"""End-to-end maestro lifecycle: delimited landing files → typed
segments → replay ingest → oracle-identical lake."""

import base64
import os

import pytest

from maestro_ray.fixtures import ChangelogParams, gen_changelog_events
from maestro_ray.io.lake import read_lake_table
from maestro_ray.oracle import replay_to_table
from maestro_ray.pipelines.ingest import ingest
from maestro_ray.pipelines.landing import convert_landing_files

PARAMS = ChangelogParams(n_urls=40, n_events=300, seg_rows=100, evolution=False)


def _write_landing(events, landing_dir, per_file=100, corrupt_line=None):
    os.makedirs(landing_dir, exist_ok=True)
    from datetime import datetime, timezone

    for i in range(0, len(events), per_file):
        lines = []
        for ev in events[i : i + per_file]:
            ts = datetime.fromtimestamp(
                ev["warc_ts"] / 1e6, tz=timezone.utc
            ).strftime("%Y-%m-%d %H:%M:%S.%f")
            h = base64.b64encode(ev["html"]).decode() if ev["html"] else ""
            lang = ev["lang"] or ""
            lines.append(
                f"{ev['offset']}|{ev['op']}|{ev['url']}|{ts}|{h}|{lang}"
            )
        if corrupt_line is not None and i == 0:
            lines.insert(corrupt_line, "not|a|valid|line")
        with open(os.path.join(landing_dir, f"landing-{i:06d}.txt"), "w") as f:
            f.write("\n".join(lines) + "\n")


def test_landing_to_lake_matches_oracle(ray_session, tmp_path):
    events = gen_changelog_events(PARAMS)
    landing = str(tmp_path / "landing")
    _write_landing(events, landing)
    log = str(tmp_path / "log")
    segs = convert_landing_files(landing, log)
    assert len(segs) == 3
    # idempotent re-discovery: nothing new
    assert convert_landing_files(landing, log) == []
    lake = str(tmp_path / "lake")
    ingest(log, lake, num_partitions=4)
    got = read_lake_table(lake)
    exp = replay_to_table(None, events)
    assert got.num_rows == exp.num_rows
    for col in exp.column_names:
        if col == "lang":
            continue  # '' vs None round-trip: checked below
        assert got.column(col).equals(exp.column(col)), col
    # empty-string sentinel maps back to null lang
    langs_got = ["" if v is None else v for v in got.column("lang").to_pylist()]
    langs_exp = ["" if v is None else v for v in exp.column("lang").to_pylist()]
    assert langs_got == langs_exp


def test_landing_quarantines_bad_rows(ray_session, tmp_path):
    events = gen_changelog_events(PARAMS)
    landing = str(tmp_path / "landing")
    _write_landing(events, landing, corrupt_line=5)
    log = str(tmp_path / "log")
    segs = convert_landing_files(landing, log, error_threshold=0.05)
    assert len(segs) == 3  # one bad row in 101 lines is under θ
    qdir = os.path.join(log, "_quarantine")
    assert os.path.isdir(qdir) and len(os.listdir(qdir)) == 1


def test_landing_rejects_dirty_file(ray_session, tmp_path):
    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    with open(os.path.join(landing, "bad.txt"), "w") as f:
        f.write("garbage\n" * 50)
    log = str(tmp_path / "log")
    segs = convert_landing_files(landing, log, error_threshold=0.05)
    assert segs == []
    # rejected file is NOT committed: a fixed version would be retried
    from maestro_ray.io.readers import LandingZone

    assert len(LandingZone(landing).discover("*.txt")) == 1
