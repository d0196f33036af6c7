"""Write-Audit-Publish (pipelines/wap.py): a passing audit publishes
exactly the staged branch state; a failing audit leaves the source
lake bit-for-bit untouched and keeps the branch for inspection."""

import os

import pandas as pd
import pytest

from maestro_ray.core.manifest import latest_manifest
from maestro_ray.fixtures import ChangelogParams, write_changelog
from maestro_ray.io.lake import clone_lake, fsck_lake, read_lake_table
from maestro_ray.pipelines.ingest import ingest
from maestro_ray.pipelines.wap import structural_audit, write_audit_publish


def _live(lake_dir) -> pd.DataFrame:
    t = read_lake_table(lake_dir).to_pandas()
    return (t[["url", "warc_ts", "text", "lang"]]
            .sort_values(["url", "warc_ts"]).reset_index(drop=True))


@pytest.fixture()
def staged(ray_session, tmp_path):
    """src ingests log A; log B (offsets above A's watermark) is the
    incoming WAP batch."""
    log_a = str(tmp_path / "logA")
    write_changelog(log_a, ChangelogParams(
        seed=15, n_urls=50, n_events=400, seg_rows=50,
        p_delete=0.15, evolution=False))
    log_b = str(tmp_path / "logB")
    write_changelog(log_b, ChangelogParams(
        seed=16, n_urls=50, n_events=700, seg_rows=50,
        p_delete=0.15, evolution=False))
    src = str(tmp_path / "src")
    ingest(log_a, src, num_partitions=4, segments_per_epoch=3)
    return {"src": src, "log_b": log_b, "tmp": tmp_path}


def test_wap_publish_matches_direct_apply(staged):
    src, log_b = staged["src"], staged["log_b"]
    # the oracle: apply log B directly to an identical clone
    direct = str(staged["tmp"] / "direct")
    clone_lake(src, direct)
    ingest(log_b, direct, num_partitions=4, segments_per_epoch=3)

    out = write_audit_publish(
        src, log_b, str(staged["tmp"] / "branch"),
        structural_audit(max_null_frac=1.0, min_rows=1),
        num_partitions=4, segments_per_epoch=3)
    assert out["published"] is True
    assert out["src_epoch_after"] == out["src_epoch_before"] + 1
    assert out["branch_dir"] is None
    assert not os.path.exists(str(staged["tmp"] / "branch"))
    pd.testing.assert_frame_equal(_live(src), _live(direct))
    rep = fsck_lake(src)
    assert rep["ok"], rep


def test_wap_reject_leaves_src_untouched(staged):
    src, log_b = staged["src"], staged["log_b"]
    before_live = _live(src)
    before_epoch = latest_manifest(src).epoch

    def veto(branch_dir):
        return False, {"reason": "vetoed"}

    branch = str(staged["tmp"] / "branch")
    out = write_audit_publish(src, log_b, branch, veto,
                              num_partitions=4, segments_per_epoch=3)
    assert out["published"] is False
    assert out["report"] == {"reason": "vetoed"}
    assert latest_manifest(src).epoch == before_epoch
    pd.testing.assert_frame_equal(_live(src), before_live)
    # branch kept for inspection, and it really holds the staged state
    assert os.path.exists(branch)
    assert latest_manifest(branch).epoch > before_epoch


def test_wap_audit_sees_staged_state(staged):
    """The audit runs against src ⊕ log B, not src alone."""
    src, log_b = staged["src"], staged["log_b"]
    seen = {}

    def probe(branch_dir):
        seen["rows"] = len(_live(branch_dir))
        return False, {}

    write_audit_publish(src, log_b, str(staged["tmp"] / "b2"), probe,
                        num_partitions=4, segments_per_epoch=3,
                        keep_failed_branch=False)
    direct = str(staged["tmp"] / "direct2")
    clone_lake(src, direct)
    ingest(log_b, direct, num_partitions=4, segments_per_epoch=3)
    assert seen["rows"] == len(_live(direct))
    assert not os.path.exists(str(staged["tmp"] / "b2"))


def test_wap_structural_audit_null_gate(staged):
    """structural_audit vetoes when the staged state exceeds the null
    ceiling (the fixture has no null langs → 0.0 passes; min_rows
    above the staged count vetoes)."""
    src, log_b = staged["src"], staged["log_b"]
    out = write_audit_publish(
        src, log_b, str(staged["tmp"] / "b3"),
        structural_audit(max_null_frac=0.0, min_rows=10**9),
        num_partitions=4, segments_per_epoch=3,
        keep_failed_branch=False)
    assert out["published"] is False
    assert out["report"]["rows"] < 10**9
