"""Single-process pure-Python replay oracle (SURVEY.md §5 layer 3).

The reference checkout is empty (SURVEY.md §0), so this oracle — the
simplest possible sequential implementation of the CDC semantics — is
the in-sandbox stand-in for "the reference's final table state after
replay" (BASELINE.json north_rule). The distributed engine must match
it row-by-row, ``text`` byte-identical.

Semantics (FIXTURES.md §2.3):
- per url: winner = event with max ``(warc_ts, offset)`` (lexicographic);
  the base-page row, if any, participates with ``offset = -1``
- winner.op == 'delete'  →  url absent from the final table (tombstone)
- else the row is ``(url, winner.warc_ts, winner.html,
  extract_text(winner.html), winner.lang)`` — ``lang`` stays null for
  v1-origin events (null-fill evolution, SURVEY.md §1.4)
- duplicate delivery (same offset re-emitted) must not change the result
"""

from __future__ import annotations

import pyarrow as pa

from maestro_ray.core.schema import PAGES_V2
from maestro_ray.ops.extract_pure import extract_text


def replay(
    base_pages: pa.Table | None, events: list[dict]
) -> dict[str, tuple[int, bytes | None, str, str | None]]:
    """Sequentially apply ``events`` over ``base_pages``.

    Returns ``{url: (warc_ts_us, html, text, lang)}`` for surviving urls.
    ``events`` rows are dicts with CHANGELOG_V3 fields (``warc_ts`` as
    int µs), e.g. from ``fixtures.gen_changelog_events``.
    """
    # winner bookkeeping: url -> (warc_ts, offset, op, html, lang)
    best: dict[str, tuple[int, int, str, bytes | None, str | None]] = {}
    if base_pages is not None:
        for row in base_pages.to_pylist():
            ts = row["warc_ts"]
            ts_us = (
                ts
                if isinstance(ts, int)
                else int(ts.timestamp() * 1_000_000)
                if hasattr(ts, "timestamp")
                else int(ts)
            )
            best[row["url"]] = (ts_us, -1, "insert", row["html"], row.get("lang"))
    for ev in events:
        key = (ev["warc_ts"], ev["offset"])
        cur = best.get(ev["url"])
        if cur is None or key > (cur[0], cur[1]):
            best[ev["url"]] = (
                ev["warc_ts"],
                ev["offset"],
                ev["op"],
                ev["html"],
                ev.get("lang"),
            )
    out: dict[str, tuple[int, bytes | None, str, str | None]] = {}
    for url, (ts, _off, op, html, lang) in best.items():
        if op == "delete":
            continue
        out[url] = (ts, html, extract_text(html), lang)
    return out


def replay_to_table(base_pages: pa.Table | None, events: list[dict]) -> pa.Table:
    """Oracle result as a PAGES_V2 table sorted by url (for comparisons)."""
    state = replay(base_pages, events)
    urls = sorted(state)
    return pa.Table.from_arrays(
        [
            pa.array(urls, pa.string()),
            pa.array([state[u][0] for u in urls], pa.timestamp("us")),
            pa.array([state[u][1] for u in urls], pa.binary()),
            pa.array([state[u][2] for u in urls], pa.string()),
            pa.array([state[u][3] for u in urls], pa.string()),
        ],
        schema=PAGES_V2,
    )
