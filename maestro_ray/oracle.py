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


def replay_epochs(
    base_pages: pa.Table | None, epochs: list[list[dict]]
) -> dict[str, tuple[int, bytes | None, str, str | None]]:
    """Sequential epoch-batched reference INCLUDING ``op='patch'``
    partial updates (non-null html/lang = set, null = keep).

    Semantics (the engine's documented epoch fold, ops/merge.py):
    state folds one epoch at a time; at each epoch boundary every
    stored row's offset resets to −1 (mirroring
    ``pages_to_candidates`` — the stored-row pseudo-event convention).
    Within an epoch, events apply in ascending ``(warc_ts, offset)``
    order: a full event replaces the row iff strictly newer than the
    current state; a patch modifies only its non-null payload columns
    iff strictly newer, never creates a row, never resurrects a
    tombstone, and advances the row's recency key to its own. With no
    patches this is exactly ``replay`` for any epoch grouping (LWW is
    a max); with patches the result is a function of the epoch
    boundaries — inherent to partial updates without per-column
    version columns, and matched by tail mode only at
    checkpoint==epoch boundaries (the existing byte-identity caveat).
    """
    state: dict[str, dict] = {}
    if base_pages is not None:
        for row in base_pages.to_pylist():
            ts = row["warc_ts"]
            ts_us = (
                ts if isinstance(ts, int)
                else int(ts.timestamp() * 1_000_000)
                if hasattr(ts, "timestamp") else int(ts)
            )
            state[row["url"]] = {"ts": ts_us, "off": -1, "op": "insert",
                                 "html": row["html"],
                                 "lang": row.get("lang")}
    for events in epochs:
        for st in state.values():  # stored rows re-enter with off=-1
            st["off"] = -1
        for ev in sorted(events,
                         key=lambda e: (e["warc_ts"], e["offset"])):
            cur = state.get(ev["url"])
            key = (ev["warc_ts"], ev["offset"])
            if ev["op"] == "patch":
                if cur is None or cur["op"] == "delete":
                    continue  # no row to patch / tombstone stays dead
                if key <= (cur["ts"], cur["off"]):
                    continue  # stale patch (LWW)
                if ev.get("html") is None and ev.get("lang") is None:
                    continue  # empty patch (e.g. lang-only in a v1
                    # segment): a no-op, never bumps recency
                if ev.get("html") is not None:
                    cur["html"] = ev["html"]
                if ev.get("lang") is not None:
                    cur["lang"] = ev["lang"]
                cur["ts"], cur["off"] = key
            else:
                if cur is not None and key <= (cur["ts"], cur["off"]):
                    continue
                state[ev["url"]] = {"ts": ev["warc_ts"],
                                    "off": ev["offset"], "op": ev["op"],
                                    "html": ev["html"],
                                    "lang": ev.get("lang")}
    return {
        url: (st["ts"], st["html"], extract_text(st["html"]), st["lang"])
        for url, st in state.items() if st["op"] != "delete"
    }
