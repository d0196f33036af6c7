"""Deterministic CDC fixture generator (SURVEY.md §2 op S3, FIXTURES.md §2).

The sandbox is sealed (no external data), so the pages base table and
the changelog segments are synthesized here — byte-identical output for
identical ``(seed, params)`` on every run, because both the engine and
the pure-Python replay oracle consume these same files.

Exercises every hard case the replay tests need: zipf url skew (hot
keys), out-of-order ``warc_ts``, duplicated delivery (same offset
re-emitted in a later segment), tombstone deletes, and schema evolution
(v1 no-lang → v2 +lang/timestamp[s] → v3 canonical).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from maestro_ray.core.schema import (
    CHANGELOG_V1,
    CHANGELOG_V2,
    CHANGELOG_V3,
    PAGES_V2,
)
from maestro_ray.ops.extract_pure import extract_text

_WORDS = (
    "the quick brown fox jumps over lazy dog data stream merge lake delta "
    "page crawl web index shard batch arrow block offset commit epoch "
    "partition schema column vector hash key salt upsert tombstone replay "
    "alpha beta gamma delta epsilon zeta eta theta iota kappa"
).split()

_LANGS = ["en", "de", "es", "fr", "zh"]

_BASE_TS_US = np.int64(1704067200000000)  # 2024-01-01T00:00:00Z in µs


def _html_for(rng: np.random.Generator, url: str, approx_bytes: int) -> bytes:
    """Deterministic HTML payload exercising every extract_text rule."""
    title = " ".join(rng.choice(_WORDS, size=3))
    n_paras = max(1, approx_bytes // 200)
    paras = []
    for _ in range(n_paras):
        words = " ".join(rng.choice(_WORDS, size=24))
        paras.append(f"<p class=\"body\">{words} &amp; more &#8212; q&#39;s</p>")
    body = "\n".join(paras)
    html = (
        f"<html><head><title>{title}</title>"
        f"<style>.body {{ color: #000; }}</style>"
        f"<script type=\"text/javascript\">var x = 1 < 2 && 3 > 2;</script>"
        f"</head><body><nav><a href=\"{url}\">home &gt; page</a></nav>\n"
        f"<h1>{title} &quot;v&quot;</h1>\n{body}\n"
        f"<footer>&lt;end&gt;</footer></body></html>"
    )
    return html.encode("utf-8")


@dataclass
class ChangelogParams:
    """FIXTURES.md §2.2 defaults (smoke tier)."""

    seed: int = 42
    n_urls: int = 500
    n_events: int = 5_000
    zipf_a: float = 1.3
    p_insert: float = 0.3
    p_update: float = 0.6
    p_delete: float = 0.1
    p_ooo: float = 0.1
    p_dup: float = 0.05
    seg_rows: int = 1_000
    evolution: bool = True
    html_bytes: int = 1024
    #: bench tier: draw html from a small deterministic template pool
    #: with a per-event unique marker instead of fully random payloads —
    #: ~20x faster generation at identical schema/size characteristics.
    fast_html: bool = False
    #: fraction of non-insert events turned into ``op='patch'`` partial
    #: updates (Debezium-style: non-null html/lang = set, null = keep).
    #: Drawn from an independent rng stream so 0.0 (default) leaves
    #: every existing fixture bit-identical.
    p_patch: float = 0.0


def _zipf_probs(n: int, a: float) -> np.ndarray:
    p = 1.0 / np.arange(1, n + 1) ** a
    return p / p.sum()


def gen_pages(
    n_urls: int = 500, seed: int = 42, html_bytes: int = 1024,
    n_sites: int | None = None,
) -> pa.Table:
    """The lake's initial state (FIXTURES.md §2.1): PAGES_V2 schema.

    Uses the same url universe as the changelog generator (same
    ``n_sites`` formula) so base pages and change events collide on key.
    """
    rng = np.random.default_rng(seed)
    if n_sites is None:
        n_sites = max(1, n_urls // 25)
    urls = [
        f"https://site{u % n_sites}.example/{u}" for u in range(n_urls)
    ]
    ts = _BASE_TS_US + rng.integers(0, 86_400_000_000, size=n_urls)
    htmls = [_html_for(rng, u, html_bytes) for u in urls]
    langs = [_LANGS[int(h) % len(_LANGS)] for h in rng.integers(0, 1 << 30, n_urls)]
    return pa.Table.from_arrays(
        [
            pa.array(urls, pa.string()),
            pa.array(ts, pa.timestamp("us")),
            pa.array(htmls, pa.binary()),
            pa.array([extract_text(h) for h in htmls], pa.string()),
            pa.array(langs, pa.string()),
        ],
        schema=PAGES_V2,
    )


def gen_changelog_events(params: ChangelogParams) -> list[dict]:
    """Canonical event list (pre-segmentation), in offset order.

    Each event dict has the CHANGELOG_V3 fields. ``warc_ts`` here is the
    value the engine must see AFTER evolution to µs — events destined
    for v2 (second-resolution) segments are already floored to whole
    seconds, so engine and oracle agree on LWW order.
    """
    p = params
    rng = np.random.default_rng(p.seed)
    probs = _zipf_probs(p.n_urls, p.zipf_a)
    url_ids = rng.choice(p.n_urls, size=p.n_events, p=probs)
    n_sites = max(1, p.n_urls // 25)
    # base timestamps: monotone-ish with ~p_ooo fraction pushed backwards
    base = _BASE_TS_US + np.arange(p.n_events, dtype=np.int64) * 60_000_000
    jitter = rng.integers(0, 50_000_000, size=p.n_events)
    ooo = rng.random(p.n_events) < p.p_ooo
    back = rng.integers(120_000_000, 7_200_000_000, size=p.n_events)
    ts = base + jitter - np.where(ooo, back, 0)
    n_segments = max(1, -(-p.n_events // p.seg_rows))
    seen: set[int] = set()
    upd_frac = p.p_update / max(1e-9, (p.p_update + p.p_delete))
    op_draw = rng.random(p.n_events)
    lang_draw = rng.integers(0, len(_LANGS), size=p.n_events)
    # independent stream: p_patch=0 leaves existing fixtures bit-identical
    patch_draw = np.random.default_rng(p.seed + 13).random(p.n_events)
    html_pool: list[bytes] = []
    if p.fast_html:
        pool_rng = np.random.default_rng(p.seed + 7)
        html_pool = [
            _html_for(pool_rng, f"pool{i}", p.html_bytes) for i in range(64)
        ]
    events: list[dict] = []
    for off in range(p.n_events):
        u = int(url_ids[off])
        url = f"https://site{u % n_sites}.example/{u}"
        if u not in seen:
            op = "insert"
            seen.add(u)
        else:
            op = "update" if op_draw[off] < upd_frac else "delete"
            if p.p_patch and patch_draw[off] < p.p_patch:
                op = "patch"
        seg_idx = off // p.seg_rows
        version = _segment_version(seg_idx, n_segments, p.evolution)
        t = int(ts[off])
        if version == 2:
            t = (t // 1_000_000) * 1_000_000  # second resolution
        if op == "delete":
            html, text_lang = None, None
        else:
            if p.fast_html:
                pool_i = off % len(html_pool)
                html = b"<p>v" + str(off).encode() + b"</p>" + html_pool[pool_i]
            else:
                html = _html_for(
                    np.random.default_rng((p.seed, off)), url, p.html_bytes
                )
            text_lang = _LANGS[int(lang_draw[off])]
        if op == "patch":  # partial update: null = keep
            k = off % 3
            if k == 0:
                html = None  # lang-only patch
            elif k == 1:
                text_lang = None  # html-only patch
            # k == 2: both columns patched
        events.append(
            {
                "offset": off,
                "op": op,
                "url": url,
                "warc_ts": t,
                "html": html,
                "lang": text_lang if version >= 2 else None,
            }
        )
    return events


def _segment_version(seg_idx: int, n_segments: int, evolution: bool) -> int:
    if not evolution:
        return 3
    third = max(1, n_segments // 3)
    if seg_idx < third:
        return 1
    if seg_idx < 2 * third:
        return 2
    return 3


def _events_to_table(rows: list[dict], version: int) -> pa.Table:
    offs = pa.array([r["offset"] for r in rows], pa.int64())
    ops = pa.array([r["op"] for r in rows], pa.string())
    urls = pa.array([r["url"] for r in rows], pa.string())
    htmls = pa.array([r["html"] for r in rows], pa.binary())
    if version == 1:
        ts = pa.array([r["warc_ts"] for r in rows], pa.timestamp("us"))
        return pa.Table.from_arrays([offs, ops, urls, ts, htmls], schema=CHANGELOG_V1)
    if version == 2:
        ts = pa.array(
            [r["warc_ts"] // 1_000_000 for r in rows], pa.timestamp("s")
        )
        langs = pa.array([r["lang"] for r in rows], pa.string())
        return pa.Table.from_arrays(
            [offs, ops, urls, ts, htmls, langs], schema=CHANGELOG_V2
        )
    ts = pa.array([r["warc_ts"] for r in rows], pa.timestamp("us"))
    langs = pa.array([r["lang"] for r in rows], pa.string())
    return pa.Table.from_arrays(
        [offs, ops, urls, ts, htmls, langs], schema=CHANGELOG_V3
    )


def write_changelog(log_dir: str, params: ChangelogParams) -> list[dict]:
    """Write ``seg-<first_offset>.parquet`` segment files; return events.

    Duplicate delivery (exactly-once test): ~``p_dup`` of events are
    re-emitted verbatim (same offset) appended to a LATER segment.
    """
    os.makedirs(log_dir, exist_ok=True)
    p = params
    events = gen_changelog_events(p)
    n_segments = max(1, -(-p.n_events // p.seg_rows))
    segments: list[list[dict]] = [
        events[i * p.seg_rows : (i + 1) * p.seg_rows] for i in range(n_segments)
    ]
    rng = np.random.default_rng(p.seed + 1)
    dup_mask = rng.random(p.n_events) < p.p_dup
    for off in np.nonzero(dup_mask)[0]:
        src_seg = int(off) // p.seg_rows
        if src_seg + 1 < n_segments:
            tgt = int(rng.integers(src_seg + 1, n_segments))
            segments[tgt] = segments[tgt] + [events[int(off)]]
    for i, seg in enumerate(segments):
        version = _segment_version(i, n_segments, p.evolution)
        tbl = _events_to_table(seg, version)
        first = i * p.seg_rows
        pq.write_table(tbl, os.path.join(log_dir, f"seg-{first:012d}.parquet"))
    return events


def write_changelog_fast(log_dir: str, params: ChangelogParams) -> int:
    """Vectorized, segment-streaming generator for BENCH-scale fixtures.

    Same schema/segment layout as ``write_changelog`` but builds Arrow
    arrays per segment directly (no per-event Python dicts), so memory
    is O(seg_rows) and 10^7-event fixtures generate in tens of seconds.
    Content differs from the oracle-grade generator (op assignment is
    vectorized, no duplicate re-emission) — use ONLY for benchmarks;
    correctness tests use ``write_changelog`` + the replay oracle.
    Returns the number of events written.
    """
    os.makedirs(log_dir, exist_ok=True)
    p = params
    rng = np.random.default_rng(p.seed)
    probs = _zipf_probs(p.n_urls, p.zipf_a)
    url_ids = rng.choice(p.n_urls, size=p.n_events, p=probs)
    n_sites = max(1, p.n_urls // 25)
    base = _BASE_TS_US + np.arange(p.n_events, dtype=np.int64) * 60_000_000
    jitter = rng.integers(0, 50_000_000, size=p.n_events)
    ooo = rng.random(p.n_events) < p.p_ooo
    back = rng.integers(120_000_000, 7_200_000_000, size=p.n_events)
    ts = base + jitter - np.where(ooo, back, 0)
    # op assignment, vectorized: first occurrence of a url -> insert
    first_idx = np.zeros(p.n_events, dtype=bool)
    _uniq, first = np.unique(url_ids, return_index=True)
    first_idx[first] = True
    upd_frac = p.p_update / max(1e-9, (p.p_update + p.p_delete))
    op_draw = rng.random(p.n_events)
    ops_all = np.where(
        first_idx, "insert", np.where(op_draw < upd_frac, "update", "delete")
    )
    lang_draw = rng.integers(0, len(_LANGS), size=p.n_events)
    pool_rng = np.random.default_rng(p.seed + 7)
    pool = [_html_for(pool_rng, f"pool{i}", p.html_bytes) for i in range(64)]
    n_segments = max(1, -(-p.n_events // p.seg_rows))
    for s in range(n_segments):
        lo, hi = s * p.seg_rows, min((s + 1) * p.seg_rows, p.n_events)
        version = _segment_version(s, n_segments, p.evolution)
        offs = np.arange(lo, hi, dtype=np.int64)
        seg_ts = ts[lo:hi].copy()
        if version == 2:
            seg_ts = (seg_ts // 1_000_000) * 1_000_000
        urls = [
            f"https://site{u % n_sites}.example/{u}" for u in url_ids[lo:hi]
        ]
        seg_ops = ops_all[lo:hi]
        htmls = [
            None
            if seg_ops[i - lo] == "delete"
            else b"<p>v" + str(i).encode() + b"</p>" + pool[i % 64]
            for i in range(lo, hi)
        ]
        cols = [
            pa.array(offs, pa.int64()),
            pa.array(seg_ops.tolist(), pa.string()),
            pa.array(urls, pa.string()),
        ]
        if version == 2:
            cols.append(pa.array(seg_ts // 1_000_000, pa.timestamp("s")))
        else:
            cols.append(pa.array(seg_ts, pa.timestamp("us")))
        cols.append(pa.array(htmls, pa.binary()))
        if version >= 2:
            langs = [
                None if seg_ops[i] == "delete" else _LANGS[int(lang_draw[lo + i])]
                for i in range(hi - lo)
            ]
            cols.append(pa.array(langs, pa.string()))
            schema = CHANGELOG_V2 if version == 2 else CHANGELOG_V3
        else:
            schema = CHANGELOG_V1
        tbl = pa.Table.from_arrays(cols, schema=schema)
        pq.write_table(tbl, os.path.join(log_dir, f"seg-{lo:012d}.parquet"))
    return p.n_events


def write_warc(path: str, records: list[tuple[str, str, bytes]],
               gzip_members: bool = True) -> int:
    """Write a WARC 1.0 shard of response records for tests/benchmarks:
    ``records`` = [(url, iso_date, payload_bytes)]. With
    ``gzip_members`` each record is its own gzip member (the
    Common-Crawl .warc.gz convention — members concatenate into one
    valid gzip stream); otherwise a plain .warc. Returns bytes
    written. Record ids are deterministic (uuid5 of url + date) so
    fixture files are byte-stable across runs."""
    import gzip
    import uuid

    chunks = []
    for url, date, payload in records:
        rid = uuid.uuid5(uuid.NAMESPACE_URL, f"{url}|{date}")
        hdr = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {date}\r\n"
            f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
            "Content-Type: application/http; msgtype=response\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n"
        ).encode("utf-8")
        rec = hdr + payload + b"\r\n\r\n"
        chunks.append(gzip.compress(rec, mtime=0) if gzip_members else rec)
    blob = b"".join(chunks)
    tmp = f"{path}.{os.getpid()}.tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)
    return len(blob)


def write_xml(path: str, records: list[dict], record_tag: str = "doc",
              root_tag: str = "docs") -> int:
    """Write an XML record-export shard for tests/benchmarks: each
    record dict becomes one ``<record_tag>`` element whose dict keys
    are child elements (None values → omitted child). Serialization is
    ElementTree's, so escaping of &/</> round-trips exactly through
    ``io.readers.read_xml``. Byte-stable across runs (no timestamps).
    Returns bytes written."""
    import re
    import xml.etree.ElementTree as ET

    # XML 1.0 cannot carry C0 controls (except \t \n \r), and parsers
    # NORMALIZE \r to \n on read — both would silently break the exact
    # round-trip this writer promises, so reject them loudly
    bad = re.compile("[\x00-\x08\x0b\x0c\x0e-\x1f\r]")
    root = ET.Element(root_tag)
    for rec in records:
        el = ET.SubElement(root, record_tag)
        for k, v in rec.items():
            if v is None:
                continue
            s = str(v)
            m = bad.search(s)
            if m:
                raise ValueError(
                    f"write_xml: field {k!r} contains "
                    f"{m.group()!r} — not round-trippable through "
                    "XML 1.0 (C0 controls are illegal; \\r is "
                    "normalized to \\n by every conforming parser)")
            child = ET.SubElement(el, k)
            child.text = s
    blob = ET.tostring(root, encoding="utf-8", xml_declaration=True)
    tmp = f"{path}.{os.getpid()}.tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)
    return len(blob)
