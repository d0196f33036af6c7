"""The pinned, FROZEN ``extract_text`` contract — the byte-identity anchor.

The north rule requires "byte-identical per-url extracted text vs
reference" (BASELINE.json metric). The reference checkout is empty
(SURVEY.md §0), so this pure-Python implementation — pinned in
FIXTURES.md §3 at first commit — *is* the reference stand-in. It is
deterministic and total on arbitrary bytes.

DO NOT "improve" this function. Any change breaks the byte-identity
invariant against every previously generated fixture and lake. The
engine's distributed stage (ops/extract.py) must match it byte-for-byte
row-by-row, which pytest enforces on adversarial inputs
(tests/unit/test_extract_text.py).

Contract (FIXTURES.md §3):
1. decode UTF-8 with ``errors="replace"``
2. drop ``<script>`` / ``<style>`` elements (non-greedy, case-insensitive,
   dotall; an unclosed element is NOT dropped — its tags fall through to
   rule 3)
3. strip all tags ``<[^>]*>``
4. unescape the five XML entities in this order:
   ``&amp; &lt; &gt; &quot; &#39;`` — then numeric ``&#NNN;``
5. collapse whitespace runs to single spaces; strip ends
"""

from __future__ import annotations

import re

_SCRIPT_RE = re.compile(rb"<script\b[^>]*>.*?</script\s*>", re.IGNORECASE | re.DOTALL)
_STYLE_RE = re.compile(rb"<style\b[^>]*>.*?</style\s*>", re.IGNORECASE | re.DOTALL)
_TAG_RE = re.compile(r"<[^>]*>")
_NUMERIC_ENTITY_RE = re.compile(r"&#(\d+);")
_WS_RE = re.compile(r"\s+")

_ENTITIES = [  # order is part of the frozen contract
    ("&amp;", "&"),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
]


def _numeric_entity(m: re.Match) -> str:
    code = int(m.group(1))
    if code > 0x10FFFF:
        return m.group(0)  # not a valid codepoint — leave literal
    return chr(code)


def extract_text(html: bytes | None) -> str:
    """Deterministic HTML → text. Total on arbitrary bytes; '' for null."""
    if html is None:
        return ""
    raw = _SCRIPT_RE.sub(b"", html)
    raw = _STYLE_RE.sub(b"", raw)
    s = raw.decode("utf-8", errors="replace")
    s = _TAG_RE.sub("", s)
    for ent, ch in _ENTITIES:
        s = s.replace(ent, ch)
    s = _NUMERIC_ENTITY_RE.sub(_numeric_entity, s)
    s = _WS_RE.sub(" ", s)
    return s.strip()
