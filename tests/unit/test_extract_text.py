"""Byte-identity tests for the frozen extract_text contract (FIXTURES.md §3)."""

import pytest

from maestro_ray.ops.extract_pure import extract_text


@pytest.mark.parametrize(
    "html,expected",
    [
        (b"<p>hello world</p>", "hello world"),
        (b"  <b>a</b>\n\n<i>b</i>\t c ", "a b c"),
        (b"<script>var x = '<p>no</p>';</script>yes", "yes"),
        (b"<style>p { color: red }</style>text", "text"),
        (b"<SCRIPT a=b>x</SCRIPT >after", "after"),
        (b"a &amp; b &lt;c&gt; &quot;d&quot; &#39;e&#39;", "a & b <c> \"d\" 'e'"),
        (b"dash &#8212; end", "dash — end"),
        (b"&amp;lt; double-unescape is the frozen contract", "< double-unescape is the frozen contract"),
        (b"<p attr=\">\">odd</p>", "\">odd"),  # tag regex stops at first '>'
        (b"", ""),
        (b"\xff\xfe plain", "�� plain"),  # invalid utf-8 -> replacement chars
        (b"<script>never closed", "never closed"),  # unclosed script NOT dropped; tag stripped
        (b"&#1114112; too big", "&#1114112; too big"),  # out-of-range codepoint left literal
    ],
)
def test_contract_cases(html, expected):
    assert extract_text(html) == expected


def test_unclosed_tag_kept_literal():
    # '<unclosed' never matches <[^>]*> (no closing '>'), so it survives
    assert extract_text(b"<unclosed") == "<unclosed"


def test_null_and_nested():
    assert extract_text(None) == ""
    assert extract_text(b"<div><div><p>deep</p></div></div>") == "deep"


def test_deterministic():
    payload = b"<html><body>x &amp; y &#65;</body></html>"
    assert extract_text(payload) == extract_text(payload) == "x & y A"
