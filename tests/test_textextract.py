"""extract_text determinism + byte-identity with the synth golden column."""

from __future__ import annotations

from kg.synth import gen_pages, page_html
from kg.textextract import extract_text


def test_basic_blocks():
    html = b"<html><body><nav>menu</nav><p>Hello world</p><p>Second</p><footer>c</footer></body></html>"
    assert extract_text(html) == "Hello world\nSecond"


def test_skip_script_style_head():
    html = b"<html><head><title>T</title><script>var p='<p>no</p>';</script></head><body><p>Yes</p></body></html>"
    assert extract_text(html) == "Yes"


def test_entities_and_whitespace_collapse():
    html = b"<p>a &amp; b\n\t  c</p>"
    assert extract_text(html) == "a & b c"


def test_nested_blocks_and_lists():
    html = b"<ul><li>one</li><li>two</li></ul><h2>Head</h2>"
    assert extract_text(html) == "one\ntwo\nHead"


def test_empty_and_garbage():
    assert extract_text(b"") == ""
    assert extract_text(b"\xff\xfegarbage<p>ok</p>") == "ok"


def test_byte_identical_on_synth_corpus():
    pages = gen_pages(200, seed=42)
    for _, row in pages.iterrows():
        assert extract_text(row["html"]) == row["text"], row["url"]


def test_html_template_roundtrip_with_escapes():
    sentences = ["a < b & c > d", 'quote "x"']
    assert extract_text(page_html(7, sentences)) == "\n".join(sentences)
