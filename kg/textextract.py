"""Canonical HTML -> text extraction (trafilatura-style, deterministic).

ONE pure-Python function shared verbatim by the single-node oracle and the
Spark ``mapInPandas`` UDF, so the "byte-identical extracted text per url"
invariant (BASELINE.json input_hint) holds by construction.

Behavior: parse HTML with the stdlib parser, drop boilerplate containers
(script/style/head/nav/header/footer/aside/form/template/noscript), emit the
text of block-level content elements (p, h1-h6, li, td, th, blockquote, pre,
figcaption, caption, dt, dd) joined by a single "\n". Whitespace inside a
block is collapsed to single spaces and trimmed; entity references are
decoded by the parser. Empty blocks are skipped. No external libraries
(trafilatura/lxml/bs4 are unavailable in this environment — SURVEY.md §7).
"""

from __future__ import annotations

from html.parser import HTMLParser

_SKIP_TAGS = frozenset(
    {
        "script",
        "style",
        "head",
        "nav",
        "header",
        "footer",
        "aside",
        "form",
        "template",
        "noscript",
        "svg",
        "iframe",
    }
)

_BLOCK_TAGS = frozenset(
    {
        "p",
        "h1",
        "h2",
        "h3",
        "h4",
        "h5",
        "h6",
        "li",
        "td",
        "th",
        "blockquote",
        "pre",
        "figcaption",
        "caption",
        "dt",
        "dd",
    }
)

# Tags that never have a closing tag; they must not affect the skip stack.
_VOID_TAGS = frozenset(
    {"br", "hr", "img", "input", "meta", "link", "area", "base", "col",
     "embed", "source", "track", "wbr"}
)


class _BlockTextParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[str] = []
        self._skip_depth = 0
        self._block_depth = 0
        self._buf: list[str] = []

    def handle_starttag(self, tag: str, attrs) -> None:  # noqa: ANN001
        if tag in _VOID_TAGS:
            if tag == "br" and self._block_depth > 0:
                self._buf.append(" ")
            return
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
            return
        if tag in _BLOCK_TAGS and self._skip_depth == 0:
            if self._block_depth == 0:
                self._buf = []
            self._block_depth += 1

    def handle_endtag(self, tag: str) -> None:
        if tag in _VOID_TAGS:
            return
        if tag in _SKIP_TAGS:
            if self._skip_depth > 0:
                self._skip_depth -= 1
            return
        if tag in _BLOCK_TAGS and self._skip_depth == 0 and self._block_depth > 0:
            self._block_depth -= 1
            if self._block_depth == 0:
                text = " ".join("".join(self._buf).split())
                if text:
                    self.blocks.append(text)
                self._buf = []

    def handle_data(self, data: str) -> None:
        if self._skip_depth == 0 and self._block_depth > 0:
            self._buf.append(data)


def extract_text(html: bytes | str) -> str:
    """Extract readable text from an HTML document (deterministic).

    Accepts raw bytes (decoded as UTF-8 with replacement) or str. Returns
    block texts joined by "\\n"; returns "" for empty/unparseable input.
    """
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    if not html:
        return ""
    parser = _BlockTextParser()
    try:
        parser.feed(html)
        parser.close()
    except Exception:
        # Malformed input: fall back to whatever blocks were already parsed.
        pass
    # flush any block left open by unclosed tags
    if parser._block_depth > 0:
        tail = " ".join("".join(parser._buf).split())
        if tail:
            parser.blocks.append(tail)
    return "\n".join(parser.blocks)
