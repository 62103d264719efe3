"""HTML main-content extraction (Boilerpipe/Readability-style, from scratch).

The reference pipeline's text-acquisition stage is OCR over images/PDFs
(app/services/ocr_service.py:42-122); for Common-Crawl-style web pages the
analogous stage is boilerplate removal. Design (stdlib-only, deterministic):

1. Flatten the DOM into a block array: one block per block-level element
   holding (tag_path, depth, text, n_chars, n_link_chars, n_words).
2. Feature-classify each block: link_density = link_chars/chars,
   text length, boilerplate-ancestor flags (nav/header/footer/aside/form).
3. Main content = newline-join of blocks classified as content, each block's
   text whitespace-collapsed; control chars stripped per
   reference app/models/document.py:177-188.
"""

from __future__ import annotations

from dataclasses import dataclass
from html import unescape
from html.parser import HTMLParser
import re

_WS_RE = re.compile(r"\s+")

# elements whose text is never content
_SKIP_TAGS = frozenset({"script", "style", "noscript", "template", "svg", "head"})
# ancestors that mark a block as boilerplate
_BOILER_TAGS = frozenset({"nav", "header", "footer", "aside", "form", "menu"})
# elements that open a new text block (boilerplate containers are block
# boundaries too, so their text never bleeds into a content block)
_BLOCK_TAGS = frozenset(
    {
        "p", "div", "section", "article", "main", "li", "td", "th",
        "blockquote", "pre", "h1", "h2", "h3", "h4", "h5", "h6",
        "body", "figcaption", "summary", "dd", "dt",
    }
) | _BOILER_TAGS

MIN_CONTENT_CHARS = 30
MAX_LINK_DENSITY = 0.33


@dataclass
class Block:
    tag_path: str
    depth: int
    text: str
    n_chars: int
    n_link_chars: int
    n_words: int
    in_boilerplate: bool

    @property
    def link_density(self) -> float:
        return self.n_link_chars / self.n_chars if self.n_chars else 0.0

    @property
    def is_content(self) -> bool:
        return (
            not self.in_boilerplate
            and self.n_chars >= MIN_CONTENT_CHARS
            and self.link_density <= MAX_LINK_DENSITY
        )


class _BlockParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.stack: list[str] = []
        self.blocks: list[Block] = []
        self._parts: list[str] = []
        self._link_chars = 0
        self._skip_depth = 0
        self._link_depth = 0
        self._block_path: str = ""
        self._block_depth: int = 0
        self._boiler = False  # any accumulated text seen under a boiler tag

    def _flush(self) -> None:
        raw = "".join(self._parts)
        text = _WS_RE.sub(" ", raw).strip()
        if text:
            self.blocks.append(
                Block(
                    tag_path=self._block_path,
                    depth=self._block_depth,
                    text=text,
                    n_chars=len(text),
                    n_link_chars=min(self._link_chars, len(text)),
                    n_words=len(text.split()),
                    in_boilerplate=self._boiler,
                )
            )
        self._parts = []
        self._link_chars = 0
        self._boiler = False

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
        if tag == "a":
            self._link_depth += 1
        if tag in _BLOCK_TAGS:
            self._flush()
        self.stack.append(tag)
        if tag in _BLOCK_TAGS:
            self._block_path = "/".join(self.stack)
            self._block_depth = len(self.stack)

    def handle_endtag(self, tag: str) -> None:
        if tag in _BLOCK_TAGS:
            self._flush()
        if tag in _SKIP_TAGS and self._skip_depth > 0:
            self._skip_depth -= 1
        if tag == "a" and self._link_depth > 0:
            self._link_depth -= 1
        # pop to the matching open tag if present (tolerates bad nesting)
        if tag in self.stack:
            while self.stack and self.stack[-1] != tag:
                self.stack.pop()
            if self.stack:
                self.stack.pop()

    def handle_data(self, data: str) -> None:
        if self._skip_depth == 0 and data:
            self._parts.append(data)
            if self._link_depth > 0:
                self._link_chars += len(_WS_RE.sub(" ", data).strip())
            if data.strip() and any(t in _BOILER_TAGS for t in self.stack):
                self._boiler = True

    def close(self) -> None:  # flush trailing text
        super().close()
        self._flush()


def html_blocks(html: bytes | str) -> list[Block]:
    """Flatten HTML into the classified block array (the DOM analog of the
    reference's per-page OCR array, ocr_service.py:89-122)."""
    if isinstance(html, bytes):
        html = html.decode("utf-8", errors="replace")
    parser = _BlockParser()
    try:
        parser.feed(unescape_safe(html))
        parser.close()
    except Exception:
        pass
    return parser.blocks


def unescape_safe(html: str) -> str:
    # convert_charrefs already handles entities in data; leave markup as-is
    return html


# strip set per reference app/models/document.py:177-188
_CONTROL_RE = re.compile(r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]")


def extract_main_content(html: bytes | str) -> str:
    """Main-content text: newline-joined content blocks, control chars
    stripped. This string is the byte-parity surface per url."""
    blocks = html_blocks(html)
    text = "\n".join(b.text for b in blocks if b.is_content)
    return _CONTROL_RE.sub("", text)
