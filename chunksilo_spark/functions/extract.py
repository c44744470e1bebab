"""HTML -> text extraction (stage-1 parser semantics).

Re-implements, self-contained (stdlib only), the reference extraction
semantics: unwrap syntax-highlighting spans, then convert HTML to a
markdown-ish text with ATX headings, ``*`` bullets, and ``script``/``style``
stripped (reference: confluence_html_formatter.py:16-83 — clean spans whose
style contains ``color``/``background`` or whose class contains ``code``,
then markdownify(heading_style="ATX", bullets="*", strip=["script","style"])).

bs4/markdownify are not available in this environment, so the conversion is
pinned HERE as the canonical semantics; the same function is the pytest
oracle and the executor UDF kernel, making extracted text byte-identical per
url by construction (the BASELINE invariant). Heading extraction and line
offsets mirror reference index.py:437-490.

Output format (pinned):
  * block elements (h1-h6, p, div, ul, ol, pre, blockquote, table rows) are
    separated by exactly one blank line;
  * ``<hN>`` -> ``'#'*N + ' ' + inline_text``;
  * ``<li>`` -> ``'* ' + inline_text`` on its own line (list items in one
    list are consecutive lines, no blank line between items);
  * ``<pre>`` -> fenced block: three backticks, raw text (whitespace
    preserved), three backticks;
  * ``<br>`` -> newline inside a block;
  * inline whitespace runs collapse to a single space; blocks are stripped;
  * ``<span>`` contributes its text (syntax spans are unwrapped, matching the
    reference; benign spans keep their text either way);
  * ``script``/``style`` content is dropped;
  * final text has no leading/trailing whitespace and no 3+ newline runs.

Malformed HTML (unclosed tags) is tolerated by the stdlib HTMLParser;
non-UTF-8 ``html`` bytes raise UnicodeDecodeError -> the quarantine path.
"""

from __future__ import annotations

import re
import unicodedata
from html.parser import HTMLParser

_BLOCK_TAGS = frozenset(
    "p div section article main header footer ul ol li pre blockquote "
    "h1 h2 h3 h4 h5 h6 table tr td th body html".split()
)
_SKIP_TAGS = frozenset(("script", "style"))
_HEADING_LEVEL = {f"h{i}": i for i in range(1, 7)}
_WS_RE = re.compile(r"\s+")
_NL3_RE = re.compile(r"\n{3,}")


class _TextExtractor(HTMLParser):
    """Streaming HTML -> markdown-ish text state machine."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[str] = []  # finished block strings
        self._inline: list[str] = []  # text fragments of the current block
        self._skip_depth = 0  # inside <script>/<style>
        self._pre_depth = 0  # inside <pre>: preserve whitespace
        self._heading_level = 0  # >0 while inside <hN>
        self._list_items: list[str] = []  # finished <li> lines of current list
        self._list_depth = 0
        self._in_li = False

    # -- block management -------------------------------------------------
    def _flush_inline(self) -> None:
        text = "".join(self._inline)
        self._inline = []
        if self._pre_depth > 0:
            text = text.strip("\n")
            if text:
                self.blocks.append("```\n" + text + "\n```")
            return
        text = _WS_RE.sub(" ", text).strip()
        if not text:
            return
        if self._heading_level:
            text = "#" * self._heading_level + " " + text
        if self._in_li:
            self._list_items.append("* " + text)
        else:
            self.blocks.append(text)

    def _flush_list(self) -> None:
        if self._list_items:
            self.blocks.append("\n".join(self._list_items))
            self._list_items = []

    # -- parser callbacks --------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
            return
        if self._skip_depth:
            return
        if tag == "br":
            self._inline.append("\n" if self._pre_depth else " ")
            return
        if tag == "span":  # unwrapped: contributes only its text
            return
        if tag in _BLOCK_TAGS:
            self._flush_inline()
            if tag in _HEADING_LEVEL:
                self._heading_level = _HEADING_LEVEL[tag]
            elif tag == "pre":
                self._pre_depth += 1
            elif tag in ("ul", "ol"):
                self._list_depth += 1
            elif tag == "li":
                self._in_li = True

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if self._skip_depth or tag == "span" or tag == "br":
            return
        if tag in _BLOCK_TAGS:
            self._flush_inline()
            if tag in _HEADING_LEVEL:
                self._heading_level = 0
            elif tag == "pre":
                self._pre_depth = max(0, self._pre_depth - 1)
            elif tag == "li":
                self._in_li = False
            elif tag in ("ul", "ol"):
                self._list_depth = max(0, self._list_depth - 1)
                if self._list_depth == 0:
                    self._flush_list()

    def handle_data(self, data: str) -> None:
        if self._skip_depth:
            return
        self._inline.append(data)

    def close(self) -> None:  # flush trailing un-closed content (malformed HTML)
        super().close()
        self._flush_inline()
        self._flush_list()


def extract_text(html: str) -> str:
    """Canonical HTML -> text conversion (see module docstring for the pin).

    Normalizes the input to NFC first so byte-identity is not sensitive to
    producer-side Unicode composition (SURVEY.md §7.4 risk 1).
    """
    if not html:
        return ""
    html = unicodedata.normalize("NFC", html)
    parser = _TextExtractor()
    parser.feed(html)
    parser.close()
    text = "\n\n".join(parser.blocks)
    return _NL3_RE.sub("\n\n", text).strip()


def extract_text_from_bytes(html: bytes) -> str:
    """Decode strictly as UTF-8 then extract; decode errors -> quarantine."""
    return extract_text(html.decode("utf-8", errors="strict"))


# -- headings / line offsets (reference index.py:437-490) -------------------

_HEADING_RE = re.compile(r"^(#{1,6})\s+(.+?)$", re.MULTILINE)
_FENCE_RE = re.compile(r"```.*?```", re.DOTALL)


def line_offsets(text: str) -> list[int]:
    """Char position where each line starts: [0] + [i+1 for each '\\n' at i].

    Reference semantics: index.py:437-447.
    """
    offsets = [0]
    start = 0
    while True:
        i = text.find("\n", start)
        if i < 0:
            return offsets
        offsets.append(i + 1)
        start = i + 1


def extract_headings(text: str) -> list[dict]:
    """ATX headings outside triple-backtick fences -> [{text, position, level}].

    Reference semantics: index.py:450-490 (same regexes, same fence skip).
    """
    fences = [(m.start(), m.end()) for m in _FENCE_RE.finditer(text)]
    headings = []
    for m in _HEADING_RE.finditer(text):
        pos = m.start()
        if any(s <= pos < e for s, e in fences):
            continue
        heading_text = m.group(2).strip()
        if heading_text:
            headings.append(
                {"text": heading_text, "position": pos, "level": len(m.group(1))}
            )
    return headings


def heading_path(headings: list[dict], char_pos: int) -> list[str]:
    """Heading path for a char offset: the texts of ALL headings with
    position <= char_pos, in document order (a flat prefix, NOT a
    decreasing-level ancestor chain) — reference search.py:154-172
    (_build_heading_path returns headings[:current_idx+1] texts; the caller
    at search.py:1280-1281 appends the current heading only when the path
    does not already end with it, which is a no-op for paths built here).
    Empty-text headings are skipped (the reference's `if h.get("text")`).
    """
    return [
        h["text"]
        for h in headings
        if h["position"] <= char_pos and h["text"]
    ]


def char_to_line(offsets: list[int], char_pos: int) -> int:
    """1-based line number for a char offset: greatest line start <= pos.

    Reference semantics: search.py:175-188 (binary search).
    """
    lo, hi = 0, len(offsets) - 1
    while lo < hi:
        mid = (lo + hi + 1) // 2
        if offsets[mid] <= char_pos:
            lo = mid
        else:
            hi = mid - 1
    return lo + 1
