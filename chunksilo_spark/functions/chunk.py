"""Sentence-window chunking (stage-1).

Deterministic re-expression of the reference splitter configuration
SentenceSplitter(chunk_size=512, chunk_overlap=50, separator=" ")
(reference index.py:1471-1476) with the pinned simplifications of
FIXTURES.md §4:

  * token   = whitespace-separated word;
  * sentence boundary = regex ``(?<=[.!?])\\s+``;
  * windows are sentence-aligned, <= ``chunk_size`` tokens, with >=
    ``chunk_overlap`` tokens of overlap carried from the previous window
    (whole sentences; at least one sentence always advances);
  * each chunk carries ``char_start``/``char_end`` into the extracted text
    (reference ``start_char_idx``, index.py:958-969).

A sentence longer than ``chunk_size`` tokens becomes its own chunk (never
split mid-sentence — matches the reference's sentence-first strategy).
"""

from __future__ import annotations

import re

from ..config import get as _cfg_get

CHUNK_SIZE = int(_cfg_get("chunk.size"))  # default 512 (pinned semantics)
CHUNK_OVERLAP = int(_cfg_get("chunk.overlap"))  # default 50

_SENT_RE = re.compile(r"(?<=[.!?])\s+")
_WS_RE = re.compile(r"\s+")


def split_sentences(text: str) -> list[tuple[int, int]]:
    """(char_start, char_end) spans of sentences, in order, whitespace-trimmed."""
    spans: list[tuple[int, int]] = []
    start = 0
    for m in _SENT_RE.finditer(text):
        spans.append((start, m.start()))
        start = m.end()
    if start < len(text):
        spans.append((start, len(text)))
    # trim leading/trailing whitespace inside each span, drop empties
    out = []
    for s, e in spans:
        while s < e and text[s].isspace():
            s += 1
        while e > s and text[e - 1].isspace():
            e -= 1
        if e > s:
            out.append((s, e))
    return out


def _ntokens(text: str, span: tuple[int, int]) -> int:
    return len(_WS_RE.split(text[span[0] : span[1]].strip()))


def chunk_text(
    text: str, chunk_size: int = CHUNK_SIZE, chunk_overlap: int = CHUNK_OVERLAP
) -> list[tuple[int, str, int, int]]:
    """-> [(chunk_id, chunk_text, char_start, char_end)] (see module pin)."""
    sents = split_sentences(text)
    if not sents:
        return []
    toks = [_ntokens(text, s) for s in sents]
    chunks: list[tuple[int, str, int, int]] = []
    i = 0
    n = len(sents)
    while i < n:
        j = i
        total = 0
        while j < n and (j == i or total + toks[j] <= chunk_size):
            total += toks[j]
            j += 1
        cs, ce = sents[i][0], sents[j - 1][1]
        chunks.append((len(chunks), text[cs:ce], cs, ce))
        if j >= n:
            break
        # next window starts so that >= chunk_overlap tokens are re-included,
        # but always advances by at least one sentence
        k = j
        overlap = 0
        while k > i + 1 and overlap + toks[k - 1] <= chunk_overlap:
            overlap += toks[k - 1]
            k -= 1
        i = k
    return chunks
