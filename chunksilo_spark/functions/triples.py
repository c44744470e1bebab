"""Pattern-rule (subj, pred, obj) triple extraction + mention detection.

Stage-2/3 semantic kernel. The reference has no triple extractor — its
"search by meaning" retrieval (search.py:1093-1111) is repurposed here as an
entity LINKER per BASELINE.json north_star; the dependency-pattern rule set
below is the pinned, deterministic extraction semantics shared by the
pure-Python oracle (driver) and the executor UDFs, so the distributed
pipeline's triple set can be compared at P/R against the oracle run.

Rules (pinned):
  * sentence boundary = chunk.split_sentences (same regex as the chunker);
  * a MENTION is a maximal run of Capitalized tokens
    ``[A-Z][A-Za-z0-9&-]*`` separated by single spaces (no ``.`` in the
    token class — sentence-final periods stay out of surfaces);
  * a TRIPLE is (subject-mention, relation, object-mention) where a relation
    phrase from RELATION_PHRASES appears in the sentence, the subject is a
    mention ending exactly one space before the phrase, and the object is a
    mention starting exactly one space after it;
  * relation phrases are matched case-sensitively, longest-first, and
    non-overlapping within a sentence (left to right).
"""

from __future__ import annotations

import re

from .chunk import split_sentences

# 12-relation pool (FIXTURES.md §3). label -> surface phrase.
RELATION_PHRASES: dict[str, str] = {
    "acquired": "acquired",
    "founded_by": "was founded by",
    "headquartered_in": "is headquartered in",
    "subsidiary_of": "is a subsidiary of",
    "partnered_with": "partnered with",
    "invested_in": "invested in",
    "competes_with": "competes with",
    "employs": "employs",
    "located_in": "is located in",
    "manufactures": "manufactures",
    "supplies": "supplies",
    "collaborates_with": "collaborates with",
}

_MENTION_RE = re.compile(r"\b[A-Z][A-Za-z0-9&\-]*(?: [A-Z][A-Za-z0-9&\-]*)*")
# longest-first alternation so "is headquartered in" wins over "is located in" etc.
_PHRASE_RE = re.compile(
    "|".join(
        re.escape(p)
        for p in sorted(RELATION_PHRASES.values(), key=len, reverse=True)
    )
)
_PHRASE_TO_LABEL = {v: k for k, v in RELATION_PHRASES.items()}
_HYPHEN_RE = re.compile(r"[-_]+")
_NORM_RE = re.compile(r"[^a-z0-9 ]+")
_WS_RE = re.compile(r"\s+")


def extract_mentions(sentence: str) -> list[tuple[str, int, int]]:
    """Maximal capitalized-token runs -> [(surface, start, end)]."""
    return [(m.group(0), m.start(), m.end()) for m in _MENTION_RE.finditer(sentence)]


def extract_triples_from_sentence(sentence: str) -> list[tuple[str, str, str]]:
    """[(subj_surface, pred_label, obj_surface)] per the pinned rules."""
    mentions = extract_mentions(sentence)
    if len(mentions) < 2:
        return []
    by_end = {end: (surf, start) for surf, start, end in mentions}
    by_start = {start: (surf, end) for surf, start, end in mentions}
    triples = []
    for m in _PHRASE_RE.finditer(sentence):
        subj = by_end.get(m.start() - 1)
        obj = by_start.get(m.end() + 1)
        if subj is not None and obj is not None:
            triples.append((subj[0], _PHRASE_TO_LABEL[m.group(0)], obj[0]))
    return triples


def extract_triples_from_text(text: str) -> list[tuple[str, str, str, int]]:
    """All sentence triples of a document -> [(subj, pred, obj, char_pos)]."""
    out = []
    for s, e in split_sentences(text):
        for subj, pred, obj in extract_triples_from_sentence(text[s:e]):
            out.append((subj, pred, obj, s))
    return out


def normalize_surface(surface: str) -> str:
    """Canonical surface normalization: lowercase, hyphens/underscores ->
    space, strip other non-alnum, collapse whitespace.

    Used for both linker fallback and canonicalization shingles, so
    "Acme-Corp", "ACME CORP" and "Acme Corp" normalize identically-shaped.
    """
    return _WS_RE.sub(
        " ", _NORM_RE.sub("", _HYPHEN_RE.sub(" ", surface.lower()))
    ).strip()
