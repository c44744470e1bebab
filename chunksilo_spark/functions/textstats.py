"""Text-analysis kernels: tokenization, stopwords, language ID, quality.

Mirrors the reference's scalar/string functions (SURVEY.md §2.7) plus the
training-data-pipeline text analyzers. Everything here has a DataFrame-ops
twin in operators/textops.py — these pure forms exist for the oracle and for
unit tests; the Spark hot path uses built-in pyspark.sql.functions, NOT these.
"""

from __future__ import annotations

import re

# Reference stopword set semantics (search.py:79-96): common English words
# dropped from BM25 queries. Pinned subset, shared with the SQL oracle.
STOPWORDS_EN = (
    "a an and are as at be by for from has he in is it its of on that the "
    "to was were will with this these those i you we they them his her our "
    "your their not no or but if then so what which who whom been have had "
    "do does did"
).split()

STOPWORDS = {
    "en": STOPWORDS_EN,
    "de": "der die das und ist ein eine zu den von mit für auf nicht sie er es im dem".split(),
    "fr": "le la les et est un une de du des en au aux pour pas que qui dans sur ne".split(),
    "es": "el la los las y es un una de del en al para no que se por con su como".split(),
    "sv": "och det att i en som är av den på för med till inte om men ett han".split(),
}

_CAMEL_RE = re.compile(r"([a-z])([A-Z])")
_FILENAME_SPLIT_RE = re.compile(r"[_\-.\s]+")
_WORD_RE = re.compile(r"\w+")
_PUNCT_RE = re.compile(r"[^\w\s]")
# BPE-ish subword tokenizer: letter runs, digit runs, single punctuation
_BPEISH_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]")


def tokenize_filename(filename: str) -> list[str]:
    """Reference index.py:1185-1215: split on [_-.\\s]+, break camelCase,
    lowercase, append the extension as its own token."""
    parts = filename.rsplit(".", 1)
    stem = parts[0]
    ext = parts[1].lower() if len(parts) == 2 and parts[1] else None
    stem = _CAMEL_RE.sub(r"\1 \2", stem)
    tokens = [t.lower() for t in _FILENAME_SPLIT_RE.split(stem) if t]
    if ext:
        tokens.append(ext)
    return tokens


def whitespace_tokens(text: str) -> list[str]:
    return text.split()


# ---------------------------------------------------------------------------
# THE two whitespace tokenizer pins (column expressions).
#
# The repo deliberately carries exactly two whitespace-token definitions, and
# every operator must import one of these rather than inlining F.split — a
# future operator pairing the wrong variant with its oracle gets a
# hash-mismatch that looks like a Spark bug (VERDICT r3 "what's wrong" #1).


def ws_tokens_split(text_col):
    """``F.split(text, r"\\s+")`` semantics: boundary empties COUNTED — text
    with leading whitespace yields a '' first token. This is the
    ``t_token_counts`` / ``export.pack_sequences`` pin; the DuckDB twin is
    ``string_split_regex(text, '\\s+')`` with no filter."""
    from pyspark.sql import functions as F

    return F.split(text_col, r"\s+")


def ws_tokens_clean(text_col):
    """Python ``str.split()`` semantics: split on whitespace runs with NO
    empty tokens (``F.trim`` strips spaces only, so the \\s-trim is spelled
    with regexp_replace). This is the dedup / curation / minhash pin; the
    DuckDB twin is ``list_filter(string_split_regex(trim(x), '\\s+'),
    t -> t <> '')`` (or the regexp-trimmed equivalent)."""
    from pyspark.sql import functions as F

    return F.array_remove(
        F.split(F.regexp_replace(text_col, r"^\s+|\s+$", ""), r"\s+"), ""
    )


def bpeish_tokens(text: str) -> list[str]:
    """Deterministic BPE-ish token count basis: letter runs / digit runs /
    single punctuation marks."""
    return _BPEISH_RE.findall(text)


def detect_language(text: str) -> str:
    """N-gram-free stopword-vote language ID over {en,de,fr,es,sv}.

    Score(lang) = |distinct lowercased tokens ∩ stopwords(lang)|; argmax,
    ties broken by language code order, empty text -> 'und'.
    SQL-twin: size(array_intersect(split(lower(text),' '), <list>)).
    """
    toks = set(text.lower().split())
    if not toks:
        return "und"
    best_lang, best = "und", 0
    for lang in sorted(STOPWORDS):
        score = len(toks & set(STOPWORDS[lang]))
        if score > best:
            best_lang, best = lang, score
    return best_lang


def quality_score(text: str) -> float:
    """Heuristic document quality in [0,1]:
    0.4·len_score + 0.3·(1 - punct_ratio·5 clamped) + 0.3·stopword_ratio.

    len_score = min(n_words/100, 1); punct_ratio = punct_chars/chars;
    stopword_ratio = en-stopword tokens / tokens. Pinned here; SQL twin in
    __spark_entry__ oracle.
    """
    words = text.split()
    if not words or not text:
        return 0.0
    len_score = min(len(words) / 100.0, 1.0)
    punct_ratio = len(_PUNCT_RE.findall(text)) / len(text)
    punct_score = max(0.0, 1.0 - punct_ratio * 5.0)
    sw = set(STOPWORDS_EN)
    stop_ratio = sum(1 for w in words if w.lower() in sw) / len(words)
    return 0.4 * len_score + 0.3 * punct_score + 0.3 * stop_ratio


def extract_quoted_phrases(query: str) -> tuple[list[str], str]:
    """Reference search.py:307-316: '"..."' phrases + query with quotes removed."""
    phrases = re.findall(r'"([^"]+)"', query)
    cleaned = re.sub(r'"[^"]*"', " ", query)
    cleaned = re.sub(r"\s+", " ", cleaned).strip()
    return phrases, cleaned


def preprocess_query(query: str) -> str:
    """Reference search.py:295-304: collapse whitespace, strip trailing .,!?;"""
    return re.sub(r"\s+", " ", query).strip().rstrip(".,!?;").strip()


# Reference search.py:381-425 (_normalize_jira_issue_keys): `AB 123`,
# `AB_123`, `AB123` -> `AB-123`. The pattern/replacement pair is pinned so
# the Spark side (Java regex, `$1-$2`) and the DuckDB oracle (RE2,
# `\1-\2`) produce identical text — the regex subset used (ASCII classes,
# \b, bounded repetition) behaves the same in both engines.
ISSUE_KEY_RE = r"\b([A-Z]{2,10})[\s_]?(\d{1,6})\b"
_ISSUE_KEY_C = re.compile(ISSUE_KEY_RE)


def normalize_issue_keys(text: str) -> str:
    """All issue-key-shaped spans normalized to `KEY-123` form."""
    return _ISSUE_KEY_C.sub(r"\1-\2", text)
