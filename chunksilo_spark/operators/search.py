"""The retrieval query surface — the reference's run_search funnel
(search.py:1333-1430) re-expressed as one declarative DataFrame query.

Funnel (reference stage order preserved):
  quoted-phrase parse -> candidate scoring (token-overlap = the BoW cosine
  analog, fully JVM-side) -> date filter (missing date passes,
  search.py:1018-1050) -> recency boost (search.py:1053-1090) -> candidate
  cap (search.py:1385-88) -> score threshold (search.py:1394-99) -> required
  phrase post-filter (search.py:1401-08) -> top-k.

Everything is built-in pyspark.sql.functions — predicate pushdown, column
pruning and whole-stage codegen apply end-to-end; no Python runs per row.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .. import config as _cfg
from ..functions.textstats import ws_tokens_split

RECENCY_HALF_LIFE_DAYS = float(_cfg.get("retrieval.recency_half_life_days"))
RECENCY_WEIGHT = float(_cfg.get("retrieval.recency_weight"))
SCORE_THRESHOLD = float(_cfg.get("retrieval.score_threshold"))
EMBED_TOP_K = int(_cfg.get("retrieval.embed_top_k"))  # reference cfgload.py:88
RERANK_CANDIDATES = int(_cfg.get("retrieval.rerank_candidates"))  # cfgload.py:91


def token_overlap_score(text_col: Column, query_tokens: list[str]) -> Column:
    """|distinct text tokens ∩ query tokens| / |query tokens| — the
    deterministic, SQL-expressible stand-in for cosine(query, chunk) used by
    the search queries (the KG pipeline uses the real BoW cosine linker)."""
    toks = ws_tokens_split(F.lower(text_col))  # '' never matches a query token
    inter = F.array_intersect(toks, F.array(*[F.lit(t) for t in query_tokens]))
    return F.size(inter) / F.lit(float(len(query_tokens)))


def recency_boost(score_col: Column, ts_col: Column, now: str) -> Column:
    """score * (1 + w * exp(-ln2/half_life * age_days)) — search.py:1083-85."""
    age_days = F.datediff(F.lit(now).cast("timestamp"), ts_col)
    decay = F.exp(F.lit(-math.log(2.0) / RECENCY_HALF_LIFE_DAYS) * age_days)
    return score_col * (F.lit(1.0) + F.lit(RECENCY_WEIGHT) * decay)


def glob_filter(
    df: DataFrame,
    include: list[str],
    exclude: list[str],
    col: str = "url",
    case_sensitive: bool = False,
) -> DataFrame:
    """Glob include/exclude path filter (reference index.py:639-684, S3):
    exclude-first, ``**/X/**`` per-component directory exclusion,
    right-anchored component matching, case-insensitive by default. The glob
    -> regex translation (functions/globmatch) is shared with the DuckDB
    oracle; evaluation is a pure Catalyst ``rlike`` conjunction (codegen,
    no Python)."""
    from ..functions.globmatch import compile_rules

    inc, exc = compile_rules(include, exclude, case_sensitive)
    path = F.col(col) if case_sensitive else F.lower(F.col(col))
    cond = F.lit(True)
    for r in exc:
        cond = cond & ~path.rlike(r)
    if inc:
        inc_cond = F.lit(False)
        for r in inc:
            inc_cond = inc_cond | path.rlike(r)
        cond = cond & inc_cond
    return df.where(cond)


def date_range_filter(
    df: DataFrame, ts_col: str, date_from: str | None, date_to: str | None
) -> DataFrame:
    """Missing/unparseable date PASSES the filter (search.py:1018-1050)."""
    cond = F.lit(True)
    if date_from:
        cond = cond & (
            F.col(ts_col).isNull()
            | (F.col(ts_col) >= F.lit(date_from).cast("timestamp"))
        )
    if date_to:
        cond = cond & (
            F.col(ts_col).isNull()
            | (F.col(ts_col) <= F.lit(date_to).cast("timestamp"))
        )
    return df.where(cond)


def phrase_post_filter(df: DataFrame, text_col: str, phrases: list[str]) -> DataFrame:
    """ALL quoted phrases must appear, case-insensitive (search.py:1401-08)."""
    out = df
    for p in phrases:
        out = out.where(F.lower(F.col(text_col)).contains(p.lower()))
    return out


def rerank(
    candidates: DataFrame,
    query: str,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    reranker=None,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Cross-encoder rerank stage (reference search.py:1184-1248, U4).

    ``reranker`` is a per-worker-cached models.ModelSpec whose model scores
    ``(query, texts) -> ndarray``; the default is the deterministic overlap
    stand-in sanctioned by the reference's own MockReranker
    (test/conftest.py:58-69) — a real cross-encoder (FlashRank-style) plugs
    into the same slot with one construction per worker. Keeps scores
    in-row (the reference's index/text re-association dance, J4, is
    unnecessary by construction).

    Keep ``candidates`` narrow — only the projected columns round the
    JVM->Arrow->Python trip, so select (id, text, score) first and join
    heavier metadata back after the top-k (plans.search_api.run_search does
    exactly that)."""
    import pandas as pd

    from ..models import DEFAULT_RERANKER

    spec = reranker or DEFAULT_RERANKER

    def run(batches):
        model = spec.resolve()  # cached per worker process
        for pdf in batches:
            out = pdf.copy()
            out["rerank_score"] = pd.Series(
                model.score(query, list(pdf[text_col])), index=pdf.index
            )
            yield out

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in candidates.schema.fields
    ) + ", rerank_score double"
    reranked = candidates.mapInPandas(run, schema=schema)
    # when id_col is not unique per row (run_search reranks CHUNKS keyed by
    # url), the caller supplies tiebreak_col so the top-k cut is
    # deterministic even for equal-scoring rows of one id
    order = [F.desc("rerank_score"), F.asc(id_col)]
    if tiebreak_col is not None:
        order.append(F.asc(tiebreak_col))
    return reranked.orderBy(*order).limit(k)


def search_documents(
    documents: DataFrame,
    query: str,
    k: int = EMBED_TOP_K,
    phrases: list[str] | None = None,
    score_threshold: float = SCORE_THRESHOLD,
) -> DataFrame:
    """The flagship funnel over a (doc_id, text, ...) table.

    Deterministic total order: score desc, doc_id asc (reference dedups by
    first-seen; a tie-broken sort is the distributed equivalent, J3 note in
    SURVEY §2.3)."""
    tokens = [t for t in query.lower().split() if t]
    scored = documents.withColumn(
        "score", F.round(token_overlap_score(F.col("text"), tokens), 6)
    )
    out = scored.where(F.col("score") >= F.lit(score_threshold))
    out = phrase_post_filter(out, "text", phrases or [])
    return (
        out.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
        .select("doc_id", "lang", "source", "score")
    )
