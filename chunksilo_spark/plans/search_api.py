"""The reference's search API (run_search / MCP search_docs) over the
materialized pipeline tables.

Reference lifecycle (search.py:1333-1430, SURVEY §3.2): quoted-phrase parse
-> preprocess -> vector top-k over the chunk index -> filename match ->
date filter -> recency boost -> candidate cap -> rerank -> score threshold
-> phrase post-filter -> result shaping with heading_path/line locations
(§1.1 result schema). Everything except the final <=k-row shaping runs as
DataFrame queries; heading paths and line numbers come from the documents
table's typed columns via the shared kernels.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.extract import char_to_line, heading_path
from ..functions.textstats import extract_quoted_phrases, preprocess_query
from ..operators.retrieval import search_index
from ..operators.search import (
    EMBED_TOP_K,
    RERANK_CANDIDATES,
    SCORE_THRESHOLD,
    date_range_filter,
    phrase_post_filter,
    recency_boost,
    rerank,
)

from .. import config as _cfg

RERANK_TOP_K = int(_cfg.get("retrieval.rerank_top_k"))  # reference cfgload.py:90
MATCHED_FILES_TOP_K = int(_cfg.get("search.matched_files_top_k"))  # index.py:1256-1259
MATCHED_FILES_CAP = int(_cfg.get("search.matched_files_cap"))  # search.py:292


def bm25_filename_scores(
    documents: DataFrame, query_tokens: list[str]
) -> DataFrame:
    """BM25 over filename tokens (the reference's filename BM25 index,
    index.py:1218-1265): one node per distinct url, tokenized with the
    SHARED tokenize_filename kernel (camelCase split + separators +
    extension — the same function is the pytest oracle), scored with the
    standard BM25 formula (k1=1.2, b=0.75, the same constants as u5_bm25).
    -> (url, score), unfiltered; callers take top-k."""
    import pandas as pd

    from ..functions.textstats import tokenize_filename

    def tok(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "tokens": [
                        tokenize_filename(str(u).rsplit("/", 1)[-1])
                        for u in pdf["url"]
                    ],
                }
            )

    from ..operators.ranking import bm25_scores

    toks = (
        documents.select("url")
        .distinct()
        .mapInPandas(tok, schema="url string, tokens array<string>")
    )
    # k1/b come from bm25_scores' own config-bound defaults — one binding
    # site (operators/ranking.py), no drift
    return bm25_scores(toks, "url", F.col("tokens"), query_tokens)


def _matched_files(documents: DataFrame, query_tokens: list[str]) -> list[dict]:
    """Filename/url BM25 match: retrieve top-10 (similarity_top_k), drop
    non-positive scores, display-cap 5 — the reference funnel shape
    (index.py:1256-1259 -> search.py:280-292)."""
    if not query_tokens:
        return []
    rows = (
        bm25_filename_scores(documents, query_tokens)
        .where(F.col("score") > 0)
        .orderBy(F.desc("score"), F.asc("url"))
        .limit(MATCHED_FILES_TOP_K)
        .collect()
    )
    return [
        {"uri": r["url"], "score": round(float(r["score"]), 4)}
        for r in rows
    ][:MATCHED_FILES_CAP]


def run_search(
    documents: DataFrame,
    chunks: DataFrame,
    query: str,
    date_from: str | None = None,
    date_to: str | None = None,
    now: str = "2026-01-01",
) -> dict:
    """-> the reference's §1.1 result dict (matched_files, chunks with
    text/score/location, counters, retrieval_time)."""
    t0 = time.time()
    phrases, cleaned = extract_quoted_phrases(query)
    cleaned = preprocess_query(cleaned)
    # filename-index query tokens go through the SAME analyzer as the
    # document side (camelCase/separator/extension split) — a raw
    # whitespace split could never match a query that names an actual
    # file ('setupGuide-v2.txt' vs indexed ['setup','guide','v2','txt'])
    from ..functions.textstats import tokenize_filename

    q_tokens = tokenize_filename(cleaned)

    # stage 1: vector top-k over the persisted index + date metadata join
    # (only warc_ts here — headings/line_offsets arrays are joined back
    # AFTER the rerank top-k so they never enter the Python stage)
    hits = search_index(chunks, cleaned, k=EMBED_TOP_K).join(
        documents.select("url", "warc_ts"), "url"
    )
    # date filter (missing date passes) -> recency boost -> candidate cap
    hits = date_range_filter(hits, "warc_ts", date_from, date_to)
    hits = hits.withColumn(
        "boosted", recency_boost(F.col("score"), F.col("warc_ts"), now)
    ).orderBy(F.desc("boosted"), F.asc("url"), F.asc("chunk_id")).limit(
        RERANK_CANDIDATES
    )
    # stage 2: rerank (per-worker-cached model) -> threshold -> phrase filter
    reranked = rerank(
        hits, cleaned, k=RERANK_TOP_K, text_col="text", id_col="url",
        tiebreak_col="chunk_id",  # equal-scoring chunks of one url: stable cut
    )
    reranked = reranked.where(F.col("rerank_score") >= SCORE_THRESHOLD)
    reranked = phrase_post_filter(reranked, "text", phrases)
    # result-shaping metadata joins back onto the <= k winners only
    reranked = reranked.join(
        documents.select("url", "headings", "line_offsets"), "url"
    ).orderBy(F.desc("rerank_score"), F.asc("url"), F.asc("chunk_id"))

    out_chunks = []
    for r in reranked.collect():
        heads = [
            {"text": h["text"], "position": h["position"], "level": h["level"]}
            for h in (r["headings"] or [])
        ]
        out_chunks.append(
            {
                "text": r["text"],
                "score": round(float(r["rerank_score"]), 4),
                "location": {
                    "uri": r["url"],
                    "line": char_to_line(
                        list(r["line_offsets"] or [0]), int(r["char_start"])
                    ),
                    "heading_path": heading_path(heads, int(r["char_start"])),
                },
            }
        )

    matched = _matched_files(documents, q_tokens)
    return {
        "query": query,
        "matched_files": matched,
        "chunks": out_chunks,
        "num_matched_files": len(matched),
        "num_chunks": len(out_chunks),
        "retrieval_time": round(time.time() - t0, 3),
    }
