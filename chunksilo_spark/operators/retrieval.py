"""Chunk-level vector retrieval — the reference's core product
(search.py:1093-1111: embed query, cosine top-k over chunk embeddings)
distributed: chunk the corpus (U1), BoW-embed chunks (U2), score against
the query vector (U3), window top-k (W1).

The chunk embedding is computed inside the same Arrow pass as scoring, so
the full retrieval pipeline is: one mapInPandas over documents -> exploded
scored chunk rows -> global top-k. For a persistent index, materialize
``chunks_with_embeddings`` once and reuse (the reference's VectorStoreIndex
analog as a plain table, SURVEY §1.3).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.chunk import chunk_text
from ..functions.embed import normalize_rows
from ..models import DEFAULT_EMBEDDER, ModelSpec, embed_query

CHUNK_EMB_SCHEMA = (
    "url string, chunk_id int, text string, char_start long, char_end long, "
    "embedding array<float>"
)
SCORED_SCHEMA = (
    "url string, chunk_id int, text string, char_start long, score float"
)


def chunks_with_embeddings(
    documents: DataFrame, embedder: ModelSpec | None = None
) -> DataFrame:
    """documents -> chunk rows with embeddings (the persisted index).

    ``embedder`` is a picklable models.ModelSpec resolved ONCE per worker
    process (reference per-process model cache, index.py:1091-1124);
    default = the sanctioned BoW mock."""
    spec = embedder or DEFAULT_EMBEDDER

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = spec.resolve()  # cached per worker, not per batch
        for pdf in batches:
            rows = {k: [] for k in (
                "url", "chunk_id", "text", "char_start", "char_end",
            )}
            for url, text in zip(pdf["url"], pdf["text"]):
                for cid, ctext, cs, ce in chunk_text(text):
                    rows["url"].append(url)
                    rows["chunk_id"].append(cid)
                    rows["text"].append(ctext)
                    rows["char_start"].append(cs)
                    rows["char_end"].append(ce)
            if not rows["url"]:
                continue
            emb = model.embed(rows["text"])
            out = pd.DataFrame(rows)
            out["embedding"] = [row.astype(np.float32) for row in emb]
            yield out

    return documents.where(F.col("ok")).select("url", "text").mapInPandas(
        run, schema=CHUNK_EMB_SCHEMA
    )


def search_index(
    chunks: DataFrame,
    query: str,
    k: int = 20,
    round_to: int | None = None,
    embedder: ModelSpec | None = None,
) -> DataFrame:
    """Search a MATERIALIZED chunks-with-embeddings table (the reference's
    load-index-then-search shape, search.py:950-971 + 1093-1111): score the
    stored embeddings against the query vector — all JVM-side arithmetic
    (zip_with dot product), no Python per row.

    ``round_to`` keeps the score as a double rounded to that many decimals
    and ranks on the ROUNDED value (deterministic cross-engine ordering for
    oracle comparison); default preserves the float score ranked raw."""
    q = embed_query(query, embedder)
    q_lit = F.array(*[F.lit(float(x)) for x in q])
    dot = F.aggregate(
        F.zip_with(F.col("embedding"), q_lit, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = F.sqrt(
        F.aggregate(
            F.transform(F.col("embedding"), lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    raw = F.when(norm > 0, dot / norm).otherwise(F.lit(0.0))
    score = (
        F.round(raw, round_to) if round_to is not None else raw.cast("float")
    )
    scored = chunks.withColumn("score", score)
    return scored.orderBy(
        F.desc("score"), F.asc("url"), F.asc("chunk_id")
    ).limit(k).select("url", "chunk_id", "text", "char_start", "score")


def vector_search(
    documents: DataFrame,
    query: str,
    k: int = 20,
    embedder: ModelSpec | None = None,
) -> DataFrame:
    """Fused retrieval: chunk + embed + cosine-score in one pass, then a
    global top-k (ORDER BY + LIMIT — Spark's TakeOrderedAndProject, no full
    sort). Deterministic tie-break on (url, chunk_id)."""
    spec = embedder or DEFAULT_EMBEDDER
    q_vec = embed_query(query, spec)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = spec.resolve()  # cached per worker process
        for pdf in batches:
            rows = {k2: [] for k2 in ("url", "chunk_id", "text", "char_start")}
            for url, text in zip(pdf["url"], pdf["text"]):
                for cid, ctext, cs, _ce in chunk_text(text):
                    rows["url"].append(url)
                    rows["chunk_id"].append(cid)
                    rows["text"].append(ctext)
                    rows["char_start"].append(cs)
            if not rows["url"]:
                continue
            emb = normalize_rows(model.embed(rows["text"]))
            out = pd.DataFrame(rows)
            out["score"] = (emb @ q_vec).astype(np.float32)
            yield out

    scored = documents.where(F.col("ok")).select("url", "text").mapInPandas(
        run, schema=SCORED_SCHEMA
    )
    return scored.orderBy(
        F.desc("score"), F.asc("url"), F.asc("chunk_id")
    ).limit(k)
