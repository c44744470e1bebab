"""Deduplication operators over a (doc_id, text, ...) corpus table.

The training-data-pipeline dedup family, each designed for the 100 TB shape:

  * exact_dedup          — hash-groupBy on md5(text): one shuffle on a
                           uniform key, map-side combine;
  * ngram_jaccard_pairs  — exact word-shingle Jaccard, but ONLY within
                           cheap blocking buckets (never all-pairs);
  * minhash_lsh_pairs    — MinHash band blocking (the scale path: candidate
                           generation is a band-key equi-join, verification
                           touches only candidates);
  * simhash_fingerprints — 64-bit SimHash per doc + bucket key for
                           near-dup banding by Hamming distance;
  * embedding_neardup    — cosine top-1 neighbor per doc over an embedding
                           column (broadcast the smaller side).

All heavy text work is Arrow-batched (mapInPandas); all joins are equi-joins
on hashed keys so AQE can coalesce/split them.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.minhash import (
    BANDS,
    band_keys,
    minhash_signature,
    simhash64,
    word_shingles,
)

# ---------------------------------------------------------------------------
# exact


def exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Groups of byte-identical texts: (text_md5, n_docs, keep_doc_id).

    keep_doc_id = min doc_id (first-seen-wins analog, reference
    index.py:1011-1020 overlapping-mount dedup)."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("text_md5"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("keep_doc_id"),
        )
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard within blocking buckets


def ngram_jaccard_pairs(
    docs: DataFrame,
    bucket_cols: list[str],
    threshold: float = 0.8,
    text_col: str = "text",
) -> DataFrame:
    """Exact distinct-token Jaccard >= threshold for doc pairs sharing a
    blocking bucket. Pure DataFrame ops (array_intersect/union sizes), so it
    has an exact SQL oracle (DuckDB list_distinct/list_intersect). Blocking
    keeps the self-join linear-ish; the word-3-gram variant at scale is
    minhash_lsh_pairs + verification."""
    toks = docs.select(
        F.col("doc_id"),
        *[F.col(c) for c in bucket_cols],
        F.array_distinct(F.split(F.lower(F.col(text_col)), r"\s+")).alias(
            "shingles"
        ),
    )
    a = toks.select(
        *[F.col(c) for c in bucket_cols],
        F.col("doc_id").alias("doc_a"),
        F.col("shingles").alias("sh_a"),
    )
    b = toks.select(
        *[F.col(c) for c in bucket_cols],
        F.col("doc_id").alias("doc_b"),
        F.col("shingles").alias("sh_b"),
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        a.join(b, bucket_cols)
        .where(F.col("doc_a") < F.col("doc_b"))
        .withColumn(
            "jaccard",
            F.round(inter.cast("double") / F.greatest(union, F.lit(1)), 6),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# MinHash-LSH


_SIG_SCHEMA = "doc_id long, band_key long"


def minhash_bands(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, band_key) rows — 32 per doc — from word-3-gram MinHash."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, keys = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                sig = minhash_signature(word_shingles(text, 3))
                for bk in band_keys(sig):
                    ids.append(doc_id)
                    keys.append(bk - (1 << 63))
            yield pd.DataFrame({"doc_id": ids, "band_key": keys})

    return docs.select("doc_id", text_col).mapInPandas(run, schema=_SIG_SCHEMA)


def minhash_lsh_pairs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Candidate near-duplicate pairs (band-collision count as evidence).

    n_bands/32 approximates Jaccard similarity; exact verification is
    ngram_jaccard_pairs on the candidates (composed by callers)."""
    bands = minhash_bands(docs, text_col)
    a = bands.select(F.col("band_key"), F.col("doc_id").alias("doc_a"))
    b = bands.select(F.col("band_key"), F.col("doc_id").alias("doc_b"))
    return (
        a.join(b, "band_key")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_bands"))
        .withColumn("est_jaccard", F.round(F.col("n_bands") / F.lit(float(BANDS)), 4))
    )


# ---------------------------------------------------------------------------
# SimHash


def simhash_fingerprints(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, simhash, bucket16) — bucket16 = top 16 bits, the banding key
    for Hamming-distance candidate generation at scale."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes, buckets = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                h = simhash64(text.lower().split())
                ids.append(doc_id)
                hashes.append(h - (1 << 63))
                buckets.append(h >> 48)
            yield pd.DataFrame(
                {"doc_id": ids, "simhash": hashes, "bucket16": buckets}
            )

    return docs.select("doc_id", text_col).mapInPandas(
        run, schema="doc_id long, simhash long, bucket16 int"
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup


def embedding_neardup(
    vectors: DataFrame,
    sample: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicates: sample rows whose nearest corpus
    neighbor has cosine >= threshold (delegates to the exact kNN operator;
    the LSH-banded variant in similarity.lsh_topk is the scale path)."""
    from .similarity import brute_force_topk

    return brute_force_topk(vectors, sample, k=1, id_col=id_col, vec_col=vec_col).where(
        F.col("cosine") >= threshold
    )
