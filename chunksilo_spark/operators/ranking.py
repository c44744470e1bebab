"""Generic BM25 ranking over a pre-tokenized column (U5/W3/S16).

One implementation serves both surfaces that need it: the document-text
BM25 query (u5_bm25) and the filename index (plans/search_api
.bm25_filename_scores). Standard Robertson/Sparck-Jones BM25 with the
+1-smoothed idf, expressed entirely in built-in DataFrame ops:

  * one pass computes per-row dl and per-term tf;
  * one global agg computes N, avgdl and per-term df (map-side combined);
  * the 1-row stats side broadcasts back (crossJoin(broadcast(...)) — a
    scale-safe scalar join).

Per-row work is JVM-side array arithmetic; the number of terms is the
query length (small), so the generated projection stays compact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .. import config as _cfg

BM25_K1 = float(_cfg.get("search.bm25_k1"))
BM25_B = float(_cfg.get("search.bm25_b"))


def bm25_scores(
    df: DataFrame,
    id_col: str,
    tokens: Column,
    terms: list[str],
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """-> (id_col, score): BM25 of ``terms`` against the token-array column
    expression ``tokens``, idf = ln((N - df + 0.5)/(df + 0.5) + 1)."""

    def _tf(term: str) -> Column:
        # factory, not a default-arg lambda: pyspark reads a 2-param lambda
        # as (element, index)
        return F.size(F.filter(F.col("_toks"), lambda x: x == F.lit(term)))

    from ..checkpointing import cut_lineage

    # d feeds the corpus-stats aggregate (a broadcast subquery) AND the
    # scoring cross-join: without a cut the tokenize + per-term filter
    # pipeline (interpreted higher-order exprs) evaluates twice per doc
    d = cut_lineage(
        df.select(F.col(id_col), tokens.alias("_toks")).select(
            id_col,
            F.size("_toks").alias("_dl"),
            *[_tf(t).alias(f"_tf{i}") for i, t in enumerate(terms)],
        )
    )
    stats = d.agg(
        F.count(F.lit(1)).alias("_n"),
        F.avg("_dl").alias("_avgdl"),
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("int")).alias(f"_df{i}")
            for i in range(len(terms))
        ],
    )
    j = d.crossJoin(F.broadcast(stats))
    score = F.lit(0.0)
    for i in range(len(terms)):
        idf = F.log(
            (F.col("_n") - F.col(f"_df{i}") + 0.5) / (F.col(f"_df{i}") + 0.5)
            + 1.0
        )
        tf_i = F.col(f"_tf{i}")
        score = score + idf * (
            tf_i * (k1 + 1.0)
            / (tf_i + k1 * (1.0 - b + b * F.col("_dl") / F.col("_avgdl")))
        )
    return j.select(id_col, score.alias("score"))
