"""Distributed k-means over embedding columns.

The corpus-curation uses: topic clustering for data mixing, the SemDeDup
cluster assignment (``dedup.semdedup`` exposes a ``cluster_col`` seam
built for exactly this), and the IVF coarse quantizer's scale path —
``similarity.ivf_topk`` trains driver-side on a bounded sample; this is
the full-corpus Lloyd's iteration for when the sample isn't enough.

Pinned algebra (every step bit-for-bit re-derivable in ANSI SQL, which
makes an ITERATIVE clustering driver-oracle-checkable):

  * init: the ``k`` lowest-id vectors (ordered take — partition arrival
    order never shifts the seeds);
  * E-step: squared euclidean distance per centroid, ROUNDED to 6
    decimals, argmin with ties to the lowest centroid index — the
    rounding absorbs float-summation-order differences between engines
    (the repo-wide ``round(sum(x), n)`` pin);
  * M-step: new centroid coordinate = ``round(sum / count, 6)``; a
    cluster that captured no points keeps its previous centroid.

100 TB shape: the E-step is MAP-ONLY — centroids are a k x d literal
(constant-sized, the broadcast-dictionary class), the distance argmin is
a codegen'd column expression, no join, no shuffle of the corpus. The
M-step is one map-side-combinable aggregation down to k x d rows
(posexplode -> partial sums per partition -> k*d-row exchange), and the
only driver state is the k x d centroid matrix. Total cost: ``iters``
corpus scans; nothing corpus-sized ever shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["fit_kmeans", "kmeans_assign"]


def _dists(vec: Column, centroids: list[list[float]]) -> Column:
    """Array of round(squared-euclidean, 6) distances to each centroid."""
    return F.array(
        *[
            F.round(
                F.aggregate(
                    F.zip_with(
                        vec,
                        F.array(*[F.lit(float(x)) for x in c]),
                        lambda x, y: (x - y) * (x - y),
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                ),
                6,
            )
            for c in centroids
        ]
    )


def _assigned(
    vectors: DataFrame,
    centroids: list[list[float]],
    vec: Column,
    keep: list[str] | None = None,
) -> DataFrame:
    """(_cl, _v, _d): each vector with its 0-based argmin cluster (first
    minimum wins — ties to the lowest index, matching the SQL twin's
    ``ORDER BY dist, cluster``) and the rounded min distance. The
    distance array is projected ONCE before the argmin references it
    three times — interpreted higher-order lambdas don't CSE (the
    d_neardup_verified lesson), and CollapseProject declines to re-inline
    an expression it would have to triplicate."""
    keep = keep or []
    return vectors.select(
        *keep, vec.alias("_v"), _dists(vec, centroids).alias("_ds")
    ).select(
        *keep,
        "_v",
        (F.array_position("_ds", F.array_min("_ds")) - 1).cast("int").alias(
            "_cl"
        ),
        F.array_min("_ds").alias("_d"),
    )


def fit_kmeans(
    vectors: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Run ``iters`` Lloyd's rounds; return the k x d centroid matrix
    (python lists — dictionary-sized driver state, like the IVF coarse
    quantizer and the alias matrix)."""
    if k < 1 or iters < 0:
        raise ValueError("kmeans needs k >= 1 and iters >= 0")
    seed_rows = (
        vectors.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
    )
    if not seed_rows:
        raise ValueError("kmeans needs a non-empty corpus")
    cents = [[float(x) for x in r[1]] for r in seed_rows]
    vec = F.col(vec_col).cast("array<double>")
    for _ in range(iters):
        sums = (
            _assigned(vectors, cents, vec)
            .select("_cl", F.posexplode("_v").alias("_i", "_x"))
            .groupBy("_cl", "_i")
            .agg(F.sum("_x").alias("_s"), F.count(F.lit(1)).alias("_n"))
            .collect()
        )
        new = [list(c) for c in cents]  # empty clusters keep their centroid
        by_cl: dict[int, list] = {}
        for r in sums:
            by_cl.setdefault(r["_cl"], []).append(r)
        for cl, rows in by_cl.items():
            for r in rows:
                new[cl][r["_i"]] = round(r["_s"] / r["_n"], 6)
        cents = new
    return cents


def kmeans_assign(
    vectors: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cluster_id, dist) — every vector labeled with its nearest
    final centroid and the rounded squared distance. Plugs straight into
    ``dedup.semdedup(cluster_col="cluster_id")`` as the SemDeDup paper's
    k-means assignment, and into IVF as a full-corpus-trained quantizer."""
    cents = fit_kmeans(vectors, k, iters, id_col=id_col, vec_col=vec_col)
    vec = F.col(vec_col).cast("array<double>")
    return _assigned(vectors, cents, vec, keep=[id_col]).select(
        F.col(id_col),
        F.col("_cl").alias("cluster_id"),
        F.col("_d").alias("dist"),
    )
