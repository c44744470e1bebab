"""Deterministic cardinality sketches for corpus profiling.

At 10^12 documents, "how many distinct users/URLs/values per group" is a
profiling query you run constantly (dedup ratios, per-domain URL counts,
crawl-frontier growth) and exact ``count(DISTINCT ...)`` is a full
shuffle of every distinct value. The KMV (k-minimum-values) estimator
(Bar-Yossef et al. 2002 / Beyer et al. 2007) keeps only the k smallest
hash values per group: if the k-th smallest of n uniform hashes in
(0, 1] sits at h_k, then n ≈ (k-1)/h_k, with relative error ~1/sqrt(k).

Everything here is DETERMINISTIC (md5-derived hashes, the repo-wide
``_md5_bucket`` algebra) so the estimate is reproducible across runs AND
re-derivable in ANSI SQL — the driver oracle computes the identical
estimate in DuckDB, making a *sketch* hash-checkable, which sampled or
seeded-random sketches never are.

Scale shape: the KMV synopsis is a mergeable bounded-size state — the
production form is a partial-aggregating sketch UDAF (or
``approx_count_distinct``, Spark's HLL++, when ±5% and no SQL twin is
fine). This implementation pins the estimator's SEMANTICS with exact-SQL
building blocks: one distinct pass, then a per-group window rank to find
h_k. The window sorts only within group partitions (AQE splits skewed
groups); rows never leave their group's partition. Swapping the window
for a bounded-heap UDAF changes the plan, not the estimate — the hash
and the formula are the contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "kmv_distinct",
    "cm_heavy_hitters",
    "cm_build",
    "cm_estimate",
    "histogram_quantiles",
    "bottomk_sample",
    "kmv_state",
    "kmv_merge",
    "u01",
]

# first 15 md5 hex chars -> uniform integer in [0, 2^60)
_HASH_SPACE = float(1 << 60)


def _h60(col: Column) -> Column:
    """md5-derived 60-bit hash of the column's string form — the exact
    algebra of ``curation._md5_bucket`` without the modulus (DuckDB twin:
    ``('0x' || substr(md5(x::VARCHAR), 1, 15))::UBIGINT``)."""
    return F.conv(
        F.substring(F.md5(col.cast("string")), 1, 15), 16, 10
    ).cast("long")


def u01(col: Column) -> Column:
    """The repo-wide deterministic coin: the 60-bit md5 hash mapped to
    [0, 1) in IEEE double — ONE definition site for every hash-Bernoulli
    acceptance test (importance_sample, mix_to_target). DuckDB twin:
    ``(('0x' || substr(md5(x::VARCHAR), 1, 15))::UBIGINT)::DOUBLE
    / 1152921504606846976.0``."""
    return _h60(col).cast("double") / F.lit(_HASH_SPACE)


def kmv_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 32,
) -> DataFrame:
    """Per-group distinct-count estimate -> (group_cols..., n_kept,
    est_distinct): KMV over ``value_col`` with sketch size ``k``.

    Pinned semantics (both engines, bit-for-bit):

      * hash = first 15 md5 hex chars of the value's string form, as a
        60-bit integer (collisions at 2^-60 — absorbed into the
        estimator's ~1/sqrt(k) error).
      * groups with fewer than k distinct values report the EXACT
        distinct count (the sketch isn't full, so it IS the distinct
        set) — ``n_kept`` = that count, ``est_distinct`` = it as double.
      * full sketches report n_kept = k and
        ``est_distinct = round((k-1) * 2^60 / h_k, 4)`` with the
        division done in IEEE double (one multiply, one divide, one
        round — same float-order pin both engines).
    """
    if k < 2:
        raise ValueError("kmv k must be >= 2")
    dv = (
        df.select(*group_cols, F.col(value_col).alias("_v"))
        .distinct()
        .select(*group_cols, _h60(F.col("_v")).alias("_h"))
    )
    w = Window.partitionBy(*group_cols).orderBy(F.asc("_h"))
    ranked = dv.select(
        *group_cols, "_h", F.row_number().over(w).alias("_rn")
    )
    per_group = ranked.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("_n"),
        F.min(F.when(F.col("_rn") == k, F.col("_h"))).alias("_hk"),
    )
    full = F.col("_n") >= k
    return per_group.select(
        *group_cols,
        F.when(full, F.lit(k)).otherwise(F.col("_n")).alias("n_kept"),
        F.round(
            F.when(
                full,
                F.lit(float(k - 1)) * F.lit(_HASH_SPACE) / F.col("_hk"),
            ).otherwise(F.col("_n").cast("double")),
            4,
        ).alias("est_distinct"),
    )


def cm_heavy_hitters(
    df: DataFrame,
    value_col: str,
    k: int = 20,
    width: int = 256,
    depth: int = 3,
) -> DataFrame:
    """Count-Min heavy hitters -> (value, est_count, rank): the top-``k``
    values by Count-Min-estimated frequency (Cormode & Muthukrishnan
    2005). The frequency twin of :func:`kmv_distinct`: ``depth`` hash
    rows of ``width`` counters each; a value's estimate is the MIN of
    its ``depth`` counters — always >= the true count, inflated only by
    collisions (error ~ N/width per row, min over rows).

    Deterministic md5-salted bucket hashing (the ``_md5_bucket``
    algebra), so the sketch — like the KMV — is bit-for-bit
    re-derivable in ANSI SQL. Pinned output: top-k by
    (est_count desc, value asc), rank = row_number over that total
    order.

    100 TB shape: the sketch build is ONE explode of the (value, salt)
    pairs into a ``depth × width``-row relation — map-side-combinable
    counts, bounded state regardless of corpus size (THE point of CM:
    the counter table is a broadcastable constant-size synopsis).
    Estimating then touches only the candidate-value relation (distinct
    values here; at production scale, a pre-filtered candidate set) via
    an equi-join against the broadcast sketch. Nothing value-cardinality-
    sized shuffles twice.
    """
    if depth < 1 or width < 2:
        raise ValueError("cm sketch needs depth >= 1 and width >= 2")
    sketch = cm_build(df, value_col, width=width, depth=depth)
    cand = df.select(F.col(value_col).cast("string").alias("value")).distinct()
    return cm_estimate(sketch, cand, k=k, width=width, depth=depth)


def _cm_bucket(col: Column, width: int) -> Column:
    return F.pmod(
        F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long"),
        F.lit(width),
    )


def cm_build(
    df: DataFrame, value_col: str, width: int = 256, depth: int = 3
) -> DataFrame:
    """(salt, b, c): the Count-Min counter table for ``df[value_col]`` —
    a bounded-size synopsis, MERGEABLE by bucket-wise addition (sum the
    ``c`` of matching (salt, b) rows), which is what lets per-shard /
    per-micro-batch sketches roll up into a corpus sketch without
    touching the corpus again (see streaming.sketches)."""
    salts = F.array(*[F.lit(f"cm{i}:") for i in range(depth)])
    pairs = df.select(
        F.col(value_col).cast("string").alias("_v"),
        F.explode(salts).alias("salt"),
    ).select(
        "salt", _cm_bucket(F.concat(F.col("salt"), F.col("_v")), width).alias("b")
    )
    return pairs.groupBy("salt", "b").agg(F.count(F.lit(1)).alias("c"))


def cm_estimate(
    sketch: DataFrame,
    candidates: DataFrame,
    k: int = 20,
    width: int = 256,
    depth: int = 3,
) -> DataFrame:
    """Top-``k`` heavy hitters among ``candidates.value`` per a prebuilt
    (salt, b, c) counter table (``cm_build`` output or a merged union of
    them). The sketch side joins BROADCAST — it is bounded by
    depth x width regardless of what corpus built it."""
    salts = F.array(*[F.lit(f"cm{i}:") for i in range(depth)])
    cand = candidates.select(
        "value", F.explode(salts).alias("salt")
    ).select(
        "value",
        "salt",
        _cm_bucket(F.concat(F.col("salt"), F.col("value")), width).alias("b"),
    )
    # LEFT join + coalesce-to-0: a candidate bucket with NO counter row
    # is an empty counter (count 0), and CM's estimate is the min over
    # ALL depth rows — an inner join would silently skip empty buckets
    # and over-estimate candidates absent from the corpus
    est = (
        cand.join(F.broadcast(sketch), ["salt", "b"], "left")
        .groupBy("value")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est_count"))
    )
    # top-k FIRST via orderBy+limit (TakeOrderedAndProject: per-partition
    # heads + driver merge, never a global sort), then rank the k
    # survivors — the window sorts k rows, not the value universe
    top = est.orderBy(
        F.col("est_count").desc(), F.col("value").asc()
    ).limit(k)
    w = Window.orderBy(F.col("est_count").desc(), F.col("value").asc())
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


def histogram_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    quantiles: list[float] = (0.5, 0.9, 0.99),
    n_bins: int = 64,
) -> DataFrame:
    """Per-group quantile estimates from a fixed-width histogram ->
    (group_cols..., quantile, n, est_q). The third member of the sketch
    family: KMV answers "how many distinct", Count-Min "how often", this
    answers "how is it distributed" with the same bounded-state,
    SQL-rederivable discipline (vs ``percentile_approx``'s KLL sketch,
    which is neither reproducible across engines nor oracle-checkable).

    Pinned algebra (both engines, bit-for-bit):

      * per group: gmin/gmax/n over non-null values; width =
        (gmax - gmin) / n_bins in IEEE double.
      * bin(v) = min(floor((v - gmin) / width), n_bins - 1); a
        degenerate group (gmax == gmin) puts everything in bin 0.
      * for quantile q: target = q * n; take the FIRST bin whose
        cumulative count reaches target, interpolate linearly inside it:
        frac = (target - cum_before) / bin_count,
        est_q = round(gmin + (bin + frac) * width, 6); degenerate
        groups report gmin exactly.

    100 TB shape: two aggregations over the corpus — min/max/count
    (3 scalars per group) and bin counts (<= n_bins rows per group) —
    both map-side-combinable; the quantile extraction then runs on the
    histogram relation only (group-count x n_bins rows), with the
    cumulative window sorting <= n_bins rows per group partition.
    Nothing after the two scans is corpus-sized, and the histogram is a
    mergeable synopsis (add counts bin-wise) for rollups across shards.
    """
    if n_bins < 1:
        raise ValueError("histogram needs n_bins >= 1")
    if not quantiles or any(not (0.0 < q <= 1.0) for q in quantiles):
        raise ValueError("quantiles must be in (0, 1]")
    v = F.col(value_col).cast("double")
    stats = df.groupBy(*group_cols).agg(
        F.min(v).alias("_gmin"),
        F.max(v).alias("_gmax"),
        F.count(v).alias("_n"),
    )
    width = (F.col("_gmax") - F.col("_gmin")) / F.lit(float(n_bins))
    binned = (
        df.select(*group_cols, v.alias("_v"))
        .where(F.col("_v").isNotNull())
        .join(F.broadcast(stats), group_cols)
        .select(
            *group_cols,
            F.when(F.col("_gmax") == F.col("_gmin"), F.lit(0))
            .otherwise(
                F.least(
                    F.floor((F.col("_v") - F.col("_gmin")) / width),
                    F.lit(n_bins - 1),
                )
            )
            .cast("int")
            .alias("_bin"),
        )
    )
    hist = binned.groupBy(*group_cols, "_bin").agg(
        F.count(F.lit(1)).alias("_c")
    )
    wcum = (
        Window.partitionBy(*group_cols)
        .orderBy("_bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("_cum", F.sum("_c").over(wcum))
    qs = F.explode(
        F.array(*[F.lit(float(q)) for q in quantiles])
    ).alias("quantile")
    targets = stats.select(*group_cols, "_gmin", "_gmax", "_n", qs).withColumn(
        "_target", F.col("quantile") * F.col("_n").cast("double")
    )
    # first bin whose cumulative count reaches the target: min over bin of
    # the (bin, c, cum) struct — lexicographic min == smallest bin
    hit = (
        targets.join(cum, group_cols)
        .where(F.col("_cum").cast("double") >= F.col("_target"))
        .groupBy(*group_cols, "quantile", "_gmin", "_gmax", "_n", "_target")
        .agg(F.min(F.struct("_bin", "_c", "_cum")).alias("_s"))
    )
    width_h = (F.col("_gmax") - F.col("_gmin")) / F.lit(float(n_bins))
    frac = (
        F.col("_target")
        - (F.col("_s._cum") - F.col("_s._c")).cast("double")
    ) / F.col("_s._c").cast("double")
    return hit.select(
        *group_cols,
        "quantile",
        F.col("_n").alias("n"),
        F.round(
            F.when(F.col("_gmax") == F.col("_gmin"), F.col("_gmin")).otherwise(
                F.col("_gmin")
                + (F.col("_s._bin").cast("double") + frac) * width_h
            ),
            6,
        ).alias("est_q"),
    )


def bottomk_sample(
    df: DataFrame,
    group_cols: list[str],
    id_col: str,
    k: int = 32,
) -> DataFrame:
    """Deterministic per-group k-sample -> (group_cols..., id, pos): the
    rows whose md5-hashed ids are the ``k`` smallest in their group —
    the bottom-k / KMV construction used as a SAMPLER. Uniform (the hash
    is uniform on ids), EXACTLY k per group (vs the rate-based
    ``curation.stratified_sample``, which is binomial), stable under
    reruns and data order, and coordinated: the same ids win across
    tables/snapshots, so bottom-k samples of two relations join (the
    correlated-sampling property hash sampling is chosen for).

    ``pos`` = 1-based rank by (hash, id). Same per-group-window shape as
    ``kmv_distinct`` — rows never leave their group's partition, the
    production form is a bounded-heap UDAF, the algebra is the contract.
    """
    if k < 1:
        raise ValueError("bottomk needs k >= 1")
    h = _h60(F.col(id_col))
    w = Window.partitionBy(*group_cols).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.select(*group_cols, F.col(id_col))
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .where(F.col("pos") <= k)
    )


def kmv_state(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 32,
) -> DataFrame:
    """(group_cols..., h): the per-group KMV synopsis — the k smallest
    distinct 60-bit hashes. THE mergeable form: bottom-k sketches
    compose exactly (bottom-k of a union of bottom-ks == bottom-k of
    the union), so per-shard / per-snapshot states roll up to the
    corpus estimate without rescanning anything —
    ``kmv_merge(kmv_state(shard1), kmv_state(shard2)) ==
    kmv_distinct(shard1 ∪ shard2)`` bit-for-bit (pinned by test)."""
    if k < 2:
        raise ValueError("kmv k must be >= 2")
    dv = (
        df.select(*group_cols, F.col(value_col).alias("_v"))
        .distinct()
        .select(*group_cols, _h60(F.col("_v")).alias("h"))
    )
    w = Window.partitionBy(*group_cols).orderBy(F.asc("h"))
    return (
        dv.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def kmv_merge(
    states: list[DataFrame],
    group_cols: list[str],
    k: int = 32,
) -> DataFrame:
    """Merge per-shard KMV states -> the same (group_cols..., n_kept,
    est_distinct) relation ``kmv_distinct`` computes over the union of
    the shards. Cost: the union of the (bounded, shards x k per group)
    state relations — never the shards' rows."""
    if not states:
        raise ValueError("kmv_merge needs at least one state")
    u = states[0]
    for s in states[1:]:
        u = u.unionByName(s)
    dv = u.select(*group_cols, "h").distinct()
    w = Window.partitionBy(*group_cols).orderBy(F.asc("h"))
    ranked = dv.select(*group_cols, "h", F.row_number().over(w).alias("_rn"))
    per_group = ranked.where(F.col("_rn") <= k).groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("_n"),
        F.min(F.when(F.col("_rn") == k, F.col("h"))).alias("_hk"),
    )
    full = F.col("_n") >= k
    return per_group.select(
        *group_cols,
        F.when(full, F.lit(k)).otherwise(F.col("_n")).alias("n_kept"),
        F.round(
            F.when(
                full,
                F.lit(float(k - 1)) * F.lit(_HASH_SPACE) / F.col("_hk"),
            ).otherwise(F.col("_n").cast("double")),
            4,
        ).alias("est_distinct"),
    )
