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
    "weighted_sample",
    "kmv_state",
    "kmv_merge",
    "kmv_overlap",
    "hll_state",
    "hll_merge",
    "hll_cardinality",
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


def _batch_bottomk(
    hashed: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    k: int,
    dedup: bool = True,
) -> DataFrame:
    """The partial-aggregation half of a bottom-k sketch: per Arrow
    batch, keep only each group's k smallest rows by ``order_cols``
    (duplicates dropped — bottom-k-of-distinct composes across batches).
    Output schema == input schema; output size is bounded by
    k x groups-present-per-batch, so the ONE shuffle that follows moves
    sketch-sized state, not the value universe — the plan shape a JVM
    sketch UDAF's partial/merge split would produce, expressed as an
    Arrow-vectorized pandas pass (pandas sort + groupby.head, no Python
    per-row loop)."""
    cols = list(hashed.columns)

    def fn(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            d = pdf
            if dedup:
                d = d.drop_duplicates(subset=group_cols + order_cols)
            d = d.sort_values(group_cols + order_cols, kind="mergesort")
            yield d.groupby(group_cols, sort=False).head(k)[cols]

    return hashed.mapInPandas(fn, schema=hashed.schema)


def kmv_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 32,
    method: str = "window",
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

    ``method``: "window" (default) is the SQL-rederivable oracle path —
    one distinct pass, per-group window rank. "partial" is the
    PRODUCTION path: a per-Arrow-batch bounded heap (``_batch_bottomk``)
    shrinks every input partition to <= k rows per group BEFORE the
    shuffle, so the exchange moves sketch-sized state instead of the
    distinct-value universe — at 10^12 rows the window path's
    distinct+sort shuffle is strictly more data. Identical output
    (pinned by parity test); the hash and the formula are the contract.
    """
    if k < 2:
        raise ValueError("kmv k must be >= 2")
    if method == "partial":
        hashed = df.select(
            *group_cols, _h60(F.col(value_col)).alias("_h")
        )
        dv = _batch_bottomk(hashed, group_cols, ["_h"], k)
    elif method == "window":
        dv = (
            df.select(*group_cols, F.col(value_col).alias("_v"))
            .distinct()
            .select(*group_cols, _h60(F.col("_v")).alias("_h"))
        )
    else:
        raise ValueError(f"unknown kmv method {method!r}")
    return _kmv_finalize(dv, group_cols, k)


def _kmv_finalize(dv: DataFrame, group_cols: list[str], k: int) -> DataFrame:
    """(groups, _h) relation of candidate hashes (>= the true bottom-k
    per group, duplicates allowed across partial states) -> the pinned
    (n_kept, est_distinct) output. Shared by the window path, the
    partial path, and kmv_merge — ONE definition of the estimator."""
    dv = dv.distinct()
    w = Window.partitionBy(*group_cols).orderBy(F.asc("_h"))
    ranked = dv.select(
        *group_cols, "_h", F.row_number().over(w).alias("_rn")
    ).where(F.col("_rn") <= k)
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
    # pre-aggregate to (value, cnt) BEFORE the salt explode and the md5
    # bucketing: bucket counts are sums of per-value counts, so hashing
    # each distinct value ``depth`` times instead of each ROW ``depth``
    # times yields the identical (integer) counter table while the md5 /
    # explode work drops from depth x N to depth x |distinct| and the
    # exchange moves map-side-combined partials either way (guide §2.3
    # "aggregate before you shuffle")
    per_value = df.groupBy(
        F.col(value_col).cast("string").alias("_v")
    ).agg(F.count(F.lit(1)).alias("_cnt"))
    salts = F.array(*[F.lit(f"cm{i}:") for i in range(depth)])
    pairs = per_value.select(
        "_v", "_cnt", F.explode(salts).alias("salt")
    ).select(
        "salt",
        _cm_bucket(F.concat(F.col("salt"), F.col("_v")), width).alias("b"),
        "_cnt",
    )
    return pairs.groupBy("salt", "b").agg(F.sum("_cnt").alias("c"))


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
    method: str = "window",
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
    ``kmv_distinct`` — rows never leave their group's partition; the
    algebra is the contract. ``method="partial"`` is the bounded-heap
    production form: each input partition keeps only its own k smallest
    (hash, id) per group before the shuffle, then the window ranks the
    <= k x partitions survivors — identical output, sketch-sized
    exchange (parity-pinned)."""
    if k < 1:
        raise ValueError("bottomk needs k >= 1")
    h = _h60(F.col(id_col))
    rows = df.select(*group_cols, F.col(id_col))
    if method == "partial":
        # dedup=False: duplicate ids each occupy a slot in the window
        # path, so the partial path must keep them too (multiset parity)
        rows = _batch_bottomk(
            rows.withColumn("_h", h), group_cols, ["_h", id_col], k,
            dedup=False,
        )
        h = F.col("_h")
    elif method != "window":
        raise ValueError(f"unknown bottomk method {method!r}")
    w = Window.partitionBy(*group_cols).orderBy(h.asc(), F.col(id_col).asc())
    return (
        rows.withColumn("pos", F.row_number().over(w).cast("long"))
        .where(F.col("pos") <= k)
        .select(*group_cols, id_col, "pos")
    )


def kmv_state(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 32,
    method: str = "window",
) -> DataFrame:
    """(group_cols..., h): the per-group KMV synopsis — the k smallest
    distinct 60-bit hashes. THE mergeable form: bottom-k sketches
    compose exactly (bottom-k of a union of bottom-ks == bottom-k of
    the union), so per-shard / per-snapshot states roll up to the
    corpus estimate without rescanning anything —
    ``kmv_merge(kmv_state(shard1), kmv_state(shard2)) ==
    kmv_distinct(shard1 ∪ shard2)`` bit-for-bit (pinned by test).

    ``method="partial"`` shrinks each input partition to <= k candidate
    hashes per group before the one shuffle (see :func:`kmv_distinct`).
    """
    if k < 2:
        raise ValueError("kmv k must be >= 2")
    if method == "partial":
        hashed = df.select(*group_cols, _h60(F.col(value_col)).alias("h"))
        dv = _batch_bottomk(hashed, group_cols, ["h"], k).distinct()
    elif method == "window":
        dv = (
            df.select(*group_cols, F.col(value_col).alias("_v"))
            .distinct()
            .select(*group_cols, _h60(F.col("_v")).alias("h"))
        )
    else:
        raise ValueError(f"unknown kmv method {method!r}")
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
    return _kmv_finalize(
        u.select(*group_cols, F.col("h").alias("_h")), group_cols, k
    )


def weighted_sample(
    df: DataFrame,
    group_cols: list[str],
    id_col: str,
    weight_col: str,
    k: int = 32,
    method: str = "window",
) -> DataFrame:
    """Deterministic per-group weighted k-sample (Efraimidis & Spirakis
    2006) -> (group_cols..., id, weight, pos): each row wins a slot with
    probability proportional to its weight — the sampler a curation
    pipeline uses when "sample 1k docs per domain" should favor
    high-quality / high-score docs without becoming a hard top-k.

    A-ES with the repo's hash coin instead of a PRNG: every row draws
    u = (h60(id) + 1) / 2^60 in (0, 1] (the +1 dodges ln(0); u = 1 maps
    to score 0, the maximum) and scores ln(u) / weight; the k LARGEST
    scores per group win — equivalent to ranking u^(1/w), the A-ES key.
    Deterministic, rerun-stable, and coordinated across relations like
    :func:`bottomk_sample` (same ids win wherever their weights agree).
    ``pos`` = 1-based rank by (score desc, id asc); weights must be > 0
    (raises inside the plan via an ANSI-mode-safe filter is NOT done —
    caller contract, matching the reference samplers).

    100 TB shape: a pure projection (md5 + ln in codegen) plus the same
    bounded per-group state as every sketch here — ``method="window"``
    sorts within group partitions (the SQL-twin oracle path);
    ``method="partial"`` pre-shrinks each partition to k rows per group
    in an Arrow heap pass so the one shuffle moves sample-sized state.
    """
    if k < 1:
        raise ValueError("weighted_sample needs k >= 1")
    u = (_h60(F.col(id_col)).cast("double") + F.lit(1.0)) / F.lit(_HASH_SPACE)
    # rank ASCENDING on the NEGATED score: -ln(u)/w >= 0, smaller = better
    negscore = -F.log(u) / F.col(weight_col).cast("double")
    rows = df.select(
        *group_cols,
        F.col(id_col),
        F.col(weight_col).alias("weight"),
        negscore.alias("_ns"),
    )
    if method == "partial":
        rows = _batch_bottomk(
            rows, group_cols, ["_ns", id_col], k, dedup=False
        )
    elif method != "window":
        raise ValueError(f"unknown weighted_sample method {method!r}")
    w = Window.partitionBy(*group_cols).orderBy(
        F.asc("_ns"), F.asc(id_col)
    )
    return (
        rows.withColumn("pos", F.row_number().over(w).cast("long"))
        .where(F.col("pos") <= k)
        .select(*group_cols, id_col, "weight", "pos")
    )


def _hll_alpha(m: int) -> float:
    """Flajolet et al. 2007 bias-correction constant for m registers."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_state(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    b: int = 8,
) -> DataFrame:
    """(group_cols..., j, r): the per-group HyperLogLog register table
    (Flajolet, Fusy, Gandouet & Meunier 2007) — for each of m = 2^b
    buckets, the MAX leading-zero rank observed. Only non-empty buckets
    materialize a row (empty register == absent row, register value 0),
    so a state is <= m rows per group: the constant-size synopsis that
    made HLL the industry-standard distinct counter (Spark's own
    ``approx_count_distinct`` is HLL++ — opaque, engine-private, and not
    re-derivable; THIS formulation pins the identical estimator on the
    repo's md5 algebra so DuckDB rebuilds it bit-for-bit).

    Pinned algebra (both engines):

      * h = 60-bit md5 hash of the value's string form (``_h60``);
        j = h mod m (bucket); w = h div m (the remaining W = 60 - b
        bits).
      * rank r = W - bitlength(w) + 1 for w > 0 (leading zeros of w in
        W bits, plus one), and W + 1 for w == 0; bitlength via
        ``length(bin(w))`` — exact integers in both engines, no
        float log2 near a power-of-two boundary.
      * register r_j = max rank in bucket j.

    MERGEABLE by register-wise max (union the states, groupBy max) —
    per-shard / per-snapshot states roll up to the corpus estimate
    without rescanning anything, same contract as :func:`kmv_state`.

    Vs KMV: HLL state is ~m small ints (registers) instead of k 60-bit
    hashes — denser per byte of synopsis at equal error (~1.04/sqrt(m)
    vs ~1/sqrt(k)) — but supports only cardinality (no Jaccard/overlap,
    no sampling): keep both, they answer different questions.

    100 TB shape: ONE distinct pass then a map-side-combinable max agg
    keyed on (group, j) — the shuffle moves <= m rows per group per
    partition. Nothing after the scan is corpus-sized.
    """
    if not (2 <= b <= 16):
        raise ValueError("hll b must be in [2, 16]")
    m = 1 << b
    w_bits = 60 - b
    dv = (
        df.select(*group_cols, F.col(value_col).alias("_v"))
        .distinct()
        .select(*group_cols, _h60(F.col("_v")).alias("_h"))
    )
    w = F.expr(f"_h div {m}")
    rank = F.when(w == 0, F.lit(w_bits + 1)).otherwise(
        F.lit(w_bits) - F.length(F.bin(w)) + F.lit(1)
    )
    return (
        dv.select(
            *group_cols,
            F.pmod(F.col("_h"), F.lit(m)).alias("j"),
            rank.cast("int").alias("_r"),
        )
        .groupBy(*group_cols, "j")
        .agg(F.max("_r").alias("r"))
    )


def _hll_finalize(
    regs: DataFrame, group_cols: list[str], b: int
) -> DataFrame:
    """Register relation (group_cols..., j, r) -> the pinned
    (m, n_zero, sum_scaled, est_distinct) output — ONE definition of the
    estimator shared by hll_cardinality and hll_merge.

    Exact-integer core: sum(2^-r_j) over ALL m registers (empty => r=0)
    is carried as ``sum_scaled = sum(2^(B - r_j))`` with B = W + 1 the
    max possible rank — a bigint (bounded by m * 2^B = 2^61 for every
    b, since B = 60 - b + 1), so the value that drives the estimate is
    hash-exact in both engines; the only floats are one literal
    multiply-divide (raw branch) or m * ln(m / n_zero) (the standard
    small-range linear-counting branch, taken when E <= 2.5m and zero
    registers remain), each rounded once to 4dp.
    """
    m = 1 << b
    max_rank = 60 - b + 1
    per_group = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("_n_present"),
        F.sum(
            F.expr(f"shiftleft(1L, {max_rank} - r)")
        ).alias("_s_present"),
    )
    n_zero = (F.lit(m) - F.col("_n_present")).cast("long")
    sum_scaled = (
        F.col("_s_present")
        + n_zero * F.lit(1 << max_rank).cast("long")
    ).cast("long")
    stats = per_group.select(
        *group_cols,
        F.lit(m).cast("long").alias("m"),
        n_zero.alias("n_zero"),
        sum_scaled.alias("sum_scaled"),
    )
    # alpha * m^2 * 2^B as ONE python-repr'd literal: the raw estimate is
    # a single IEEE division literal/sum_scaled — identical both engines
    numerator = _hll_alpha(m) * float(m) * float(m) * float(1 << max_rank)
    raw = F.lit(numerator) / F.col("sum_scaled").cast("double")
    lc = F.lit(float(m)) * F.log(
        F.lit(float(m)) / F.col("n_zero").cast("double")
    )
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (F.col("n_zero") > 0), lc
    ).otherwise(raw)
    return stats.select(
        *group_cols,
        "m",
        "n_zero",
        "sum_scaled",
        F.round(est, 4).alias("est_distinct"),
    )


def hll_cardinality(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    b: int = 8,
) -> DataFrame:
    """Per-group HLL distinct-count estimate -> (group_cols..., m,
    n_zero, sum_scaled, est_distinct). See :func:`hll_state` for the
    pinned algebra; ``sum_scaled`` and ``n_zero`` are the exact-integer
    estimator inputs (hash-stable by construction), ``est_distinct`` the
    standard Flajolet estimate with small-range linear counting."""
    return _hll_finalize(hll_state(df, group_cols, value_col, b), group_cols, b)


def hll_merge(
    states: list[DataFrame],
    group_cols: list[str],
    b: int = 8,
) -> DataFrame:
    """Merge per-shard HLL register states -> the same (group_cols...,
    m, n_zero, sum_scaled, est_distinct) relation ``hll_cardinality``
    computes over the union of the shards (register-wise max IS the
    union semantics — pinned by test bit-for-bit). Cost: a union of
    <= m-rows-per-group register relations; the shards' rows are never
    rescanned."""
    if not states:
        raise ValueError("hll_merge needs at least one state")
    u = states[0]
    for s in states[1:]:
        u = u.unionByName(s)
    merged = u.groupBy(*group_cols, "j").agg(F.max("r").alias("r"))
    return _hll_finalize(merged, group_cols, b)


def kmv_compare(
    state_a: DataFrame,
    state_b: DataFrame,
    group_cols: list[str],
    k: int = 32,
) -> DataFrame:
    """Per-group set-comparison estimates from two KMV states ->
    (group_cols..., n_common, n_only_a, n_only_b, n_union_sketch,
    jaccard_ppm, est_union, est_intersection, est_only_a, est_only_b):
    the classic KMV Jaccard estimator (Beyer et al. 2007) extended with
    the DIFFERENCE shares — est_only_a/b estimate |A \\ B| and
    |B \\ A| by the same merged-sketch share rule (est_union x
    n_only_x / n_union_sketch, one multiply-divide-round each), which
    is the crawl-snapshot diff question ("how many urls did today add
    / lose vs yesterday") answered at synopsis cost — how much do two crawl snapshots / two hosts /
    two dedup shards share, WITHOUT touching either corpus again.

    Algebra (both engines, bit-for-bit): S = bottom-k of (A ∪ B) hashes;
    J ≈ |S ∩ A ∩ B| / |S|, emitted as exact-integer
    ``jaccard_ppm = (1000000 * n_common) DIV n_union_sketch`` (the
    pinned-integer discipline — no round()'d double enters the hash);
    ``est_union`` is the merged sketch's KMV estimate and
    ``est_intersection = round(est_union * n_common / n_union_sketch,
    4)`` (one multiply, one divide, one round).

    Cost: unions and joins of sketch-sized relations only (<= 2k rows
    per group) — the mergeable-synopsis payoff: pairwise corpus overlap
    becomes an O(groups x k) problem.
    """
    a = state_a.select(*group_cols, F.col("h")).withColumn(
        "_in_a", F.lit(1)
    )
    b = state_b.select(*group_cols, F.col("h")).withColumn(
        "_in_b", F.lit(1)
    )
    both = (
        a.join(b, [*group_cols, "h"], "full")
        .select(
            *group_cols,
            "h",
            F.coalesce("_in_a", F.lit(0)).alias("_a"),
            F.coalesce("_in_b", F.lit(0)).alias("_b"),
        )
    )
    w = Window.partitionBy(*group_cols).orderBy(F.asc("h"))
    s = both.withColumn("_rn", F.row_number().over(w)).where(
        F.col("_rn") <= k
    )
    agg = s.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_union_sketch"),
        F.sum(
            (F.col("_a") * F.col("_b")).cast("long")
        ).alias("n_common"),
        F.sum(
            (F.col("_a") * (1 - F.col("_b"))).cast("long")
        ).alias("n_only_a"),
        F.sum(
            ((1 - F.col("_a")) * F.col("_b")).cast("long")
        ).alias("n_only_b"),
        F.min(F.when(F.col("_rn") == k, F.col("h"))).alias("_hk"),
    )
    full = F.col("n_union_sketch") >= k
    est_union = F.round(
        F.when(
            full, F.lit(float(k - 1)) * F.lit(_HASH_SPACE) / F.col("_hk")
        ).otherwise(F.col("n_union_sketch").cast("double")),
        4,
    )

    def _share(col: str) -> Column:
        return F.round(
            est_union
            * F.col(col).cast("double")
            / F.col("n_union_sketch").cast("double"),
            4,
        )

    return agg.select(
        *group_cols,
        "n_common",
        "n_only_a",
        "n_only_b",
        "n_union_sketch",
        F.expr(
            "(n_common * 1000000L) div n_union_sketch"
        ).alias("jaccard_ppm"),
        est_union.alias("est_union"),
        _share("n_common").alias("est_intersection"),
        _share("n_only_a").alias("est_only_a"),
        _share("n_only_b").alias("est_only_b"),
    )


def kmv_overlap(
    state_a: DataFrame,
    state_b: DataFrame,
    group_cols: list[str],
    k: int = 32,
) -> DataFrame:
    """Per-group set-overlap estimate from two KMV states — the
    overlap-only projection of :func:`kmv_compare` (ONE estimator
    definition; this keeps the original column contract). See
    kmv_compare for the algebra."""
    return kmv_compare(state_a, state_b, group_cols, k).drop(
        "n_only_a", "n_only_b", "est_only_a", "est_only_b"
    )
