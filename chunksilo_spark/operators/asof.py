"""As-of (point-in-time) join — the classic operator Spark's DataFrame API
lacks (pandas merge_asof / DuckDB ASOF JOIN / kdb aj). For the KG pipeline:
join each crawl snapshot / event to the latest state row at-or-before its
timestamp (e.g. events to the user's latest order, a page capture to the
robots policy in force when it was fetched).

Semantics (pinned; DuckDB's native ``ASOF JOIN`` is the driver oracle):
for each left row, attach the single right row with the same key and the
GREATEST right_ts <= left_ts; left rows with no such right row keep NULL
right columns (left outer). The right side must be unique per
(key, right_ts) — pre-aggregate ties away (``dedup_right_latest`` below
does it deterministically); with duplicates the picked row would be
partition-order-dependent.

100 TB shape — the union+window formulation, NOT a range join:
  * both sides shuffle ONCE on the key; the tagged union sorts within key
    partitions by (ts, side) and a running ``last(right_value,
    ignoreNulls)`` carries the in-force right row forward — O(n log n)
    per key vs the O(|L|x|R|) per-key explosion of the naive
    ``l.ts >= r.ts`` theta-join (which Spark plans as BroadcastNestedLoop
    or a cartesian per key);
  * right rows order BEFORE left rows at equal ts, so at-or-before
    includes same-instant state changes;
  * skew: a hub key's partition degrades to one disk-backed sort (the
    same spill-safe story as dup_spans); if one key dominates the corpus,
    pre-bucket by time range and as-of within buckets (documented
    extension, not needed at driver scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_right_latest(
    right: DataFrame, on: str, ts: str, tiebreak: str
) -> DataFrame:
    """One right row per (key, ts): the max-``tiebreak`` row, picked via a
    lexicographic max over struct(tiebreak, *cols) — deterministic and one
    map-side-combinable aggregation (no window sort)."""
    others = [c for c in right.columns if c not in (on, ts)]
    picked = right.groupBy(on, ts).agg(
        F.max(F.struct(tiebreak, *[c for c in others if c != tiebreak]))
        .alias("_s")
    )
    return picked.select(
        on, ts,
        *[F.col(f"_s.{c}") for c in [tiebreak] + [c for c in others if c != tiebreak]],
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
) -> DataFrame:
    """Left-outer as-of join -> all left columns + right's non-key columns
    (NULL when no right row is in force). Column names must not collide
    across sides except ``on`` (rename first; keeps the API honest instead
    of silently suffixing)."""
    from pyspark.sql import Window

    r_cols = [c for c in right.columns if c != on]
    l_cols = left.columns
    overlap = set(l_cols) & set(r_cols)
    if overlap:
        raise ValueError(
            f"column collision across sides: {sorted(overlap)} — rename "
            "before asof_join"
        )
    r_tagged = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).cast("timestamp").alias("_ts"),
        F.lit(1).alias("_isr"),
        F.struct(*r_cols).alias("_rv"),
        F.lit(None).cast(
            left.select(F.struct(*l_cols).alias("x")).schema["x"].dataType
        ).alias("_lv"),
    )
    l_tagged = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).cast("timestamp").alias("_ts"),
        F.lit(0).alias("_isr"),
        F.lit(None).cast(
            right.select(F.struct(*r_cols).alias("x")).schema["x"].dataType
        ).alias("_rv"),
        F.struct(*l_cols).alias("_lv"),
    )
    # right rows first at equal _ts (at-or-before includes same-instant);
    # rowsBetween makes last() a running carry, not a full-frame scan
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_isr").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = r_tagged.unionByName(l_tagged).withColumn(
        "_in_force", F.last("_rv", ignorenulls=True).over(w)
    )
    out = u.where(F.col("_isr") == 0)
    return out.select(
        *[F.col(f"_lv.{c}").alias(c) for c in l_cols],
        *[F.col(f"_in_force.{c}").alias(c) for c in r_cols],
    )
