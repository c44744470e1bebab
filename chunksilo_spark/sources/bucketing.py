"""Bucketed table layout: shuffle-free joins for the hot keys (SURVEY §4).

At 100 TB the same keys are joined over and over — documents⋈chunks and
documents⋈outlinks on ``url``, edge tables on node ids. Hash-bucketing the
stored tables on that key (Spark's ``bucketBy`` + ``saveAsTable``) records
the partitioning in the catalog, so every later equi-join on the bucket
key of two co-bucketed tables runs WITHOUT an Exchange on either side —
the shuffle is paid once at write time and amortized over every subsequent
join, the classic warehouse layout play (and the parquet-era stand-in for
Iceberg's bucket partition transform, which the TableStore iceberg branch
would use instead).

Requirements Spark enforces for the exchange-free plan (pinned by the
test): same bucket count on both sides (or a whole-number ratio with
``spark.sql.bucketing.coalesceBucketsInJoin.enabled`` — also tested),
join keys = bucket keys, and ``spark.sql.sources.bucketing.enabled``
(default true). ``sortBy`` lays each bucket file out sorted; note that
Spark 3+ does NOT propagate that ordering to the planner by default
(SPARK-28556 — the per-task Sort before a SortMergeJoin remains unless
``spark.sql.legacy.bucketedTableScan.outputOrdering`` is set), so the
win bucketing buys here is the Exchange, not the Sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    sort: bool = True,
) -> None:
    """Persist ``df`` hash-bucketed (and bucket-sorted) on ``bucket_col``.

    ``table`` may be db-qualified (``db.name``); the catalog records the
    layout so readers get the co-location guarantee automatically.
    """
    w = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, bucket_col)
    )
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table)


def cobucketed_join(
    spark: SparkSession, left: str, right: str, on: str
) -> DataFrame:
    """Equi-join two co-bucketed catalog tables on their bucket key.

    The merge hint keeps the planner on SortMergeJoin (a broadcast would
    also be shuffle-free but proves nothing about layout); with matching
    bucket counts the executed plan contains NO Exchange (asserted in
    tests/test_bucketing.py).
    """
    return (
        spark.table(left)
        .hint("merge")
        .join(spark.table(right), on)
    )
