"""Per-partition lineage rows (north-star stage 4).

Each materialized stage appends one row per physical output partition to the
``lineage`` table: (stage, part_id, n_rows, key_min, key_max, written_at).
The reference analog is the SQLite files-ledger (index.py:314-401) — here it
is a queryable table so a resumed run, an auditor, or a skew monitor can see
exactly what each partition produced (the hub-entity skew test reads this).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LINEAGE_SCHEMA = (
    "stage string, part_id int, n_rows long, key_min string, key_max string, "
    "written_at double"
)


def partition_lineage(df: DataFrame, stage: str, key_col: str) -> DataFrame:
    """One row per physical partition of ``df`` (groupBy spark_partition_id)."""
    now = float(time.time())
    return (
        df.withColumn("part_id", F.spark_partition_id())
        .groupBy("part_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(F.col(key_col).cast("string")).alias("key_min"),
            F.max(F.col(key_col).cast("string")).alias("key_max"),
        )
        .select(
            F.lit(stage).alias("stage"),
            F.col("part_id"),
            F.col("n_rows"),
            F.col("key_min"),
            F.col("key_max"),
            F.lit(now).alias("written_at"),
        )
    )
