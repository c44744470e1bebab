"""Continuous sketch maintenance: Count-Min counters over a stream.

The profiling queries the sketch family answers (heavy-hitter domains,
frequency skew of urls/users/entities) don't want a batch rescan per
question at crawl scale — they want a synopsis that is ALREADY CURRENT
when asked. Count-Min is mergeable by bucket-wise addition, so the
streaming form is just: per micro-batch, build the batch's (salt, b, c)
increments with the SAME ``cm_build`` kernel the batch operator uses,
land them in a ``batch_id=N`` partition with dynamic partition OVERWRITE
(foreachBatch is at-least-once; a replayed batch rewrites its partition
instead of double-counting — the repo-wide idempotence discipline from
streaming.ingest), and let readers sum partitions.

The merged sketch a reader sees is bit-for-bit THE batch sketch of the
union of all delivered rows — ``test_streaming_sketches`` pins streamed
== batch-rebuilt equality, which only holds because addition is the
merge and overwrite is the replay story.

Reader cost: depth x width rows per batch partition — a sum over
batches x depth x width rows, never over the stream's rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sketches import cm_build, cm_estimate

__all__ = [
    "start_cm_maintenance",
    "merged_sketch",
    "merged_heavy_hitters",
    "start_kmv_maintenance",
    "merged_kmv",
]


def start_cm_maintenance(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    value_col: str,
    schema: str,
    width: int = 256,
    depth: int = 3,
    available_now: bool = True,
):
    """Maintain ``out_dir/cm_sketch`` (partitioned by batch_id) over a
    growing parquet directory. Returns the StreamingQuery."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(src_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        inc = cm_build(batch_df, value_col, width=width, depth=depth)
        (
            inc.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(f"{out_dir}/cm_sketch")
        )

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def merged_sketch(spark: SparkSession, out_dir: str) -> DataFrame:
    """(salt, b, c): all batch increments summed bucket-wise — the
    corpus sketch as of the last delivered batch."""
    return (
        spark.read.parquet(f"{out_dir}/cm_sketch")
        .groupBy("salt", "b")
        .agg(F.sum("c").alias("c"))
    )


def merged_heavy_hitters(
    spark: SparkSession,
    out_dir: str,
    candidates: DataFrame,
    k: int = 20,
    width: int = 256,
    depth: int = 3,
) -> DataFrame:
    """Top-k heavy hitters among ``candidates.value`` per the maintained
    sketch — the standing profiling query, answered from the synopsis
    alone (the stream's rows are never re-read)."""
    return cm_estimate(
        merged_sketch(spark, out_dir), candidates, k=k, width=width, depth=depth
    )


def start_kmv_maintenance(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    group_col: str,
    value_col: str,
    schema: str,
    k: int = 32,
    available_now: bool = True,
):
    """Maintain per-group KMV distinct-count states over a growing
    parquet directory — the distinct-cardinality twin of
    :func:`start_cm_maintenance`. Per micro-batch, the batch's bounded
    (group, h) bottom-k state (``sketches.kmv_state``) lands in a
    ``batch_id=N`` partition (overwrite-idempotent); readers merge with
    ``sketches.kmv_merge``, which lands EXACTLY on the batch sketch of
    everything delivered (bottom-k composability)."""
    from ..operators.sketches import kmv_state

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(src_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        state = kmv_state(batch_df, [group_col], value_col, k=k)
        (
            state.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(f"{out_dir}/kmv_state")
        )

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def merged_kmv(
    spark: SparkSession, out_dir: str, group_col: str, k: int = 32
) -> DataFrame:
    """(group, n_kept, est_distinct): all batch states merged — the
    corpus distinct-count estimate as of the last delivered batch."""
    from ..operators.sketches import kmv_merge

    return kmv_merge(
        [spark.read.parquet(f"{out_dir}/kmv_state").drop("batch_id")],
        [group_col],
        k=k,
    )
