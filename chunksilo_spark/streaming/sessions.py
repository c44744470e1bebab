"""Continuous sessionization: mergeable session segments over a stream.

The batch operator (:func:`operators/temporal.sessionize`) carves an
event log into gap-delimited sessions; a crawler or traffic pipeline
wants those sessions maintained AS the log grows, without rescanning
history per question. Session state is mergeable the way intervals are:

  * per micro-batch, run the SAME sessionize kernel on just the batch's
    rows -> session SEGMENTS (key, start_ep, end_ep, n_events). A
    segment never internally spans a silence longer than the gap (the
    batch kernel guarantees it), so segments are sound partial state.
  * land the batch's segments in a ``batch_id=N`` partition with dynamic
    partition OVERWRITE — foreachBatch is at-least-once, and a replayed
    batch must REWRITE its partition, not double-count (the repo-wide
    idempotence discipline from streaming.ingest).
  * readers merge segments with the classic gap-interval merge: per key
    in start order, a segment opens a new session iff its start is more
    than ``gap_s`` after the RUNNING MAX of previous segment ends (the
    running max handles overlapping segments from late/out-of-order
    batches); n_events sum within the merged chain.

``merged_sessions`` therefore lands EXACTLY on the batch rebuild
(``sessionize`` over the union of all delivered rows) — pinned
bit-for-bit by test_streaming_sessions, including an arbitrary batch
split of the same rows and a replay. Why exact: a true silence > gap
can never hide inside a segment, unioning batches only FILLS gaps, and
every event is counted by exactly one batch's segment.

Reader cost: segments-per-key rows (sessions, not events) — the merge
runs over synopsis-sized state, never the stream's rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.temporal import sessionize

__all__ = ["start_session_maintenance", "merged_sessions"]


def start_session_maintenance(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    gap_s: int,
    schema: str,
    key_col: str = "user_id",
    ts_col: str = "ts",
    available_now: bool = True,
):
    """Maintain ``out_dir/session_segments`` (partitioned by batch_id)
    over a growing parquet directory. Returns the StreamingQuery."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(src_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        seg = sessionize(batch_df, gap_s, key_col=key_col, ts_col=ts_col)
        (
            seg.select(
                key_col, "n_events", "start_ep", "end_ep"
            )
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(f"{out_dir}/session_segments")
        )

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def merged_sessions(
    spark: SparkSession,
    out_dir: str,
    gap_s: int,
    key_col: str = "user_id",
) -> DataFrame:
    """All batch segments gap-merged per key -> the SAME (key,
    session_idx, n_events, start_ep, end_ep, duration_s) relation the
    batch :func:`sessionize` produces over every delivered row."""
    seg = spark.read.parquet(f"{out_dir}/session_segments")
    w = Window.partitionBy(key_col).orderBy(
        "start_ep", "end_ep", "n_events"
    )
    prev_max_end = F.max("end_ep").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = seg.withColumn(
        "_new",
        F.when(
            F.col("start_ep") - prev_max_end > gap_s, F.lit(1)
        ).otherwise(F.lit(0)),
    ).withColumn(
        "session_idx",
        (
            F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
            + 1
        ).cast("long"),
    )
    return (
        marked.groupBy(key_col, "session_idx")
        .agg(
            F.sum("n_events").cast("long").alias("n_events"),
            F.min("start_ep").alias("start_ep"),
            F.max("end_ep").alias("end_ep"),
        )
        .select(
            key_col,
            "session_idx",
            "n_events",
            "start_ep",
            "end_ep",
            (F.col("end_ep") - F.col("start_ep")).alias("duration_s"),
        )
    )
