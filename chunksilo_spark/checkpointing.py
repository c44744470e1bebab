"""Lineage cuts for iterative / multi-consumer plans.

Every iterative operator (PageRank, connected components) and every
multi-branch relation (minhash bands, the pipeline's fresh-docs relation)
truncates its lineage so plans stay O(1) deep. Two modes:

* default — ``localCheckpoint()``: executor-local blocks, zero external
  storage. Right for local[] / local-cluster[] test runs and for clusters
  where recomputing a lost block is acceptable.
* reliable — ``checkpoint()`` against the SparkContext's checkpoint dir:
  survives executor loss, which localCheckpoint does NOT (a lost executor
  makes a localCheckpoint-truncated plan unrecoverable — at 100 TB with
  1000 executors, executor churn is routine, so production runs should set
  a checkpoint dir on durable storage).

The mode is data-driven, not a per-call flag: call
``use_reliable_checkpoints(spark, dir)`` (or set
``SPARK_GRAFT_CHECKPOINT_DIR`` before session creation — session.get_spark
forwards it) and every ``cut_lineage`` site in the package switches to
reliable checkpoints with no operator changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def use_reliable_checkpoints(spark: SparkSession, checkpoint_dir: str) -> None:
    """Route all subsequent ``cut_lineage`` calls through reliable
    ``checkpoint()`` files under ``checkpoint_dir`` (HDFS/S3/... on a real
    cluster; any path Spark can write)."""
    spark.sparkContext.setCheckpointDir(checkpoint_dir)


def checkpoint_dir(df: DataFrame) -> str | None:
    d = df.sparkSession.sparkContext.getCheckpointDir()
    return d if d else None


def cut_lineage(df: DataFrame) -> DataFrame:
    """Truncate ``df``'s lineage: reliable ``checkpoint()`` when a
    checkpoint dir is configured, else ``localCheckpoint()``. Both are
    eager — iterative callers rely on the cut materializing NOW so the next
    round's plan starts from the checkpointed relation.

    Reliable mode persists before checkpointing: a bare ``checkpoint()``
    computes the plan once for the eager count and AGAIN when the
    checkpoint files are written (classic RDD double-compute); caching in
    between means the write pass reads the cache. The cache is released
    immediately — the returned relation reads from the checkpoint files.
    Superseded checkpoint files are removed by Spark's context cleaner
    (``spark.cleaner.referenceTracking.cleanCheckpoints`` is set by
    session.py) once the old RDD is garbage-collected; point the dir at
    job-scoped storage so whatever outlives the cleaner dies with the job.
    """
    if checkpoint_dir(df) is not None:
        from pyspark import StorageLevel

        cached = df.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            return cached.checkpoint(eager=True)
        finally:
            cached.unpersist()
    return df.localCheckpoint()
