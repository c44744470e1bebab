"""SparkSession factory with scale-oriented defaults.

Local testing runs on local[$SPARK_GRAFT_CPUS] (default 32 threads); the
configs are chosen to behave the same way on a multi-executor cluster:
AQE on (runtime coalesce + skew-join splitting), Arrow on (all our Python
surface is pandas-UDF/mapInPandas batches), shuffle partitions ~2x cores.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# one BLAS thread per Python worker: parallelism comes from Spark tasks;
# nested OMP threading just fights the other workers for the same cores
# (reference analog: ONNX threads pinned, SURVEY §4)
for _var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_var, "1")


def cpu_count() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(app: str = "chunksilo_spark", cores: int | None = None) -> SparkSession:
    cores = cores or cpu_count()
    return (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(2 * cores))
        .config("spark.default.parallelism", str(2 * cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .getOrCreate()
    )
