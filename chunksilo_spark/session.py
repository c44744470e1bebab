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

# executor python workers inherit PYTHONPATH (not the driver's sys.path):
# make chunksilo_spark importable regardless of the launch cwd
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in os.environ.get("PYTHONPATH", "").split(os.pathsep):
    os.environ["PYTHONPATH"] = (
        _REPO_ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")
    ).rstrip(os.pathsep)


def cpu_count() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def package_zip() -> str:
    """Zip chunksilo_spark for shipping to executors (the spark-submit
    --py-files analog for programmatic sessions)."""
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    out = os.path.join("/tmp", "chunksilo_spark_pyfiles.zip")
    with zipfile.ZipFile(out, "w") as z:
        for root, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                    z.write(full, rel)
    return out


def get_spark_cluster(
    app: str = "chunksilo_spark",
    executors: int = 2,
    cores_per_executor: int = 4,
    executor_mem_mb: int = 8192,
) -> SparkSession:
    """Multi-executor session via Spark's local-cluster mode: each executor
    is its OWN JVM with its own python workers — the faithful single-box
    emulation of an N-executor cluster (used for the N vs 4N scaling
    evidence; one big local[k] JVM hits GC/scheduler contention that real
    clusters never see). The package ships via addPyFile (--py-files)."""
    total = executors * cores_per_executor
    spark = (
        SparkSession.builder.master(
            f"local-cluster[{executors},{cores_per_executor},{executor_mem_mb}]"
        )
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(2 * total))
        .config("spark.default.parallelism", str(2 * total))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.sql.files.maxPartitionBytes", str(32 * 1024 * 1024))
        .config("spark.driver.memory", "4g")
        .config("spark.executorEnv.OMP_NUM_THREADS", "1")
        .config("spark.executorEnv.OPENBLAS_NUM_THREADS", "1")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        # reliable cut_lineage checkpoints: let the context cleaner
        # delete superseded iterations' checkpoint files once their
        # RDDs are garbage-collected (otherwise every pagerank/CC
        # round leaves a permanent rdd-N dir on durable storage)
        .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
        .getOrCreate()
    )
    spark.sparkContext.addPyFile(package_zip())
    return spark


def get_spark(app: str = "chunksilo_spark", cores: int | None = None) -> SparkSession:
    cores = cores or cpu_count()
    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(2 * cores))
        .config("spark.default.parallelism", str(2 * cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        # python-heavy scans want more, smaller splits than the JVM default
        # (task cost is dominated by the UDF, not scan setup)
        .config("spark.sql.files.maxPartitionBytes", str(32 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # pin wall-clock<->epoch conversions to UTC so timestamp results
        # (unix_micros, date parsing, NTZ casts) do not depend on the
        # driver host's TZ — on a cluster the driver and executors may
        # disagree with each other and with the oracle engine otherwise
        # (mirrored in get_spark_cluster above)
        .config("spark.sql.session.timeZone", "UTC")
        # reliable cut_lineage checkpoints: let the context cleaner
        # delete superseded iterations' checkpoint files once their
        # RDDs are garbage-collected (otherwise every pagerank/CC
        # round leaves a permanent rdd-N dir on durable storage)
        .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
        .getOrCreate()
    )
    # opt into reliable (executor-loss-safe) lineage cuts for the iterative
    # operators: every checkpointing.cut_lineage site switches from
    # localCheckpoint to checkpoint when this dir is set
    ckpt_dir = os.environ.get("SPARK_GRAFT_CHECKPOINT_DIR")
    if ckpt_dir and not spark.sparkContext.getCheckpointDir():
        spark.sparkContext.setCheckpointDir(ckpt_dir)
    return spark
