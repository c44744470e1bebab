"""Benchmark driver: headline queries + the KG pipeline.

Prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "pipeline": {...}, "scaling": {...}}

Measurement shape (matches production, see BENCH/BASELINE.md):
  * the pages corpus is STAGED TO PARQUET once (it is the input table; the
    reference also reads materialized files) — generation cost is excluded;
  * each timed pipeline run reads the parquet, runs extract -> link ->
    canonicalize -> triples, and sinks via the noop writer;
  * a warmup pass (2% sample) precedes the timed run so JIT/codegen and
    Python-worker spin-up are not billed to the measured job;
  * scaling evidence (BENCH_SCALING=1): the same job at N and 4N local
    cores with 4N <= physical_cores/2, because in local mode the JVM serde
    work shares the box with the Python workers — on a multi-executor
    cluster those run on disjoint cores (see BENCH/BASELINE.md).

Env knobs:
  SPARK_GRAFT_SF_DIR  parquet dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local[k] for headline queries (default 32)
  BENCH_PAGES         pipeline corpus size (default 100000)
  BENCH_SCALING=1     add the N vs 4N scaling section
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

HEADLINE = [
    "q1_pricing_summary",
    "a1_rollup",
    "o1_recency_boost",
    "w1_topk_per_type",
    "u5_bm25",
    "flagship_search",
    "t_lang_id",
    "t_quality",
    "d_exact",
    "d_minhash_lsh",
    "s_knn_bruteforce",
    "s_knn_lsh",
    "incr_change_detect",
]


def _run_queries(spark, sf_dir: str) -> dict[str, float]:
    import __spark_entry__ as em

    qs = em.queries()
    times: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        times[name] = round(time.time() - t0, 3)
    return times


def _stage_pages(pages_dir: str, n_pages: int) -> None:
    from chunksilo_spark.session import get_spark
    from chunksilo_spark.sources.corpus import pages_df

    spark = get_spark("bench_stage_pages", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    try:
        pages_df(spark, n_pages, partitions=128).write.mode("overwrite").parquet(
            pages_dir
        )
    finally:
        spark.stop()


def _pipeline_job(spark, pages, cores: int):
    """The measured DAG: parquet pages -> canonical triples (lazy)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from chunksilo_spark.functions.triples import normalize_surface
    from chunksilo_spark.operators import stage1_extract as s1
    from chunksilo_spark.operators import stage2_link as s2
    from chunksilo_spark.operators import stage3_triples as s3
    from chunksilo_spark.operators.canon import canon_map
    from chunksilo_spark.sources.corpus import aliases_df

    from pyspark import StorageLevel

    parts = 2 * cores
    documents = s1.extract_documents(pages, partitions=parts).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    alias_bc = s2.build_alias_broadcast(spark, aliases_df(spark))
    linked = s2.detect_and_link(documents, alias_bc).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    raw = s3.extract_raw_triples(documents)

    def norm_batch(batches):
        for pdf in batches:
            yield pd.DataFrame({"norm": [normalize_surface(s) for s in pdf["s"]]})

    surfaces = (
        aliases_df(spark).select(F.col("alias").alias("s"))
        .unionByName(linked.select(F.col("surface").alias("s")))
        .distinct()
        .mapInPandas(norm_batch, schema="norm string")
        .distinct()
    )
    canon = canon_map(surfaces, partitions=max(8, cores // 2))
    return s3.canonical_triples(raw, s3.linked_surfaces(linked), canon)


def _run_pipeline(cores: int, pages_dir: str, n_pages: int) -> dict:
    from chunksilo_spark.session import get_spark

    spark = get_spark(f"bench_pipeline_{cores}", cores=cores)
    try:
        pages = spark.read.parquet(pages_dir)
        # warmup: full DAG on a 2% sample (codegen + python worker spin-up)
        _pipeline_job(spark, pages.sample(0.02, seed=1), cores).write.format(
            "noop"
        ).mode("overwrite").save()
        t0 = time.time()
        triples = _pipeline_job(spark, pages, cores)
        n_triples = triples.count()
        wall = time.time() - t0
        return {
            "cores": cores,
            "wall_s": round(wall, 2),
            "n_pages": n_pages,
            "n_triples": n_triples,
            "docs_per_sec": round(n_pages / wall, 1),
            "triples_per_sec": round(n_triples / wall, 1),
        }
    finally:
        spark.stop()


def _run_pipeline_pinned(cores: int, pages_dir: str, n_pages: int) -> dict:
    """Run the pipeline in a subprocess pinned (taskset) to exactly
    ``cores`` CPUs — the local-mode emulation of a cluster with N executor
    cores. Without pinning, a local[4] JVM freerides its GC/shuffle/serde
    threads on the idle cores and the scaling ratio is meaningless."""
    import subprocess

    cmd = [
        "taskset", "-c", f"0-{cores - 1}",
        sys.executable, os.path.abspath(__file__),
        "--pipeline-run", str(cores), pages_dir, str(n_pages),
    ]
    out = subprocess.run(
        cmd, capture_output=True, text=True, check=True,
        env={**os.environ, "SPARK_GRAFT_DRIVER_MEM": "24g"},
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_pages = int(os.environ.get("BENCH_PAGES", "100000"))
    sf_label = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from chunksilo_spark.session import get_spark

    spark = get_spark("bench_queries", cores=cores)
    qtimes = _run_queries(spark, sf_dir)
    spark.stop()

    pages_dir = os.path.join(tempfile.gettempdir(), f"bench_pages_{n_pages}")
    if not os.path.exists(os.path.join(pages_dir, "_SUCCESS")):
        _stage_pages(pages_dir, n_pages)

    hi = min(16, cores)  # leave JVM-serde headroom in local mode
    pipe = _run_pipeline(hi, pages_dir, n_pages)
    qtimes["kg_pipeline"] = pipe["wall_s"]

    result = {
        "metric": "headline_queries_plus_kg_pipeline_wall",
        "value": round(sum(qtimes.values()), 2),
        "unit": "sec",
        "queries": qtimes,
        "sf": sf_label,
        "cores": cores,
        "pipeline": pipe,
    }

    if os.environ.get("BENCH_SCALING") == "1":
        # scaling evidence runs on a larger corpus so per-core compute
        # dominates the fixed driver/canon costs (which amortize at real
        # scale); same job, N vs 4N cores
        # sized so corpus-proportional work dominates the dictionary-sized
        # canon fixed cost (Amdahl): the efficiency then reflects the
        # per-executor stages, which is what scales to 10^12 docs
        n_scale = int(os.environ.get("BENCH_SCALING_PAGES", "1600000"))
        scale_dir = os.path.join(tempfile.gettempdir(), f"bench_pages_{n_scale}")
        if not os.path.exists(os.path.join(scale_dir, "_SUCCESS")):
            _stage_pages(scale_dir, n_scale)
        lo = max(1, hi // 4)
        pipe_hi = _run_pipeline_pinned(hi, scale_dir, n_scale)
        pipe_lo = _run_pipeline_pinned(lo, scale_dir, n_scale)
        thr_hi = pipe_hi["docs_per_sec"] / pipe_hi["cores"]
        thr_lo = pipe_lo["docs_per_sec"] / pipe_lo["cores"]
        result["scaling"] = {
            "low": pipe_lo,
            "high": pipe_hi,
            "efficiency": round(thr_hi / thr_lo, 3),
        }

    print(json.dumps(result))
    # staged pages stay cached in /tmp (path is size-keyed) for reruns


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--pipeline-run":
        print(
            json.dumps(
                _run_pipeline(int(sys.argv[2]), sys.argv[3], int(sys.argv[4]))
            )
        )
    else:
        main()
