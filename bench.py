"""Benchmark driver: headline queries + the KG pipeline at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., ...extras}

Env knobs:
  SPARK_GRAFT_SF_DIR   parquet dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[k] (default 32)
  BENCH_PAGES          KG pipeline corpus size (default 20000)
  BENCH_SCALING=1      also run the pipeline at cores/4 and report scaling
                       efficiency (the north rule's N vs 4N evidence)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

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
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        times[name] = round(time.time() - t0, 3)
    return times


def _run_pipeline(cores: int, n_pages: int) -> dict:
    """Fresh session at the given parallelism; returns wall + throughput."""
    from chunksilo_spark.session import get_spark
    from chunksilo_spark.operators import stage1_extract as s1
    from chunksilo_spark.operators import stage2_link as s2
    from chunksilo_spark.operators import stage3_triples as s3
    from chunksilo_spark.sources.corpus import aliases_df, pages_df

    spark = get_spark(f"bench_pipeline_{cores}", cores=cores)
    try:
        parts = 4 * cores
        t0 = time.time()
        pages = pages_df(spark, n_pages, partitions=parts)
        documents = s1.extract_documents(pages, partitions=parts).localCheckpoint()
        alias_bc = s2.build_alias_broadcast(spark, aliases_df(spark))
        linked = s2.link_mentions(s2.detect_mentions(documents), alias_bc)
        raw = s3.extract_raw_triples(documents)
        surface_map = s3.linked_surfaces(linked)
        # canon over the alias dictionary (mention surfaces resolve through it)
        import pandas as pd
        from pyspark.sql import functions as F
        from chunksilo_spark.functions.triples import normalize_surface
        from chunksilo_spark.operators.canon import canon_map

        def norm_batch(batches):
            for pdf in batches:
                yield pd.DataFrame(
                    {"norm": [normalize_surface(s) for s in pdf["s"]]}
                )

        surfaces = (
            aliases_df(spark).select(F.col("alias").alias("s"))
            .unionByName(linked.select(F.col("surface").alias("s")))
            .distinct()
            .mapInPandas(norm_batch, schema="norm string")
            .distinct()
        )
        canon = canon_map(surfaces)
        triples = s3.canonical_triples(raw, surface_map, canon)
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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_pages = int(os.environ.get("BENCH_PAGES", "20000"))
    sf_label = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from chunksilo_spark.session import get_spark

    spark = get_spark("bench_queries", cores=cores)
    t0 = time.time()
    qtimes = _run_queries(spark, sf_dir)
    spark.stop()

    pipe = _run_pipeline(cores, n_pages)
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
        low = max(1, cores // 4)
        pipe_low = _run_pipeline(low, n_pages)
        thr_hi = pipe["docs_per_sec"] / pipe["cores"]
        thr_lo = pipe_low["docs_per_sec"] / pipe_low["cores"]
        result["scaling"] = {
            "low": pipe_low,
            "high": pipe,
            "efficiency": round(thr_hi / thr_lo, 3),
        }

    print(json.dumps(result))


if __name__ == "__main__":
    main()
