"""spark-submit entrypoint for the incremental apply (reference
index.py:1491-1585 semantics: classify vs the stored ledger, delete removed
urls, re-ingest changed ones, rebuild the global tables).

    spark-submit --py-files chunksilo_spark.zip scripts/run_incremental.py \
        --pages  /path/to/new_snapshot_parquet \
        --state  /path/to/existing_output_tables \
        [--aliases /path/to/aliases_parquet]  (default: built-in dictionary)
        [--fingerprint v2] [--partitions N]

The state directory must hold a prior run_pipeline.py (or apply) output;
prints a one-line JSON summary with per-class change counts and final
table sizes.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pages", required=True, help="new snapshot parquet path")
    p.add_argument("--state", required=True, help="existing tables directory")
    p.add_argument("--aliases", default=None)
    p.add_argument("--fingerprint", default="v2")
    p.add_argument("--partitions", type=int, default=None)
    p.add_argument("--cores", type=int,
                   default=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    args = p.parse_args()

    from pyspark.sql import functions as F

    from chunksilo_spark.operators import incremental as incr
    from chunksilo_spark.plans.pipeline import apply_increment
    from chunksilo_spark.session import get_spark
    from chunksilo_spark.sources.corpus import aliases_df
    from chunksilo_spark.sources.storage import TableStore

    spark = get_spark("chunksilo_incremental", cores=args.cores)
    pages = spark.read.parquet(args.pages)
    aliases = (
        spark.read.parquet(args.aliases) if args.aliases else aliases_df(spark)
    )

    store = TableStore(args.state)
    state = store.read(spark, "documents").select("url", "content_md5")
    snap = incr.with_content_hash(pages).select("url", "content_md5")
    counts = {
        r["change"]: r["n"]
        for r in incr.change_log(snap, state)
        .groupBy("change").agg(F.count(F.lit(1)).alias("n")).collect()
    }

    t0 = time.time()
    tables = apply_increment(
        spark, pages, aliases, args.state,
        fingerprint=args.fingerprint, partitions=args.partitions,
    )
    summary = {
        "changes": counts,
        "wall_s": round(time.time() - t0, 2),
        "tables": {name: tables[name].count() for name in
                   ("documents", "chunks", "triples", "nodes", "edges")},
        "state_dir": args.state,
        "fingerprint": args.fingerprint,
    }
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
