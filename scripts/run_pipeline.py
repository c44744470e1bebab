"""spark-submit entrypoint for the KG construction pipeline.

    spark-submit --py-files chunksilo_spark.zip scripts/run_pipeline.py \
        --pages  /path/to/pages_parquet \
        --out    /path/to/output_tables \
        [--aliases /path/to/aliases_parquet]  (default: built-in dictionary)
        [--fingerprint v1] [--no-resume] [--partitions N]

Runs the staged, resumable extract -> link -> canonicalize -> materialize
DAG (plans/pipeline.py) and prints a one-line JSON summary. On a cluster,
pass the package zip via --py-files (chunksilo_spark.session.package_zip()
builds it); in local testing the repo root on PYTHONPATH suffices.
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
    p.add_argument("--pages", required=True, help="pages parquet path")
    p.add_argument("--out", required=True, help="output tables directory")
    p.add_argument("--aliases", default=None,
                   help="aliases parquet (entity_id, alias, embedding); "
                        "default: the built-in synthetic dictionary")
    p.add_argument("--fingerprint", default="v1")
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--partitions", type=int, default=None)
    p.add_argument("--link-graph", action="store_true",
                   help="also materialize outlinks/web_edges/web_rank")
    args = p.parse_args()

    from pyspark.sql import SparkSession

    from chunksilo_spark.plans.pipeline import run_pipeline
    from chunksilo_spark.sources.corpus import aliases_df

    # under spark-submit the session/master come from the submit args;
    # getOrCreate picks them up instead of forcing local[k]
    spark = SparkSession.builder.appName("chunksilo_spark_pipeline").getOrCreate()

    pages = spark.read.parquet(args.pages)
    aliases = (
        spark.read.parquet(args.aliases) if args.aliases else aliases_df(spark)
    )

    t0 = time.time()
    tables = run_pipeline(
        spark, pages, aliases, args.out,
        fingerprint=args.fingerprint,
        resume=not args.no_resume,
        partitions=args.partitions,
        link_graph=args.link_graph,
    )
    summary = {
        "wall_s": round(time.time() - t0, 2),
        "out": args.out,
        "n_documents": tables["documents"].count(),
        "n_quarantined": tables["quarantine"].count(),
        "n_triples": tables["triples"].count(),
        "n_nodes": tables["nodes"].count(),
        "n_edges": tables["edges"].count(),
    }
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
