"""spark-submit entrypoint: one-pass corpus profile from the sketch family.

    spark-submit --py-files chunksilo_spark.zip scripts/profile_corpus.py \
        --table    /path/to/documents_parquet \
        [--id-col doc_id] [--text-col text] [--group-col lang]
        [--value-col n_chars] [--cores 8]

The standing questions a 100 TB curation run asks before anything else —
how many docs, what group mixture, which values dominate, how is size
distributed, give me a stable sample — answered with the deterministic
sketch operators (KMV / Count-Min / histogram quantiles / bottom-k), so
two runs over the same table print the SAME JSON line and a profile can
be diffed across crawl snapshots. Every number here is the same pinned
algebra the driver oracle checks (sketches.py); this script is just the
productized composition.

Cost shape: each section is one or two map-side-combinable aggregations;
nothing corpus-sized reaches the driver (the printed JSON is bounded by
k / n_bins / group cardinality).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_profile(
    df,
    id_col: str,
    text_col: str | None,
    group_col: str | None,
    value_col: str | None,
) -> dict:
    from pyspark.sql import functions as F

    from chunksilo_spark.operators.sketches import (
        bottomk_sample,
        cm_heavy_hitters,
        histogram_quantiles,
        kmv_distinct,
    )

    profile: dict = {"n_rows": df.count()}
    if group_col:
        profile["group_mixture"] = {
            r[group_col]: r["n"]
            for r in df.groupBy(group_col)
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        profile["distinct_ids_per_group"] = {
            r[group_col]: r["est_distinct"]
            for r in kmv_distinct(df, [group_col], id_col, k=32).collect()
        }
        profile["heavy_hitters"] = [
            {"value": r["value"], "est_count": r["est_count"]}
            for r in cm_heavy_hitters(df, group_col, k=10).orderBy(
                "rank"
            ).collect()
        ]
        profile["sample_ids"] = {
            r[group_col]: r[id_col]
            for r in bottomk_sample(df, [group_col], id_col, k=1).collect()
        }
    if value_col:
        profile["value_quantiles"] = [
            {"q": r["quantile"], "est": r["est_q"]}
            for r in histogram_quantiles(
                df.withColumn("_all", F.lit(1)),
                ["_all"],
                value_col,
                quantiles=[0.5, 0.9, 0.99],
                n_bins=64,
            ).orderBy("quantile").collect()
        ]
    if text_col:
        profile["mean_text_chars"] = round(
            df.agg(F.avg(F.length(text_col))).collect()[0][0] or 0.0, 2
        )
    return profile


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--table", required=True, help="parquet path")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--group-col", default="lang")
    p.add_argument("--value-col", default="n_chars")
    p.add_argument("--cores", type=int, default=8)
    args = p.parse_args()

    from chunksilo_spark.session import get_spark

    spark = get_spark("profile_corpus", cores=args.cores)
    df = spark.read.parquet(args.table)
    cols = set(df.columns)
    profile = build_profile(
        df,
        args.id_col,
        args.text_col if args.text_col in cols else None,
        args.group_col if args.group_col in cols else None,
        args.value_col if args.value_col in cols else None,
    )
    print(json.dumps(profile, sort_keys=True))
    spark.stop()


if __name__ == "__main__":
    main()
