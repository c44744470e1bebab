"""Paired window-vs-partial sketch benchmark (round-5 VERDICT item 7).

Measures kmv_distinct and bottomk_sample at sf0.1 under both methods as
INTERLEAVED pairs (this host drifts ±30% over minutes — only
back-to-back ratios mean anything, see BENCH/BASELINE.md §3) and prints
one JSON line. The partial path must be <= the window path (ratio <= ~1
within noise): its per-batch pandas heaps shrink every partition to
k rows per group before the shuffle, so the exchange moves sketch-sized
state instead of the distinct-value universe.

Usage: python scripts/bench_sketch_methods.py [sf_dir] [repeats]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pyspark.sql import functions as F

    from chunksilo_spark.operators import sketches as sk
    from chunksilo_spark.session import get_spark

    replicate = int(os.environ.get("BENCH_SKETCH_REPLICATE", "128"))

    spark = get_spark("bench_sketch_methods", cores=32)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # The partial path's claim is about SHUFFLE VOLUME: the window path
    # exchanges every (map-side-)distinct value, the partial path <= k
    # rows per group per partition. At the raw sf0.1 row count (~60k)
    # both shuffles fit in L2 and host noise (±30%) decides the ratio —
    # so replicate the sf0.1 ids into a high-cardinality long relation
    # (~60k x replicate rows, all values distinct, 16 groups): the
    # regime a 10^12-row corpus actually lives in, where the exchange
    # is the cost. No external data: everything derives from the sf dir.
    rows = (
        docs.select("doc_id")
        .withColumn("_r", F.explode(F.sequence(F.lit(0), F.lit(replicate - 1))))
        .select(
            (F.col("doc_id") % 16).cast("string").alias("grp"),
            (F.col("doc_id") * replicate + F.col("_r")).alias("v"),
        )
        .withColumn("id", F.col("v").cast("string"))
    )
    n_rows = rows.count()  # also warms cache/codegen

    def run(fn) -> float:
        t0 = time.time()
        fn().write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    cases = {
        "kmv_distinct": lambda m: sk.kmv_distinct(
            rows, ["grp"], "v", k=64, method=m
        ),
        "bottomk_sample": lambda m: sk.bottomk_sample(
            rows, ["grp"], "id", k=64, method=m
        ),
    }
    out = {"sf_dir": sf_dir, "n_rows": n_rows, "repeats": repeats, "cases": {}}
    for name, make in cases.items():
        run(lambda: make("window"))  # one unmeasured warmup pair
        run(lambda: make("partial"))
        pairs = []
        for _ in range(repeats):
            w = run(lambda: make("window"))
            p = run(lambda: make("partial"))
            pairs.append((w, p, round(p / w, 3)))
        ratios = sorted(r for _, _, r in pairs)
        out["cases"][name] = {
            "pairs_window_partial_ratio": pairs,
            "median_partial_over_window": ratios[len(ratios) // 2],
        }
    spark.stop()
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
