"""Per-query isolation bench (guide §1.4): times individual declared
queries with the noop sink in ONE session, optionally repeats, optionally
captures .explain("formatted") to plans/r06/.

Usage:
  python bench_extra.py q1 q2 ...            # time the named queries
  python bench_extra.py --repeat 3 q1        # min over repeats
  python bench_extra.py --plan before q1     # also write plans/r06/q1_before.txt
  python bench_extra.py --all                # every bench.HEADLINE query

Prints one JSON line {"queries": {name: sec}, "repeats": n}.
This file is auxiliary evidence only; bench.py stays the frozen driver.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

_REPO = os.path.dirname(os.path.abspath(__file__))


def main() -> None:
    argv = sys.argv[1:]
    repeat = 1
    plan_tag = None
    names: list[str] = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--repeat":
            repeat = int(argv[i + 1])
            i += 2
        elif a == "--plan":
            plan_tag = argv[i + 1]
            i += 2
        elif a == "--all":
            import bench

            names.extend(bench.HEADLINE)
            i += 1
        else:
            names.append(a)
            i += 1

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import __spark_entry__ as em
    from chunksilo_spark.session import get_spark

    spark = get_spark("bench_extra", cores=cores)
    qs = em.queries()
    # same warmups as bench.py so numbers are comparable
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").groupBy(
        "l_returnflag"
    ).count().write.format("noop").mode("overwrite").save()
    spark.range(0, 256, numPartitions=int(spark.conf.get(
        "spark.sql.shuffle.partitions", "32"
    ))).mapInPandas(lambda it: it, schema="id long").write.format(
        "noop"
    ).mode("overwrite").save()

    times: dict[str, float] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        samples = []
        for _ in range(repeat):
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            samples.append(round(time.time() - t0, 3))
        times[name] = min(samples)
        if repeat > 1:
            times[f"{name}__samples"] = samples  # type: ignore[assignment]
        if plan_tag:
            os.makedirs(os.path.join(_REPO, "plans", "r06"), exist_ok=True)
            import contextlib
            import io

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                qs[name](spark, sf_dir).explain("formatted")
            with open(
                os.path.join(_REPO, "plans", "r06", f"{name}_{plan_tag}.txt"),
                "w",
            ) as f:
                f.write(buf.getvalue())
        spark.sparkContext.setJobDescription(None)

    print(json.dumps({"queries": times, "repeats": repeat}))
    spark.stop()


if __name__ == "__main__":
    main()
