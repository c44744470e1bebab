"""Local stand-in for the driver's correctness gate: run every queries()
entry in Spark AND its oracle_sql() in DuckDB at the given sf dir, compare
row count, column names/types, and order-insensitive values.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canon_rows(cols, rows, exact=False):
    """exact=True reproduces the DRIVER's comparison: floats hash at full
    precision (repr), no 6dp re-round. The default 6dp round is looser
    than the driver — a last-ulp round() divergence passes here and fails
    there (round 4's t_domain_profile red). Run --exact before trusting a
    float-emitting oracle in the driver window."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                elif exact:
                    v = repr(v)
                else:
                    v = round(v, 6)
            elif isinstance(v, (list, tuple)):
                v = tuple(v)
            elif hasattr(v, "isoformat"):
                v = v.isoformat()
            vals.append((str(type(v).__name__) if False else v))
        out.append(tuple(vals))
    out.sort(key=repr)
    return [cols[i] for i in order], out


def run_gate(spark, sf_dir: str, only=None, exact=False) -> list[str]:
    """Run the driver-equivalent oracle gate on an existing SparkSession.

    Returns the list of failing query names (empty == all consistent).
    Pulled out of main() so pytest can run the FULL 63-query surface on the
    shared test session every run — the driver's own CORRECTNESS artifact
    caps at 50 rows, and round 3 proved insertion-order tails can silently
    fall out of that window.
    """
    only = set(only or ())

    import __spark_entry__ as entry_mod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = list(sdf.columns)
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error {e}")
            continue
        ok = True
        if sorted(scols) != sorted(dcols):
            print(f"FAIL  {name}: cols spark={sorted(scols)} duck={sorted(dcols)}")
            ok = False
        elif len(srows) != len(drows):
            print(f"FAIL  {name}: rows spark={len(srows)} duck={len(drows)}")
            ok = False
        else:
            _, sc = canon_rows(scols, srows, exact=exact)
            _, dc = canon_rows(dcols, drows, exact=exact)
            if sc != dc:
                diff = [
                    (a, b) for a, b in zip(sc, dc) if a != b
                ][:3]
                print(f"FAIL  {name}: value mismatch, e.g. {diff}")
                ok = False
        if ok:
            print(f"OK    {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")
        else:
            failures.append(name)
    con.close()
    return failures


def main() -> int:
    argv = [a for a in sys.argv[1:] if a != "--exact"]
    exact = "--exact" in sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    only = set(argv[1:])

    from chunksilo_spark.session import get_spark

    spark = get_spark("oracle_check", cores=8)
    failures = run_gate(spark, sf_dir, only, exact=exact)
    spark.stop()
    if failures:
        print("FAILURES:", failures)
        return 1
    print("all queries consistent")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
