"""CLI search over materialized pipeline tables (reference: `chunksilo
"query" [--date-from --date-to]`, cli.py:100-110).

    python scripts/search.py --tables /path/to/out_dir "your query" \
        [--date-from 2024-01-01] [--date-to 2025-01-01]

Prints the reference's §1.1 result schema as JSON. The MCP-server analog
(reference server.py) is this same function behind any RPC layer — the
result dict is the wire schema.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("query")
    p.add_argument("--tables", required=True, help="pipeline output dir")
    p.add_argument("--date-from", default=None)
    p.add_argument("--date-to", default=None)
    p.add_argument("--cores", type=int, default=8)
    args = p.parse_args()

    from chunksilo_spark.plans.search_api import run_search
    from chunksilo_spark.session import get_spark

    spark = get_spark("chunksilo_spark_search", cores=args.cores)
    documents = spark.read.parquet(f"{args.tables}/documents")
    chunks = spark.read.parquet(f"{args.tables}/chunks")
    res = run_search(
        documents, chunks, args.query,
        date_from=args.date_from, date_to=args.date_to,
    )
    print(json.dumps(res, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
