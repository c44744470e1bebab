"""Long-lived search service over the materialized pipeline tables — the
reference's MCP server surface (server.py:61-71 exposes ``search_docs`` as a
persistent tool) as a line-delimited JSON loop on stdio, the same transport
shape MCP stdio servers use, with zero extra dependencies.

One SparkSession and one set of cached tables serve every request (the
"load index once, search many" lifecycle — reference search.py:950-971);
per-request work is just the search DAG.

    spark-submit --py-files chunksilo_spark.zip scripts/serve.py <tables_dir>

Protocol (one JSON object per line):
  -> {"id": 1, "method": "search_docs",
      "params": {"query": "...", "date_from": null, "date_to": null}}
  <- {"id": 1, "result": {...reference §1.1 result dict...}}
  -> {"id": 2, "method": "ping"}          <- {"id": 2, "result": "pong"}
  -> {"id": 3, "method": "shutdown"}      <- {"id": 3, "result": "bye"}
Unknown methods / bad JSON return {"id": ..., "error": "..."} and the loop
continues (a serving process must never die on one bad request).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from chunksilo_spark.plans.search_api import run_search
    from chunksilo_spark.session import get_spark
    from chunksilo_spark.sources.storage import TableStore

    tables_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/chunksilo_tables"
    spark = get_spark("chunksilo_serve", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    store = TableStore(tables_dir)
    documents = store.read(spark, "documents").cache()
    chunks = store.read(spark, "chunks").cache()
    documents.count(), chunks.count()  # materialize the cache up front
    sys.stderr.write(f"chunksilo_serve ready on {tables_dir}\n")
    sys.stderr.flush()

    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        rid = None
        try:
            req = json.loads(line)
            rid = req.get("id")
            method = req.get("method")
            if method == "ping":
                resp = {"id": rid, "result": "pong"}
            elif method == "shutdown":
                print(json.dumps({"id": rid, "result": "bye"}), flush=True)
                break
            elif method == "search_docs":
                p = req.get("params", {})
                result = run_search(
                    documents,
                    chunks,
                    p.get("query", ""),
                    date_from=p.get("date_from"),
                    date_to=p.get("date_to"),
                )
                resp = {"id": rid, "result": result}
            else:
                resp = {"id": rid, "error": f"unknown method: {method!r}"}
        except Exception as e:  # keep serving
            resp = {"id": rid, "error": f"{type(e).__name__}: {e}"}
        print(json.dumps(resp), flush=True)

    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
