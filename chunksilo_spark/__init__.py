"""chunksilo_spark — a PySpark-native knowledge-graph construction engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference indexer (Chetic/chunksilo): distributed
extract -> link -> canonicalize -> materialize over web-page tables, plus the
retrieval operator surface (top-k vector search, BM25, recency boost, date
filters) expressed as DataFrame queries.

Layout:
    functions/   pure-Python + vectorized semantic kernels shared by the
                 pytest oracle (driver) and Arrow UDFs (executors)
    sources/     deterministic corpus synthesis + table storage abstraction
    operators/   the Spark operators (stages 1-4, dedup, similarity, ...)
    plans/       pipeline driver: stage manifest, lineage, resume
"""

__version__ = "0.1.0"
