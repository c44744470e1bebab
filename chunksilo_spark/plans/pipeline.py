"""The extract -> link -> canonicalize -> materialize DAG with
checkpointed, resumable stage boundaries (north-star stage 4).

Each stage writes its output table + per-partition lineage rows, then marks
the stage complete in the store manifest keyed by an input fingerprint.
A resumed run (same fingerprint) reads the materialized table instead of
recomputing — the reference's "run again to continue" semantics
(index.py:1681-1696) at stage granularity. Killing the job between stages
and rerunning produces byte-identical final tables (tested).

Stage graph:
    pages ──1──> documents ──┬──> chunks                      (retrieval surface)
                             ├──2──> mentions ──> linked
                             └──3──> raw_triples ─┐
    linked ──(distinct surfaces)──> canon_map ────┴──> triples
    triples ──4──> nodes, edges, lineage
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import canon as canon_ops
from ..operators import stage1_extract as s1
from ..operators import stage2_link as s2
from ..operators import stage3_triples as s3
from ..sources.storage import TableStore
from .lineage import partition_lineage


def _materialize(
    store: TableStore,
    spark: SparkSession,
    stage: str,
    table: str,
    fingerprint: str,
    build,
    key_col: str,
    resume: bool = True,
) -> DataFrame:
    """Run one resumable stage: build -> write table + lineage -> mark."""
    if resume and store.stage_complete(stage, fingerprint) and store.exists(table):
        return store.read(spark, table)
    t0 = time.time()
    df = build()
    store.write(df, table)
    out = store.read(spark, table)
    lineage = partition_lineage(out, stage, key_col)
    lineage.write.mode("append").parquet(store.path("lineage"))
    store.mark_complete(
        stage, fingerprint, table=table, wall_s=round(time.time() - t0, 3)
    )
    return out


def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    aliases: DataFrame,
    out_dir: str,
    fingerprint: str = "v1",
    resume: bool = True,
    partitions: int | None = None,
) -> dict[str, DataFrame]:
    """Run all four stages; returns the materialized DataFrames by name."""
    store = TableStore(out_dir)

    documents = _materialize(
        store, spark, "stage1_extract", "documents", fingerprint,
        lambda: s1.extract_documents(pages, partitions), "url", resume,
    )
    # chunks carry their embeddings: this table IS the vector index
    # (the reference's persisted VectorStoreIndex, SURVEY §1.3) — query it
    # with operators/retrieval.search_index
    from ..operators.retrieval import chunks_with_embeddings

    chunks = _materialize(
        store, spark, "stage1_chunk", "chunks", fingerprint,
        lambda: chunks_with_embeddings(documents), "url", resume,
    )
    quarantined = _materialize(
        store, spark, "stage1_quarantine", "quarantine", fingerprint,
        lambda: s1.quarantine(documents), "url", resume,
    )

    alias_bc = s2.build_alias_broadcast(spark, aliases)
    mentions = _materialize(
        store, spark, "stage2_mentions", "mentions", fingerprint,
        lambda: s2.detect_mentions(documents), "url", resume,
    )
    linked = _materialize(
        store, spark, "stage2_linked", "linked_mentions", fingerprint,
        lambda: s2.link_mentions(mentions, alias_bc), "url", resume,
    )

    raw_triples = _materialize(
        store, spark, "stage3_raw_triples", "raw_triples", fingerprint,
        lambda: s3.extract_raw_triples(documents), "url", resume,
    )
    # canonicalize over dictionary aliases ∪ linked mention surfaces
    def build_canon():
        from ..functions.triples import normalize_surface
        import pandas as pd
        from typing import Iterator

        def norm_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                yield pd.DataFrame(
                    {"norm": [normalize_surface(s) for s in pdf["s"]]}
                )

        surfaces = (
            aliases.select(F.col("alias").alias("s"))
            .unionByName(linked.select(F.col("surface").alias("s")))
            .distinct()
            .mapInPandas(norm_batch, schema="norm string")
            .distinct()
        )
        return canon_ops.canon_map(surfaces)

    canon = _materialize(
        store, spark, "stage3_canon", "canon_map", fingerprint,
        build_canon, "norm", resume,
    )

    triples = _materialize(
        store, spark, "stage3_triples", "triples", fingerprint,
        lambda: s3.canonical_triples(
            raw_triples, s3.linked_surfaces(linked), canon
        ),
        "url", resume,
    )

    nodes = _materialize(
        store, spark, "stage4_nodes", "nodes", fingerprint,
        lambda: _build_nodes(triples), "canon_id", resume,
    )
    edges = _materialize(
        store, spark, "stage4_edges", "edges", fingerprint,
        lambda: _build_edges(triples), "subj_canon_id", resume,
    )

    return {
        "documents": documents,
        "chunks": chunks,
        "quarantine": quarantined,
        "mentions": mentions,
        "linked": linked,
        "raw_triples": raw_triples,
        "canon_map": canon,
        "triples": triples,
        "nodes": nodes,
        "edges": edges,
        "lineage": spark.read.parquet(store.path("lineage")),
    }


def _build_nodes(triples: DataFrame) -> DataFrame:
    """Distinct canonical entities with mention statistics."""
    subj = triples.select(
        F.col("subj_canon_id").alias("canon_id"),
        F.col("subj_canon").alias("canon_surface"),
        F.col("url"),
    )
    obj = triples.select(
        F.col("obj_canon_id").alias("canon_id"),
        F.col("obj_canon").alias("canon_surface"),
        F.col("url"),
    )
    return (
        subj.unionByName(obj)
        .groupBy("canon_id", "canon_surface")
        .agg(
            F.count(F.lit(1)).alias("n_mentions"),
            F.countDistinct("url").alias("n_urls"),
        )
    )


def _build_edges(triples: DataFrame) -> DataFrame:
    """Aggregated edge table with support counts."""
    return triples.groupBy(
        "subj_canon_id", "subj_canon", "pred", "obj_canon_id", "obj_canon"
    ).agg(
        F.count(F.lit(1)).alias("support"),
        F.countDistinct("url").alias("n_urls"),
    )
