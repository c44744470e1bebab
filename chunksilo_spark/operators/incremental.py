"""Batch-incremental change detection (reference index.py:1491-1544).

The reference classifies scanned files vs the SQLite ledger into
new / modified / deleted, then deletes removed docs and re-ingests changed
ones. Distributed form: three joins between the new snapshot and the state
table (SURVEY §2.3 J1/J2) — anti-joins and an inner join with a hash
inequality; the cheap columns (url, content hash) are compared BEFORE any
expensive UDF runs (the mtime fast-path analog, index.py:816-824).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def classify_changes(
    snapshot: DataFrame, state: DataFrame, key: str = "url", hash_col: str = "content_md5"
) -> dict[str, DataFrame]:
    """-> {'new', 'modified', 'unchanged', 'deleted'} DataFrames.

    snapshot/state: (key, hash_col, ...). new = in snapshot only; modified =
    both but hash differs; deleted = in state only (J1/J2)."""
    snap_h = snapshot.select(key, F.col(hash_col).alias("snap_hash"))
    state_h = state.select(key, F.col(hash_col).alias("state_hash"))
    new = snap_h.join(state_h, key, "left_anti").select(key, F.col("snap_hash").alias(hash_col))
    joined = snap_h.join(state_h, key)
    modified = joined.where(F.col("snap_hash") != F.col("state_hash")).select(
        key, F.col("snap_hash").alias(hash_col)
    )
    unchanged = joined.where(F.col("snap_hash") == F.col("state_hash")).select(
        key, F.col("snap_hash").alias(hash_col)
    )
    deleted = state_h.join(snap_h, key, "left_anti").select(
        key, F.col("state_hash").alias(hash_col)
    )
    return {"new": new, "modified": modified, "unchanged": unchanged, "deleted": deleted}


def with_content_hash(pages: DataFrame, bin_col: str = "html") -> DataFrame:
    """MD5 of the raw bytes (reference streaming-MD5, index.py:827-833 —
    F.md5 yields the identical digest, computed JVM-side)."""
    return pages.withColumn("content_md5", F.md5(F.col(bin_col)))


def incremental_plan(
    snapshot_pages: DataFrame, state: DataFrame
) -> DataFrame:
    """Rows of ``snapshot_pages`` that actually need (re)processing —
    new ∪ modified, by url+content hash. The expensive stage-1 UDF only ever
    sees this frontier (the reference's 'skip unchanged' fast path)."""
    snap = with_content_hash(snapshot_pages)
    changes = classify_changes(snap, state)
    frontier = changes["new"].unionByName(changes["modified"]).select("url")
    return snap.join(frontier, "url")
