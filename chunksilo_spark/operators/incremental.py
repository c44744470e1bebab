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


def change_log(
    snapshot: DataFrame, state: DataFrame, key: str = "url", hash_col: str = "content_md5"
) -> DataFrame:
    """-> (key, hash_col, change) with change in
    new / modified / unchanged / deleted — ONE full-outer join, so each input
    is scanned once (the previous three-join formulation scanned each side
    4x, and at 100 TB the snapshot scan+hash IS the expensive part).

    Presence is tracked with marker literals (not hash nullness), so rows
    with a legitimately-null hash still classify by key presence; a row
    present on both sides where either hash is null gets change = NULL
    (neither provably modified nor provably unchanged), matching the
    null-comparison semantics of the join-based formulation."""
    snap_h = snapshot.select(
        key, F.col(hash_col).alias("snap_hash"), F.lit(True).alias("_in_snap")
    )
    state_h = state.select(
        key, F.col(hash_col).alias("state_hash"), F.lit(True).alias("_in_state")
    )
    j = snap_h.join(state_h, key, "full_outer")
    change = (
        F.when(F.col("_in_state").isNull(), F.lit("new"))
        .when(F.col("_in_snap").isNull(), F.lit("deleted"))
        .when(F.col("snap_hash") != F.col("state_hash"), F.lit("modified"))
        .when(F.col("snap_hash") == F.col("state_hash"), F.lit("unchanged"))
    )
    return j.select(
        key,
        F.coalesce("snap_hash", "state_hash").alias(hash_col),
        change.alias("change"),
    )


def classify_changes(
    snapshot: DataFrame, state: DataFrame, key: str = "url", hash_col: str = "content_md5"
) -> dict[str, DataFrame]:
    """-> {'new', 'modified', 'unchanged', 'deleted'} DataFrames — filters
    over the single-scan ``change_log`` (use change_log directly when all
    classes are consumed together; each dict entry re-plans the join)."""
    log = change_log(snapshot, state, key, hash_col)
    return {
        label: log.where(F.col("change") == label).select(key, hash_col)
        for label in ("new", "modified", "unchanged", "deleted")
    }


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
    frontier = (
        change_log(snap, state)
        .where(F.col("change").isin("new", "modified"))
        .select("url")
    )
    return snap.join(frontier, "url")
