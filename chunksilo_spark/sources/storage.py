"""Table storage abstraction: Iceberg when a catalog is configured, parquet
directories otherwise (SURVEY §7.4 risk 2 — no Iceberg jars in this sandbox).

The features the pipeline relies on (atomic stage commit, resumable state,
snapshot-style change detection) have parquet-dir equivalents implemented
here: each write goes to the final path via Spark's own atomic rename
protocol, and stage completion is recorded in a JSON manifest written
atomically (tmp + os.replace). On a real cluster, set
``spark.sql.catalog.<name>`` to an Iceberg catalog and pass
``table_format='iceberg'`` — writes become ``writeTo(...).createOrReplace``
and the manifest becomes redundant with Iceberg snapshots (kept anyway for
stage bookkeeping).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession


class TableStore:
    def __init__(self, root: str, table_format: str = "parquet") -> None:
        self.root = root
        self.table_format = table_format
        os.makedirs(root, exist_ok=True)
        self._manifest_path = os.path.join(root, "_manifest.json")

    # -- manifest (the SQLite-ledger analog, reference index.py:314-401) ----
    def manifest(self) -> dict:
        """Unreadable/corrupt manifest degrades to empty (= recompute all
        stages) — a resumable pipeline must never be un-runnable because its
        checkpoint metadata was damaged. Our own writes are atomic
        (tmp + os.replace), so this only triggers on external damage."""
        if os.path.exists(self._manifest_path):
            try:
                with open(self._manifest_path) as f:
                    return json.load(f)
            except (json.JSONDecodeError, OSError) as e:
                import warnings

                warnings.warn(
                    f"corrupt stage manifest {self._manifest_path} "
                    f"({e}); recomputing all stages"
                )
        return {"stages": {}}

    def _write_manifest(self, m: dict) -> None:
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1, sort_keys=True)
        os.replace(tmp, self._manifest_path)

    def stage_complete(self, stage: str, fingerprint: str) -> bool:
        entry = self.manifest()["stages"].get(stage)
        return bool(
            entry
            and entry.get("status") == "complete"
            and entry.get("fingerprint") == fingerprint
        )

    def mark_complete(self, stage: str, fingerprint: str, **meta) -> None:
        m = self.manifest()
        m["stages"][stage] = {
            "status": "complete",
            "fingerprint": fingerprint,
            "completed_at": time.time(),
            **meta,
        }
        self._write_manifest(m)

    # -- tables --------------------------------------------------------------
    def path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def write(self, df: DataFrame, table: str) -> None:
        if self.table_format == "iceberg":
            df.writeTo(table).createOrReplace()
        else:
            df.write.mode("overwrite").parquet(self.path(table))

    # seconds after which another process's swap lock is presumed crashed;
    # a live replace() holds the lock for one directory-rename pair (~ms)
    SWAP_LOCK_STALE_S = 30.0

    def replace(self, df: DataFrame, table: str) -> None:
        """Replace a table whose CURRENT contents feed ``df``'s plan (the
        incremental-apply shape: new = old minus stale plus fresh). A direct
        overwrite would truncate the input mid-read, so: write to a staging
        dir, then swap directories. With Iceberg this is simply
        createOrReplace (snapshot isolation).

        Cross-process safety for the parquet backend: the rename pair runs
        under a ``.__swap_lock`` file that ``_heal`` respects, so a
        concurrent reader (e.g. scripts/serve.py against a dir a streaming
        writer maintains) cannot rename ``.__old`` back mid-swap and break
        the writer's final rename. Multi-WRITER is still out of scope for
        parquet dirs — use the Iceberg backend for that."""
        if self.table_format == "iceberg":
            df.writeTo(table).createOrReplace()
            return
        import shutil

        final = self.path(table)
        staging = final + ".__staging"
        df.write.mode("overwrite").parquet(staging)
        old = final + ".__old"
        if os.path.exists(old):
            shutil.rmtree(old)
        lock = final + ".__swap_lock"
        with open(lock, "w") as f:
            f.write(str(os.getpid()))
        try:
            if os.path.exists(final):
                os.replace(final, old)
            os.replace(staging, final)
        finally:
            if os.path.exists(lock):
                os.remove(lock)
        if os.path.exists(old):
            shutil.rmtree(old)

    def _heal(self, table: str) -> None:
        """Recover from a crash inside replace(): if the final dir is gone
        but the displaced previous version (.__old) survives, restore it —
        the swap window (final renamed away, staging not yet renamed in)
        must never lose the table.

        A FRESH ``.__swap_lock`` means another process is mid-swap right
        now: wait for it instead of healing (renaming ``.__old`` back would
        make the writer's final rename fail with a non-empty target). A
        stale lock is a crashed writer — remove it and heal."""
        final = self.path(table)
        old = final + ".__old"
        lock = final + ".__swap_lock"
        deadline = time.time() + self.SWAP_LOCK_STALE_S
        while os.path.exists(lock):
            try:
                age = time.time() - os.path.getmtime(lock)
            except OSError:  # lock vanished between exists() and getmtime()
                break
            if age >= self.SWAP_LOCK_STALE_S:
                try:
                    os.remove(lock)  # crashed writer
                except OSError:
                    pass
                break
            if time.time() >= deadline:
                break
            time.sleep(0.05)  # live writer: the swap is a ~ms rename pair
        if not os.path.exists(final) and os.path.exists(old):
            os.replace(old, final)

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        if self.table_format == "iceberg":
            return spark.read.table(table)
        self._heal(table)
        return spark.read.parquet(self.path(table))

    def exists(self, table: str, spark: SparkSession | None = None) -> bool:
        if self.table_format == "iceberg":
            spark = spark or SparkSession.getActiveSession()
            if spark is None:
                return False  # can't verify -> force recompute, never lie
            return spark.catalog.tableExists(table)
        self._heal(table)
        return os.path.exists(os.path.join(self.path(table), "_SUCCESS"))
