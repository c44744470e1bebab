"""Streaming sessionization: streamed == batch rebuild, replay
idempotence, sessions spanning micro-batch boundaries."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from chunksilo_spark.operators.temporal import sessionize
from chunksilo_spark.streaming.sessions import (
    merged_sessions,
    start_session_maintenance,
)

SCHEMA = "user_id string, ts timestamp"
BASE = 1_700_000_000
GAP = 300


def _ts(ep):
    return dt.datetime.fromtimestamp(ep, dt.timezone.utc)


def _all_rows():
    rows = []
    for u in range(4):
        # bursts of 6 events 60 s apart, silences of 2000 s between
        # bursts; offsets differ per user
        for burst in range(3):
            t0 = BASE + u * 7 + burst * 2000
            rows.extend((f"u{u}", _ts(t0 + i * 60)) for i in range(6))
    return rows


def _rollup(df):
    return sorted(
        (
            r["user_id"], r["session_idx"], r["n_events"],
            r["start_ep"], r["end_ep"], r["duration_s"],
        )
        for r in df.collect()
    )


class TestStreamingSessions:
    def test_streamed_equals_batch_rebuild_across_batch_splits(
        self, spark, tmp_path
    ):
        src = str(tmp_path / "src")
        out = str(tmp_path / "out")
        rows = _all_rows()
        # split MID-SESSION: each burst's first half lands in file 1,
        # second half in file 2 -> segments must gap-merge across
        # micro-batches to reproduce the batch sessions
        first = [r for i, r in enumerate(rows) if i % 6 < 3]
        second = [r for i, r in enumerate(rows) if i % 6 >= 3]
        spark.createDataFrame(first, SCHEMA).coalesce(4).write.mode(
            "append"
        ).parquet(src)
        spark.createDataFrame(second, SCHEMA).coalesce(4).write.mode(
            "append"
        ).parquet(src)

        q = start_session_maintenance(
            spark, src, out, str(tmp_path / "c1"), GAP, SCHEMA
        )
        q.awaitTermination(120)

        got = _rollup(merged_sessions(spark, out, GAP))
        want = _rollup(
            sessionize(spark.createDataFrame(rows, SCHEMA), GAP)
        )
        assert got == want
        # and the sessions really did span batches: more segments than
        # merged sessions
        n_seg = spark.read.parquet(f"{out}/session_segments").count()
        assert n_seg > len(got)

    def test_replay_overwrites_not_double_counts(self, spark, tmp_path):
        src = str(tmp_path / "src")
        out = str(tmp_path / "out")
        rows = _all_rows()
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)

        q = start_session_maintenance(
            spark, src, out, str(tmp_path / "c1"), GAP, SCHEMA
        )
        q.awaitTermination(120)
        want = _rollup(merged_sessions(spark, out, GAP))

        # replay from a FRESH checkpoint: batch ids restart, partitions
        # overwrite, the merged view must not change
        q2 = start_session_maintenance(
            spark, src, out, str(tmp_path / "c2"), GAP, SCHEMA
        )
        q2.awaitTermination(120)
        assert _rollup(merged_sessions(spark, out, GAP)) == want
        total = merged_sessions(spark, out, GAP).agg(
            F.sum("n_events")
        ).collect()[0][0]
        assert total == len(rows)

    def test_out_of_order_batches_overlapping_segments(
        self, spark, tmp_path
    ):
        src = str(tmp_path / "src")
        out = str(tmp_path / "out")
        rows = _all_rows()
        # late data: the SECOND file delivered contains the EARLIER
        # half of every burst, producing overlapping segments the
        # running-max merge must absorb
        early = [r for i, r in enumerate(rows) if i % 2 == 0]
        late = [r for i, r in enumerate(rows) if i % 2 == 1]
        spark.createDataFrame(early, SCHEMA).coalesce(4).write.mode(
            "append"
        ).parquet(src)
        spark.createDataFrame(late, SCHEMA).coalesce(4).write.mode(
            "append"
        ).parquet(src)

        q = start_session_maintenance(
            spark, src, out, str(tmp_path / "c1"), GAP, SCHEMA
        )
        q.awaitTermination(120)

        got = _rollup(merged_sessions(spark, out, GAP))
        want = _rollup(
            sessionize(spark.createDataFrame(rows, SCHEMA), GAP)
        )
        assert got == want
