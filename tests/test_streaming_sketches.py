"""Streaming CM maintenance: streamed == batch rebuild, replay idempotence."""

from __future__ import annotations

from pyspark.sql import functions as F

from chunksilo_spark.operators.sketches import cm_build, cm_heavy_hitters
from chunksilo_spark.streaming.sketches import (
    merged_heavy_hitters,
    merged_sketch,
    start_cm_maintenance,
)

SCHEMA = "id long, v string"


def _rows(spark, lo, hi):
    return spark.createDataFrame(
        [(i, f"u{i % 23}") for i in range(lo, hi)], SCHEMA
    )


class TestStreamingSketches:
    def test_streamed_sketch_equals_batch_sketch(self, spark, tmp_path):
        src = str(tmp_path / "src")
        out = str(tmp_path / "out")
        # two source files -> multiple micro-batches (maxFilesPerTrigger=4
        # caps per batch; two writes guarantee >= 1 batch each)
        _rows(spark, 0, 300).coalesce(2).write.mode("append").parquet(src)
        _rows(spark, 300, 500).coalesce(2).write.mode("append").parquet(src)

        q = start_cm_maintenance(
            spark, src, out, str(tmp_path / "c1"), "v", SCHEMA, width=32
        )
        q.awaitTermination(120)

        got = sorted(
            (r["salt"], r["b"], r["c"])
            for r in merged_sketch(spark, out).collect()
        )
        want = sorted(
            (r["salt"], r["b"], r["c"])
            for r in cm_build(_rows(spark, 0, 500), "v", width=32).collect()
        )
        assert got == want

    def test_heavy_hitters_from_maintained_sketch(self, spark, tmp_path):
        src = str(tmp_path / "src")
        out = str(tmp_path / "out")
        all_rows = _rows(spark, 0, 400)
        all_rows.coalesce(2).write.mode("append").parquet(src)

        q = start_cm_maintenance(
            spark, src, out, str(tmp_path / "c1"), "v", SCHEMA, width=32
        )
        q.awaitTermination(120)

        cand = all_rows.select(F.col("v").alias("value")).distinct()
        got = sorted(
            (r["value"], r["est_count"], r["rank"])
            for r in merged_heavy_hitters(
                spark, out, cand, k=10, width=32
            ).collect()
        )
        want = sorted(
            (r["value"], r["est_count"], r["rank"])
            for r in cm_heavy_hitters(all_rows, "v", k=10, width=32).collect()
        )
        assert got == want

    def test_replay_overwrites_not_double_counts(self, spark, tmp_path):
        src = str(tmp_path / "src")
        out = str(tmp_path / "out")
        _rows(spark, 0, 200).coalesce(1).write.mode("append").parquet(src)

        q = start_cm_maintenance(
            spark, src, out, str(tmp_path / "c1"), "v", SCHEMA, width=32
        )
        q.awaitTermination(120)
        total1 = merged_sketch(spark, out).agg(F.sum("c")).collect()[0][0]

        # fresh checkpoint replays every file into the same batch_ids
        q = start_cm_maintenance(
            spark, src, out, str(tmp_path / "c2"), "v", SCHEMA, width=32
        )
        q.awaitTermination(120)
        total2 = merged_sketch(spark, out).agg(F.sum("c")).collect()[0][0]
        assert total1 == total2 == 200 * 3  # rows x depth, counted once


class TestStreamingKmv:
    def test_streamed_kmv_equals_batch_sketch(self, spark, tmp_path):
        from chunksilo_spark.operators.sketches import kmv_distinct
        from chunksilo_spark.streaming.sketches import (
            merged_kmv,
            start_kmv_maintenance,
        )

        src = str(tmp_path / "src")
        out = str(tmp_path / "out")
        rows = spark.createDataFrame(
            [(i, f"g{i % 2}", i * 3 % 200) for i in range(600)],
            "id long, g string, v long",
        )
        # two appends -> multiple micro-batches with overlapping values
        rows.where("id < 300").coalesce(2).write.mode("append").parquet(src)
        rows.where("id >= 300").coalesce(2).write.mode("append").parquet(src)

        q = start_kmv_maintenance(
            spark, src, out, str(tmp_path / "c1"), "g", "v",
            "id long, g string, v long", k=16,
        )
        q.awaitTermination(120)

        got = sorted(
            (r["g"], r["n_kept"], r["est_distinct"])
            for r in merged_kmv(spark, out, "g", k=16).collect()
        )
        want = sorted(
            (r["g"], r["n_kept"], r["est_distinct"])
            for r in kmv_distinct(rows, ["g"], "v", k=16).collect()
        )
        assert got == want
