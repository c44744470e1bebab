"""Distributed k-means: python-twin parity, blob recovery, semdedup seam."""

from __future__ import annotations

import pytest

from chunksilo_spark.operators.clustering import fit_kmeans, kmeans_assign


def _blob_rows(n_per=40, dim=8):
    """3 well-separated blobs with deterministic jitter, ids interleaved
    across blobs so the seed take mixes blobs."""
    rows = []
    centers = [[0.0] * dim, [10.0] * dim, [-10.0] * dim]
    for i in range(3 * n_per):
        blob = i % 3
        jit = [((i * 7 + j * 13) % 11 - 5) / 10.0 for j in range(dim)]
        rows.append((i, [centers[blob][j] + jit[j] for j in range(dim)]))
    return rows


def _python_kmeans(rows, k, iters):
    rows = sorted(rows)
    cents = [[float(x) for x in v] for _, v in rows[:k]]

    def dists(v):
        return [
            round(sum((x - y) * (x - y) for x, y in zip(v, c)), 6)
            for c in cents
        ]

    for _ in range(iters):
        agg = {}
        for _, v in rows:
            ds = dists(v)
            cl = ds.index(min(ds))
            s, n = agg.setdefault(cl, ([0.0] * len(v), 0))
            for j, x in enumerate(v):
                s[j] += x
            agg[cl] = (s, n + 1)
        new = [list(c) for c in cents]
        for cl, (s, n) in agg.items():
            new[cl] = [round(x / n, 6) for x in s]
        cents = new
    out = {}
    for i, v in rows:
        ds = dists(v)
        m = min(ds)
        out[i] = (ds.index(m), m)
    return out


class TestKmeans:
    def _run(self, spark, rows, k, iters):
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        got = kmeans_assign(df, k=k, iters=iters)
        return {r["vec_id"]: (r["cluster_id"], r["dist"]) for r in got.collect()}

    def test_matches_python_twin_across_iteration_counts(self, spark):
        rows = _blob_rows()
        for iters in (0, 1, 3):
            assert self._run(spark, rows, 3, iters) == _python_kmeans(
                rows, 3, iters
            ), iters

    def test_separated_blobs_recovered(self, spark):
        rows = _blob_rows()
        got = self._run(spark, rows, 3, iters=3)
        by_blob = {}
        for i, _ in rows:
            by_blob.setdefault(i % 3, set()).add(got[i][0])
        # every blob maps to exactly one label, and the labels differ
        assert all(len(s) == 1 for s in by_blob.values())
        assert len(set.union(*by_blob.values())) == 3

    def test_empty_cluster_keeps_seed_centroid(self, spark):
        # 12 copies of 2 distinct points, k=4: two clusters go empty and
        # must keep their (duplicate) seed centroids without crashing
        rows = [(i, [float(i % 2)] * 4) for i in range(12)]
        got = self._run(spark, rows, 4, iters=2)
        assert set(got) == set(range(12))
        assert all(d == 0.0 for _, d in got.values())

    def test_fit_returns_k_by_d_matrix(self, spark):
        df = spark.createDataFrame(
            _blob_rows(), "vec_id long, embedding array<double>"
        )
        cents = fit_kmeans(df, k=3, iters=2)
        assert len(cents) == 3 and all(len(c) == 8 for c in cents)

    def test_semdedup_cluster_col_seam(self, spark):
        from chunksilo_spark.operators.dedup import semdedup

        rows = _blob_rows(n_per=10)
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        clustered = df.join(
            kmeans_assign(df, k=3, iters=2).select("vec_id", "cluster_id"),
            "vec_id",
        )
        out = semdedup(clustered, threshold=0.999, cluster_col="cluster_id")
        labels = {r["vec_id"]: r for r in out.collect()}
        assert set(labels) == {i for i, _ in rows}
        # survivors exist in every k-means cluster
        kept_clusters = {
            r["cluster_id"] for r in labels.values() if r["keep"]
        }
        assert len(kept_clusters) == 3

    def test_bad_params_raise(self, spark):
        df = spark.createDataFrame(
            [(1, [1.0])], "vec_id long, embedding array<double>"
        )
        with pytest.raises(ValueError):
            kmeans_assign(df, k=0)
        with pytest.raises(ValueError):
            fit_kmeans(df.where("vec_id < 0"), k=2)
