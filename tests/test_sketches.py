"""KMV distinct-cardinality sketch: formula parity vs a plain-python
re-derivation, exact path under k, and estimator sanity on known
cardinalities."""

import hashlib

import pytest
from pyspark.sql import functions as F

from chunksilo_spark.operators.sketches import kmv_distinct

SPACE = float(1 << 60)


def _h60(v) -> int:
    return int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)


def _python_kmv(pairs, k):
    groups = {}
    for g, v in set(pairs):
        groups.setdefault(g, set()).add(_h60(v))
    out = {}
    for g, hashes in groups.items():
        n = len(hashes)
        if n < k:
            out[g] = (n, round(float(n), 4))
        else:
            hk = sorted(hashes)[k - 1]
            out[g] = (k, round((k - 1) * SPACE / hk, 4))
    return out


class TestKmvDistinct:
    def _run(self, spark, pairs, k):
        df = spark.createDataFrame(pairs, "grp string, v long")
        got = kmv_distinct(df, ["grp"], "v", k=k)
        return {
            r["grp"]: (r["n_kept"], r["est_distinct"]) for r in got.collect()
        }

    def test_matches_python_formula(self, spark):
        pairs = [(f"g{i % 3}", (i * 7) % 50) for i in range(400)]
        for k in (2, 8, 16):
            assert self._run(spark, pairs, k) == _python_kmv(pairs, k), k

    def test_exact_below_k(self, spark):
        pairs = [("a", 1), ("a", 2), ("a", 2), ("b", 9)]
        got = self._run(spark, pairs, 8)
        assert got == {"a": (2, 2.0), "b": (1, 1.0)}

    def test_estimate_within_relative_error(self, spark):
        # 5000 distinct values, k=64 -> ~1/sqrt(64) = 12.5% rel. error;
        # allow 3x slack (deterministic hashes: this never flakes)
        n = 5000
        pairs = [("g", i) for i in range(n)]
        (_, est), = self._run(spark, pairs, 64).values()
        assert abs(est - n) / n < 0.375

    def test_k_below_two_raises(self, spark):
        df = spark.createDataFrame([("a", 1)], "grp string, v long")
        with pytest.raises(ValueError):
            kmv_distinct(df, ["grp"], "v", k=1)

    def test_duplicates_do_not_inflate(self, spark):
        base = [("g", i) for i in range(100)]
        dup = base * 5
        assert self._run(spark, base, 16) == self._run(spark, dup, 16)


def _python_cm(values, k, width, depth):
    buckets = {}
    for v in values:
        for i in range(depth):
            b = _h60(f"cm{i}:{v}") % width
            buckets[(i, b)] = buckets.get((i, b), 0) + 1
    est = {}
    for v in set(values):
        est[v] = min(
            buckets[(i, _h60(f"cm{i}:{v}") % width)] for i in range(depth)
        )
    ranked = sorted(est.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [(v, c, r + 1) for r, (v, c) in enumerate(ranked)]


class TestCmHeavyHitters:
    def _run(self, spark, values, k, width=256, depth=3):
        from chunksilo_spark.operators.sketches import cm_heavy_hitters

        df = spark.createDataFrame([(v,) for v in values], "v string")
        got = cm_heavy_hitters(df, "v", k=k, width=width, depth=depth)
        return sorted(
            (r["value"], r["est_count"], r["rank"]) for r in got.collect()
        )

    def test_matches_python_formula(self, spark):
        values = [f"t{i % 37}" for i in range(500)] + ["hot"] * 80
        for width in (16, 256):
            assert self._run(spark, values, 10, width=width) == sorted(
                _python_cm(values, 10, width, 3)
            ), width

    def test_estimate_never_undercounts(self, spark):
        values = [f"v{i % 50}" for i in range(400)]
        truth = {}
        for v in values:
            truth[v] = truth.get(v, 0) + 1
        got = self._run(spark, values, 50, width=32)
        assert all(c >= truth[v] for v, c, _ in got)

    def test_wide_sketch_is_exact_on_small_universe(self, spark):
        # universe 20 << width 4096: collisions vanish, estimates exact
        values = [f"u{i % 20}" for i in range(300)] + ["top"] * 55
        got = dict((v, c) for v, c, _ in self._run(spark, values, 21, width=4096))
        assert got["top"] == 55
        assert all(c == 15 for v, c in got.items() if v != "top")

    def test_bad_params_raise(self, spark):
        from chunksilo_spark.operators.sketches import cm_heavy_hitters

        df = spark.createDataFrame([("a",)], "v string")
        with pytest.raises(ValueError):
            cm_heavy_hitters(df, "v", depth=0)


def _python_hq(rows, quantiles, n_bins):
    import math

    groups = {}
    for g, v in rows:
        groups.setdefault(g, []).append(v)
    out = []
    for g, vals in groups.items():
        gmin, gmax, n = min(vals), max(vals), len(vals)
        width = (gmax - gmin) / n_bins
        hist = {}
        for v in vals:
            b = (
                0
                if gmax == gmin
                else min(int(math.floor((v - gmin) / width)), n_bins - 1)
            )
            hist[b] = hist.get(b, 0) + 1
        bins = sorted(hist)
        for q in quantiles:
            target = q * n
            cum = 0
            for b in bins:
                c = hist[b]
                cum += c
                if cum >= target:
                    if gmax == gmin:
                        est = float(gmin)
                    else:
                        est = gmin + (b + (target - (cum - c)) / c) * width
                    out.append((g, q, n, round(est, 6)))
                    break
    return sorted(out)


class TestHistogramQuantiles:
    def _run(self, spark, rows, quantiles, n_bins):
        from chunksilo_spark.operators.sketches import histogram_quantiles

        df = spark.createDataFrame(rows, "g string, v double")
        got = histogram_quantiles(df, ["g"], "v", quantiles, n_bins)
        return sorted(
            (r["g"], r["quantile"], r["n"], r["est_q"]) for r in got.collect()
        )

    def test_matches_python_formula(self, spark):
        rows = (
            [("a", float(i * i % 97)) for i in range(200)]
            + [("b", float(i)) for i in range(50)]
            + [("c", 7.0)] * 9  # degenerate: gmin == gmax
        )
        for n_bins in (8, 64):
            assert self._run(spark, rows, [0.5, 0.9, 0.99], n_bins) == (
                _python_hq(rows, [0.5, 0.9, 0.99], n_bins)
            ), n_bins

    def test_estimate_within_one_bin_width(self, spark):
        import numpy as np

        vals = [float(v) for v in np.random.default_rng(7).normal(50, 10, 500)]
        rows = [("g", v) for v in vals]
        n_bins = 64
        width = (max(vals) - min(vals)) / n_bins
        got = dict(
            (q, est) for _, q, _, est in self._run(spark, rows, [0.5, 0.9], n_bins)
        )
        for q in (0.5, 0.9):
            true = float(np.quantile(vals, q))
            assert abs(got[q] - true) <= width + 1e-9, (q, got[q], true)

    def test_constant_group_reports_exact_value(self, spark):
        got = self._run(spark, [("k", 3.25)] * 12, [0.5, 1.0], 16)
        assert got == [("k", 0.5, 12, 3.25), ("k", 1.0, 12, 3.25)]

    def test_bad_params_raise(self, spark):
        from chunksilo_spark.operators.sketches import histogram_quantiles

        df = spark.createDataFrame([("a", 1.0)], "g string, v double")
        with pytest.raises(ValueError):
            histogram_quantiles(df, ["g"], "v", [0.5], n_bins=0)
        with pytest.raises(ValueError):
            histogram_quantiles(df, ["g"], "v", [1.5])


class TestBottomkSample:
    def _run(self, spark, rows, k):
        from chunksilo_spark.operators.sketches import bottomk_sample

        df = spark.createDataFrame(rows, "g string, id long")
        got = bottomk_sample(df, ["g"], "id", k=k)
        return sorted((r["g"], r["id"], r["pos"]) for r in got.collect())

    def test_matches_python_formula(self, spark):
        rows = [(f"g{i % 3}", i) for i in range(100)]
        exp = []
        for g in ("g0", "g1", "g2"):
            ids = [i for gg, i in rows if gg == g]
            ranked = sorted(ids, key=lambda i: (_h60(i), i))[:7]
            exp += [(g, i, p + 1) for p, i in enumerate(ranked)]
        assert self._run(spark, rows, 7) == sorted(exp)

    def test_exactly_k_per_group_and_rerun_stable(self, spark):
        rows = [(f"g{i % 4}", i) for i in range(200)]
        got1 = self._run(spark, rows, 5)
        assert len(got1) == 20
        # shuffled input order -> identical sample
        got2 = self._run(spark, rows[::-1], 5)
        assert got1 == got2

    def test_small_group_returns_all(self, spark):
        got = self._run(spark, [("g", 1), ("g", 2)], 10)
        assert len(got) == 2

    def test_coordinated_across_relations(self, spark):
        # the same ids win in two different tables sharing the id space
        a = [("x", i) for i in range(50)]
        b = [("x", i) for i in range(50)]
        assert self._run(spark, a, 6) == self._run(spark, b, 6)

    def test_bad_k_raises(self, spark):
        from chunksilo_spark.operators.sketches import bottomk_sample

        df = spark.createDataFrame([("g", 1)], "g string, id long")
        with pytest.raises(ValueError):
            bottomk_sample(df, ["g"], "id", k=0)


def _python_hll(pairs, b=8):
    m = 1 << b
    w_bits = 60 - b
    alpha = (
        {16: 0.673, 32: 0.697, 64: 0.709}.get(m)
        or 0.7213 / (1.0 + 1.079 / m)
    )
    groups = {}
    for g, v in set(pairs):
        h = _h60(v)
        j, w = h % m, h // m
        rho = (w_bits + 1) if w == 0 else w_bits - w.bit_length() + 1
        regs = groups.setdefault(g, {})
        regs[j] = max(regs.get(j, 0), rho)
    out = {}
    for g, regs in groups.items():
        n_zero = m - len(regs)
        s = sum(1 << (w_bits + 1 - r) for r in regs.values())
        s += n_zero * (1 << (w_bits + 1))
        raw = alpha * m * m * float(1 << (w_bits + 1)) / s
        import math

        est = (
            m * math.log(m / n_zero)
            if raw <= 2.5 * m and n_zero > 0
            else raw
        )
        out[g] = (m, n_zero, s, round(est, 4))
    return out


class TestHll:
    def _run(self, spark, pairs, b=8):
        from chunksilo_spark.operators.sketches import hll_cardinality

        df = spark.createDataFrame(pairs, "grp string, v long")
        got = hll_cardinality(df, ["grp"], "v", b=b)
        return {
            r["grp"]: (r["m"], r["n_zero"], r["sum_scaled"], r["est_distinct"])
            for r in got.collect()
        }

    def test_matches_python_formula(self, spark):
        pairs = [(f"g{i % 3}", (i * 13) % 700) for i in range(2000)]
        for b in (4, 8):
            assert self._run(spark, pairs, b) == _python_hll(pairs, b), b

    def test_estimate_within_relative_error(self, spark):
        # 5000 distinct, m=256 registers -> ~1.04/16 = 6.5% expected
        # rel. error; allow 3x slack (deterministic hashes: never flakes)
        n = 5000
        got = self._run(spark, [("g", i) for i in range(n)])
        (_, _, _, est), = got.values()
        assert abs(est - n) / n < 0.2

    def test_small_range_linear_counting(self, spark):
        # 10 distinct values: almost all registers empty -> the
        # linear-counting branch, which is near-exact there
        got = self._run(spark, [("g", i) for i in range(10)])
        (_, n_zero, _, est), = got.values()
        assert n_zero >= 246 and abs(est - 10) <= 1

    def test_state_bounded_and_merge_equals_global(self, spark):
        from chunksilo_spark.operators.sketches import (
            hll_cardinality,
            hll_merge,
            hll_state,
        )

        rows = [(f"g{i % 3}", i * 7 % 450) for i in range(900)]
        df = spark.createDataFrame(rows, "g string, v long")
        state = hll_state(df, ["g"], "v", b=4)
        per_group = {
            r["g"]: r["n"]
            for r in state.groupBy("g").count()
            .withColumnRenamed("count", "n").collect()
        }
        assert all(n <= 16 for n in per_group.values())
        # value-overlapping shards: register-wise max must dedup
        shards = [
            spark.createDataFrame(rows[i::3], "g string, v long")
            for i in range(3)
        ]
        merged = hll_merge(
            [hll_state(s, ["g"], "v", b=4) for s in shards], ["g"], b=4
        )
        got = sorted(tuple(r) for r in merged.collect())
        want = sorted(
            tuple(r) for r in hll_cardinality(df, ["g"], "v", b=4).collect()
        )
        assert got == want

    def test_bad_b_raises(self, spark):
        from chunksilo_spark.operators.sketches import (
            hll_merge,
            hll_state,
        )

        df = spark.createDataFrame([("g", 1)], "g string, v long")
        with pytest.raises(ValueError):
            hll_state(df, ["g"], "v", b=1)
        with pytest.raises(ValueError):
            hll_merge([], ["g"])


class TestKmvMerge:
    def test_sharded_merge_equals_global_sketch(self, spark):
        from chunksilo_spark.operators.sketches import (
            kmv_distinct,
            kmv_merge,
            kmv_state,
        )

        rows = [(f"g{i % 3}", i * 7 % 450) for i in range(900)]
        df = spark.createDataFrame(rows, "g string, v long")
        # row-interleaved shards so the same VALUE appears in several
        # shards — the merge must dedup across states, not just rank
        shards = [
            spark.createDataFrame(rows[i::3], "g string, v long")
            for i in range(3)
        ]
        merged = kmv_merge(
            [kmv_state(s, ["g"], "v", k=16) for s in shards], ["g"], k=16
        )
        got = sorted(
            (r["g"], r["n_kept"], r["est_distinct"]) for r in merged.collect()
        )
        want = sorted(
            (r["g"], r["n_kept"], r["est_distinct"])
            for r in kmv_distinct(df, ["g"], "v", k=16).collect()
        )
        assert got == want

    def test_single_state_roundtrip(self, spark):
        from chunksilo_spark.operators.sketches import (
            kmv_distinct,
            kmv_merge,
            kmv_state,
        )

        df = spark.createDataFrame(
            [("g", i) for i in range(10)], "g string, v long"
        )
        got = kmv_merge([kmv_state(df, ["g"], "v", k=32)], ["g"], k=32)
        assert got.collect()[0]["est_distinct"] == 10.0
        assert (
            kmv_distinct(df, ["g"], "v", k=32).collect()[0]["est_distinct"]
            == 10.0
        )

    def test_empty_states_raise(self, spark):
        from chunksilo_spark.operators.sketches import kmv_merge

        with pytest.raises(ValueError):
            kmv_merge([], ["g"])


class TestCmEstimateExternalCandidates:
    def test_absent_candidate_estimates_zero_not_collision(self, spark):
        # a candidate NOT in the corpus whose buckets are mostly empty:
        # canonical CM takes min over ALL depth rows (empty counter = 0),
        # so the estimate must be 0 — an inner join against the sketch
        # would skip the empty buckets and report the colliding bucket's
        # count instead
        from chunksilo_spark.operators.sketches import cm_build, cm_estimate

        df = spark.createDataFrame([("hot",)] * 50, "v string")
        sketch = cm_build(df, "v", width=64, depth=3)
        cand = spark.createDataFrame(
            [("hot",), ("never-seen-value",)], "value string"
        )
        got = {
            r["value"]: r["est_count"]
            for r in cm_estimate(sketch, cand, k=10, width=64).collect()
        }
        assert got["hot"] == 50
        assert got["never-seen-value"] == 0  # reported, and as zero


class TestPartialAggregateParity:
    """The production bounded-heap path (method='partial': per-Arrow-batch
    pandas heaps shrink each partition to <= k rows per group BEFORE the
    shuffle) must reproduce the window path bit-for-bit. Fixtures
    repartition to many partitions so the cross-batch merge is really
    exercised."""

    PAIRS = [(f"g{i % 5}", (i * 13) % 900) for i in range(3000)]

    def test_kmv_distinct_parity(self, spark):
        from chunksilo_spark.operators.sketches import kmv_distinct

        df = spark.createDataFrame(self.PAIRS, "grp string, v long").repartition(8)
        for k in (2, 16, 64):
            win = sorted(map(tuple, kmv_distinct(df, ["grp"], "v", k=k).collect()))
            par = sorted(
                map(
                    tuple,
                    kmv_distinct(df, ["grp"], "v", k=k, method="partial").collect(),
                )
            )
            assert win == par, k

    def test_kmv_state_parity(self, spark):
        from chunksilo_spark.operators.sketches import kmv_state

        df = spark.createDataFrame(self.PAIRS, "grp string, v long").repartition(8)
        win = sorted(map(tuple, kmv_state(df, ["grp"], "v", k=16).collect()))
        par = sorted(
            map(tuple, kmv_state(df, ["grp"], "v", k=16, method="partial").collect())
        )
        assert win == par

    def test_partial_state_merges_with_window_state(self, spark):
        """Mixed-provenance rollup: a shard sketched via the partial path
        merges with a shard sketched via the window path, matching the
        global window sketch — the mergeable-state contract is
        path-independent."""
        from chunksilo_spark.operators.sketches import (
            kmv_distinct,
            kmv_merge,
            kmv_state,
        )

        df = spark.createDataFrame(self.PAIRS, "grp string, v long")
        s1 = df.where("v % 2 = 0")
        s2 = df.where("v % 2 = 1")
        merged = kmv_merge(
            [
                kmv_state(s1, ["grp"], "v", k=16, method="partial"),
                kmv_state(s2, ["grp"], "v", k=16),
            ],
            ["grp"],
            k=16,
        )
        want = sorted(map(tuple, kmv_distinct(df, ["grp"], "v", k=16).collect()))
        assert sorted(map(tuple, merged.collect())) == want

    def test_bottomk_sample_parity(self, spark):
        from chunksilo_spark.operators.sketches import bottomk_sample

        rows = [(f"g{i % 4}", f"id{i}") for i in range(500)]
        df = spark.createDataFrame(rows, "grp string, id string").repartition(8)
        win = sorted(map(tuple, bottomk_sample(df, ["grp"], "id", k=9).collect()))
        par = sorted(
            map(
                tuple,
                bottomk_sample(df, ["grp"], "id", k=9, method="partial").collect(),
            )
        )
        assert win == par

    def test_bottomk_sample_parity_with_duplicate_ids(self, spark):
        """Duplicate ids each occupy a sample slot in the window path;
        the partial path must keep that multiset semantics (dedup=False)."""
        from chunksilo_spark.operators.sketches import bottomk_sample

        rows = [(f"g{i % 2}", f"id{i % 7}") for i in range(60)]
        df = spark.createDataFrame(rows, "grp string, id string").repartition(6)
        win = sorted(
            (r["grp"], r["id"]) for r in bottomk_sample(df, ["grp"], "id", k=5).collect()
        )
        par = sorted(
            (r["grp"], r["id"])
            for r in bottomk_sample(
                df, ["grp"], "id", k=5, method="partial"
            ).collect()
        )
        assert win == par

    def test_unknown_method_raises(self, spark):
        import pytest as _pytest

        from chunksilo_spark.operators.sketches import bottomk_sample, kmv_distinct

        df = spark.createDataFrame([("a", 1)], "grp string, v long")
        with _pytest.raises(ValueError):
            kmv_distinct(df, ["grp"], "v", k=4, method="heap")
        with _pytest.raises(ValueError):
            bottomk_sample(df, ["grp"], "v", k=4, method="heap")

    def test_partial_shuffle_is_sketch_sized(self, spark):
        """The point of the partial path: the exchange input is the
        mapInPandas output (<= k x partitions x groups rows), never the
        raw relation — assert the plan runs the Python stage BEFORE the
        first exchange."""
        from chunksilo_spark.operators.sketches import kmv_distinct

        df = spark.createDataFrame(self.PAIRS, "grp string, v long").repartition(8)
        plan = (
            kmv_distinct(df, ["grp"], "v", k=16, method="partial")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # the plan string prints top-down, so deeper operators appear
        # LATER: the pandas heap stage must sit below (after) every
        # hash-partitioned exchange — i.e. it runs before any shuffle
        assert "MapInPandas" in plan
        assert plan.rindex("Exchange hashpartitioning") < plan.index(
            "MapInPandas"
        )


class TestWeightedSample:
    """A-ES weighted sampling with the deterministic hash coin."""

    ROWS = [
        (f"g{i % 3}", f"id{i}", 1.0 + (i * 7) % 13) for i in range(300)
    ]

    @staticmethod
    def _python_ws(rows, k):
        import math

        out = {}
        by_g = {}
        for g, i, w in rows:
            u = (_h60(i) + 1.0) / SPACE
            by_g.setdefault(g, []).append((-math.log(u) / w, i, w))
        for g, items in by_g.items():
            items.sort()
            for pos, (_, i, w) in enumerate(items[:k], start=1):
                out[(g, i)] = (w, pos)
        return out

    def _run(self, spark, k, method="window"):
        from chunksilo_spark.operators.sketches import weighted_sample

        df = spark.createDataFrame(
            self.ROWS, "grp string, id string, w double"
        ).repartition(8)
        got = weighted_sample(df, ["grp"], "id", "w", k=k, method=method)
        return {
            (r["grp"], r["id"]): (r["weight"], r["pos"])
            for r in got.collect()
        }

    def test_matches_python_formula(self, spark):
        for k in (1, 5, 20):
            assert self._run(spark, k) == self._python_ws(self.ROWS, k), k

    def test_partial_parity(self, spark):
        assert self._run(spark, 9, "partial") == self._run(spark, 9)

    def test_heavier_weights_win_more_slots(self, spark):
        """Statistical sanity: doubling an item set's weights ~doubles
        its inclusion odds. 200 ids, half weight 1, half weight 10 —
        the heavy half must take well over half of a k=40 sample."""
        from chunksilo_spark.operators.sketches import weighted_sample

        rows = [
            ("g", f"id{i}", 10.0 if i % 2 == 0 else 1.0)
            for i in range(200)
        ]
        df = spark.createDataFrame(rows, "grp string, id string, w double")
        got = weighted_sample(df, ["grp"], "id", "w", k=40).collect()
        heavy = sum(1 for r in got if r["weight"] == 10.0)
        assert heavy > 28  # E[heavy] ~ 36 of 40; deterministic, no flake

    def test_rerun_stable_and_k_bounds(self, spark):
        import pytest as _pytest

        from chunksilo_spark.operators.sketches import weighted_sample

        df = spark.createDataFrame(
            self.ROWS, "grp string, id string, w double"
        )
        a = sorted(map(tuple, weighted_sample(df, ["grp"], "id", "w", k=5).collect()))
        b = sorted(map(tuple, weighted_sample(df, ["grp"], "id", "w", k=5).collect()))
        assert a == b
        with _pytest.raises(ValueError):
            weighted_sample(df, ["grp"], "id", "w", k=0)
        with _pytest.raises(ValueError):
            weighted_sample(df, ["grp"], "id", "w", k=5, method="heap")


class TestKmvOverlap:
    @staticmethod
    def _python_overlap(vals_a, vals_b, k):
        ha = sorted({_h60(v) for v in vals_a})[:k]
        hb = sorted({_h60(v) for v in vals_b})[:k]
        union = sorted(set(ha) | set(hb))[:k]
        n_u = len(union)
        n_c = sum(1 for h in union if h in set(ha) and h in set(hb))
        if n_u >= k:
            est_union = round((k - 1) * SPACE / union[k - 1], 4)
        else:
            est_union = round(float(n_u), 4)
        return (
            n_c,
            n_u,
            (n_c * 1000000) // n_u,
            est_union,
            round(est_union * n_c / n_u, 4),
        )

    def _run(self, spark, vals_a, vals_b, k):
        from chunksilo_spark.operators.sketches import kmv_overlap, kmv_state

        da = spark.createDataFrame([("g", v) for v in vals_a], "grp string, v long")
        db = spark.createDataFrame([("g", v) for v in vals_b], "grp string, v long")
        sa = kmv_state(da, ["grp"], "v", k=k)
        sb = kmv_state(db, ["grp"], "v", k=k)
        (r,) = kmv_overlap(sa, sb, ["grp"], k=k).collect()
        return (
            r["n_common"],
            r["n_union_sketch"],
            r["jaccard_ppm"],
            r["est_union"],
            r["est_intersection"],
        )

    def test_matches_python_formula(self, spark):
        a = [v for v in range(500) if v % 3 != 0]
        b = [v for v in range(500) if v % 2 == 0]
        for k in (8, 32, 64):
            assert self._run(spark, a, b, k) == self._python_overlap(a, b, k), k

    def test_identical_states_are_fully_overlapping(self, spark):
        vals = list(range(100))
        n_c, n_u, ppm, eu, ei = self._run(spark, vals, vals, 16)
        assert (n_c, n_u, ppm) == (16, 16, 1000000)
        assert eu == ei

    def test_disjoint_states_share_nothing(self, spark):
        n_c, _, ppm, _, ei = self._run(
            spark, list(range(100)), list(range(1000, 1100)), 16
        )
        assert (n_c, ppm, ei) == (0, 0, 0.0)

    def test_jaccard_estimate_near_truth(self, spark):
        # true J of {v%3!=0} vs {v%2==0} over 3000 values: residue
        # classes mod 6 -> |A∩B| = 1000 ({2,4}), |A∪B| = 2500
        # ({0,1,2,4,5}), J = 0.4; k=256 -> sd ~ sqrt(J(1-J)/k) ~ 0.031,
        # deterministic hashes land at 0.3555 (no flake)
        a = [v for v in range(3000) if v % 3 != 0]
        b = [v for v in range(3000) if v % 2 == 0]
        _, _, ppm, _, _ = self._run(spark, a, b, 256)
        assert abs(ppm / 1e6 - 0.4) < 0.08


class TestKmvCompare:
    @staticmethod
    def _python_compare(vals_a, vals_b, k):
        ha = sorted({_h60(v) for v in vals_a})[:k]
        hb = sorted({_h60(v) for v in vals_b})[:k]
        sa, sb = set(ha), set(hb)
        union = sorted(sa | sb)[:k]
        n_u = len(union)
        n_c = sum(1 for h in union if h in sa and h in sb)
        n_a = sum(1 for h in union if h in sa and h not in sb)
        n_b = sum(1 for h in union if h not in sa and h in sb)
        if n_u >= k:
            est_union = round((k - 1) * SPACE / union[k - 1], 4)
        else:
            est_union = round(float(n_u), 4)
        return (
            n_c, n_a, n_b, n_u,
            (n_c * 1000000) // n_u,
            est_union,
            round(est_union * n_c / n_u, 4),
            round(est_union * n_a / n_u, 4),
            round(est_union * n_b / n_u, 4),
        )

    def _run(self, spark, vals_a, vals_b, k):
        from chunksilo_spark.operators.sketches import kmv_compare, kmv_state

        da = spark.createDataFrame(
            [("g", v) for v in vals_a], "grp string, v long"
        )
        db = spark.createDataFrame(
            [("g", v) for v in vals_b], "grp string, v long"
        )
        sa = kmv_state(da, ["grp"], "v", k=k)
        sb = kmv_state(db, ["grp"], "v", k=k)
        (r,) = kmv_compare(sa, sb, ["grp"], k=k).collect()
        return (
            r["n_common"], r["n_only_a"], r["n_only_b"],
            r["n_union_sketch"], r["jaccard_ppm"], r["est_union"],
            r["est_intersection"], r["est_only_a"], r["est_only_b"],
        )

    def test_matches_python_formula(self, spark):
        a = [v for v in range(500) if v % 3 != 0]
        b = [v for v in range(500) if v % 2 == 0]
        for k in (8, 32, 64):
            assert self._run(spark, a, b, k) == self._python_compare(
                a, b, k
            ), k

    def test_snapshot_diff_reads(self, spark):
        # yesterday = 0..399, today = 100..499: the difference shares
        # estimate ~100 gone / ~100 new within KMV error at k=64
        y = list(range(400))
        t = list(range(100, 500))
        got = self._run(spark, y, t, 64)
        n_c, n_a, n_b, n_u, _, est_u, est_i, est_a, est_b = got
        assert got == self._python_compare(y, t, 64)
        # the SHARES are what the estimator pins (the union magnitude
        # carries its own ~1/sqrt(k) error on any one draw): true
        # shares are 300/500, 100/500, 100/500
        for n, share in ((n_c, 0.6), (n_a, 0.2), (n_b, 0.2)):
            assert abs(n / n_u - share) < 0.15
        # share identity: the three shares partition the union estimate
        assert abs((est_i + est_a + est_b) - est_u) < 2e-3

    def test_disjoint_and_identical(self, spark):
        a = list(range(100))
        got = self._run(spark, a, a, 32)
        assert got[0] == got[3] and got[1] == got[2] == 0
        assert got[7] == got[8] == 0.0
        got = self._run(spark, a, [v + 1000 for v in a], 32)
        assert got[0] == 0 and got[6] == 0.0
        assert got[1] + got[2] == got[3]

    def test_overlap_is_the_projection(self, spark):
        from chunksilo_spark.operators.sketches import (
            kmv_compare,
            kmv_overlap,
            kmv_state,
        )

        da = spark.createDataFrame(
            [("g", v) for v in range(300) if v % 3], "grp string, v long"
        )
        db = spark.createDataFrame(
            [("g", v) for v in range(300) if v % 2 == 0],
            "grp string, v long",
        )
        sa, sb = (
            kmv_state(da, ["grp"], "v", k=32),
            kmv_state(db, ["grp"], "v", k=32),
        )
        o = kmv_overlap(sa, sb, ["grp"], k=32).collect()[0].asDict()
        c = kmv_compare(sa, sb, ["grp"], k=32).collect()[0].asDict()
        assert o == {k: v for k, v in c.items() if k in o}
