"""Bloom-prune: python-formula parity, superset guarantee, no-shuffle plan."""

from __future__ import annotations

import hashlib

import pytest

from chunksilo_spark.operators.bloom import bloom_prune


def _pos(v, i, width) -> int:
    h = hashlib.md5(f"bf{i}:{v}".encode()).hexdigest()[:15]
    return int(h, 16) % width


def _python_bloom_pass(fact_keys, member_keys, width, depth):
    bits = set()
    for k in set(member_keys):
        for i in range(depth):
            bits.add(_pos(k, i, width))
    return [
        k
        for k in fact_keys
        if all(_pos(k, i, width) in bits for i in range(depth))
    ]


class TestBloomPrune:
    def _run(self, spark, fact_keys, member_keys, width, depth=3):
        facts = spark.createDataFrame([(k,) for k in fact_keys], "k long")
        keys = spark.createDataFrame([(k,) for k in member_keys], "k long")
        got = bloom_prune(facts, keys, "k", width=width, depth=depth)
        return sorted(r["k"] for r in got.collect())

    def test_matches_python_formula_including_false_positives(self, spark):
        fact_keys = list(range(500))
        member_keys = [k * 7 for k in range(30)]
        for width in (64, 256):
            got = self._run(spark, fact_keys, member_keys, width)
            exp = sorted(_python_bloom_pass(fact_keys, member_keys, width, 3))
            assert got == exp, width
            # a width this small MUST produce false positives, or the
            # parity assertion above is only testing the exact-member path
            assert set(got) > set(member_keys) & set(fact_keys), width

    def test_superset_of_exact_members_never_loses_one(self, spark):
        fact_keys = list(range(300))
        member_keys = list(range(0, 300, 11))
        got = set(self._run(spark, fact_keys, member_keys, width=64, depth=2))
        assert got >= set(member_keys)

    def test_wide_filter_is_exact(self, spark):
        # 30 keys x 3 salts << 2^16 bits: FP probability ~ (90/65536)^3
        fact_keys = list(range(400))
        member_keys = list(range(0, 400, 13))
        assert self._run(spark, fact_keys, member_keys, width=1 << 16) == (
            sorted(member_keys)
        )

    def test_empty_key_set_prunes_everything(self, spark):
        facts = spark.createDataFrame([(1,), (2,)], "k long")
        keys = spark.createDataFrame([], "k long")
        assert bloom_prune(facts, keys, "k", width=64).count() == 0

    def test_null_fact_keys_dropped_null_member_keys_ignored(self, spark):
        facts = spark.createDataFrame([(None,), (5,)], "k long")
        keys = spark.createDataFrame([(None,), (5,)], "k long")
        got = bloom_prune(facts, keys, "k", width=1 << 16)
        assert [r["k"] for r in got.collect()] == [5]

    def test_plan_has_no_join_or_exchange_on_fact_side(self, spark):
        facts = spark.createDataFrame([(k,) for k in range(100)], "k long")
        keys = spark.createDataFrame([(1,), (2,)], "k long")
        plan = bloom_prune(facts, keys, "k")._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan
        assert "Exchange" not in plan

    def test_bad_params_raise(self, spark):
        df = spark.createDataFrame([(1,)], "k long")
        with pytest.raises(ValueError):
            bloom_prune(df, df, "k", width=32)
        with pytest.raises(ValueError):
            bloom_prune(df, df, "k", depth=0)
