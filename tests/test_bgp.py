"""BGP matcher vs a brute-force itertools oracle, plus guard behavior."""

import itertools

import pytest
from pyspark.sql import functions as F

from chunksilo_spark.operators.bgp import bgp_match

TRIPLES = [
    # a small social/commerce KG: longs for entities, strings for preds
    (1, "knows", 2),
    (2, "knows", 3),
    (1, "knows", 3),
    (3, "knows", 1),
    (1, "bought", 10),
    (2, "bought", 10),
    (3, "bought", 11),
    (2, "bought", 11),
    (10, "madeby", 100),
    (11, "madeby", 100),
    (2, "knows", 2),  # self-loop
]


def _brute(patterns, filters=None):
    """All variable bindings satisfying the conjunction, bag semantics."""
    var_names = sorted(
        {t[1:] for p in patterns for t in p if isinstance(t, str) and t.startswith("?")}
    )
    out = []
    for binding in itertools.product(
        {v for t in TRIPLES for v in (t[0], t[2])} | {t[1] for t in TRIPLES},
        repeat=len(var_names),
    ):
        env = dict(zip(var_names, binding))

        def term(t):
            return env[t[1:]] if isinstance(t, str) and t.startswith("?") else t

        if all(tuple(term(t) for t in p) in set(TRIPLES) for p in patterns):
            if filters is None or filters(env):
                out.append(tuple(env[v] for v in var_names))
    return sorted(out), var_names


@pytest.fixture(scope="module")
def triples(spark):
    return spark.createDataFrame(TRIPLES, "subj long, pred string, obj long")


def _run(df):
    return sorted(tuple(r) for r in df.collect())


class TestBgpMatch:
    def test_single_pattern_constant_pred(self, triples):
        got = _run(bgp_match(triples, [("?x", "bought", "?y")]))
        want, _ = _brute([("?x", "bought", "?y")])
        assert got == want

    def test_two_hop_join(self, triples):
        pats = [("?a", "knows", "?b"), ("?b", "knows", "?c")]
        got = _run(bgp_match(triples, pats))
        want, names = _brute(pats)
        assert names == ["a", "b", "c"]
        assert got == want

    def test_three_pattern_star_with_filter(self, triples):
        pats = [
            ("?a", "bought", "?p"),
            ("?b", "bought", "?p"),
            ("?p", "madeby", "?m"),
        ]
        got = _run(
            bgp_match(triples, pats, filters=[F.col("a") < F.col("b")])
        )
        want, _ = _brute(pats, filters=lambda e: e["a"] < e["b"])
        assert got == want

    def test_repeated_var_within_pattern_is_self_loop(self, triples):
        got = _run(bgp_match(triples, [("?x", "knows", "?x")]))
        assert got == [(2,)]

    def test_constant_subject_binds_tail(self, triples):
        got = _run(bgp_match(triples, [(1, "knows", "?x")]))
        assert got == [(2,), (3,)]

    def test_distinct_collapses_derivations(self, triples):
        # x bought anything (two items each for 1? no — 1 bought one, 2 two)
        pats = [("?x", "bought", "?y")]
        bag = bgp_match(triples, pats, select=["x"])
        assert _run(bag) == [(1,), (2,), (2,), (3,)]
        assert _run(bgp_match(triples, pats, select=["x"], distinct=True)) == [
            (1,),
            (2,),
            (3,),
        ]

    def test_select_orders_columns(self, triples):
        df = bgp_match(
            triples, [("?a", "knows", "?b")], select=["b", "a"]
        )
        assert df.columns == ["b", "a"]

    def test_disconnected_raises(self, triples):
        with pytest.raises(ValueError, match="disconnected"):
            bgp_match(
                triples, [("?a", "knows", "?b"), ("?c", "bought", "?d")]
            )

    def test_all_constant_pattern_raises(self, triples):
        with pytest.raises(ValueError, match="binds no variables"):
            bgp_match(triples, [("?a", "knows", "?b"), (1, "knows", 2)])

    def test_unbound_select_raises(self, triples):
        with pytest.raises(ValueError, match="unbound"):
            bgp_match(triples, [("?a", "knows", "?b")], select=["z"])

    def test_empty_bgp_raises(self, triples):
        with pytest.raises(ValueError, match="empty"):
            bgp_match(triples, [])

    def test_variable_on_predicate_position(self, triples):
        pats = [(1, "?p", "?o")]
        got = _run(bgp_match(triples, pats))
        want, _ = _brute(pats)
        assert got == want


class TestRandomizedParity:
    """Seeded random triple sets vs the itertools brute force — the cheap
    randomized sweep (one Spark job per seed, not per hypothesis example)."""

    def _random_triples(self, seed):
        import random

        rng = random.Random(seed)
        ents = list(range(6))
        preds = ["p", "q", "r"]
        return list({
            (rng.choice(ents), rng.choice(preds), rng.choice(ents))
            for _ in range(rng.randint(8, 20))
        })

    def test_chain_and_star_on_random_graphs(self, spark):
        global TRIPLES
        shapes = [
            [("?a", "p", "?b"), ("?b", "q", "?c")],
            [("?a", "p", "?x"), ("?a", "q", "?y")],
            [("?a", "p", "?b"), ("?b", "q", "?a")],
        ]
        orig = TRIPLES
        try:
            for seed in (1, 2, 3):
                triples = self._random_triples(seed)
                TRIPLES = triples  # _brute reads the module global
                df = spark.createDataFrame(
                    triples, "subj long, pred string, obj long"
                )
                for pats in shapes:
                    got = _run(bgp_match(df, pats))
                    want, _ = _brute(pats)
                    assert got == want, (seed, pats)
        finally:
            TRIPLES = orig
