"""CONSTRUCT + forward chaining vs plain-python fixpoint oracles."""

import pytest
from pyspark.sql import functions as F

from chunksilo_spark.operators.infer import (
    construct,
    extend_chain,
    forward_chain,
)

TRIPLES = [
    (1, "knows", 2),
    (2, "knows", 3),
    (3, "knows", 4),
    (1, "bought", 10),
    (2, "bought", 10),
]


@pytest.fixture()
def triples(spark):
    return spark.createDataFrame(TRIPLES, "subj long, pred string, obj long")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _python_chain(base, rules, max_rounds=20):
    cur = set(base)
    for _ in range(max_rounds):
        new = set()
        for patterns, template in rules:
            sols = [{}]
            for s, p, o in patterns:
                nxt = []
                for t in cur:
                    for binding in sols:
                        b = dict(binding)
                        ok = True
                        for term, val in zip((s, p, o), t):
                            if isinstance(term, str) and term.startswith("?"):
                                v = term[1:]
                                if v in b and b[v] != val:
                                    ok = False
                                    break
                                b[v] = val
                            elif term != val:
                                ok = False
                                break
                        if ok:
                            nxt.append(b)
                sols = nxt
            for b in sols:
                out = tuple(
                    b[t[1:]] if isinstance(t, str) and t.startswith("?") else t
                    for t in template
                )
                if out not in cur:
                    new.add(out)
        if not new:
            break
        cur |= new
    return sorted(cur)


class TestConstruct:
    def test_templated_triples(self, triples):
        got = construct(
            triples,
            [("?a", "knows", "?b"), ("?b", "knows", "?c")],
            ("?a", "knows2", "?c"),
        )
        assert _rows(got) == [(1, "knows2", 3), (2, "knows2", 4)]

    def test_multi_template_and_constants(self, triples):
        got = construct(
            triples,
            [("?a", "bought", 10)],
            [("?a", "customer", 0), (10, "soldto", "?a")],
        )
        assert _rows(got) == [
            (1, "customer", 0),
            (2, "customer", 0),
            (10, "soldto", 1),
            (10, "soldto", 2),
        ]

    def test_set_semantics(self, triples):
        # two derivations (both buyers bind ?a) -> one constant triple
        got = construct(
            triples, [("?a", "bought", "?p")], (10, "popular", 0)
        )
        assert _rows(got) == [(10, "popular", 0)]

    def test_unbound_template_var_raises(self, triples):
        with pytest.raises(ValueError):
            construct(triples, [("?a", "knows", "?b")], ("?a", "p", "?z"))

    def test_composes_with_values(self, triples):
        got = construct(
            triples,
            [("?a", "knows", "?b")],
            ("?a", "sel", "?b"),
            values=(["?a"], [(1,), (3,)]),
        )
        assert _rows(got) == [(1, "sel", 2), (3, "sel", 4)]


class TestForwardChain:
    RULES = [
        ([("?a", "knows", "?b"), ("?b", "knows", "?c")], ("?a", "knows", "?c")),
    ]

    def test_transitive_closure_matches_python(self, triples):
        got = forward_chain(triples, self.RULES, max_rounds=6)
        assert _rows(got) == _python_chain(TRIPLES, self.RULES)

    def test_log_round_convergence_on_chain(self, spark):
        # a 33-node path: closure depth 32 must close in <= 6 rounds
        # (delta path length doubles per round) — would need 31 rounds
        # naively one-hop-at-a-time
        base = [(i, "p", i + 1) for i in range(32)]
        t = spark.createDataFrame(base, "subj long, pred string, obj long")
        rules = [
            ([("?a", "p", "?b"), ("?b", "p", "?c")], ("?a", "p", "?c"))
        ]
        got = forward_chain(t, rules, max_rounds=6, strict=True)
        exp = sorted(
            (i, "p", j) for i in range(33) for j in range(i + 1, 33)
        )
        assert _rows(got) == exp

    def test_multi_rule_cascade(self, triples):
        # rule 2 consumes rule 1's output in a later round
        rules = self.RULES + [
            ([("?a", "knows", 4)], ("?a", "reaches4", 0)),
        ]
        got = forward_chain(triples, rules, max_rounds=6)
        assert _rows(got) == _python_chain(TRIPLES, rules)
        assert (1, "reaches4", 0) in _rows(got)  # needs the derived 1->4

    def test_strict_raises_without_fixpoint(self, spark):
        base = [(i, "p", i + 1) for i in range(32)]
        t = spark.createDataFrame(base, "subj long, pred string, obj long")
        rules = [
            ([("?a", "p", "?b"), ("?b", "p", "?c")], ("?a", "p", "?c"))
        ]
        with pytest.raises(RuntimeError):
            forward_chain(t, rules, max_rounds=2, strict=True)

    def test_disconnected_body_raises(self, triples):
        with pytest.raises(ValueError, match="connect"):
            forward_chain(
                triples,
                [
                    (
                        [("?a", "knows", "?b"), ("?x", "bought", "?y")],
                        ("?a", "p", "?x"),
                    )
                ],
            )

    def test_no_applicable_rules_returns_base(self, triples):
        got = forward_chain(
            triples, [([("?a", "nosuch", "?b")], ("?a", "x", "?b"))]
        )
        assert _rows(got) == sorted(TRIPLES)


class TestExtendChain:
    RULES = [
        ([("?a", "p", "?b"), ("?b", "p", "?c")], ("?a", "p", "?c")),
    ]

    def test_incremental_equals_scratch(self, spark):
        base = [(i, "p", i + 1) for i in range(10)]
        delta = [(10, "p", 11), (11, "p", 12), (3, "q", 99)]
        b = spark.createDataFrame(base, "subj long, pred string, obj long")
        d = spark.createDataFrame(delta, "subj long, pred string, obj long")
        closed = forward_chain(b, self.RULES, max_rounds=8, strict=True)
        inc = extend_chain(closed, d, self.RULES, max_rounds=8, strict=True)
        scratch = forward_chain(
            b.unionByName(d), self.RULES, max_rounds=8, strict=True
        )
        assert _rows(inc) == _rows(scratch)

    def test_bridging_delta_connects_two_closures(self, spark):
        # two separately-closed chains; the delta bridges them — every
        # cross pair must appear even though neither side is re-derived
        left = [(i, "p", i + 1) for i in range(3)]          # 0..3
        right = [(i, "p", i + 1) for i in range(10, 13)]    # 10..13
        b = spark.createDataFrame(
            left + right, "subj long, pred string, obj long"
        )
        closed = forward_chain(b, self.RULES, max_rounds=6, strict=True)
        bridge = spark.createDataFrame(
            [(3, "p", 10)], "subj long, pred string, obj long"
        )
        inc = extend_chain(closed, bridge, self.RULES, max_rounds=6, strict=True)
        got = set(_rows(inc))
        assert (0, "p", 13) in got and (2, "p", 11) in got

    def test_duplicate_delta_is_noop(self, spark):
        base = [(i, "p", i + 1) for i in range(5)]
        b = spark.createDataFrame(base, "subj long, pred string, obj long")
        closed = forward_chain(b, self.RULES, max_rounds=6, strict=True)
        again = extend_chain(
            closed,
            spark.createDataFrame(base[:2], "subj long, pred string, obj long"),
            self.RULES,
            strict=True,
        )
        assert _rows(again) == _rows(closed)
