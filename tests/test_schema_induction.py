"""Inverse-predicate mining vs a brute-force python oracle."""

from chunksilo_spark.operators.schema_induction import inverse_predicates

CLAIMS = [
    # p/q: perfect inverses; r: symmetric; s: one-way only
    (1, "p", 10),
    (2, "p", 20),
    (10, "q", 1),
    (20, "q", 2),
    (3, "r", 4),
    (4, "r", 3),
    (5, "r", 5),      # reflexive claim matches itself
    (6, "s", 7),
    (1, "p", 10),     # duplicate claim must not double-count
]


def _python(claims, min_matched=1):
    cs = set(claims)
    out = {}
    totals = {}
    for s, p, o in cs:
        totals[p] = totals.get(p, 0) + 1
    for s, p, o in cs:
        for s2, q, o2 in cs:
            if s2 == o and o2 == s:
                out[(p, q)] = out.get((p, q), 0) + 1
    return {
        (p, q): (totals[p], n, round(n / totals[p], 6))
        for (p, q), n in out.items()
        if n >= min_matched
    }


class TestInversePredicates:
    def test_matches_python_oracle(self, spark):
        df = spark.createDataFrame(
            CLAIMS, "subj long, pred string, obj long"
        ).repartition(3)
        got = {
            (r["pred"], r["inv_pred"]): (
                r["n_pred"], r["n_matched"], r["inv_confidence"]
            )
            for r in inverse_predicates(df).collect()
        }
        assert got == _python(CLAIMS)
        # sanity on the fixture itself
        assert got[("p", "q")] == (2, 2, 1.0)
        assert got[("q", "p")] == (2, 2, 1.0)
        assert got[("r", "r")] == (3, 3, 1.0)
        assert ("s", "s") not in got

    def test_min_matched_filters(self, spark):
        df = spark.createDataFrame(CLAIMS, "subj long, pred string, obj long")
        got = {
            (r["pred"], r["inv_pred"])
            for r in inverse_predicates(df, min_matched=3).collect()
        }
        assert got == {("r", "r")}
