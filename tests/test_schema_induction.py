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


from chunksilo_spark.operators.schema_induction import path_rules  # noqa: E402

RULE_CLAIMS = [
    # born(a, city) + in_country(city, country) => citizen(a, country)
    (1, "born", 100), (2, "born", 100), (3, "born", 101),
    (100, "in_country", 500), (101, "in_country", 500),
    (1, "citizen", 500), (2, "citizen", 500),   # 3 missing: conf 2/3
    # multi-bridge pair counts ONCE: 4->both 100,101->500
    (4, "born", 100), (4, "born", 101),
    # noise predicate with no chains
    (7, "likes", 8),
]


def _python_rules(claims, min_support=1):
    cs = set(claims)
    chains = {
        (a, p, q, c2)
        for (a, p, b) in cs
        for (b2, q, c2) in cs
        if b2 == b
    }
    body = {}
    for a, p, q, c in chains:
        body[(p, q)] = body.get((p, q), 0) + 1
    heads = {}
    pca = {}
    for a, p, q, c in chains:
        for r in {r for (a2, r, c2) in cs if a2 == a and c2 == c}:
            heads[(p, q, r)] = heads.get((p, q, r), 0) + 1
        for r in {r for (a2, r, c2) in cs if a2 == a}:
            pca[(p, q, r)] = pca.get((p, q, r), 0) + 1
    return {
        (p, q, r): (
            body[(p, q)], n, round(n / body[(p, q)], 6),
            pca[(p, q, r)], round(n / pca[(p, q, r)], 6),
        )
        for (p, q, r), n in heads.items()
        if n >= min_support
    }


class TestPathRules:
    def test_matches_python_oracle(self, spark):
        df = spark.createDataFrame(
            RULE_CLAIMS, "subj long, pred string, obj long"
        ).repartition(3)
        got = {
            (r["pred_p"], r["pred_q"], r["pred_r"]): (
                r["n_body"], r["support"], r["confidence"],
                r["n_pca_body"], r["pca_confidence"],
            )
            for r in path_rules(df).collect()
        }
        assert got == _python_rules(RULE_CLAIMS)
        # the headline rule: body pairs are (1,500),(2,500),(3,500),(4,500)
        # — 4 counted once despite two bridges; heads 1,2 => CWA conf 0.5,
        # but only subjects 1,2 have ANY citizen claim => PCA conf 1.0
        assert got[("born", "in_country", "citizen")] == (4, 2, 0.5, 2, 1.0)

    def test_min_support(self, spark):
        df = spark.createDataFrame(RULE_CLAIMS, "subj long, pred string, obj long")
        got = {
            (r["pred_p"], r["pred_q"], r["pred_r"])
            for r in path_rules(df, min_support=2).collect()
        }
        assert ("born", "in_country", "citizen") in got
        for key in got:
            assert _python_rules(RULE_CLAIMS)[key][1] >= 2

    def test_pca_at_least_cwa(self, spark):
        df = spark.createDataFrame(RULE_CLAIMS, "subj long, pred string, obj long")
        for r in path_rules(df).collect():
            assert r["pca_confidence"] >= r["confidence"]
            assert r["n_pca_body"] >= r["support"]
