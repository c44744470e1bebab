"""Entity co-occurrence + PMI vs a plain-python oracle."""

import math

import pytest

from chunksilo_spark.operators import cooccur as C

# (ctx, entity) with deliberate dup mentions (same entity twice in ctx 10)
MENTIONS = [
    (10, 1), (10, 2), (10, 2), (10, 3),
    (11, 1), (11, 2),
    (12, 2), (12, 3),
    (13, 1),
    (14, 4),          # lone entity: appears in no pair
    (15, 1), (15, 2),
]


def _python_pmi(rows, min_pairs=1):
    ctxs = {}
    for c, e in rows:
        ctxs.setdefault(c, set()).add(e)
    n = len(ctxs)
    marg = {}
    for es in ctxs.values():
        for e in es:
            marg[e] = marg.get(e, 0) + 1
    pairs = {}
    for es in ctxs.values():
        es = sorted(es)
        for i in range(len(es)):
            for j in range(i + 1, len(es)):
                pairs[(es[i], es[j])] = pairs.get((es[i], es[j]), 0) + 1
    out = {}
    for (a, b), np_ in pairs.items():
        if np_ < min_pairs:
            continue
        p_ab = np_ / n
        pmi = math.log(p_ab / ((marg[a] / n) * (marg[b] / n)))
        npmi = None if p_ab == 1.0 else pmi / -math.log(p_ab)
        out[(a, b)] = (np_, marg[a], marg[b], pmi, npmi)
    return out


class TestCooccurrencePmi:
    def test_matches_python_oracle(self, spark):
        df = spark.createDataFrame(MENTIONS, "url long, entity_id long")
        got = {
            (r["a"], r["b"]): (r["n_pair"], r["n_a"], r["n_b"], r["pmi"], r["npmi"])
            for r in C.cooccurrence_pmi(df).collect()
        }
        want = _python_pmi(MENTIONS)
        assert set(got) == set(want)
        for k, (np_, na, nb, pmi, npmi) in want.items():
            g = got[k]
            assert g[:3] == (np_, na, nb), k
            assert g[3] == pytest.approx(pmi, abs=1e-12), k
            if npmi is None:
                assert g[4] is None, k
            else:
                assert g[4] == pytest.approx(npmi, abs=1e-12), k

    def test_min_pairs_prunes(self, spark):
        df = spark.createDataFrame(MENTIONS, "url long, entity_id long")
        got = {
            (r["a"], r["b"])
            for r in C.cooccurrence_pmi(df, min_pairs=2).collect()
        }
        want = {k for k, v in _python_pmi(MENTIONS).items() if v[0] >= 2}
        assert got == want and (1, 2) in got

    def test_duplicate_mentions_do_not_inflate(self, spark):
        # (10, 2) appears twice; pair (2, 3) in ctx 10 must count once
        df = spark.createDataFrame(MENTIONS, "url long, entity_id long")
        by = {
            (r["a"], r["b"]): r["n_pair"]
            for r in C.cooccurrence_pmi(df).collect()
        }
        assert by[(2, 3)] == 2  # ctx 10 and 12, not 3

    def test_npmi_bounds_and_perfect_pair(self, spark):
        # a pair that always co-occurs but NOT in every context -> npmi 1
        rows = [(1, 7), (1, 8), (2, 7), (2, 8), (3, 9)]
        df = spark.createDataFrame(rows, "url long, entity_id long")
        out = {(r["a"], r["b"]): r for r in C.cooccurrence_pmi(df).collect()}
        r = out[(7, 8)]
        assert r["npmi"] == pytest.approx(1.0, abs=1e-12)
        for row in out.values():
            if row["npmi"] is not None:
                assert row["npmi"] <= 1.0 + 1e-12

    def test_npmi_null_when_pair_in_every_context(self, spark):
        rows = [(1, 7), (1, 8), (2, 7), (2, 8)]
        df = spark.createDataFrame(rows, "url long, entity_id long")
        out = {(r["a"], r["b"]): r for r in C.cooccurrence_pmi(df).collect()}
        assert out[(7, 8)]["npmi"] is None  # p_ab == 1: -ln(p)==0 guarded

    def test_top_associations_deterministic(self, spark):
        df = spark.createDataFrame(MENTIONS, "url long, entity_id long")
        top = C.top_associations(C.cooccurrence_pmi(df), 3).collect()
        assert len(top) == 3
        npmis = [r["npmi"] for r in top]
        assert npmis == sorted(npmis, reverse=True)

    def test_empty_input(self, spark):
        df = spark.createDataFrame([], "url long, entity_id long")
        assert C.cooccurrence_pmi(df).count() == 0

    def test_over_corpus_linked_mentions(self, spark):
        """End-to-end over the synthetic crawl: stage 1+2 -> linked
        mentions -> doc-level PMI. The hub entity (30% of docs) pairs
        broadly but with LOW npmi (co-occurrence by ubiquity, not
        association) — the exact reason PMI beats raw counts."""
        from chunksilo_spark.operators import stage1_extract as s1
        from chunksilo_spark.operators import stage2_link as s2
        from chunksilo_spark.sources.corpus import (
            HUB_ENTITY_ID, aliases_df, pages_df,
        )

        docs = s1.extract_documents(pages_df(spark, 60))
        bc = s2.build_alias_broadcast(spark, aliases_df(spark))
        linked = s2.link_mentions(s2.detect_mentions(docs), bc)
        pmi = C.cooccurrence_pmi(linked, ctx_col="url", ent_col="entity_id")
        rows = pmi.collect()
        assert len(rows) > 10
        hub_pairs = [
            r for r in rows
            if HUB_ENTITY_ID in (r["a"], r["b"]) and r["npmi"] is not None
        ]
        other = [
            r for r in rows
            if HUB_ENTITY_ID not in (r["a"], r["b"]) and r["npmi"] is not None
        ]
        assert hub_pairs and other
        med = sorted(r["npmi"] for r in other)[len(other) // 2]
        hub_med = sorted(r["npmi"] for r in hub_pairs)[len(hub_pairs) // 2]
        assert hub_med < med  # ubiquity is not association
