"""Training-export operators: deterministic shuffle/shard order, sequence
packing, domain caps — each vs a plain-python oracle + determinism under
repartitioning."""

import hashlib

import pytest

from chunksilo_spark.operators import export as ex

ROWS = [
    (i, f"src{i % 7}", " ".join(f"w{j}" for j in range(1 + (i * 13) % 29)), 100 - i % 50)
    for i in range(120)
]
SCHEMA = "doc_id long, source string, text string, n_chars long"


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


class TestTrainOrder:
    def _python(self, shards, seed):
        keyed = [
            (i, hashlib.md5(f"{seed}:{i}".encode()).hexdigest())
            for i, *_ in ROWS
        ]
        out = {}
        by_shard = {}
        for i, k in keyed:
            by_shard.setdefault(_md5_long(k) % shards, []).append((k, i))
        for shard, items in by_shard.items():
            for pos, (_, i) in enumerate(sorted(items), start=1):
                out[i] = (shard, pos)
        return out

    def test_matches_python_oracle(self, spark):
        df = spark.createDataFrame(ROWS, SCHEMA)
        got = {
            r["doc_id"]: (r["shard"], r["pos"])
            for r in ex.train_order(df, shards=4, seed="s1").collect()
        }
        assert got == self._python(4, "s1")

    def test_partitioning_invariant(self, spark):
        df = spark.createDataFrame(ROWS, SCHEMA)
        a = set(map(tuple, ex.train_order(df, 4).collect()))
        b = set(map(tuple, ex.train_order(df.repartition(13), 4).collect()))
        assert a == b

    def test_seed_reshuffles(self, spark):
        df = spark.createDataFrame(ROWS, SCHEMA)
        a = {r["doc_id"]: r["pos"] for r in ex.train_order(df, 1, "a").collect()}
        b = {r["doc_id"]: r["pos"] for r in ex.train_order(df, 1, "b").collect()}
        assert a != b and set(a) == set(b)


class TestPackSequences:
    def test_matches_python_oracle(self, spark):
        budget, shards = 40, 3
        df = spark.createDataFrame(ROWS, SCHEMA)
        got = {
            r["doc_id"]: (r["shard"], r["n_tokens"], r["seq_id"])
            for r in ex.pack_sequences(df, budget, shards).collect()
        }
        by_shard = {}
        for i, _, text, _ in ROWS:
            shard = _md5_long(str(i)) % shards
            by_shard.setdefault(shard, []).append((i, len(text.split())))
        want = {}
        for shard, items in by_shard.items():
            cum = 0
            for i, nt in sorted(items):
                want[i] = (shard, nt, cum // budget)
                cum += nt
        assert got == want

    def test_seq_ids_monotone_within_shard(self, spark):
        df = spark.createDataFrame(ROWS, SCHEMA)
        rows = ex.pack_sequences(df, 25, 2).collect()
        by_shard = {}
        for r in rows:
            by_shard.setdefault(r["shard"], []).append((r["doc_id"], r["seq_id"]))
        for items in by_shard.values():
            seqs = [s for _, s in sorted(items)]
            assert seqs == sorted(seqs)
            assert seqs[0] == 0


class TestDomainCap:
    def test_matches_python_oracle(self, spark):
        cap = 5
        df = spark.createDataFrame(ROWS, SCHEMA)
        got = {
            (r["doc_id"], r["source"], r["domain_rank"])
            for r in ex.domain_cap(df, cap=cap).collect()
        }
        by_dom = {}
        for i, src, _, q in ROWS:
            by_dom.setdefault(src, []).append((-q, i))
        want = set()
        for src, items in by_dom.items():
            for rank, (_, i) in enumerate(sorted(items)[:cap], start=1):
                want.add((i, src, rank))
        assert got == want

    def test_cap_respected(self, spark):
        df = spark.createDataFrame(ROWS, SCHEMA)
        rows = ex.domain_cap(df, cap=3).collect()
        counts = {}
        for r in rows:
            counts[r["source"]] = counts.get(r["source"], 0) + 1
        assert counts and all(c <= 3 for c in counts.values())

    @staticmethod
    def _skew_df(spark, n_big, n_small=40):
        rows = [
            (i, "bigdom" if i < n_big else f"dom{i % 7}", "t", (i * 37) % 997)
            for i in range(n_big + 7 * n_small)
        ]
        return spark.createDataFrame(rows, SCHEMA)

    def test_skew_prefilter_bounds_window_input_exactly(self, spark):
        """One domain = 50% of all rows (the pathological-skew case the r3
        docstring promised to handle): the pre-filter must bound the final
        window's input to <= skew_threshold rows per domain AND the capped
        output must be byte-identical to the plain exact window."""
        cap, thresh, n_big, n_small = 5, 100, 1000, 40
        df = self._skew_df(spark, n_big, n_small)

        pre = ex.skew_prefilter(df, cap, thresh, "source", "n_chars", "doc_id")
        big_survivors = pre.where("source = 'bigdom'").count()
        assert cap <= big_survivors <= thresh  # the REAL bound, not n/50
        # small domains pass through untouched
        assert pre.where("source <> 'bigdom'").count() == 7 * n_small

        got = sorted(
            tuple(r)
            for r in ex.domain_cap(
                df, cap=cap, skew_threshold=thresh
            ).collect()
        )
        want = sorted(
            tuple(r)
            # skew_threshold=0 disables the pre-filter -> plain exact window
            for r in ex.domain_cap(df, cap=cap, skew_threshold=0).collect()
        )
        assert got == want and len(got) == 8 * cap

    def test_skew_prefilter_multi_round_reduction(self, spark):
        """threshold/cap ratio small enough that one salted round leaves the
        domain oversized (1000 -> 250 -> 65 -> 20 at cap=5/thresh=20): the
        loop must keep reducing to <= threshold and stay exact."""
        cap, thresh = 5, 20
        df = self._skew_df(spark, n_big=1000, n_small=3)
        pre = ex.skew_prefilter(df, cap, thresh, "source", "n_chars", "doc_id")
        assert cap <= pre.where("source = 'bigdom'").count() <= thresh
        got = sorted(
            tuple(r)
            for r in ex.domain_cap(df, cap=cap, skew_threshold=thresh).collect()
        )
        want = sorted(
            tuple(r)
            for r in ex.domain_cap(df, cap=cap, skew_threshold=0).collect()
        )
        # 7 small domains hold 3 rows each (< cap), bigdom contributes cap
        assert got == want and len(got) == cap + 7 * 3

    def test_skew_threshold_validation(self, spark):
        df = self._skew_df(spark, n_big=10)
        with pytest.raises(ValueError, match="2\\*cap"):
            ex.skew_prefilter(df, cap=5, skew_threshold=9)


TRIPLES = [
    (1, "born_in", 100),
    (1, "born_in", 101),   # multi-valued
    (2, "born_in", 100),
    (3, "born_in", 102),
    (1, "works_for", 200),
    (2, "works_for", 200),
    (3, "works_for", 201),
]


def _python_negatives(triples, m, seed="neg-v1"):
    pools = {}
    for s, p, o in triples:
        pools.setdefault(p, set()).add(o)
    pools = {p: sorted(v) for p, v in pools.items()}
    true = set(triples)
    out = []
    for s, p, o in sorted(set(triples)):
        pool = pools[p]
        for i in range(m):
            ix = _md5_long(f"{seed}:{s}:{p}:{o}:{i}") % len(pool)
            cand = pool[ix]
            if (s, p, cand) not in true:
                out.append((s, p, o, i, cand))
    return sorted(out)


class TestKgNegativeSamples:
    def test_matches_python_oracle(self, spark):
        t = spark.createDataFrame(
            TRIPLES, "subj long, pred string, obj long"
        ).repartition(3)
        got = sorted(
            tuple(r) for r in ex.kg_negative_samples(t, m=4).collect()
        )
        assert got == _python_negatives(TRIPLES, 4)
        assert got  # fixture actually yields negatives

    def test_negatives_stay_in_predicate_pool(self, spark):
        t = spark.createDataFrame(TRIPLES, "subj long, pred string, obj long")
        pools = {}
        for s, p, o in TRIPLES:
            pools.setdefault(p, set()).add(o)
        for r in ex.kg_negative_samples(t, m=6).collect():
            assert r["neg_obj"] in pools[r["pred"]]
            assert (r["subj"], r["pred"], r["neg_obj"]) not in set(TRIPLES)

    def test_seed_changes_draws(self, spark):
        t = spark.createDataFrame(TRIPLES, "subj long, pred string, obj long")
        a = sorted(tuple(r) for r in ex.kg_negative_samples(t, m=4, seed="a").collect())
        b = sorted(tuple(r) for r in ex.kg_negative_samples(t, m=4, seed="b").collect())
        assert a != b

    def test_partitioning_invariance(self, spark):
        t1 = spark.createDataFrame(TRIPLES, "subj long, pred string, obj long")
        got1 = sorted(tuple(r) for r in ex.kg_negative_samples(t1, m=3).collect())
        got2 = sorted(
            tuple(r)
            for r in ex.kg_negative_samples(t1.repartition(7), m=3).collect()
        )
        assert got1 == got2


class TestAdjacencyLists:
    def test_sorted_numeric_not_lexical(self, spark):
        e = spark.createDataFrame(
            [(1, 10), (1, 2), (1, 10), (2, 3)], "src long, dst long"
        )
        got = {r["node"]: (r["n_out"], r["out_csv"])
               for r in ex.adjacency_lists(e).collect()}
        assert got == {1: (2, "2,10"), 2: (1, "3")}


class TestMentionContexts:
    DOCS = [
        (1, "alpha beta gamma delta epsilon"),
        (2, "beta at start"),
        (3, "ends with beta"),
        (4, "no match here"),
        (5, "beta beta beta"),  # first occurrence only
        (6, "Beta capitalized"),  # case-sensitive: no match
    ]

    def _got(self, spark, window):
        d = spark.createDataFrame(self.DOCS, "doc_id long, text string")
        a = spark.createDataFrame([("beta",), ("delta",)], "alias string")
        return {
            (r["doc_id"], r["alias"]): (r["pos"], r["left_ctx"], r["right_ctx"])
            for r in ex.mention_contexts(d, a, window=window).collect()
        }

    def test_python_oracle(self, spark):
        got = self._got(spark, window=6)
        want = {}
        for doc_id, text in self.DOCS:
            for alias in ("beta", "delta"):
                i = text.find(alias)
                if i >= 0:
                    want[(doc_id, alias)] = (
                        i + 1,
                        text[max(0, i - 6):i],
                        text[i + len(alias):i + len(alias) + 6],
                    )
        assert got == want

    def test_edges(self, spark):
        got = self._got(spark, window=10)
        assert got[(2, "beta")] == (1, "", " at start")   # nothing left of start
        assert got[(3, "beta")] == (11, "ends with ", "")  # nothing right of end
        assert got[(5, "beta")][0] == 1                    # first only
        assert (6, "beta") not in got                      # case-sensitive
        assert (4, "beta") not in got
