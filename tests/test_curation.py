"""Curation operators: repetition profile, PII scrub, decontamination,
deterministic stratified sampling (operators/curation.py)."""

import hashlib

import pyspark.sql.functions as F
import pytest

from chunksilo_spark.operators import curation as cu


class TestRepetition:
    def test_known_duplicate_fraction(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "a b a b a b"),   # 3-grams: aba, bab, aba, bab
                (2, "w x y z"),       # 2 distinct 3-grams
                (3, "one two"),       # < 3 words: no grams
            ],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: (r["n_grams"], r["n_distinct"], r["dup_frac"])
            for r in cu.repetition_profile(docs).collect()
        }
        assert got[1] == (4, 2, 0.5)
        assert got[2] == (2, 2, 0.0)
        assert got[3] == (0, 0, 0.0)


class TestPiiScrub:
    def test_counts_and_clean_digest(self, spark):
        text = "mail a@b.co and c.d+x@e.org or call 555-123-4567 ok"
        docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
        row = cu.pii_scrub(docs).collect()[0]
        assert row["n_emails"] == 2 and row["n_phones"] == 1
        expected = "mail <EMAIL> and <EMAIL> or call <PHONE> ok"
        assert row["clean_md5"] == hashlib.md5(expected.encode()).hexdigest()

    def test_email_scrub_precedes_phone_count(self, spark):
        # digits inside an email local part must not count as a phone
        docs = spark.createDataFrame(
            [(1, "x 555-123-4567@corp.example y")], "doc_id long, text string"
        )
        row = cu.pii_scrub(docs).collect()[0]
        assert row["n_emails"] == 1 and row["n_phones"] == 0


class TestContamination:
    def test_shared_8gram_found_self_excluded(self, spark):
        passage = "the quick brown fox jumps over the lazy dog tonight"
        docs = spark.createDataFrame(
            [
                (1, "intro words here " + passage),
                (2, passage + " trailing text"),
                (3, "totally unrelated content with many different words "
                    "spread across this entire sentence"),
            ],
            "doc_id long, text string",
        )
        ev = docs.where("doc_id = 1")
        got = {
            (r["doc_id"], r["eval_id"]): r["n_shared"]
            for r in cu.contamination_check(docs, ev).collect()
        }
        assert set(got) == {(2, 1)}  # doc 2 contaminated; self (1,1) excluded
        assert got[(2, 1)] >= 1

    def test_eval_side_broadcasts(self, spark):
        docs = spark.createDataFrame(
            [(1, "a b c d e f g h i"), (2, "a b c d e f g h j")],
            "doc_id long, text string",
        )
        plan = cu.contamination_check(docs, docs.where("doc_id = 1"))._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan  # the corpus is never shuffled


class TestStratifiedSample:
    def test_deterministic_and_partition_independent(self, spark):
        docs = spark.createDataFrame(
            [(i, "en" if i % 3 else "de") for i in range(500)],
            "doc_id long, lang string",
        )
        rates = {("en",): 20, ("de",): 50}
        a = {r["doc_id"] for r in cu.stratified_sample(
            docs.repartition(8), ["lang"], rates).collect()}
        b = {r["doc_id"] for r in cu.stratified_sample(
            docs.orderBy(F.desc("doc_id")).repartition(3), ["lang"], rates
        ).collect()}
        assert a == b and a  # same exact rows regardless of layout
        # rates land near their targets (md5 is uniform)
        en = [r for r in a if r % 3]
        de = [r for r in a if not r % 3]
        n_en, n_de = len([i for i in range(500) if i % 3]), len(
            [i for i in range(500) if not i % 3]
        )
        assert abs(len(en) / n_en - 0.20) < 0.08
        assert abs(len(de) / n_de - 0.50) < 0.10

    def test_no_shuffle_in_plan(self, spark):
        docs = spark.createDataFrame(
            [(i, "en") for i in range(100)], "doc_id long, lang string"
        )
        plan = cu.stratified_sample(docs, ["lang"], 25)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # a pure filter: no shuffle at 100 TB

    def test_flat_rate_applies_everywhere(self, spark):
        docs = spark.createDataFrame(
            [(i, "xx") for i in range(200)], "doc_id long, lang string"
        )
        n = cu.stratified_sample(docs, ["lang"], 100).count()
        assert n == 200  # rate 100/100 keeps everything
        assert cu.stratified_sample(docs, ["lang"], 0).count() == 0

    def test_wrong_arity_stratum_raises(self, spark):
        docs = spark.createDataFrame(
            [(1, "en", "web")], "doc_id long, lang string, source string"
        )
        with pytest.raises(ValueError, match="stratum tuples"):
            cu.stratified_sample(docs, ["lang", "source"], {("en",): 50})

    def test_default_rate_for_unlisted_strata(self, spark):
        docs = spark.createDataFrame(
            [(i, "en" if i % 2 else "de") for i in range(200)],
            "doc_id long, lang string",
        )
        # unlisted 'de' excluded by default...
        only_en = cu.stratified_sample(docs, ["lang"], {("en",): 100})
        assert {r["lang"] for r in only_en.collect()} == {"en"}
        # ...and passed through whole with default_rate=buckets
        both = cu.stratified_sample(
            docs, ["lang"], {("en",): 100}, default_rate=100
        )
        assert both.where("lang = 'de'").count() == 100


class TestUnigramLogprob:
    def test_matches_python_oracle_with_oov(self, spark):
        import math

        from chunksilo_spark.operators.curation import unigram_logprob

        rows = [
            (0, "the cat sat on the mat"),
            (1, "the dog ran"),
            (2, "zyxwv qqqq zyxwv"),  # rare tokens -> OOV under a tiny vocab
            (3, "the the the cat"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        vocab_size, floor = 3, 0.5

        toks = [(i, t) for i, s in rows for t in s.split()]
        total = len(toks)
        counts: dict = {}
        for _, t in toks:
            counts[t] = counts.get(t, 0) + 1
        vocab = dict(
            sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_size]
        )
        want = {}
        for i, s in rows:
            lps = [
                math.log(vocab.get(t, floor) / total) for t in s.split()
            ]
            want[i] = (len(lps), round(sum(lps) / len(lps), 6))

        got = {
            r["doc_id"]: (r["n_tokens"], r["mean_logprob"])
            for r in unigram_logprob(
                df, vocab_size=vocab_size, floor_count=floor
            ).collect()
        }
        assert got == want
        # the rare-token doc scores strictly worse than the common-token doc
        assert got[2][1] < got[3][1]


class TestEdgeWhitespaceTokens:
    def test_boundary_newlines_yield_no_phantom_grams(self, spark):
        # F.trim strips spaces only; text edged with \n/\t must not
        # produce '' tokens (phantom n-grams diverging from the oracles)
        rows = [(0, "\nfoo bar baz\n"), (1, "\tfoo foo foo\t")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        prof = {
            r["doc_id"]: (r["n_grams"], r["n_distinct"])
            for r in cu.repetition_profile(df, n=3).collect()
        }
        assert prof == {0: (1, 1), 1: (1, 1)}
        lm = {
            r["doc_id"]: r["n_tokens"]
            for r in cu.unigram_logprob(df, vocab_size=2).collect()
        }
        assert lm == {0: 3, 1: 3}


class TestHashedLinearQuality:
    def test_matches_python_oracle(self, spark):
        import math

        rows = [(0, "Alpha beta GAMMA delta"), (1, ""), (2, "one")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: (r["n_toks"], r["score"], r["keep"])
            for r in cu.hashed_linear_quality(df, n_buckets=1024).collect()
        }

        def bucket(t):
            return int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % 1024

        def w(b):
            h = int(hashlib.md5(f"qw:{b}".encode()).hexdigest()[:15], 16)
            return (h % 2001 - 1000) / 1000.0

        for doc_id, text in rows:
            toks = text.lower().split()
            z = sum(w(bucket(t)) for t in toks) / max(len(toks), 1)
            score = round(1 / (1 + math.exp(-z)), 6)
            assert got[doc_id] == (len(toks), score, score >= 0.5)

    def test_trained_weights_drop_in(self, spark):
        # a "trained" 4-bucket head rides the plan as a literal: every
        # token of doc 0 lands in some bucket; flipping that bucket's
        # weight flips the doc's score around 0.5
        df = spark.createDataFrame([(0, "tok tok tok")], "doc_id long, text string")
        b = int(hashlib.md5(b"tok").hexdigest()[:15], 16) % 4
        up = [0.0] * 4
        up[b] = 2.0
        down = [0.0] * 4
        down[b] = -2.0
        hi = cu.hashed_linear_quality(df, n_buckets=4, weights=up).collect()[0]
        lo = cu.hashed_linear_quality(df, n_buckets=4, weights=down).collect()[0]
        assert hi["keep"] and not lo["keep"]
        assert hi["score"] > 0.5 > lo["score"]

    def test_weight_arity_raises(self, spark):
        df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
        with pytest.raises(ValueError):
            cu.hashed_linear_quality(df, n_buckets=8, weights=[1.0, 2.0])


class TestUrlQualityFilter:
    ROWS = [
        (0, "https://ok.example/a/b.html"),
        (1, "https://ads.tracker.example/x"),       # subdomain of blocked
        (2, "https://tracker.example/x"),           # exact blocked
        (3, "https://nontracker.example/x"),        # suffix must NOT match
        (4, "ftp://tracker.example/x"),             # scheme outranks host
        (5, "https://ok.example/p?utm_source=a"),
        (6, "https://ok.example/" + "a/" * 13 + "x"),
    ]

    def _expect(self):
        return {
            0: None,
            1: "blocked_host",
            2: "blocked_host",
            3: None,
            4: "scheme",
            5: "blocked_pattern",
            6: "path_too_deep",
        }

    def test_list_blocklist_and_priorities(self, spark):
        df = spark.createDataFrame(self.ROWS, "doc_id long, url string")
        got = {
            r["doc_id"]: r["reject_reason"]
            for r in cu.url_quality_filter(
                df,
                blocked_hosts=["tracker.example"],
                blocked_patterns=[r"[?&]utm_"],
            ).collect()
        }
        assert got == self._expect()

    def test_dataframe_blocklist_matches_list_path(self, spark):
        df = spark.createDataFrame(self.ROWS, "doc_id long, url string")
        bl = spark.createDataFrame(
            [("tracker.example",)], "blocked_host string"
        )
        got = {
            r["doc_id"]: (r["reject_reason"], r["url"])
            for r in cu.url_quality_filter(
                df, blocked_hosts=bl, blocked_patterns=[r"[?&]utm_"]
            ).collect()
        }
        assert {k: v[0] for k, v in got.items()} == self._expect()
        # original columns pass through untouched
        assert got[0][1] == self.ROWS[0][1]


def _python_boilerplate(rows, min_docs=2):
    """Driver-side re-derivation of remove_boilerplate_lines."""
    import re

    def norm(s):
        return re.sub(r"\s+", " ", s).strip().lower()

    df = {}
    for _id, text in rows:
        seen = set()
        for ln in text.split("\n"):
            n = norm(ln)
            if n and n not in seen:
                seen.add(n)
                df[n] = df.get(n, 0) + 1
    out = {}
    for _id, text in rows:
        lines = text.split("\n")
        kept = [
            ln for ln in lines
            if not norm(ln) or df[norm(ln)] < min_docs
        ]
        out[_id] = ("\n".join(kept), len(lines), len(lines) - len(kept))
    return out


class TestBoilerplateLines:
    ROWS = [
        (1, "Unique alpha content\nCopyright  2024 ACME\nmore body text"),
        (2, "different body\ncopyright 2024 acme\n\nclosing line"),
        (3, "COPYRIGHT 2024   ACME\nanother page entirely\nclosing line"),
        (4, "no shared lines here at all"),
        (5, "repeated inside\nrepeated inside\nrepeated inside"),
    ]

    def _df(self, spark):
        return spark.createDataFrame(self.ROWS, "doc_id long, text string")

    def test_matches_python_oracle(self, spark):
        from chunksilo_spark.operators.curation import remove_boilerplate_lines

        got = {
            r["doc_id"]: (r["clean_text"], r["n_lines"], r["n_removed"])
            for r in remove_boilerplate_lines(self._df(spark)).collect()
        }
        assert got == _python_boilerplate(self.ROWS)

    def test_pinned_behaviors(self, spark):
        from chunksilo_spark.operators.curation import remove_boilerplate_lines

        got = {
            r["doc_id"]: r
            for r in remove_boilerplate_lines(self._df(spark)).collect()
        }
        # ws/case-variant copyright line removed from all three docs
        for d in (1, 2, 3):
            assert "opyright" not in got[d]["clean_text"], d
        # blank line survives (doc 2 keeps its empty structural line)
        assert "\n\nclosing" not in got[2]["clean_text"]
        assert "" in got[2]["clean_text"].split("\n")
        # df is per-DOC: doc 5's in-doc repetition is NOT boilerplate
        assert got[5]["n_removed"] == 0
        # 'closing line' in docs 2+3 -> removed at min_docs=2
        assert "closing line" not in got[2]["clean_text"]

    def test_min_docs_threshold(self, spark):
        from chunksilo_spark.operators.curation import remove_boilerplate_lines

        got = {
            r["doc_id"]: r["n_removed"]
            for r in remove_boilerplate_lines(
                self._df(spark), min_docs=3
            ).collect()
        }
        # only the 3-doc copyright line crosses df>=3; closing line (df 2) stays
        assert got == {1: 1, 2: 1, 3: 1, 4: 0, 5: 0}

    def test_all_boilerplate_doc_yields_empty(self, spark):
        from chunksilo_spark.operators.curation import remove_boilerplate_lines

        rows = [(1, "same line"), (2, "same line"), (3, "same line")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["doc_id"]: r for r in remove_boilerplate_lines(df).collect()}
        assert all(r["clean_text"] == "" and r["n_removed"] == 1
                   for r in got.values())

    def test_over_corpus_documents(self, spark):
        """End-to-end over stage-1 extracted text: removal == python oracle
        on real multi-line markdown-ish documents."""
        from chunksilo_spark.operators import stage1_extract as s1
        from chunksilo_spark.operators.curation import remove_boilerplate_lines
        from chunksilo_spark.sources.corpus import pages_df

        docs = s1.extract_documents(pages_df(spark, 50)).select(
            "url", "text"
        )
        rows = [(r["url"], r["text"]) for r in docs.collect()]
        got = {
            r["url"]: (r["clean_text"], r["n_lines"], r["n_removed"])
            for r in remove_boilerplate_lines(
                docs, min_docs=3, id_col="url"
            ).collect()
        }
        assert got == _python_boilerplate(rows, min_docs=3)
        assert sum(v[2] for v in got.values()) > 0  # something was removed


class TestDomainProfile:
    ROWS = [
        ("https://A.example/p1", "same text", "en"),
        ("https://a.example/p2", "same text", "en"),      # dup of p1
        ("https://a.example/p3", "unique here", "de"),
        ("https://B.example:8080/p4", "same text", "en"),  # cross-host dup
        ("https://b.example:8080/p5", "other b", "en"),
        ("ftp://c.example/x", "ignored row", "en"),        # no http host
        ("ftp://c.example/y", "other b", "en"),  # dups an http row's text
        ("relative/only", "ignored too", "en"),
    ]

    def test_profile(self, spark):
        from chunksilo_spark.operators.curation import domain_profile

        df = spark.createDataFrame(self.ROWS, "url string, text string, lang string")
        got = {r["host"]: r for r in domain_profile(df).collect()}
        assert set(got) == {"a.example", "b.example"}
        a = got["a.example"]
        assert (a["n_docs"], a["n_dup_docs"], a["n_langs"]) == (3, 2, 2)
        assert a["dup_ppm"] == (2 * 1000000) // 3
        b = got["b.example"]
        # p4 dups a.example's text; p5's text dups an EXCLUDED ftp row —
        # the corpus-wide window flags both even though only http rows
        # are profiled
        assert (b["n_docs"], b["n_dup_docs"], b["n_langs"]) == (2, 2, 1)
        assert a["sum_chars"] == len("same text") * 2 + len("unique here")

    def test_empty(self, spark):
        from chunksilo_spark.operators.curation import domain_profile

        df = spark.createDataFrame([], "url string, text string, lang string")
        assert domain_profile(df).count() == 0

    def test_over_corpus(self, spark):
        """Host totals over the synthetic crawl reconcile with raw counts."""
        from chunksilo_spark.operators.curation import domain_profile
        from chunksilo_spark.sources.corpus import pages_df
        from chunksilo_spark.operators import stage1_extract as s1

        docs = s1.extract_documents(pages_df(spark, 60))
        prof = domain_profile(docs).collect()
        assert sum(r["n_docs"] for r in prof) == docs.count()
        assert all(r["host"].startswith("site") for r in prof)


class TestBigramLogprob:
    def test_matches_python_oracle(self, spark):
        import math

        from chunksilo_spark.operators.curation import bigram_logprob

        rows = [
            (0, "the cat sat on the mat"),
            (1, "the cat ran"),
            (2, "one"),            # <2 tokens -> no bigrams, drops out
            (3, "  the   cat  "),  # messy whitespace, one bigram
            (4, ""),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        lam = 0.75

        bigrams = []
        for i, s in rows:
            t = s.split()
            bigrams += [(i, t[j], t[j + 1]) for j in range(len(t) - 1)]
        c12: dict = {}
        c1: dict = {}
        c2: dict = {}
        for _, a, b in bigrams:
            c12[(a, b)] = c12.get((a, b), 0) + 1
            c1[a] = c1.get(a, 0) + 1
            c2[b] = c2.get(b, 0) + 1
        T = len(bigrams)
        want = {}
        for i, s in rows:
            t = s.split()
            lps = [
                math.log(
                    lam * (c12[(t[j], t[j + 1])] / c1[t[j]])
                    + (1 - lam) * (c2[t[j + 1]] / T)
                )
                for j in range(len(t) - 1)
            ]
            if lps:
                want[i] = (len(lps), round(sum(lps) / len(lps), 6))

        got = {
            r["doc_id"]: (r["n_bigrams"], r["mean_logprob"])
            for r in bigram_logprob(df, lam=lam).collect()
        }
        assert got == want
        assert 2 not in got and 4 not in got

    def test_order_sensitivity(self, spark):
        # same token multiset, different order -> the repeated-order doc
        # must score strictly higher (this is what unigram LM cannot see)
        from chunksilo_spark.operators.curation import bigram_logprob

        rows = [(i, "a b a b a b a b") for i in range(4)] + [
            (9, "b b a a b a b a")
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: r["mean_logprob"]
            for r in bigram_logprob(df).collect()
        }
        assert got[0] > got[9]


class TestDsirLogratio:
    def test_matches_python_oracle(self, spark):
        import hashlib
        import math

        from chunksilo_spark.operators.curation import dsir_logratio

        rows = [
            (0, "en", "the cat sat on the mat"),
            (1, "en", "the cat ran home"),
            (2, "de", "der hund lief schnell weg"),
            (3, "de", "der hund schlief"),
            (4, "en", "x"),  # <2 tokens -> drops out
        ]
        B = 16

        def bucket(a, b):
            h = hashlib.md5(f"{a} {b}".encode()).hexdigest()[:15]
            return int(h, 16) % B

        feats = []
        for i, lang, s in rows:
            t = s.split()
            feats += [
                (i, lang == "en", bucket(t[j], t[j + 1]))
                for j in range(len(t) - 1)
            ]
        cr: dict = {}
        ct: dict = {}
        for _, tgt, f in feats:
            cr[f] = cr.get(f, 0) + 1
            if tgt:
                ct[f] = ct.get(f, 0) + 1
        tr, tt = len(feats), sum(1 for _, tgt, _ in feats if tgt)
        want = {}
        for i, _, s in rows:
            t = s.split()
            ws = [
                math.log(
                    ((ct.get(bucket(t[j], t[j + 1]), 0) + 1) / (tt + B))
                    / ((cr[bucket(t[j], t[j + 1])] + 1) / (tr + B))
                )
                for j in range(len(t) - 1)
            ]
            if ws:
                want[i] = (len(ws), round(sum(ws), 6))

        df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
        from pyspark.sql import functions as F

        got = {
            r["doc_id"]: (r["n_feats"], r["dsir_logratio"])
            for r in dsir_logratio(
                df, F.col("lang") == "en", buckets=B
            ).collect()
        }
        assert got == want and 4 not in got

    def test_target_profile_ranks_higher(self, spark):
        # target-slice docs must average a higher weight than off-target
        from pyspark.sql import functions as F

        from chunksilo_spark.operators.curation import dsir_logratio

        rows = [(i, "en", "alpha beta gamma delta epsilon zeta") for i in range(8)] + [
            (100 + i, "de", "eins zwei drei vier fuenf sechs") for i in range(8)
        ]
        df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
        got = {
            r["doc_id"]: r["dsir_logratio"]
            for r in dsir_logratio(df, F.col("lang") == "en").collect()
        }
        en = sum(v for k, v in got.items() if k < 100) / 8
        de = sum(v for k, v in got.items() if k >= 100) / 8
        assert en > 0 > de


class TestTfidfTopTerms:
    DOCS = [
        (1, "apple banana apple cherry"),
        (2, "banana cherry cherry date"),
        (3, "apple banana"),
        (4, "  Unique\tTOKENS  here  "),  # ws mess + case folding
    ]

    def _python_tfidf(self, docs, k):
        import math

        tf = {}
        for i, text in docs:
            for t in text.lower().split():
                tf[(i, t)] = tf.get((i, t), 0) + 1
        df = {}
        for (_, t) in tf:
            df[t] = df.get(t, 0) + 1
        n = len(docs)
        scored = [
            (i, t, c, df[t], round(c * math.log(n / df[t]), 6))
            for (i, t), c in tf.items()
        ]
        out = []
        for i in {i for i, _ in docs}:
            mine = sorted(
                (r for r in scored if r[0] == i),
                key=lambda r: (-r[4], r[1]),
            )[:k]
            out.extend(
                (i, t, c, d, s, rank + 1)
                for rank, (_, t, c, d, s) in enumerate(mine)
            )
        return sorted(out)

    def _run(self, spark, k):
        docs = spark.createDataFrame(self.DOCS, "doc_id long, text string")
        got = cu.tfidf_top_terms(docs, k=k)
        return sorted(
            (r["doc_id"], r["term"], r["tf"], r["df"], r["tfidf"], r["rank"])
            for r in got.collect()
        )

    def test_matches_python_oracle(self, spark):
        for k in (1, 2, 5):
            assert self._run(spark, k) == self._python_tfidf(self.DOCS, k), k

    def test_distinctive_term_outranks_common(self, spark):
        got = self._run(spark, 1)
        top = {i: t for i, t, *_ in got}
        # doc 1's 'apple' (tf 2, df 2) beats 'cherry' (tf 1, df 2) and
        # 'banana' (tf 1, df 3); doc 4 is all-unique -> lexicographically
        # first unique term wins among equal scores
        assert top[1] == "apple"
        assert top[4] == "here"

    def test_corpuswide_term_scores_zero_but_stays(self, spark):
        docs = spark.createDataFrame(
            [(1, "same"), (2, "same")], "doc_id long, text string"
        )
        rows = cu.tfidf_top_terms(docs, k=1).collect()
        assert sorted((r["doc_id"], r["term"], r["tfidf"]) for r in rows) == [
            (1, "same", 0.0), (2, "same", 0.0),
        ]


class TestImportanceSample:
    def _df(self, spark):
        import math

        rows = [(i, round(math.sin(i) * 2, 3)) for i in range(400)]
        return (
            spark.createDataFrame(rows, "doc_id long, w double"),
            dict(rows),
        )

    def test_matches_python_formula(self, spark):
        import hashlib
        import math

        from chunksilo_spark.operators.curation import importance_sample

        df, weights = self._df(spark)
        got = {
            r["doc_id"]: r["accept_p"]
            for r in importance_sample(
                df, "w", temperature=2.0, scale=0.5
            ).collect()
        }
        exp = {}
        for i, w in weights.items():
            u = int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) / float(
                1 << 60
            )
            p = min(1.0, 0.5 * math.exp(w / 2.0))
            if u < p:
                exp[i] = round(p, 6)
        assert got == exp
        # the weighting must actually thin: some accepted, some rejected
        assert 0 < len(got) < 400

    def test_higher_weight_never_hurts_acceptance(self, spark):
        from chunksilo_spark.operators.curation import importance_sample

        df, _ = self._df(spark)
        lo = {r["doc_id"] for r in importance_sample(df, "w", scale=0.2).collect()}
        hi = {r["doc_id"] for r in importance_sample(df, "w", scale=0.8).collect()}
        assert lo <= hi  # raising scale only adds rows (same u per id)

    def test_bad_params_raise(self, spark):
        from chunksilo_spark.operators.curation import importance_sample

        df = spark.createDataFrame([(1, 0.0)], "doc_id long, w double")
        with pytest.raises(ValueError):
            importance_sample(df, "w", temperature=0)
        with pytest.raises(ValueError):
            importance_sample(df, "w", scale=-1)


class TestMixToTarget:
    def _docs(self, spark):
        rows = [(i, ["en", "en", "en", "en", "de", "fr"][i % 6]) for i in range(600)]
        return spark.createDataFrame(rows, "doc_id long, lang string"), rows

    def test_matches_python_formula(self, spark):
        import hashlib

        from chunksilo_spark.operators.curation import mix_to_target

        df, rows = self._docs(spark)
        targets = {"en": 0.5, "de": 0.25, "fr": 0.25}
        counts = {}
        for _, g in rows:
            counts[g] = counts.get(g, 0) + 1
        T = min(counts[d] / t for d, t in targets.items())
        exp = {}
        for i, g in rows:
            if g not in targets:
                continue
            p = targets[g] * T / counts[g]
            u = int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) / float(
                1 << 60
            )
            if u < p:
                exp[i] = (g, round(p, 6))
        got = {
            r["doc_id"]: (r["lang"], r["accept_p"])
            for r in mix_to_target(df, "lang", targets).collect()
        }
        assert got == exp

    def test_binding_domain_fully_kept_and_mixture_near_target(self, spark):
        from chunksilo_spark.operators.curation import mix_to_target

        df, rows = self._docs(spark)
        # de and fr are 100 rows each vs en 400; targets make de binding
        out = mix_to_target(df, "lang", {"en": 0.5, "de": 0.25, "fr": 0.25})
        by = {r[0]: r[1] for r in out.groupBy("lang").count().collect()}
        assert by["de"] == 100  # binding domain: p == 1, nothing dropped
        # en target is 2x de's: expected 200 of 400 (binomial, wide margin)
        assert 150 <= by["en"] <= 250
        assert 75 <= by["fr"] <= 100

    def test_unlisted_domains_dropped(self, spark):
        from chunksilo_spark.operators.curation import mix_to_target

        df, _ = self._docs(spark)
        out = mix_to_target(df, "lang", {"en": 1.0})
        assert {r["lang"] for r in out.select("lang").distinct().collect()} == {
            "en"
        }

    def test_bad_targets_raise(self, spark):
        import pytest as _pytest

        from chunksilo_spark.operators.curation import mix_to_target

        df, _ = self._docs(spark)
        with _pytest.raises(ValueError):
            mix_to_target(df, "lang", {})
        with _pytest.raises(ValueError):
            mix_to_target(df, "lang", {"en": 0.0})


class TestRegisteredDomains:
    RULES = [("com",), ("co.uk",), ("*.ck",), ("!www.ck",), ("uk",)]

    def _run(self, spark, hosts):
        from chunksilo_spark.operators.curation import registered_domains

        rules = spark.createDataFrame(self.RULES, "rule string")
        df = spark.createDataFrame([(h,) for h in hosts], "host string")
        return {
            r["host"]: (r["public_suffix"], r["registered_domain"])
            for r in registered_domains(df, rules).collect()
        }

    def test_psl_canonical_vectors(self, spark):
        got = self._run(spark, [
            "example.com", "a.b.example.com", "example.co.uk",
            "www.example.co.uk", "foo.ck", "www.ck", "a.www.ck",
            "bar.foo.ck", "example.zz", "zz", "co.uk", "Example.COM",
        ])
        assert got == {
            "example.com": ("com", "example.com"),
            "a.b.example.com": ("com", "example.com"),
            "example.co.uk": ("co.uk", "example.co.uk"),
            "www.example.co.uk": ("co.uk", "example.co.uk"),
            # wildcard *.ck: every direct child of ck is a suffix
            "foo.ck": ("foo.ck", None),
            # exception !www.ck beats the wildcard
            "www.ck": ("ck", "www.ck"),
            "a.www.ck": ("ck", "www.ck"),
            "bar.foo.ck": ("foo.ck", "bar.foo.ck"),
            # unknown TLD -> implicit * rule
            "example.zz": ("zz", "example.zz"),
            "zz": ("zz", None),
            # a bare public suffix has no registered domain
            "co.uk": ("co.uk", None),
            # hosts are case-folded
            "Example.COM": ("com", "example.com"),
        }

    def test_longest_rule_wins_and_columns_pass_through(self, spark):
        from chunksilo_spark.operators.curation import registered_domains

        rules = spark.createDataFrame(
            [("uk",), ("co.uk",)], "rule string"
        )
        df = spark.createDataFrame(
            [("x.co.uk", 7)], "host string, payload int"
        )
        row = registered_domains(df, rules).collect()[0]
        assert (row["public_suffix"], row["registered_domain"]) == (
            "co.uk", "x.co.uk"
        )
        assert row["payload"] == 7

    def test_quota_grouping_use_case(self, spark):
        # the operator's point: per-PLD caps group subdomain dust
        hosts = [f"s{i}.example.co.uk" for i in range(5)] + [
            "other.com", "deep.a.other.com"
        ]
        got = self._run(spark, hosts)
        plds = {v[1] for v in got.values()}
        assert plds == {"example.co.uk", "other.com"}
