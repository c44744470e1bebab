"""BPE trainer: parity with the classic reference algorithm (Sennrich et
al. 2016 pseudo-code: overlapping adjacent-pair counts, greedy
left-to-right merge application), run-merging edge cases, segmentation."""

from __future__ import annotations

import pytest

from chunksilo_spark.operators.tokenizer import (
    bpe_segment_words,
    bpe_train,
    word_frequencies,
)


def _python_bpe(word_counts, n_merges):
    """The textbook while-loop implementation — deliberately a different
    mechanism than the operator's bracket-string replace algebra."""
    vocab = {w: [ch for ch in w] for w in word_counts}
    merges = []
    for rank in range(1, n_merges + 1):
        pairs = {}
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + word_counts[w]
        if not pairs:
            break
        (l, r), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, l, r, cnt))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges, vocab


def _wc(texts):
    counts = {}
    for t in texts:
        for w in t.lower().split():
            counts[w] = counts.get(w, 0) + 1
    return counts


CORPUS = [
    "the cat sat on the mat",
    "the cat ate the rat aaaa aaa",
    "low lower lowest newest newest widest",
    "abab ababab banana bandana",
]


class TestBpeTrain:
    def _run(self, spark, texts, n_merges):
        df = spark.createDataFrame([(t,) for t in texts], "text string")
        got = bpe_train(df, n_merges=n_merges)
        return [
            (r["merge_rank"], r["left"], r["right"], r["pair_count"])
            for r in got.orderBy("merge_rank").collect()
        ]

    def test_matches_textbook_bpe(self, spark):
        for n in (1, 4, 12):
            exp, _ = _python_bpe(_wc(CORPUS), n)
            assert self._run(spark, CORPUS, n) == exp, n

    def test_run_merging_even_and_odd(self, spark):
        # 'aaaa' must become [aa][aa] then [aaaa]; 'aaa' -> [aa][a]
        got = self._run(spark, ["aaaa aaa"], 12)
        exp, vocab = _python_bpe({"aaaa": 1, "aaa": 1}, 12)
        assert got == exp
        assert vocab["aaaa"] == ["aaaa"]

    def test_stops_early_when_fully_merged(self, spark):
        got = self._run(spark, ["ab ab ab"], 50)
        assert len(got) == 1  # one merge exhausts all pairs
        assert got[0] == (1, "a", "b", 3)

    def test_segmentation_matches_textbook_vocab(self, spark):
        n = 8
        exp_merges, exp_vocab = _python_bpe(_wc(CORPUS), n)
        df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
        rules = [(l, r) for _, l, r, _ in exp_merges]
        seg = bpe_segment_words(word_frequencies(df).select("word"), rules)
        got = {r["word"]: list(r["tokens"]) for r in seg.collect()}
        assert got == exp_vocab

    def test_single_char_and_unicode_words(self, spark):
        got = self._run(spark, ["x y z éé"], 3)
        exp, _ = _python_bpe({"x": 1, "y": 1, "z": 1, "éé": 1}, 3)
        assert got == exp

    def test_bad_params_raise(self, spark):
        df = spark.createDataFrame([("a",)], "text string")
        with pytest.raises(ValueError):
            bpe_train(df, n_merges=0)


class TestBpeTokenCounts:
    def test_counts_match_textbook_segmentation(self, spark):
        from chunksilo_spark.operators.tokenizer import bpe_token_counts

        n = 8
        merges, vocab = _python_bpe(_wc(CORPUS), n)
        rules = [(l, r) for _, l, r, _ in merges]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
        )
        got = {
            r["doc_id"]: (r["n_words"], r["n_tokens"])
            for r in bpe_token_counts(df, rules).collect()
        }
        exp = {}
        for i, t in enumerate(CORPUS):
            ws = t.lower().split()
            exp[i] = (len(ws), sum(len(vocab[w]) for w in ws))
        assert got == exp

    def test_no_merges_counts_characters(self, spark):
        from chunksilo_spark.operators.tokenizer import bpe_token_counts

        df = spark.createDataFrame([(1, "ab cde")], "doc_id long, text string")
        got = bpe_token_counts(df, []).collect()[0]
        assert (got["n_words"], got["n_tokens"]) == (2, 5)


class TestBpeVocabAndEncode:
    def test_vocab_ids_chars_then_merges(self, spark):
        from chunksilo_spark.operators.tokenizer import bpe_vocab

        n = 6
        merges, _ = _python_bpe(_wc(CORPUS), n)
        rules = [(l, r) for _, l, r, _ in merges]
        df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
        got = {
            r["token"]: r["token_id"] for r in bpe_vocab(df, rules).collect()
        }
        chars = sorted({ch for t in CORPUS for ch in t.lower() if ch != " "})
        exp = {ch: i for i, ch in enumerate(chars)}
        for i, (l, r) in enumerate(rules):
            exp.setdefault(l + r, len(chars) + i)
        assert got == exp

    def test_duplicate_merge_string_keeps_smallest_id(self, spark):
        from chunksilo_spark.operators.tokenizer import bpe_vocab

        df = spark.createDataFrame([("abc abc",)], "text string")
        # contrive rules where ("a","bc") and ("ab","c") both yield "abc"
        rules = [("b", "c"), ("a", "bc"), ("a", "b"), ("ab", "c")]
        got = {
            r["token"]: r["token_id"] for r in bpe_vocab(df, rules).collect()
        }
        assert got["abc"] == 3 + 1  # 3 chars, then rank-2 rule (index 1)

    def test_encode_matches_segmentation_through_vocab(self, spark):
        from chunksilo_spark.operators.tokenizer import (
            bpe_encode_words,
            bpe_vocab,
            word_frequencies,
        )

        n = 8
        merges, vocab_py = _python_bpe(_wc(CORPUS), n)
        rules = [(l, r) for _, l, r, _ in merges]
        df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
        vocab = {
            r["token"]: r["token_id"] for r in bpe_vocab(df, rules).collect()
        }
        enc = bpe_encode_words(
            word_frequencies(df).select("word"), rules, vocab
        )
        got = {r["word"]: list(r["token_ids"]) for r in enc.collect()}
        exp = {w: [vocab[t] for t in toks] for w, toks in vocab_py.items()}
        assert got == exp
        assert all(None not in ids for ids in got.values())

    def test_unseen_char_encodes_null(self, spark):
        from chunksilo_spark.operators.tokenizer import bpe_encode_words

        words = spark.createDataFrame([("zq",)], "word string")
        got = bpe_encode_words(words, [], {"z": 0}).collect()[0]
        assert list(got["token_ids"]) == [0, None]
