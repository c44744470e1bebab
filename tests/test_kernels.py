"""Unit tests for the pure semantic kernels (no Spark).

Mirrors the reference's pure-function test layer (SURVEY §5.1:
test_chunk_location.py / test_utils.py / test_confluence_html_formatter.py).
"""

from chunksilo_spark.functions.chunk import chunk_text, split_sentences
from chunksilo_spark.functions.embed import bow_embed, bow_embed_matrix
from chunksilo_spark.functions.extract import (
    char_to_line,
    extract_headings,
    extract_text,
    heading_path,
    line_offsets,
)
from chunksilo_spark.functions.minhash import (
    band_keys,
    char_shingles,
    hamming64,
    jaccard,
    minhash_signature,
    simhash64,
)
from chunksilo_spark.functions.textstats import (
    detect_language,
    extract_quoted_phrases,
    preprocess_query,
    quality_score,
    tokenize_filename,
)
from chunksilo_spark.functions.triples import (
    extract_mentions,
    extract_triples_from_sentence,
    normalize_surface,
)


class TestExtract:
    def test_headings_become_atx(self):
        assert extract_text("<h1>Title</h1><h3>Sub</h3>") == "# Title\n\n### Sub"

    def test_paragraphs_and_lists(self):
        out = extract_text("<p>One two.</p><ul><li>a</li><li>b</li></ul>")
        assert out == "One two.\n\n* a\n* b"

    def test_script_style_stripped(self):
        out = extract_text("<p>keep</p><script>var x=1;</script><style>.c{}</style>")
        assert out == "keep"

    def test_spans_unwrapped(self):
        html = '<p><span style="color:#c00">red</span> and <span>plain</span></p>'
        assert extract_text(html) == "red and plain"

    def test_pre_becomes_fence(self):
        out = extract_text("<pre># not-a-heading\ncode()\n</pre>")
        assert out == "```\n# not-a-heading\ncode()\n```"
        assert extract_headings(out) == []

    def test_malformed_html_tolerated(self):
        out = extract_text("<html><body><h2>T</h2><p>dangling")
        assert out == "## T\n\ndangling"

    def test_whitespace_collapsed(self):
        assert extract_text("<p>a\n   b\t c</p>") == "a b c"

    def test_headings_extraction_positions(self):
        text = "# A\n\nbody\n\n## B\n\nmore"
        hs = extract_headings(text)
        assert [(h["text"], h["level"]) for h in hs] == [("A", 1), ("B", 2)]
        assert text[hs[1]["position"]:].startswith("## B")

    def test_heading_path_flat_prefix(self):
        # reference _build_heading_path (search.py:154-172) returns the texts
        # of ALL headings up to the position — sibling same-level headings
        # stay in the path (it is NOT a decreasing-level ancestor chain)
        text = "# A\n\n## B\n\nbody\n\n## C\n\ntail"
        hs = extract_headings(text)
        assert heading_path(hs, text.index("body")) == ["A", "B"]
        assert heading_path(hs, text.index("tail")) == ["A", "B", "C"]
        assert heading_path(hs, 0) == ["A"]
        assert heading_path(hs, text.index("# A") - 1 if "#" != text[0] else 0) == ["A"]

    def test_heading_path_before_first_heading_empty(self):
        text = "intro\n\n# A\n\nbody"
        hs = extract_headings(text)
        assert heading_path(hs, 0) == []
        assert heading_path(hs, text.index("body")) == ["A"]
        assert heading_path([], 10) == []

    def test_line_offsets_and_char_to_line(self):
        text = "ab\ncd\nef"
        offs = line_offsets(text)
        assert offs == [0, 3, 6]
        assert char_to_line(offs, 0) == 1
        assert char_to_line(offs, 4) == 2
        assert char_to_line(offs, 7) == 3


class TestChunk:
    def test_sentences(self):
        spans = split_sentences("One. Two! Three?")
        assert [(s, e) for s, e in spans] == [(0, 4), (5, 9), (10, 16)]

    def test_single_chunk_when_small(self):
        text = "One. Two. Three."
        chunks = chunk_text(text)
        assert len(chunks) == 1
        assert chunks[0][1] == text
        assert (chunks[0][2], chunks[0][3]) == (0, len(text))

    def test_windows_and_overlap(self):
        sents = [f"word{i} " * 99 + "end." for i in range(10)]  # 100 tokens each
        text = " ".join(sents)
        chunks = chunk_text(text, chunk_size=250, chunk_overlap=100)
        assert len(chunks) > 1
        for _, ctext, cs, ce in chunks:
            assert text[cs:ce] == ctext
            assert len(ctext.split()) <= 300  # <=2 sentences + slack
        # consecutive chunks overlap by exactly one 100-token sentence
        assert chunks[1][2] < chunks[0][3]

    def test_oversized_sentence_is_own_chunk(self):
        text = "w " * 600 + "end. short one."
        chunks = chunk_text(text, chunk_size=512)
        assert len(chunks) == 2


class TestEmbed:
    def test_reference_bow_semantics(self):
        # reference conftest.py:36-55: index = sum(ord) % 384 per word
        vec = bow_embed("Ab ab")
        idx = (ord("a") + ord("b")) % 384
        assert vec[idx] == 2.0 and sum(vec) == 2.0

    def test_matrix_matches_single(self):
        texts = ["Acme Corp", "hello world hello"]
        mat = bow_embed_matrix(texts)
        for i, t in enumerate(texts):
            assert list(mat[i]) == bow_embed(t)


class TestTriples:
    def test_mentions(self):
        ms = extract_mentions("Acme Corp acquired Beta-Systems yesterday.")
        assert [m[0] for m in ms] == ["Acme Corp", "Beta-Systems"]

    def test_triple_rule(self):
        got = extract_triples_from_sentence("Acme Corp acquired Beta Inc.")
        assert got == [("Acme Corp", "acquired", "Beta Inc")]

    def test_longest_phrase_wins(self):
        got = extract_triples_from_sentence("Acme Corp is headquartered in Oslo City.")
        assert got == [("Acme Corp", "headquartered_in", "Oslo City")]

    def test_no_mention_no_triple(self):
        assert extract_triples_from_sentence("it was founded by someone.") == []

    def test_normalize_surface(self):
        assert normalize_surface("ACME-Corp  Inc.") == "acme corp inc"


class TestMinhash:
    def test_signature_deterministic(self):
        a = minhash_signature(["acme", "corp"])
        b = minhash_signature(["acme", "corp"])
        assert (a == b).all()
        assert len(band_keys(a)) == 32

    def test_similar_sets_share_bands(self):
        a = set(band_keys(minhash_signature(["acme", "corp", "inc"])))
        b = set(band_keys(minhash_signature(["acme", "corp"])))
        assert a & b

    def test_jaccard(self):
        assert jaccard({"a", "b"}, {"b", "c"}) == 1 / 3
        assert jaccard(set(), set()) == 1.0

    def test_simhash_similarity(self):
        a = simhash64("the quick brown fox jumps".split())
        b = simhash64("the quick brown fox leaps".split())
        c = simhash64("completely different words entirely here".split())
        assert hamming64(a, b) < hamming64(a, c)

    def test_char_shingles(self):
        assert char_shingles("abcd", 3) == ["abc", "bcd"]


class TestTextstats:
    def test_tokenize_filename(self):
        # reference index.py:1185-1215 semantics
        assert tokenize_filename("myFile_name-v2.PDF") == [
            "my", "file", "name", "v2", "pdf",
        ]

    def test_quoted_phrases(self):
        phrases, cleaned = extract_quoted_phrases('find "exact phrase" here')
        assert phrases == ["exact phrase"] and cleaned == "find here"

    def test_preprocess_query(self):
        assert preprocess_query("  what   is this?!") == "what is this"
        assert preprocess_query("a  b . ") == "a b"

    def test_detect_language(self):
        assert detect_language("the cat is on the mat and it is happy") == "en"
        assert detect_language("der hund ist mit der katze im haus") == "de"
        assert detect_language("") == "und"

    def test_quality_score_bounds(self):
        assert quality_score("") == 0.0
        dense = "the cat sat on the mat and it was good " * 10
        assert 0.0 < quality_score("!!! ???") < quality_score(dense) <= 1.0


class TestGlobMatch:
    """Pinned semantics of functions/globmatch (reference index.py:639-684)."""

    def test_right_anchored_component_match(self):
        from chunksilo_spark.functions.globmatch import matches

        assert matches("a/b/c.txt", ["*.txt"], [])
        assert matches("a/b/c.txt", ["b/*.txt"], [])
        assert not matches("a/b/c.txt", ["a/*.txt"], [])  # not trailing comps
        assert not matches("a/b/c.md", ["*.txt"], [])
        assert matches("a/b/c.txt", [], [])  # empty include passes

    def test_star_does_not_cross_separator(self):
        from chunksilo_spark.functions.globmatch import matches

        assert not matches("a/b/c.txt", ["a*.txt"], [])
        assert matches("ab.txt", ["a?.txt"], [])
        assert not matches("a/.txt", ["a?.txt"], [])

    def test_exclude_first_and_dir_exclusion(self):
        from chunksilo_spark.functions.globmatch import matches

        # **/X/** drops any path with a matching NON-final component
        assert not matches("x/node_modules/y.txt", ["*.txt"], ["**/node_modules/**"])
        assert not matches("x/my-venv/y/z.txt", ["*.txt"], ["**/*venv*/**"])
        # the filename itself is not a directory component
        assert matches("x/y/node_modules", [], ["**/node_modules/**"])
        # exclude wins over include
        assert not matches("a/b.txt", ["*.txt"], ["b.txt"])

    def test_case_insensitive_default(self):
        from chunksilo_spark.functions.globmatch import matches

        assert matches("A/B/C.TXT", ["*.txt"], [])
        assert not matches("A/B/C.TXT", ["*.txt"], [], case_sensitive=True)
        assert matches("a/b/c.txt", ["*.TXT"], [])

    def test_spark_filter_matches_python_kernel(self, spark):
        from chunksilo_spark.functions.globmatch import matches
        from chunksilo_spark.operators.search import glob_filter

        paths = [
            "src1/en/doc-1.txt", "src1/de/doc-2.txt", "SRC2/en/doc-13.txt",
            "src3/en/doc-100.txt", "src3/fr/doc-43.txt", "src1/en/readme.md",
            "a/node_modules/x.txt",
        ]
        include = ["src1/*/*", "doc-1*.txt"]
        exclude = ["**/de/**", "doc-?3.txt", "**/node_modules/**"]
        df = spark.createDataFrame([(p,) for p in paths], schema="path string")
        got = {r["path"] for r in glob_filter(df, include, exclude, col="path").collect()}
        want = {p for p in paths if matches(p, include, exclude)}
        assert got == want and want  # non-degenerate


class TestConfig:
    def test_defaults_and_override(self, tmp_path, monkeypatch):
        import importlib
        import json

        import chunksilo_spark.config as cfg

        assert cfg.get("retrieval.embed_top_k") == 20
        assert cfg.get("nonexistent.key", 7) == 7
        f = tmp_path / "over.json"
        f.write_text(json.dumps({"retrieval.embed_top_k": 33}))
        monkeypatch.setenv("CHUNKSILO_SPARK_CONFIG", str(f))
        importlib.reload(cfg)
        assert cfg.get("retrieval.embed_top_k") == 33
        assert cfg.get("retrieval.score_threshold") == 0.1  # default kept
        monkeypatch.delenv("CHUNKSILO_SPARK_CONFIG")
        importlib.reload(cfg)
        assert cfg.get("retrieval.embed_top_k") == 20


class TestWinnowFingerprint:
    def test_robust_to_local_edit_unlike_md5(self):
        import hashlib

        from chunksilo_spark.functions.minhash import rolling_fingerprint

        base = "the quick brown fox jumps over the lazy dog " * 20
        edited = base[:100] + "X" + base[101:]  # 1-char substitution
        assert rolling_fingerprint(base) == rolling_fingerprint(edited)
        assert (
            hashlib.md5(base.encode()).hexdigest()
            != hashlib.md5(edited.encode()).hexdigest()
        )
        # but a substantial rewrite changes it
        assert rolling_fingerprint(base) != rolling_fingerprint(
            "completely different content " * 20
        )

    def test_short_text_and_determinism(self):
        from chunksilo_spark.functions.minhash import rolling_fingerprint

        assert rolling_fingerprint("abc") == rolling_fingerprint("abc")
        assert len(rolling_fingerprint("")) == 32  # md5 hex
