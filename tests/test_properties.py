"""Property-based tests (hypothesis) for the pure kernels — invariants that
must hold for ANY input, not just the fixtures: offset arithmetic, chunk
reconstruction, signature determinism, glob/regex agreement.
"""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from chunksilo_spark.functions.chunk import chunk_text
from chunksilo_spark.functions.extract import (
    char_to_line,
    extract_headings,
    heading_path,
    line_offsets,
)
from chunksilo_spark.functions.minhash import (
    jaccard,
    minhash_signature,
    minhash_signatures_batch,
    word_shingles,
)

text_st = st.text(
    alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
    max_size=400,
)
words_st = st.lists(
    st.text(alphabet="abcdefgh", min_size=1, max_size=6), max_size=40
)


class TestOffsetInvariants:
    @given(text_st)
    @settings(max_examples=200, deadline=None)
    def test_line_offsets_partition_the_text(self, text):
        offs = line_offsets(text)
        assert offs[0] == 0 and offs == sorted(set(offs))
        # every char position maps to exactly the line whose start precedes it
        for pos in range(0, len(text), max(1, len(text) // 7)):
            line = char_to_line(offs, pos)
            assert 1 <= line <= len(offs)
            assert offs[line - 1] <= pos
            if line < len(offs):
                assert pos < offs[line]

    @given(text_st)
    @settings(max_examples=100, deadline=None)
    def test_heading_path_is_prefix_monotone(self, text):
        hs = extract_headings(text)
        # paths at increasing offsets only ever grow (flat-prefix semantics)
        prev: list[str] = []
        for pos in range(0, len(text) + 1, max(1, len(text) // 5 + 1)):
            cur = heading_path(hs, pos)
            assert cur[: len(prev)] == prev
            prev = cur


class TestChunkInvariants:
    @given(st.lists(st.sampled_from(
        ["One sentence here.", "Another bit!", "Ok?", "Word " * 30 + "end."]
    ), min_size=1, max_size=12))
    @settings(max_examples=100, deadline=None)
    def test_chunk_spans_reconstruct_text(self, sents):
        text = " ".join(sents)
        chunks = chunk_text(text)
        assert chunks, "non-empty text must chunk"
        for _, ctext, cs, ce in chunks:
            assert text[cs:ce] == ctext
        # coverage: every non-space char of the text appears in some chunk
        covered = set()
        for _, _, cs, ce in chunks:
            covered.update(range(cs, ce))
        missing = [i for i, ch in enumerate(text) if not ch.isspace() and i not in covered]
        assert not missing


class TestMinhashInvariants:
    @given(words_st, words_st)
    @settings(max_examples=100, deadline=None)
    def test_signature_agreement_tracks_jaccard_bounds(self, wa, wb):
        ta, tb = " ".join(wa), " ".join(wb)
        sa = minhash_signature(word_shingles(ta, 3))
        sb = minhash_signature(word_shingles(tb, 3))
        if ta == tb:
            assert (sa == sb).all()
        j = jaccard(set(word_shingles(ta, 3)), set(word_shingles(tb, 3)))
        agree = float((sa == sb).mean())
        # E[agree] == j; allow wide slack for 128 perms (binomial tail)
        assert abs(agree - j) <= 0.35

    @given(st.lists(st.text(alphabet="abc def", max_size=30), max_size=8))
    @settings(max_examples=60, deadline=None)
    def test_batch_equals_single_always(self, texts):
        lists = [word_shingles(t, 3) for t in texts]
        batch = minhash_signatures_batch(lists, max_chunk=7)
        for sig, sh in zip(batch, lists):
            assert (sig == minhash_signature(sh)).all()


class TestGlobInvariants:
    @given(
        st.lists(st.text(alphabet="abcxyz.", min_size=1, max_size=5),
                 min_size=1, max_size=4),
        st.text(alphabet="abcxyz.*?", min_size=1, max_size=6),
    )
    @settings(max_examples=200, deadline=None)
    def test_single_component_pattern_matches_last_component(self, comps, pat):
        """A one-component pattern matches iff the LAST path component
        fnmatches it (PurePosixPath.match semantics, case-sensitive)."""
        import fnmatch

        from chunksilo_spark.functions.globmatch import glob_to_regex

        path = "/".join(comps)
        got = bool(re.search(glob_to_regex(pat), path))
        want = fnmatch.fnmatchcase(comps[-1], pat)
        assert got == want


from urllib.parse import urljoin as _urljoin  # noqa: E402

from chunksilo_spark.functions.urls import resolve_href  # noqa: E402

_seg_st = st.text(alphabet="abcdefghij0123456789-_", min_size=1, max_size=5)


@st.composite
def _base_st(draw):
    scheme = draw(st.sampled_from(["http", "https"]))
    host = draw(_seg_st) + ".example"
    # depth >= 3 so up to 2 levels of ../ never climb above the root
    path = "/".join(draw(st.lists(_seg_st, min_size=3, max_size=5)))
    leaf = draw(_seg_st) + ".html"
    return f"{scheme}://{host}/{path}/{leaf}"


@st.composite
def _href_st(draw):
    kind = draw(st.sampled_from(
        ["abs", "scheme_rel", "root_rel", "rel", "dot_rel", "up_rel"]
    ))
    segs = draw(st.lists(_seg_st, min_size=1, max_size=3))
    tail = "/".join(segs) + ".html"
    if kind == "abs":
        return "https://" + draw(_seg_st) + ".example/" + tail
    if kind == "scheme_rel":
        return "//" + draw(_seg_st) + ".example/" + tail
    if kind == "root_rel":
        return "/" + tail
    if kind == "dot_rel":
        return "./" + tail
    if kind == "up_rel":
        return "../" * draw(st.integers(1, 2)) + tail
    return tail


class TestUrlResolutionInvariants:
    @given(_base_st(), _href_st())
    @settings(max_examples=300, deadline=None)
    def test_matches_urljoin_on_crawler_shapes(self, base, href):
        # on every structural shape a crawler emits, the pinned regex
        # algebra agrees with the stdlib resolver exactly
        assert resolve_href(base, href) == _urljoin(base, href)

    @given(_base_st(), _href_st())
    @settings(max_examples=100, deadline=None)
    def test_fragment_never_survives(self, base, href):
        out = resolve_href(base, href + "#frag")
        assert out is not None and "#" not in out
        assert out == resolve_href(base, href)
