"""The search API over materialized pipeline tables: result shape, phrase
requirements, date filtering — the reference's run_search contract."""

import pytest

from chunksilo_spark.operators.retrieval import chunks_with_embeddings
from chunksilo_spark.operators.stage1_extract import extract_documents
from chunksilo_spark.plans.search_api import run_search
from chunksilo_spark.sources.corpus import pages_df


@pytest.fixture(scope="module")
def tables(spark):
    docs = extract_documents(pages_df(spark, 120, partitions=4), partitions=4)
    docs = docs.localCheckpoint()
    chunks = chunks_with_embeddings(docs).localCheckpoint()
    return docs, chunks


def test_result_shape(spark, tables):
    docs, chunks = tables
    res = run_search(docs, chunks, "Acme Systems acquired Vertex partnered")
    assert set(res) == {
        "query", "matched_files", "chunks", "num_matched_files",
        "num_chunks", "retrieval_time",
    }
    assert 0 < res["num_chunks"] <= 5
    top = res["chunks"][0]
    assert set(top) == {"text", "score", "location"}
    assert set(top["location"]) == {"uri", "line", "heading_path"}
    assert top["location"]["uri"].startswith("https://")
    assert top["location"]["line"] >= 1
    assert isinstance(top["location"]["heading_path"], list)


def test_required_phrase_filters(spark, tables):
    docs, chunks = tables
    res = run_search(docs, chunks, 'acquired "Section 1"')
    for c in res["chunks"]:
        assert "section 1" in c["text"].lower()


def test_date_filter_excludes(spark, tables):
    docs, chunks = tables
    all_res = run_search(docs, chunks, "acquired partnered with")
    none_res = run_search(
        docs, chunks, "acquired partnered with",
        date_from="2030-01-01",  # after every warc_ts
    )
    assert all_res["num_chunks"] > 0
    assert none_res["num_chunks"] == 0


def test_deterministic(spark, tables):
    docs, chunks = tables
    a = run_search(docs, chunks, "Acme acquired")
    b = run_search(docs, chunks, "Acme acquired")
    strip = lambda r: [  # noqa: E731
        (c["text"], c["score"], c["location"]["uri"]) for c in r["chunks"]
    ]
    assert strip(a) == strip(b)


def test_bm25_filename_match_parity(spark):
    """The Spark BM25 filename scorer matches a plain-Python BM25 oracle
    (same tokenize_filename kernel, k1=1.2 b=0.75) on a fixed url corpus,
    and the funnel keeps the reference shape: top-10 retrieve, >0 filter,
    display cap 5."""
    import math

    from chunksilo_spark.functions.textstats import tokenize_filename
    from chunksilo_spark.plans.search_api import (
        _matched_files,
        bm25_filename_scores,
    )

    urls = [
        f"https://docs.example.com/{name}"
        for name in (
            "cpp_styleguide.md", "python_styleguide.md", "cppReference.md",
            "setupGuide-v2.txt", "style_notes.md", "readme.md",
            "cpp_faq.md", "guide_style_cpp.md", "misc-001.md", "misc-002.md",
        )
    ]
    docs = spark.createDataFrame([(u,) for u in urls], schema="url string")
    q = ["cpp", "styleguide"]

    # plain-Python BM25 oracle
    toks = {u: tokenize_filename(u.rsplit("/", 1)[-1]) for u in urls}
    n = len(urls)
    avgdl = sum(len(t) for t in toks.values()) / n
    want = {}
    for u, t in toks.items():
        s = 0.0
        for term in q:
            tf = t.count(term)
            df = sum(1 for tt in toks.values() if term in tt)
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            s += idf * (tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * len(t) / avgdl)))
        want[u] = s
    got = {r["url"]: r["score"] for r in bm25_filename_scores(docs, q).collect()}
    assert set(got) == set(want)
    for u in urls:
        assert abs(got[u] - want[u]) < 1e-9, u

    matched = _matched_files(docs, q)
    assert len(matched) <= 5
    assert all(m["score"] > 0 for m in matched)
    # the exact-name file wins; ordering follows the oracle's descending score
    want_order = [u for u in sorted(want, key=lambda u: (-want[u], u)) if want[u] > 0]
    assert [m["uri"] for m in matched] == want_order[:5]
    assert matched[0]["uri"].endswith("cpp_styleguide.md")


def test_serve_loop_roundtrip(spark, tmp_path):
    """scripts/serve.py: one long-lived process answers ping / search_docs /
    unknown-method / shutdown over line-JSON stdio without dying."""
    import json
    import os
    import subprocess
    import sys as _sys

    from chunksilo_spark.sources.storage import TableStore

    docs = extract_documents(pages_df(spark, 20, partitions=2), partitions=2)
    store = TableStore(str(tmp_path))
    store.write(docs, "documents")
    store.write(chunks_with_embeddings(store.read(spark, "documents")), "chunks")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {**os.environ, "SPARK_GRAFT_CPUS": "2"}
    proc = subprocess.Popen(
        [_sys.executable, os.path.join(repo, "scripts", "serve.py"), str(tmp_path)],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE, text=True, env=env,
    )
    reqs = [
        {"id": 1, "method": "ping"},
        {"id": 2, "method": "search_docs",
         "params": {"query": "Acme Systems acquired"}},
        {"id": 3, "method": "no_such_method"},
        {"id": 4, "method": "shutdown"},
    ]
    out, _ = proc.communicate(
        "\n".join(json.dumps(r) for r in reqs) + "\n", timeout=300
    )
    lines = [json.loads(line) for line in out.strip().splitlines()]
    by_id = {r["id"]: r for r in lines}
    assert by_id[1]["result"] == "pong"
    res = by_id[2]["result"]
    assert set(res) >= {"query", "matched_files", "chunks", "num_chunks"}
    assert "error" in by_id[3]  # bad method did not kill the loop
    assert by_id[4]["result"] == "bye"
    assert proc.wait(timeout=60) == 0
