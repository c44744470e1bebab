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
