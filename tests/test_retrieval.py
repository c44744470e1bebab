"""Chunk vector retrieval must match the single-node oracle exactly
(same chunker, same BoW embedding, same cosine)."""

import numpy as np

from chunksilo_spark.functions.chunk import chunk_text
from chunksilo_spark.functions.embed import bow_embed, bow_embed_matrix, normalize_rows
from chunksilo_spark.functions.extract import extract_text
from chunksilo_spark.operators import retrieval as rt
from chunksilo_spark.operators import stage1_extract as s1
from chunksilo_spark.sources.corpus import golden_pages, pages_df

N_PAGES = 150
QUERY = "Acme Systems acquired partnered with Vertex"


def _oracle_topk(k: int):
    chunks = []
    for p in golden_pages(N_PAGES):
        try:
            text = extract_text(p["html"].decode("utf-8", "strict"))
        except UnicodeDecodeError:
            continue
        for cid, ctext, cs, _ce in chunk_text(text):
            chunks.append((p["url"], cid, ctext, cs))
    emb = normalize_rows(bow_embed_matrix([c[2] for c in chunks]))
    q = np.array(bow_embed(QUERY), dtype=np.float32)
    q = q / np.linalg.norm(q)
    scores = (emb @ q).astype(np.float32)
    order = sorted(
        range(len(chunks)),
        key=lambda i: (-scores[i], chunks[i][0], chunks[i][1]),
    )[:k]
    return [(chunks[i][0], chunks[i][1], float(scores[i])) for i in order]


def test_vector_search_matches_oracle(spark):
    docs = s1.extract_documents(pages_df(spark, N_PAGES, partitions=4), partitions=4)
    got = [
        (r["url"], r["chunk_id"], float(r["score"]))
        for r in rt.vector_search(docs, QUERY, k=10).collect()
    ]
    want = _oracle_topk(10)
    assert [(u, c) for u, c, _ in got] == [(u, c) for u, c, _ in want]
    for (_, _, gs), (_, _, ws) in zip(got, want):
        assert abs(gs - ws) < 1e-6


def test_chunks_with_embeddings_schema(spark):
    docs = s1.extract_documents(pages_df(spark, 30, partitions=2), partitions=2)
    chunks = rt.chunks_with_embeddings(docs)
    row = chunks.first()
    assert len(row["embedding"]) == 384
    assert chunks.count() > 0


def test_search_index_equals_fused_search(spark):
    """Searching the materialized index must rank exactly like the fused
    chunk-and-score path (same embeddings, same cosine, same tie-break)."""
    docs = s1.extract_documents(pages_df(spark, 60, partitions=3), partitions=3)
    chunks = rt.chunks_with_embeddings(docs).localCheckpoint()
    a = [
        (r["url"], r["chunk_id"], round(float(r["score"]), 5))
        for r in rt.search_index(chunks, QUERY, k=8).collect()
    ]
    b = [
        (r["url"], r["chunk_id"], round(float(r["score"]), 5))
        for r in rt.vector_search(docs, QUERY, k=8).collect()
    ]
    assert a == b
