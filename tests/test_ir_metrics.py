"""IR-quality metrics over ground-truth queries — the reference's
test_rag_metrics layer (P@k / MRR / NDCG@k harness, test_rag_metrics.py:
473-573) on the synthetic corpus, whose fact sentences give exact
relevance labels (a page is relevant to entity E iff one of its generated
triples mentions E).

With the sanctioned BoW mock embedder, absolute scores are modest (hash
collisions at 384 dims; the reference runs a real model here), so the gate
is RELATIVE: retrieval must beat a seeded random ranking by >=2x on MRR
and NDCG@10, plus a small absolute floor. The metric implementations are
the standard definitions, shared by the assertions below.
"""

import math
import random
from collections import defaultdict

import pytest

from chunksilo_spark.operators.retrieval import vector_search
from chunksilo_spark.operators.stage1_extract import extract_documents
from chunksilo_spark.sources.corpus import (
    build_entity_pool,
    golden_pages,
    pages_df,
)

N_PAGES = 200
K = 10


def mrr(ranked: list[str], relevant: set[str]) -> float:
    for i, u in enumerate(ranked):
        if u in relevant:
            return 1.0 / (i + 1)
    return 0.0


def recall_at_k(ranked: list[str], relevant: set[str], k: int) -> float:
    return len(set(ranked[:k]) & relevant) / min(len(relevant), k)


def precision_at_k(ranked: list[str], relevant: set[str], k: int) -> float:
    return len(set(ranked[:k]) & relevant) / k


def ndcg_at_k(ranked: list[str], relevant: set[str], k: int) -> float:
    dcg = sum(
        1.0 / math.log2(i + 2) for i, u in enumerate(ranked[:k]) if u in relevant
    )
    idcg = sum(1.0 / math.log2(i + 2) for i in range(min(len(relevant), k)))
    return dcg / idcg if idcg else 0.0


@pytest.fixture(scope="module")
def ground_truth(spark):
    gold = golden_pages(N_PAGES)
    pool = build_entity_pool()
    rel: dict[int, set[str]] = defaultdict(set)
    for g in gold:
        for s, _p, o in g["gt_triples"]:
            rel[s].add(g["url"])
            rel[o].add(g["url"])
    # 8 most-mentioned non-hub entities as queries
    qids = [e for e in sorted(rel, key=lambda e: -len(rel[e])) if e != 0][:8]
    docs = extract_documents(
        pages_df(spark, N_PAGES, partitions=4), partitions=4
    ).localCheckpoint()
    all_urls = [r["url"] for r in docs.select("url").collect()]
    return pool, rel, qids, docs, all_urls


def test_retrieval_beats_random_on_mrr_and_ndcg(spark, ground_truth):
    pool, rel, qids, docs, all_urls = ground_truth
    rng = random.Random(7)

    got_mrr, got_ndcg, rnd_mrr, rnd_ndcg = [], [], [], []
    for eid in qids:
        query = pool[eid][0]
        rows = vector_search(docs, query, k=100).collect()
        seen, ranked = set(), []
        for r in rows:
            if r["url"] not in seen:
                seen.add(r["url"])
                ranked.append(r["url"])
        relevant = rel[eid]
        got_mrr.append(mrr(ranked, relevant))
        got_ndcg.append(ndcg_at_k(ranked, relevant, K))
        # random baseline: mean of 20 seeded shuffles of the url universe
        ms, ns = [], []
        for _ in range(20):
            shuffled = all_urls[:]
            rng.shuffle(shuffled)
            ms.append(mrr(shuffled, relevant))
            ns.append(ndcg_at_k(shuffled, relevant, K))
        rnd_mrr.append(sum(ms) / len(ms))
        rnd_ndcg.append(sum(ns) / len(ns))

    mean = lambda xs: sum(xs) / len(xs)  # noqa: E731
    assert mean(got_mrr) >= 0.15  # absolute floor (BoW mock embedder)
    assert mean(got_mrr) >= 2.0 * mean(rnd_mrr)
    assert mean(got_ndcg) >= 2.0 * mean(rnd_ndcg)


def test_reference_ci_metric_report(spark, ground_truth):
    """The reference's CI gates retrieval at P@5 0.491 / MRR 0.518
    (reference .github/workflows/test-rag-metrics.yml) with its real ONNX
    embedder. With the sanctioned BoW stand-in those absolutes are not
    reachable (hash collisions at 384 dims), so this test REPORTS the same
    three metrics on the labeled synthetic corpus — the numbers recorded in
    BENCH/BASELINE.md §2 — and pins floors so a regression in the retrieval
    surface (chunking, embedding, scoring, rank order) fails loudly."""
    pool, rel, qids, docs, all_urls = ground_truth
    p5s, mrrs, ndcg5s = [], [], []
    for eid in qids:
        query = pool[eid][0]
        rows = vector_search(docs, query, k=100).collect()
        seen, ranked = set(), []
        for r in rows:
            if r["url"] not in seen:
                seen.add(r["url"])
                ranked.append(r["url"])
        relevant = rel[eid]
        p5s.append(precision_at_k(ranked, relevant, 5))
        mrrs.append(mrr(ranked, relevant))
        ndcg5s.append(ndcg_at_k(ranked, relevant, 5))

    mean = lambda xs: sum(xs) / len(xs)  # noqa: E731
    report = {
        "P@5": round(mean(p5s), 3),
        "MRR": round(mean(mrrs), 3),
        "NDCG@5": round(mean(ndcg5s), 3),
        "reference_ci": {"P@5": 0.491, "MRR": 0.518},
        "queries": len(qids),
        "pages": N_PAGES,
    }
    print(f"IR metric report (BoW stand-in embedder): {report}")
    # floors: ~2/3 of the values measured when this report was recorded
    # (P@5 0.100 / MRR 0.267 / NDCG@5 0.109) — loose enough for corpus
    # tweaks, tight enough to catch rank breakage
    assert mean(p5s) >= 0.065
    assert mean(mrrs) >= 0.175
    assert mean(ndcg5s) >= 0.07


def test_metric_kernels_against_known_values(spark):
    ranked = ["a", "b", "c", "d"]
    assert mrr(ranked, {"c"}) == pytest.approx(1 / 3)
    assert mrr(ranked, {"x"}) == 0.0
    assert precision_at_k(ranked, {"a", "c", "x"}, 2) == pytest.approx(1 / 2)
    assert precision_at_k(ranked, {"a", "b"}, 4) == pytest.approx(1 / 2)
    # capped recall: denominator is min(|relevant|, k) (R-precision style)
    assert recall_at_k(ranked, {"a", "d", "x"}, 2) == pytest.approx(1 / 2)
    assert recall_at_k(ranked, {"a", "d"}, 4) == pytest.approx(1.0)
    # perfect ranking -> NDCG 1
    assert ndcg_at_k(["r1", "r2", "n"], {"r1", "r2"}, 3) == pytest.approx(1.0)
    # relevant at the bottom -> strictly less
    assert ndcg_at_k(["n", "r1", "r2"], {"r1", "r2"}, 3) < 1.0
