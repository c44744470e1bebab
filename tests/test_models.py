"""The pluggable model seam (models.ModelSpec): per-worker construction
caching, swap-in of a non-default model, and default-path equivalence.

Reference pattern: one model load per process, bulk batches
(index.py:1091-1124, 1643-1649)."""

import os
import sys
import tempfile

import numpy as np
import pytest
from pyspark import cloudpickle as _cloudpickle
from pyspark.sql import functions as F

# the model doubles below live in this test module, which Spark workers
# can't import — ship them by value instead (a real model class would live
# in an importable module and needs none of this)
_cloudpickle.register_pickle_by_value(sys.modules[__name__])

from chunksilo_spark import models
from chunksilo_spark.functions.embed import DIM, bow_embed_matrix
from chunksilo_spark.models import ModelSpec
from chunksilo_spark.operators.retrieval import chunks_with_embeddings
from chunksilo_spark.operators.search import rerank


class LoggingEmbedder:
    """'Expensive' model double: appends one line per CONSTRUCTION to a
    shared file, so the test can count loads across worker processes."""

    dim = DIM

    def __init__(self, log_path: str):
        with open(log_path, "a") as f:
            f.write(f"{os.getpid()}\n")

    def embed(self, texts):
        return bow_embed_matrix(list(texts)) * 2.0  # visibly not the default


class ConstantReranker:
    def __init__(self, value: float = 7.0):
        self.value = value

    def score(self, query, texts):
        return np.full(len(texts), self.value, dtype=np.float64)


def _docs(spark, n=200, parts=8):
    return (
        spark.range(n)
        .select(
            F.concat(F.lit("https://ex.com/p"), F.col("id")).alias("url"),
            F.concat(
                F.lit("alpha beta gamma sentence "), F.col("id").cast("string"),
                F.lit(". another sentence here."),
            ).alias("text"),
            F.lit(True).alias("ok"),
        )
        .repartition(parts)
    )


class TestPerWorkerCache:
    def test_one_construction_per_worker_across_jobs(self, spark):
        log = tempfile.mktemp(suffix=".modellog")
        spec = ModelSpec(LoggingEmbedder, log_path=log)
        docs = _docs(spark)
        # two separate jobs over 8 partitions each: loads must be bounded by
        # the number of distinct worker PROCESSES, not tasks or batches
        n1 = chunks_with_embeddings(docs, embedder=spec).count()
        assert n1 > 0
        with open(log) as f:
            pids_after_job1 = [ln.strip() for ln in f if ln.strip()]
        assert len(pids_after_job1) >= 1
        # one construction per distinct worker process
        assert len(pids_after_job1) == len(set(pids_after_job1))

        n2 = chunks_with_embeddings(docs, embedder=spec).count()
        assert n2 == n1
        with open(log) as f:
            pids_after_job2 = [ln.strip() for ln in f if ln.strip()]
        # reused workers (spark.python.worker.reuse default) hit the cache:
        # still at most one construction per distinct pid
        assert len(pids_after_job2) == len(set(pids_after_job2))
        os.remove(log)

    def test_driver_side_resolve_caches(self):
        log = tempfile.mktemp(suffix=".modellog")
        spec = ModelSpec(LoggingEmbedder, log_path=log)
        m1 = spec.resolve()
        m2 = spec.resolve()
        assert m1 is m2
        with open(log) as f:
            assert len(f.readlines()) == 1
        assert models.load_count(spec) == 1
        os.remove(log)

    def test_distinct_params_are_distinct_models(self):
        a = ModelSpec(ConstantReranker, value=1.0)
        b = ModelSpec(ConstantReranker, value=2.0)
        assert a.key != b.key
        assert a.resolve().value == 1.0
        assert b.resolve().value == 2.0


class TestSwapIn:
    def test_custom_embedder_changes_vectors_default_unchanged(self, spark):
        docs = _docs(spark, n=20, parts=2)
        log = tempfile.mktemp(suffix=".modellog")
        custom = (
            chunks_with_embeddings(
                docs, embedder=ModelSpec(LoggingEmbedder, log_path=log)
            )
            .orderBy("url", "chunk_id")
            .limit(3)
            .collect()
        )
        default = (
            chunks_with_embeddings(docs)
            .orderBy("url", "chunk_id")
            .limit(3)
            .collect()
        )
        for c, d in zip(custom, default):
            assert c["url"] == d["url"] and c["chunk_id"] == d["chunk_id"]
            np.testing.assert_allclose(
                np.array(c["embedding"]), 2.0 * np.array(d["embedding"])
            )
        # default path == raw BoW kernel (oracle unchanged by the seam)
        np.testing.assert_allclose(
            np.array(default[0]["embedding"]),
            bow_embed_matrix([default[0]["text"]])[0],
        )
        os.remove(log)

    def test_custom_reranker_swaps_in(self, spark):
        df = spark.createDataFrame(
            [(1, "alpha beta"), (2, "alpha alpha alpha"), (3, "gamma")],
            "doc_id long, text string",
        )
        out = rerank(
            df, "alpha", k=2, reranker=ModelSpec(ConstantReranker, value=3.5)
        ).collect()
        assert [r["rerank_score"] for r in out] == [3.5, 3.5]
        # constant scores -> deterministic id tie-break
        assert [r["doc_id"] for r in out] == [1, 2]

    def test_default_reranker_matches_overlap_semantics(self, spark):
        df = spark.createDataFrame(
            [(1, "alpha beta"), (2, "alpha alpha alpha alpha")],
            "doc_id long, text string",
        )
        out = {
            r["doc_id"]: r["rerank_score"]
            for r in rerank(df, "alpha", k=2).collect()
        }
        assert out[1] == pytest.approx(50.0)
        assert out[2] == pytest.approx(100.0)


class TestFactoryGuard:
    def test_rejects_ambiguous_factories(self):
        import pytest as _pytest

        with _pytest.raises(ValueError, match="module-level"):
            ModelSpec(lambda: object())

        def local():
            class Inner:
                pass

            return Inner

        with _pytest.raises(ValueError, match="module-level"):
            ModelSpec(local())
