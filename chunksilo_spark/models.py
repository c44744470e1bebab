"""Pluggable embedding / rerank models with a per-worker-process cache.

The reference loads its ONNX embedder and FlashRank reranker once per
process and then feeds them bulk batches (index.py:1091-1124, 1643-1649;
search.py:1184-1248).  On Spark the analogous unit is the *Python worker
process*: a model must be constructed at most once per worker and shared by
every Arrow batch and every job that worker serves, never once per batch or
per task.

``ModelSpec`` is the picklable recipe that crosses the driver->worker
boundary: a factory callable plus frozen kwargs.  ``resolve()`` runs on
whichever process calls it (driver for query-side embedding, worker inside
``mapInPandas``) and memoizes the constructed model in a module-level cache
keyed by the spec — Spark reuses Python workers across tasks and jobs
(``spark.python.worker.reuse``, default true), so the cache gives exactly
one construction per worker per spec (tested: tests/test_models.py).

Interfaces (structural, no ABC needed):

  * Embedder: ``dim: int`` and ``embed(texts) -> (len(texts), dim)``
    float32 ndarray (unnormalized; call sites decide about L2).
  * Reranker: ``score(query, texts) -> (len(texts),)`` float64 ndarray.

Defaults are the deterministic stand-ins sanctioned by the reference's own
test doubles (test/conftest.py:36-69): BoW hashing embedder, term-overlap
reranker.  A real model drops in as::

    spec = ModelSpec(MyOnnxEmbedder, model_path="/models/minilm.onnx")
    chunks = chunks_with_embeddings(documents, embedder=spec)

with no other call-site changes.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Sequence

import numpy as np

from .functions.embed import DIM, bow_embed_matrix

# Per-process model cache. Module-level on purpose: Spark pickles the
# ModelSpec into the UDF closure, but this dict lives (and persists) in the
# worker process across batches, tasks and jobs.
_PROCESS_CACHE: dict[tuple, Any] = {}
# Construction count per key, for tests / diagnostics ("one load per worker").
_LOAD_COUNTS: dict[tuple, int] = {}


@dataclass(frozen=True)
class ModelSpec:
    """Picklable model recipe: ``factory(**params)`` builds the model.

    ``factory`` must be importable on the workers (a top-level class or
    function); ``params`` values must be hashable (they key the cache).
    """

    factory: Callable[..., Any]
    params: tuple[tuple[str, Any], ...] = field(default=())

    def __init__(self, factory: Callable[..., Any], **params: Any) -> None:
        # enforce the docstring contract instead of trusting it: a lambda or
        # function-local class has qualname '<lambda>'/'<locals>', so two
        # DIFFERENT factories defined in the same scope would collide on the
        # (module, qualname, params) cache key and resolve() would silently
        # hand back the wrong model — corrupt embeddings, no error.
        qn = getattr(factory, "__qualname__", "")
        if "<lambda>" in qn or "<locals>" in qn:
            raise ValueError(
                "ModelSpec factory must be a module-level (importable) "
                f"callable; got {qn!r} — lambdas/function-local classes "
                "have ambiguous cache keys"
            )
        object.__setattr__(self, "factory", factory)
        object.__setattr__(self, "params", tuple(sorted(params.items())))

    @property
    def key(self) -> tuple:
        f = self.factory
        return (
            getattr(f, "__module__", ""),
            getattr(f, "__qualname__", repr(f)),
            self.params,
        )

    def resolve(self) -> Any:
        """Construct-or-fetch the model in THIS process (at most one
        construction per process per spec)."""
        k = self.key
        model = _PROCESS_CACHE.get(k)
        if model is None:
            model = self.factory(**dict(self.params))
            _PROCESS_CACHE[k] = model
            _LOAD_COUNTS[k] = _LOAD_COUNTS.get(k, 0) + 1
        return model


def load_count(spec: ModelSpec) -> int:
    """How many times this process constructed ``spec`` (0 or 1 unless the
    cache was cleared)."""
    return _LOAD_COUNTS.get(spec.key, 0)


class BowEmbedder:
    """Default embedder: the reference's sanctioned BoW hashing mock
    (test/conftest.py:36-55) — 384-dim, word -> sum(ord) % 384 count."""

    dim = DIM

    def embed(self, texts: Sequence[str]) -> np.ndarray:
        return bow_embed_matrix(list(texts))


class OverlapReranker:
    """Default reranker: per-term frequency-weighted overlap * 100, the
    reference's MockReranker semantics (test/conftest.py:58-69)."""

    def score(self, query: str, texts: Sequence[str]) -> np.ndarray:
        q_tokens = [t for t in query.lower().split() if t]
        out = np.empty(len(texts), dtype=np.float64)
        for i, text in enumerate(texts):
            toks = text.lower().split()
            n = max(len(toks), 1)
            out[i] = round(sum(toks.count(t) for t in q_tokens) / n * 100.0, 6)
        return out


DEFAULT_EMBEDDER = ModelSpec(BowEmbedder)
DEFAULT_RERANKER = ModelSpec(OverlapReranker)


def embed_query(query: str, embedder: ModelSpec | None = None) -> np.ndarray:
    """Driver-side single-query embedding, L2-normalized float32."""
    spec = embedder or DEFAULT_EMBEDDER
    vec = np.asarray(spec.resolve().embed([query])[0], dtype=np.float32)
    n = np.linalg.norm(vec)
    return vec / n if n > 0 else vec
