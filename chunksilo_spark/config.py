"""Config surface (the reference's cfgload.py analog): funnel constants with
documented defaults, overridable by a JSON file named in
``CHUNKSILO_SPARK_CONFIG`` (flat {"dotted.key": value} entries).

Only read at import time by the operator modules — Spark plans capture the
values into literals, so a config change applies to new plans (same as the
reference, which reads config at process start; cfgload.py:60-96)."""

from __future__ import annotations

import json
import os

DEFAULTS: dict[str, object] = {
    # retrieval funnel (reference cfgload.py:86-91)
    "retrieval.embed_top_k": 20,
    "retrieval.rerank_candidates": 100,
    "retrieval.rerank_top_k": 5,
    "retrieval.score_threshold": 0.1,
    "retrieval.recency_half_life_days": 30.0,
    "retrieval.recency_weight": 0.5,
    # filename BM25 (reference index.py:1256-1259, search.py:292)
    "search.matched_files_top_k": 10,
    "search.matched_files_cap": 5,
    "search.bm25_k1": 1.2,
    "search.bm25_b": 0.75,
    # extraction guards (reference per-file timeout analog, index.py:584-602)
    "extract.max_html_bytes": 10_000_000,
    # chunking (reference cfgload.py chunk defaults)
    "chunk.size": 512,
    "chunk.overlap": 50,
}

_overrides: dict[str, object] | None = None


def _load_overrides() -> dict[str, object]:
    global _overrides
    if _overrides is None:
        path = os.environ.get("CHUNKSILO_SPARK_CONFIG")
        _overrides = {}
        if path and os.path.exists(path):
            with open(path) as f:
                _overrides = dict(json.load(f))
    return _overrides


def get(key: str, default: object | None = None) -> object:
    """Override > DEFAULTS > caller default (reference cfgload.get shape)."""
    ov = _load_overrides()
    if key in ov:
        return ov[key]
    if key in DEFAULTS:
        return DEFAULTS[key]
    return default
