"""Stage 2: mention detection + embedding-based entity linking.

The reference's "search by meaning" retrieval (vector top-k over chunk
embeddings, search.py:1093-1111) repurposed as an entity LINKER per the
north_star: each detected mention is BoW-embedded and scored by cosine
against a BROADCAST alias/embedding dictionary; top-1 above threshold links
the mention. No per-row Python in the hot path — one numpy matmul per Arrow
batch inside mapInPandas (reference bulk-embedding analog, index.py:1643-49).

Scale notes:
  * the alias dictionary is driver-small by design (entity dictionaries are
    ~1e6-1e8 rows — fits a broadcast of two numpy arrays; at the top end,
    switch to the LSH-bucketed variant in operators/similarity.py);
  * the broadcast is a plain ``sparkContext.broadcast`` of L2-normalized
    float32 matrices, materialized once per executor, shared by all tasks;
  * mention detection runs per document (not per chunk) so window overlaps
    can't double-count a mention.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.chunk import split_sentences
from ..functions.embed import cosine_topk, normalize_rows
from ..functions.triples import extract_mentions
from ..models import DEFAULT_EMBEDDER, ModelSpec

MENTIONS_SCHEMA = (
    "url string, sent_start long, m_start long, m_end long, surface string"
)
LINKED_SCHEMA = (
    "url string, sent_start long, m_start long, surface string, "
    "alias_id long, alias string, entity_id long, score float"
)

LINK_THRESHOLD = 0.999  # cosine; BoW vectors of equal token multisets hit 1.0


def _mention_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = {k: [] for k in ("url", "sent_start", "m_start", "m_end", "surface")}
        for url, text in zip(pdf["url"], pdf["text"]):
            for s, e in split_sentences(text):
                for surface, ms, me in extract_mentions(text[s:e]):
                    rows["url"].append(url)
                    rows["sent_start"].append(s)
                    rows["m_start"].append(s + ms)
                    rows["m_end"].append(s + me)
                    rows["surface"].append(surface)
        yield pd.DataFrame(rows)


def detect_mentions(documents: DataFrame) -> DataFrame:
    """en documents -> mention rows (url, offsets, surface)."""
    return (
        documents.where(F.col("ok") & (F.col("lang") == "en"))
        .select("url", "text")
        .mapInPandas(_mention_batch, schema=MENTIONS_SCHEMA)
    )


def build_alias_broadcast(spark, aliases: DataFrame):
    """Collect the (small) alias dict into broadcast numpy arrays.

    Returns a Broadcast of (alias_ids, alias_strs, entity_ids, norm_matrix).
    """
    # toPandas() rides the Arrow transfer path (enabled in session.py);
    # a row collect() pickles every 384-float embedding through py4j —
    # measurably slower for the same dictionary
    pdf = aliases.select("entity_id", "alias", "embedding").toPandas()
    rows = len(pdf)
    alias_strs = pdf["alias"].tolist()
    entity_ids = pdf["entity_id"].to_numpy(dtype=np.int64)
    if rows:
        mat = normalize_rows(
            np.vstack([np.asarray(e, dtype=np.float32) for e in pdf["embedding"]])
        )
    else:
        # empty dictionary: a well-formed (0, dim) matrix so the linkers'
        # empty-guard fires instead of a numpy axis error here
        from ..functions.embed import DIM

        mat = np.zeros((0, DIM), dtype=np.float32)
    alias_ids = np.arange(rows, dtype=np.int64)
    return spark.sparkContext.broadcast((alias_ids, alias_strs, entity_ids, mat))


def detect_and_link(
    documents: DataFrame,
    alias_bc,
    threshold: float = LINK_THRESHOLD,
    embedder: ModelSpec | None = None,
) -> DataFrame:
    """Fused stage 2: mention detection + linking in ONE Arrow pass.

    Avoids shipping the (large) mention table JVM->Python a second time:
    per batch of documents, detect mentions, embed all surfaces
    (``embedder`` = per-worker-cached models.ModelSpec, default BoW), one
    matmul against the broadcast dict, emit linked rows. Functionally equal
    to link_mentions(detect_mentions(docs)) — tested equivalent."""
    import numpy as np

    spec = embedder or DEFAULT_EMBEDDER

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        alias_ids, alias_strs, entity_ids, mat = alias_bc.value
        model = spec.resolve()  # one construction per worker process
        for pdf in batches:
            rows = {k: [] for k in ("url", "sent_start", "m_start", "surface")}
            for url, text in zip(pdf["url"], pdf["text"]):
                for s, e in split_sentences(text):
                    for surface, ms, _me in extract_mentions(text[s:e]):
                        rows["url"].append(url)
                        rows["sent_start"].append(s)
                        rows["m_start"].append(s + ms)
                        rows["surface"].append(surface)
            if not rows["url"]:
                continue
            # score each DISTINCT surface once (mentions repeat heavily:
            # the matmul is the linker's cost, so dedup first)
            uniq, inv = np.unique(
                np.asarray(rows["surface"], dtype=object), return_inverse=True
            )
            q = normalize_rows(model.embed(list(uniq)))
            idx, scores = cosine_topk(q, mat, k=1)
            top, sc = idx[inv, 0], scores[inv, 0]
            keep = sc >= threshold
            yield pd.DataFrame(
                {
                    "url": np.asarray(rows["url"], dtype=object)[keep],
                    "sent_start": np.asarray(rows["sent_start"])[keep],
                    "m_start": np.asarray(rows["m_start"])[keep],
                    "surface": np.asarray(rows["surface"], dtype=object)[keep],
                    "alias_id": alias_ids[top[keep]],
                    "alias": [alias_strs[i] for i in top[keep]],
                    "entity_id": entity_ids[top[keep]],
                    "score": sc[keep].astype(np.float32),
                }
            )

    return (
        documents.where(F.col("ok") & (F.col("lang") == "en"))
        .select("url", "text")
        .mapInPandas(run, schema=LINKED_SCHEMA)
    )


def link_mentions(
    mentions: DataFrame,
    alias_bc,
    threshold: float = LINK_THRESHOLD,
    embedder: ModelSpec | None = None,
) -> DataFrame:
    """Cosine top-1 of each mention's embedding vs the broadcast dict.

    Emits only linked mentions (score >= threshold). Batch-vectorized: one
    (batch x dim) @ (dim x n_alias) matmul per Arrow batch; the embedder is
    a per-worker-cached models.ModelSpec (default BoW).
    """
    spec = embedder or DEFAULT_EMBEDDER

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        alias_ids, alias_strs, entity_ids, mat = alias_bc.value
        if mat.shape[0] == 0:  # empty dictionary: zero links, not a crash
            return
        model = spec.resolve()  # one construction per worker process
        for pdf in batches:
            if len(pdf) == 0:
                continue
            uniq, inv = np.unique(
                pdf["surface"].to_numpy(dtype=object), return_inverse=True
            )
            q = normalize_rows(model.embed(list(uniq)))
            idx, scores = cosine_topk(q, mat, k=1)
            top = idx[inv, 0]
            sc = scores[inv, 0]
            keep = sc >= threshold
            out = pd.DataFrame(
                {
                    "url": pdf["url"].to_numpy()[keep],
                    "sent_start": pdf["sent_start"].to_numpy()[keep],
                    "m_start": pdf["m_start"].to_numpy()[keep],
                    "surface": pdf["surface"].to_numpy()[keep],
                    "alias_id": alias_ids[top[keep]],
                    "alias": [alias_strs[i] for i in top[keep]],
                    "entity_id": entity_ids[top[keep]],
                    "score": sc[keep].astype(np.float32),
                }
            )
            yield out

    return mentions.mapInPandas(run, schema=LINKED_SCHEMA)
