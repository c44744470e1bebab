"""Stage 3: triple extraction + canonical triple assembly.

Extracts (subj, pred, obj) surface triples with the pinned dependency-pattern
rules (functions/triples.py) inside a mapInPandas pass, links subject/object
surfaces through the stage-2 linker output (broadcast join on surface), and
rewrites both sides to canonical entities via the canon_map (broadcast join
on normalized surface).

Scale notes:
  * the surface->alias map and canon map are dictionary-sized — broadcast
    joins, no shuffle of the (huge) triples side;
  * triples are extracted from documents (not chunks) so chunk overlap can't
    duplicate a triple; dedup within a document is by exact tuple.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.triples import extract_triples_from_text, normalize_surface

RAW_TRIPLES_SCHEMA = (
    "url string, subj_surface string, pred string, obj_surface string, "
    "char_pos long, subj_norm string, obj_norm string"
)


def _triple_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    # normalization fused here: one Arrow pass instead of two over the
    # (large) triples relation
    for pdf in batches:
        rows = {k: [] for k in (
            "url", "subj_surface", "pred", "obj_surface", "char_pos",
            "subj_norm", "obj_norm",
        )}
        for url, text in zip(pdf["url"], pdf["text"]):
            for subj, pred, obj, pos in extract_triples_from_text(text):
                rows["url"].append(url)
                rows["subj_surface"].append(subj)
                rows["pred"].append(pred)
                rows["obj_surface"].append(obj)
                rows["char_pos"].append(pos)
                rows["subj_norm"].append(normalize_surface(subj))
                rows["obj_norm"].append(normalize_surface(obj))
        yield pd.DataFrame(rows)


def extract_raw_triples(documents: DataFrame) -> DataFrame:
    """en documents -> (url, subj_surface, pred, obj_surface, char_pos)."""
    return (
        documents.where(F.col("ok") & (F.col("lang") == "en"))
        .select("url", "text")
        .mapInPandas(_triple_batch, schema=RAW_TRIPLES_SCHEMA)
    )


def linked_surfaces(linked_mentions: DataFrame) -> DataFrame:
    """Distinct surface -> (alias_id, entity_id) map from stage-2 output."""
    return linked_mentions.select("surface", "alias_id", "entity_id").distinct()


def canonical_triples(
    raw_triples: DataFrame,
    surface_map: DataFrame,
    canon: DataFrame,
) -> DataFrame:
    """raw surface triples -> (url, subj_canon, pred, obj_canon, ...).

    Both sides must link (inner joins against the linked-surface map — the
    reference analog of dropping unlinked retrieval hits) and both normalized
    surfaces resolve through the canon map. All four joins broadcast the
    small dictionary side.
    """
    with_norms = raw_triples  # norms are fused into extraction
    smap = F.broadcast(surface_map.select(F.col("surface")).distinct())
    cmap = F.broadcast(
        canon.select(
            F.col("norm"),
            F.col("canon_id"),
            F.col("canon_surface"),
        )
    )
    t = (
        with_norms.join(
            smap.withColumnRenamed("surface", "subj_surface"), "subj_surface"
        )
        .join(smap.withColumnRenamed("surface", "obj_surface"), "obj_surface")
        .join(
            cmap.select(
                F.col("norm").alias("subj_norm"),
                F.col("canon_id").alias("subj_canon_id"),
                F.col("canon_surface").alias("subj_canon"),
            ),
            "subj_norm",
        )
        .join(
            cmap.select(
                F.col("norm").alias("obj_norm"),
                F.col("canon_id").alias("obj_canon_id"),
                F.col("canon_surface").alias("obj_canon"),
            ),
            "obj_norm",
        )
    )
    return t.select(
        "url",
        "subj_canon_id",
        "subj_canon",
        "pred",
        "obj_canon_id",
        "obj_canon",
        "subj_surface",
        "obj_surface",
        "char_pos",
    )
