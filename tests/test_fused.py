"""The fused single-pass execution mode must reproduce the staged pipeline's
canonical triple set exactly (same kernels, different dataflow)."""

import pyspark.sql.functions as F

from chunksilo_spark.operators import fused as fz
from chunksilo_spark.operators import stage1_extract as s1
from chunksilo_spark.operators import stage2_link as s2
from chunksilo_spark.operators import stage3_triples as s3
from chunksilo_spark.operators.canon import canon_map, normalize_column
from chunksilo_spark.sources.corpus import aliases_df, pages_df

N_PAGES = 250


def test_fused_equals_staged(spark):
    pages = pages_df(spark, N_PAGES, partitions=6)
    aliases = aliases_df(spark)
    alias_bc = s2.build_alias_broadcast(spark, aliases)

    # staged path
    docs = s1.extract_documents(pages, partitions=6).localCheckpoint()
    linked = s2.detect_and_link(docs, alias_bc).localCheckpoint()
    staged_surfaces = normalize_column(
        aliases.select(F.col("alias").alias("s"))
        .unionByName(linked.select(F.col("surface").alias("s")))
        .distinct(),
        "s",
    ).distinct()
    staged = s3.canonical_triples(
        s3.extract_raw_triples(docs),
        s3.linked_surfaces(linked),
        canon_map(staged_surfaces, partitions=4),
    )

    # fused path
    fused_raw = fz.fused_linked_triples(pages, alias_bc).localCheckpoint()
    alias_norms = normalize_column(aliases, "alias")
    fused_surfaces = (
        fused_raw.select(F.col("subj_norm").alias("norm"))
        .unionByName(fused_raw.select(F.col("obj_norm").alias("norm")))
        .unionByName(alias_norms)
        .distinct()
    )
    fused = fz.canonical_from_fused(
        fused_raw, canon_map(fused_surfaces, partitions=4)
    )

    key = lambda r: (  # noqa: E731
        r["url"], r["subj_canon"], r["pred"], r["obj_canon"], r["char_pos"]
    )
    a = sorted(map(key, staged.collect()))
    b = sorted(map(key, fused.collect()))
    assert len(a) > 100
    assert a == b


def test_link_cache_is_dictionary_scoped(spark):
    """The per-worker surface->linked cache must key on the alias
    dictionary's CONTENT: running the fused pass with a different (here:
    empty) dictionary right after a populated one must not reuse stale
    link decisions from the first run."""
    pages = pages_df(spark, 60, partitions=2)
    full_bc = s2.build_alias_broadcast(spark, aliases_df(spark))
    # a 3-alias dictionary links far fewer surfaces; same shape, same
    # threshold, same embedder — only the matrix CONTENT differs, which
    # is exactly what the cache key must see
    tiny_bc = s2.build_alias_broadcast(
        spark, aliases_df(spark).where(F.col("entity_id") < 1)
    )
    n_full = fz.fused_linked_triples(pages, full_bc).count()
    n_tiny = fz.fused_linked_triples(pages, tiny_bc).count()
    n_full_again = fz.fused_linked_triples(pages, full_bc).count()
    assert n_full > 0
    # stale full-dictionary decisions leaking into the tiny run would
    # inflate n_tiny up to n_full
    assert n_tiny < n_full
    assert n_full_again == n_full
