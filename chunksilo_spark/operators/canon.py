"""Entity canonicalization: MinHash-LSH blocking + connected components.

North-star stage 3: cluster normalized mention/alias surfaces so that
case/punctuation/suffix variants of one entity share a canonical id, WITHOUT
pairwise-comparing all surfaces:

  1. ``lsh_bands``       — one MinHash signature per distinct surface (word
                           shingles), exploded to 32 band keys (mapInPandas);
  2. ``candidate_pairs`` — self-join on band key (equi-join, shuffle on the
                           band hash — uniformly distributed by construction);
  3. ``verify_pairs``    — exact word-set Jaccard >= threshold inside a
                           vectorized batch UDF (kills LSH false positives);
  4. ``connected_components`` — iterative min-label propagation over the
                           verified edge set with localCheckpoint truncation;
  5. ``canon_map``       — component -> lexicographically-smallest member
                           surface as the canonical representative.

Skew notes (the north rule's explicit concern):
  * min-label aggregation is a partial-aggregable ``min`` — Spark's hash
    aggregate does map-side combine, which IS the salting two-phase for
    idempotent monoids (no hot reducer even if one component spans 30% of
    rows — the hub fixture);
  * the label join uses AQE skew-join splitting for hub vertices
    (spark.sql.adaptive.skewJoin.enabled, set in session.py);
  * band buckets are bounded because input surfaces are pre-deduplicated
    (``.distinct()``), so identical strings never flood one bucket.

Oracle parity: the same signature/band/jaccard functions (functions/minhash)
run single-node in tests; vertex ids come from functions/hashing.hash64 so
driver and executors agree exactly.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..checkpointing import cut_lineage
from ..functions.hashing import hash64
from ..functions.minhash import band_keys, jaccard, minhash_signatures_batch

JACCARD_THRESHOLD = 0.6

_BANDS_SCHEMA = "nid long, norm string, band_key long"
_EDGES_SCHEMA = "a long, b long"


def normalize_column(df: DataFrame, col: str) -> DataFrame:
    """-> single-column ('norm') DataFrame of normalize_surface(df[col])."""
    from ..functions.triples import normalize_surface

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {"norm": [normalize_surface(s) for s in pdf[col]]}
            )

    return df.select(col).mapInPandas(run, schema="norm string")


def lsh_bands(surfaces: DataFrame, col: str = "norm") -> DataFrame:
    """distinct surfaces -> (nid, norm, band_key) rows, 32 per surface."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sigs = minhash_signatures_batch([n.split() for n in pdf[col]])
            nids, norms, keys = [], [], []
            for norm, sig in zip(pdf[col], sigs):
                nid = hash64(norm)
                for bk in band_keys(sig):
                    nids.append(nid)
                    norms.append(norm)
                    keys.append(bk - (1 << 63))  # to signed 64-bit
            yield pd.DataFrame({"nid": nids, "norm": norms, "band_key": keys})

    return surfaces.select(F.col(col)).distinct().mapInPandas(
        run, schema=_BANDS_SCHEMA
    )


def candidate_pairs(bands: DataFrame) -> DataFrame:
    """Self-join on band key -> distinct (a, b, norm_a, norm_b), a < b."""
    left = bands.select(
        F.col("band_key"),
        F.col("nid").alias("a"),
        F.col("norm").alias("norm_a"),
    )
    right = bands.select(
        F.col("band_key"),
        F.col("nid").alias("b"),
        F.col("norm").alias("norm_b"),
    )
    return (
        left.join(right, "band_key")
        .where(F.col("a") < F.col("b"))
        .select("a", "b", "norm_a", "norm_b")
        .distinct()
    )


def verify_pairs(
    pairs: DataFrame, threshold: float = JACCARD_THRESHOLD
) -> DataFrame:
    """Exact word-set Jaccard filter -> verified edges (a, b)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keep_a, keep_b = [], []
            for a, b, na, nb in zip(
                pdf["a"], pdf["b"], pdf["norm_a"], pdf["norm_b"]
            ):
                if jaccard(set(na.split()), set(nb.split())) >= threshold:
                    keep_a.append(a)
                    keep_b.append(b)
            yield pd.DataFrame({"a": keep_a, "b": keep_b})

    return pairs.mapInPandas(run, schema=_EDGES_SCHEMA)


def connected_components(
    vertices: DataFrame, edges: DataFrame, max_iter: int = 20,
    partitions: int = 16,
    strict: bool = False,
) -> DataFrame:
    """Min-label propagation -> (nid, component) with component = min nid.

    vertices: (nid long); edges: (a long, b long). Iterates until no label
    changes (diameter-bounded; alias-variant clusters are stars, so 2-4
    rounds). Each round: symmetric neighbor-label min, map-side-combined;
    ``checkpointing.cut_lineage`` truncates the growing plan (SURVEY §4
    custom item 3; localCheckpoint locally, reliable checkpoint when a
    checkpoint dir is set).

    ``partitions`` sizes the per-iteration shuffles to the DATA, not the
    cluster: entity-dictionary graphs are orders of magnitude smaller than
    the corpus, and over-parallelizing the tiny iterative joins just buys
    scheduler overhead. Scale it up with the surface count (e.g. n/100k).

    ``strict=True`` RAISES if labels have not converged after ``max_iter``
    rounds instead of silently returning partial components — required by
    callers whose graphs can have long chains (dedup clusters of
    incrementally-edited documents have diameter ~chain length, unlike the
    star-shaped alias clusters this default was tuned for). Each round
    propagates 2 hops, so ``max_iter >= ceil(diameter/2)`` suffices:
    convergence exactly at the boundary round is detected by ONE extra
    single-hop probe (the in-loop check needs a change-free round, which a
    boundary convergence never gets), so strict mode raises only on
    genuine non-convergence.
    """
    sym = cut_lineage(
        edges.union(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .repartition(partitions, "a")
    )
    labels = cut_lineage(vertices.select(
        F.col("nid"), F.col("nid").alias("component")
    ).repartition(partitions, "nid"))
    def step(lbl):
        neighbor = (
            sym.join(lbl, sym["a"] == lbl["nid"])
            .select(F.col("b").alias("nid"), F.col("component"))
        )
        return (
            lbl.unionByName(neighbor)
            .repartition(partitions, "nid")
            .groupBy("nid")
            .agg(F.min("component").alias("component"))
        )

    for _ in range(max_iter):
        # two propagation hops per convergence check: alias-variant clusters
        # are stars (diameter <= 3), so this halves the action count while
        # localCheckpoint still truncates lineage every round
        new_labels = cut_lineage(step(step(labels)))
        # existence of ONE improved label decides the round — limit(1)
        # lets the probe job stop at the first hit instead of counting
        # every improvement
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "nid")
            .where(F.col("n.component") < F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        if strict:
            # the loop's change check trails by one round: labels that
            # converged exactly at round max_iter still report changed > 0
            # (they improved INTO the fixpoint). One single-hop probe
            # settles it — a fixpoint is unchanged under one more step.
            probe_changed = (
                step(labels).alias("n")
                .join(labels.alias("o"), "nid")
                .where(F.col("n.component") < F.col("o.component"))
                .count()
            )
            if probe_changed > 0:
                raise RuntimeError(
                    f"connected_components did not converge in {max_iter} "
                    f"rounds ({2 * max_iter} propagation hops) — a "
                    f"component has diameter > {2 * max_iter}; raise "
                    f"max_iter"
                )
    return labels


SMALL_GRAPH_THRESHOLD = 200_000


def canon_map_local(
    spark, norms: list[str], threshold: float = JACCARD_THRESHOLD
) -> DataFrame:
    """Driver-side canon for dictionary-sized surface sets (< ~200k): the
    exact same LSH + verify + union-find semantics (it IS the test oracle,
    plans/oracle.py), one collect + one createDataFrame instead of ~8 tiny
    distributed jobs. canon_map() auto-dispatches here below the threshold —
    the standard small-graph fast path (GraphFrames does the same)."""
    from ..plans.oracle import oracle_canon_map

    cmap = oracle_canon_map(set(norms), threshold)
    rows = [(n, cid, csurf) for n, (cid, csurf) in cmap.items()]
    return spark.createDataFrame(
        rows, schema="norm string, canon_id long, canon_surface string"
    )


def canon_map(surfaces: DataFrame, col: str = "norm",
              threshold: float = JACCARD_THRESHOLD,
              max_iter: int = 20, partitions: int = 16,
              auto_local: bool = True) -> DataFrame:
    """distinct surfaces -> (norm, canon_id, canon_surface).

    canon_surface = min surface string in the component (deterministic
    representative); canon_id = component id (min member hash64 — also
    computable by the plain-Python oracle).

    With ``auto_local`` (default), dictionary-sized inputs collect to the
    driver and run the identical union-find semantics there (one job instead
    of ~8 tiny ones); the distributed LSH + CC path below handles web-scale
    surface sets and is what the oracle-parity tests exercise explicitly."""
    if auto_local:
        sample = (
            surfaces.select(F.col(col))
            .distinct()
            .limit(SMALL_GRAPH_THRESHOLD + 1)
        )
        norms = [r[0] for r in sample.collect()]
        if len(norms) <= SMALL_GRAPH_THRESHOLD:
            return canon_map_local(surfaces.sparkSession, norms, threshold)
    # checkpoint: bands is dictionary-sized (32 rows/surface) but its
    # upstream (distinct over corpus-derived surfaces) can be huge — it is
    # consumed three times below (verts, candidate self-join), so cut the
    # recompute here
    bands = cut_lineage(
        lsh_bands(surfaces, col)
        .repartition(partitions, "band_key")
    )
    verts = cut_lineage(bands.select("nid", "norm").distinct())
    edges = verify_pairs(candidate_pairs(bands), threshold)
    labels = connected_components(
        verts.select("nid"), edges, max_iter, partitions
    )
    with_comp = verts.join(labels, "nid")
    reps = (
        with_comp.groupBy("component")
        .agg(F.min("norm").alias("canon_surface"))
    )
    return (
        with_comp.join(reps, "component")
        .select(
            F.col("norm"),
            F.col("component").alias("canon_id"),
            F.col("canon_surface"),
        )
    )


def blocking_metrics(
    surfaces: DataFrame,
    truth: DataFrame,
    col: str = "norm",
    truth_key: str = "entity_id",
    truth_col: str = "norm",
) -> DataFrame:
    """ER blocking quality -> one row (n_surfaces, n_candidates,
    n_true_pairs, n_covered, reduction_ratio, pair_completeness): the
    two numbers every blocking scheme is judged by (Christen's ER
    survey) — how many of the O(n^2) comparisons the LSH bands avoided
    (RR = 1 - candidates / C(n,2)) and how many TRUE alias pairs still
    land in a shared block (PC = covered / true). Run per build against
    a labeled sample; a PC drop means the banding parameters no longer
    fit the alias distribution, BEFORE it silently degrades the KG.

    ``truth`` maps normalized surfaces to gold entity ids; true pairs
    are distinct same-entity (norm_a < norm_b) pairs. All heavy steps
    are the production blocking path itself (lsh_bands/candidate_pairs)
    plus one labeled self-join; only scalar counts reach the driver.
    """
    s = surfaces.select(F.col(col).alias("norm")).distinct()
    n = s.count()
    # candidate_pairs orders by nid (hash64), true pairs lexicographically
    # — re-canonicalize on the norms so the coverage join keys agree
    cands = cut_lineage(
        candidate_pairs(lsh_bands(s)).select(
            F.least("norm_a", "norm_b").alias("norm_a"),
            F.greatest("norm_a", "norm_b").alias("norm_b"),
        )
    )
    t = truth.select(
        F.col(truth_key).alias("_eid"), F.col(truth_col).alias("norm")
    ).distinct()
    tp = (
        t.alias("l")
        .join(t.alias("r"), "_eid")
        .where(F.col("l.norm") < F.col("r.norm"))
        .select(
            F.col("l.norm").alias("norm_a"), F.col("r.norm").alias("norm_b")
        )
        .distinct()
    )
    n_true = tp.count()
    n_cand = cands.count()
    n_cov = tp.join(cands, ["norm_a", "norm_b"], "left_semi").count()
    all_pairs = n * (n - 1) // 2
    spark = surfaces.sparkSession
    return spark.createDataFrame(
        [(
            n, n_cand, n_true, n_cov,
            round(1.0 - (n_cand / all_pairs), 6) if all_pairs else 1.0,
            round(n_cov / n_true, 6) if n_true else 1.0,
        )],
        "n_surfaces long, n_candidates long, n_true_pairs long, "
        "n_covered long, reduction_ratio double, pair_completeness double",
    )
