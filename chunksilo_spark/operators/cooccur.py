"""Entity co-occurrence counting + (N)PMI edge weighting.

The statistical complement of stage 3's pattern-extracted triples: two
entities that keep appearing in the same context are related even when no
dependency pattern fires, and (normalized) pointwise mutual information is
the standard way to turn raw co-mention counts into an association score
(the reference has no analog — its graph is retrieval-only; this is the
KG-construction signal a web-scale pipeline adds on top).

Semantics (pinned for the SQL oracle), over mention rows (ctx, entity):
  * entities are counted AT MOST ONCE per context (distinct before
    pairing) — PMI is about co-presence, not token frequency;
  * pairs are unordered, emitted once with a < b;
  * with N = number of distinct contexts:
      p(e)    = ctx_count(e) / N
      p(a,b)  = pair_count(a,b) / N
      pmi     = ln( p(a,b) / (p(a) * p(b)) )
      npmi    = pmi / -ln(p(a,b))        (1 = perfect association,
                                          0 = independence, <0 = repulsion;
                                          undefined-at-p=1 contexts cannot
                                          occur since a pair seen in every
                                          context still has p(a,b) <= 1 —
                                          npmi is emitted as NULL when
                                          p(a,b) == 1)
  * float-op ORDER is pinned exactly as written above (ratio first, one
    ln) so DuckDB reproduces the doubles bit-for-bit modulo the gate's
    6dp rounding.

100 TB shape:
  * the pair relation is an equi-join of the distinct (ctx, entity)
    relation with itself ON ctx — fan-out is k*(k-1)/2 per context where
    k = entities per sentence/doc (single digits), never corpus-sized;
  * pair counts aggregate with map-side partial combine; the hub-entity
    skew (one entity in 30% of docs) spreads across DISTINCT (hub, x)
    keys, so no single reducer key explodes — the classic reason PMI
    scales where a groupBy-collect_list approach would not;
  * marginals are entity-sized and join back BROADCAST;
  * N is a 1-row aggregate broadcast-cross-joined into the plan (the same
    no-driver-collect pattern as PageRank's dangling mass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..checkpointing import cut_lineage


def _distinct_mentions(
    mentions: DataFrame, ctx_col: str, ent_col: str
) -> DataFrame:
    """The deduped (ctx, e) relation both operators derive from —
    lineage-cut because every consumer (pairing join sides, marginals,
    context count) would otherwise re-run a possibly-expensive upstream
    plan (e.g. stage-1/2 extraction) once each."""
    return cut_lineage(
        mentions.select(
            F.col(ctx_col).alias("ctx"), F.col(ent_col).alias("e")
        ).distinct()
    )


def _pairs(m: DataFrame) -> DataFrame:
    """Unordered co-occurring pairs of an already-deduped (ctx, e)
    relation -> (ctx, a, b), a < b. THE pinned pair semantics — the one
    implementation both entity_pairs and cooccurrence_pmi share."""
    left = m.select("ctx", F.col("e").alias("a"))
    right = m.select("ctx", F.col("e").alias("b"))
    return left.join(right, "ctx").where(F.col("a") < F.col("b"))


def entity_pairs(mentions: DataFrame, ctx_col: str, ent_col: str) -> DataFrame:
    """Distinct unordered co-occurring pairs per context -> (ctx, a, b),
    a < b. Input may repeat (ctx, entity); dedup happens here."""
    return _pairs(_distinct_mentions(mentions, ctx_col, ent_col))


def cooccurrence_pmi(
    mentions: DataFrame,
    ctx_col: str = "url",
    ent_col: str = "entity_id",
    min_pairs: int = 1,
) -> DataFrame:
    """(a, b, n_pair, n_a, n_b, pmi, npmi) per co-occurring entity pair.

    ``min_pairs`` prunes low-support pairs BEFORE the marginal join (at
    scale the long tail of 1-count pairs dominates the pair relation; PMI
    on them is noise anyway).
    """
    m = _distinct_mentions(mentions, ctx_col, ent_col)
    # every mention row carries an entity, so the distinct ctx set of m
    # equals that of the raw input — derived from the cut relation to
    # avoid a second pass over the upstream plan
    n_ctx = m.select("ctx").distinct().agg(
        F.count(F.lit(1)).cast("double").alias("_n")
    )
    marg = m.groupBy("e").agg(F.count(F.lit(1)).alias("n_e"))
    pairs = (
        _pairs(m)
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .where(F.col("n_pair") >= F.lit(min_pairs))
    )
    out = (
        pairs.join(
            F.broadcast(marg.select(F.col("e").alias("a"), F.col("n_e").alias("n_a"))),
            "a",
        )
        .join(
            F.broadcast(marg.select(F.col("e").alias("b"), F.col("n_e").alias("n_b"))),
            "b",
        )
        .crossJoin(F.broadcast(n_ctx))
    )
    p_ab = F.col("n_pair") / F.col("_n")
    p_a = F.col("n_a") / F.col("_n")
    p_b = F.col("n_b") / F.col("_n")
    pmi = F.log(p_ab / (p_a * p_b))
    npmi = F.when(p_ab == 1.0, F.lit(None).cast("double")).otherwise(
        pmi / -F.log(p_ab)
    )
    return out.select(
        "a", "b", "n_pair", "n_a", "n_b",
        pmi.alias("pmi"), npmi.alias("npmi"),
    )


def top_associations(pmi_df: DataFrame, k: int) -> DataFrame:
    """Strongest k associations by (rounded) npmi; support + pair-id
    tiebreaks pin the cutoff cross-engine, and orderBy+limit compiles to
    TakeOrderedAndProject (per-partition top-k, no global sort)."""
    r = pmi_df.select(
        "a", "b", "n_pair",
        F.round("pmi", 6).alias("pmi"),
        F.round("npmi", 6).alias("npmi"),
    )
    return r.orderBy(
        F.col("npmi").desc(), F.col("n_pair").desc(),
        F.col("a").asc(), F.col("b").asc(),
    ).limit(k)
