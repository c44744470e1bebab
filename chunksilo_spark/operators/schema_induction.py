"""KG schema induction: relation-algebra statistics mined from the claims.

The reference has no ontology layer — its KG analog stores whatever the
extractor emits. At 10^12-document scale the predicate vocabulary itself
must be AUDITED from data: which predicates are single-valued lives in the
driver's per-predicate profile (`kg_pred_profile`, countDistinct rollup);
this module adds cross-predicate structure — inverse / symmetric predicate
pairs (``born_in`` vs ``birthplace_of``, ``married_to``'s self-inverse),
the signal that drives predicate canonicalization (merge q into p-inverse)
and KG completion (materialize the missing inverse edges).

Scale shape: one self-equi-join of the distinct-claims relation keyed on
the SWAPPED entity pair (subj=obj, obj=subj) — a plain hash join AQE can
split on hot entity pairs — then a map-side-combinable groupBy on the
predicate pair, with predicate totals (vocabulary-sized) broadcast back.
Nothing corpus-proportional crosses the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["inverse_predicates"]


def inverse_predicates(
    claims: DataFrame,
    min_matched: int = 1,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
) -> DataFrame:
    """Inverse-predicate candidates -> (pred, inv_pred, n_pred,
    n_matched, inv_confidence).

    Pinned semantics (SQL-rederivable): over DISTINCT claims,
    ``n_matched(p, q)`` counts claims ``(a, p, b)`` such that the claim
    ``(b, q, a)`` also exists; ``n_pred`` is the total distinct claims
    of ``p``; ``inv_confidence = round(n_matched / n_pred, 6)``. A pair
    with high confidence both ways is an inverse pair; ``p == q`` rows
    measure symmetry. Self-paired claims (a, p, a) match themselves —
    reflexive noise that real extractors emit; audit, don't hide.
    Rows with ``n_matched < min_matched`` are dropped.
    """
    c = claims.select(
        F.col(subj_col).alias("subj"),
        F.col(pred_col).alias("pred"),
        F.col(obj_col).alias("obj"),
    ).distinct()
    totals = c.groupBy("pred").agg(F.count(F.lit(1)).alias("n_pred"))
    matched = (
        c.alias("l")
        .join(
            c.alias("r"),
            (F.col("l.subj") == F.col("r.obj"))
            & (F.col("l.obj") == F.col("r.subj")),
        )
        .groupBy(
            F.col("l.pred").alias("pred"), F.col("r.pred").alias("inv_pred")
        )
        .agg(F.count(F.lit(1)).alias("n_matched"))
        .where(F.col("n_matched") >= F.lit(min_matched))
    )
    return matched.join(F.broadcast(totals), "pred").select(
        "pred",
        "inv_pred",
        "n_pred",
        "n_matched",
        F.round(F.col("n_matched") / F.col("n_pred"), 6).alias(
            "inv_confidence"
        ),
    )


def path_rules(
    claims: DataFrame,
    min_support: int = 1,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
) -> DataFrame:
    """Composition-rule candidates ``p(a,b) ∧ q(b,c) ⇒ r(a,c)`` ->
    (pred_p, pred_q, pred_r, n_body, support, confidence): AMIE-style
    horn-rule mining restricted to the length-2 closed path shape — the
    workhorse rule class (born_in ∧ located_in ⇒ citizen_of). Mined
    rules drive KG completion (materialize high-confidence heads) and
    extractor QA (a confident rule with missing heads = extraction gaps).

    Pinned semantics (SQL-rederivable, set-based like AMIE's support):
    over DISTINCT claims, ``n_body(p, q)`` = #DISTINCT pairs (a, c) with
    ∃b: p(a,b) ∧ q(b,c) — the mid-entity b is PROJECTED OUT before
    counting, so a pair connected through many bridges counts once;
    ``support(p,q,r)`` = # of those pairs with r(a,c) present;
    ``confidence = round(support / n_body, 6)`` (CWA: every unproven
    head counts against the rule). ``n_pca_body(p,q,r)`` = # body pairs
    whose subject a has at least one r-claim AT ALL, and
    ``pca_confidence = round(support / n_pca_body, 6)`` — AMIE's
    partial-completeness denominator (an absent head only counts
    against the rule if the KG knows *something* r-shaped about a; the
    honest confidence over an incomplete KG, always >= the CWA value).
    Rules below ``min_support`` are dropped.

    100 TB shape: the chain join is keyed on the bridge entity b — the
    hub-entity deg^2 blowup, same territory as link prediction: AQE
    skew-join splits hot b's, and the immediate DISTINCT over
    (a, p, q, c) collapses bridge multiplicity before anything else
    grows. The head join is an equi-join on the (a, c) pair; per-(p,q)
    body totals are predicate-pair-sized and broadcast back.
    """
    c = claims.select(
        F.col(subj_col).alias("subj"),
        F.col(pred_col).alias("pred"),
        F.col(obj_col).alias("obj"),
    ).distinct()
    chains = (
        c.alias("l")
        .join(c.alias("r"), F.col("l.obj") == F.col("r.subj"))
        .select(
            F.col("l.subj").alias("a"),
            F.col("l.pred").alias("pred_p"),
            F.col("r.pred").alias("pred_q"),
            F.col("r.obj").alias("c"),
        )
        .distinct()
    )
    body = chains.groupBy("pred_p", "pred_q").agg(
        F.count(F.lit(1)).alias("n_body")
    )
    heads = (
        chains.join(
            c.select(
                F.col("subj").alias("a"),
                F.col("pred").alias("pred_r"),
                F.col("obj").alias("c"),
            ),
            ["a", "c"],
        )
        .groupBy("pred_p", "pred_q", "pred_r")
        .agg(F.count(F.lit(1)).alias("support"))
        .where(F.col("support") >= F.lit(min_support))
    )
    # PCA denominator: body pairs whose subject has ANY r-claim — join on
    # the subject only, against the (subj, pred) projection
    pca = (
        chains.join(
            c.select(F.col("subj").alias("a"), F.col("pred").alias("pred_r"))
            .distinct(),
            "a",
        )
        .groupBy("pred_p", "pred_q", "pred_r")
        .agg(F.count(F.lit(1)).alias("n_pca_body"))
    )
    return (
        heads.join(F.broadcast(body), ["pred_p", "pred_q"])
        .join(pca, ["pred_p", "pred_q", "pred_r"])
        .select(
            "pred_p",
            "pred_q",
            "pred_r",
            "n_body",
            "support",
            F.round(F.col("support") / F.col("n_body"), 6).alias("confidence"),
            "n_pca_body",
            F.round(F.col("support") / F.col("n_pca_body"), 6).alias(
                "pca_confidence"
            ),
        )
    )
