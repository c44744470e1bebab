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
