"""Temporal knowledge-graph state: snapshot and validity intervals.

The north-star corpus carries an observation timestamp per page
(``warc_ts``), so every extracted triple is an OBSERVATION
``(subj, pred, obj) @ ts`` — re-crawls re-observe the same (subj, pred)
with possibly different objects. Two derived relations turn that
observation log into queryable graph state (the reference's analog is its
incremental index state: reference index.py keeps the latest extraction
per file and reconciles on re-index; here the same latest-wins semantics
are applied per graph key, time-parameterized):

* :func:`triple_snapshot` — the graph AS OF an instant: for each
  (subj, pred), the payload of the latest observation at-or-before the
  cutoff. The temporal-join analog of ``operators/asof.dedup_right_latest``
  (same latest-wins pick), exposed as a first-class KG materialization.
* :func:`triple_intervals` — the full bitemporal ledger: each observation
  becomes a validity interval ``[valid_from, valid_to)``, half-open,
  closed by the next observation of the same (subj, pred); the current
  belief has ``valid_to IS NULL``. Point-in-time queries become a range
  predicate (``valid_from <= t AND (valid_to IS NULL OR t < valid_to)``),
  which Catalyst pushes straight to the parquet/Iceberg scan.

100 TB shape:
* snapshot — ONE map-side-combinable aggregation: ``max(struct(ts,
  tiebreak, payload...))`` per (subj, pred). No window sort, no
  row_number: partial maxes combine on the map side, so a hub subject
  (an entity observed in 30% of pages) costs a wide partial-agg fan-in,
  not a single-task sort. This is the same struct-max trick as
  ``asof.dedup_right_latest`` — pinned there, reused here.
* intervals — one shuffle on (subj, pred) and a per-key sort for the
  ``lead()`` window; keys are (entity, predicate) pairs so the key space
  is enormous and partitions balance; a hub key degrades to one
  disk-backed sort (spill-safe), never a cross-partition bottleneck.

Determinism: ties on ``ts`` (two observations of the same key in the same
instant) are broken by the ``tiebreak`` column (ascending in the interval
ordering, greatest-wins inside the snapshot struct-max), so both relations
are partition-order-independent and DuckDB-rederivable — the driver
oracles ``kg_triple_snapshot`` / ``kg_triple_intervals`` pin exactly this.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def triple_snapshot(
    triples: DataFrame,
    at_ts: Column | str,
    subj: str = "subj",
    pred: str = "pred",
    ts: str = "ts",
    tiebreak: str = "obs_id",
) -> DataFrame:
    """Latest observation per (subj, pred) at-or-before ``at_ts``.

    Returns one row per (subj, pred) observed by the cutoff, with every
    other column of ``triples`` carrying the values of the winning
    observation (greatest ``ts``, ties broken by greatest ``tiebreak``).
    """
    at = F.lit(at_ts) if isinstance(at_ts, str) else at_ts
    payload = [c for c in triples.columns if c not in (subj, pred)]
    ordered = [ts, tiebreak] + [
        c for c in payload if c not in (ts, tiebreak)
    ]
    picked = (
        triples.where(F.col(ts) <= at)
        .groupBy(subj, pred)
        .agg(F.max(F.struct(*ordered)).alias("_s"))
    )
    return picked.select(
        subj, pred, *[F.col(f"_s.{c}").alias(c) for c in ordered]
    )


def triple_intervals(
    triples: DataFrame,
    subj: str = "subj",
    pred: str = "pred",
    ts: str = "ts",
    tiebreak: str = "obs_id",
) -> DataFrame:
    """Observation log -> validity intervals, one row per observation.

    ``valid_from`` = the observation's own ``ts``; ``valid_to`` = the
    ``ts`` of the next observation of the same (subj, pred) in
    (ts, tiebreak) order, NULL while current. Half-open ``[from, to)``:
    an observation superseded in the same instant (same ts, higher
    tiebreak) yields a zero-length interval rather than a duplicate
    claim — snapshot(t) == intervals filtered at t for every t
    (property-tested in tests/test_temporal.py).
    """
    w = Window.partitionBy(subj, pred).orderBy(
        F.col(ts).asc(), F.col(tiebreak).asc()
    )
    return triples.select(
        *triples.columns,
        F.col(ts).alias("valid_from"),
        F.lead(F.col(ts)).over(w).alias("valid_to"),
    ).drop(ts)


def triple_support(
    triples: DataFrame,
    as_of: Column | str,
    half_life_days: float = 30.0,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
    ts: str = "ts",
    source: str | None = None,
) -> DataFrame:
    """Evidence aggregation per distinct claim -> (subj, pred, obj,
    n_obs, [n_sources,] first_seen, last_seen, confidence).

    The edge-weight materialization step: a claim observed many times,
    recently, from many pages outweighs a one-off stale extraction.
    ``confidence`` is the recency-weighted support
    ``sum over observations of 0.5 ^ (age_days / half_life_days)`` with
    age measured from ``as_of`` (exact microsecond arithmetic, UTC
    session pin), rounded to 6dp. ONE map-side-combinable groupBy — every
    aggregate (count, min, max, conditional sum, count-distinct source)
    partials on the map side, so hub claims fan in without a single-task
    sort; this is the aggregation shape that survives a 30%-hub corpus.
    """
    at = F.lit(as_of) if isinstance(as_of, str) else as_of
    age_days = (
        F.unix_micros(at.cast("timestamp"))
        - F.unix_micros(F.col(ts).cast("timestamp"))
    ).cast("double") / F.lit(86400.0 * 1e6)
    weight = F.pow(F.lit(0.5), age_days / F.lit(float(half_life_days)))
    aggs = [
        F.count(F.lit(1)).alias("n_obs"),
        F.min(ts).alias("first_seen"),
        F.max(ts).alias("last_seen"),
        F.round(F.sum(weight), 6).alias("confidence"),
    ]
    if source is not None:
        aggs.insert(1, F.countDistinct(source).alias("n_sources"))
    return triples.groupBy(subj, pred, obj).agg(*aggs)


def functional_conflicts(
    triples: DataFrame,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
    ts: str = "ts",
    tiebreak: str = "obs_id",
) -> DataFrame:
    """Functional-predicate violations -> (subj, pred, n_values,
    top_obj, top_n_obs, latest_obj).

    A predicate expected to be single-valued (ceo-of, founded-in,
    capital-of) showing >= 2 distinct objects for one subject is either
    a real change over time or an extraction error — exactly the rows a
    KG-quality pass routes to canonicalization review. Per conflicted
    key the most-supported value (``top_obj``, ties to the greater
    object — deterministic) and the most-recent value (``latest_obj``,
    (ts, tiebreak) order) disagree often enough that both are emitted.

    Two chained map-side-combinable aggregations, both keyed on the KG
    key space ((s,p,o) then (s,p)) — no windows, no self-joins; the
    second input is one row per distinct VALUE, already evidence-
    collapsed, so hubs cost partial-agg fan-in only.
    """
    per_val = triples.groupBy(subj, pred, obj).agg(
        F.count(F.lit(1)).alias("_n_obs"),
        F.max(F.struct(F.col(ts), F.col(tiebreak))).alias("_last"),
    )
    return (
        per_val.groupBy(subj, pred)
        .agg(
            F.count(F.lit(1)).alias("n_values"),
            F.max(F.struct(F.col("_n_obs"), F.col(obj))).alias("_top"),
            F.max(
                F.struct(
                    F.col(f"_last.{ts}"),
                    F.col(f"_last.{tiebreak}"),
                    F.col(obj),
                )
            ).alias("_latest"),
        )
        .where(F.col("n_values") >= 2)
        .select(
            subj,
            pred,
            "n_values",
            F.col(f"_top.{obj}").alias("top_obj"),
            F.col("_top._n_obs").alias("top_n_obs"),
            F.col(f"_latest.{obj}").alias("latest_obj"),
        )
    )


def snapshot_from_intervals(
    intervals: DataFrame, at_ts: Column | str
) -> DataFrame:
    """Point-in-time filter over :func:`triple_intervals` output — the
    range predicate Catalyst can push down to the scan. With the interval
    table partitioned/sorted on valid_from, old history prunes away
    entirely. NOTE: same-instant superseded observations produce
    zero-length intervals which this predicate correctly excludes
    (``t < valid_to`` with ``valid_to == valid_from``)."""
    at = F.lit(at_ts) if isinstance(at_ts, str) else at_ts
    return intervals.where(
        (F.col("valid_from") <= at)
        & (F.col("valid_to").isNull() | (at < F.col("valid_to")))
    )


def snapshot_diff(
    triples: DataFrame,
    t1: Column | str,
    t2: Column | str,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
    ts: str = "ts",
    tiebreak: str = "obs_id",
) -> DataFrame:
    """Claim-level delta between two instants -> (subj, pred, change,
    obj_before, obj_after): what a nightly KG build actually publishes —
    ``added`` (no observation by t1, observed by t2), ``removed`` (the
    reverse — meaningful when t1 > t2 or the log is corrected), and
    ``changed`` (both present, different object). Unchanged claims are
    dropped; 'before'/'after' follow :func:`triple_snapshot` semantics
    (latest (ts, tiebreak) at-or-before the cutoff).

    100 TB shape: ONE scan and ONE shuffle — both snapshots come out of
    a single groupBy(subj, pred) via conditional struct-max aggregation
    (``max(when(ts <= t, struct))``), map-side combinable; no
    snapshot-vs-snapshot join at all. The diff itself is a projection.
    """
    at1 = F.lit(t1) if isinstance(t1, str) else t1
    at2 = F.lit(t2) if isinstance(t2, str) else t2
    st = F.struct(F.col(ts), F.col(tiebreak), F.col(obj).alias("_obj"))
    agg = triples.groupBy(subj, pred).agg(
        F.max(F.when(F.col(ts) <= at1, st)).alias("_s1"),
        F.max(F.when(F.col(ts) <= at2, st)).alias("_s2"),
    )
    before = F.col("_s1._obj")
    after = F.col("_s2._obj")
    change = (
        F.when(F.col("_s1").isNull() & F.col("_s2").isNotNull(), F.lit("added"))
        .when(F.col("_s1").isNotNull() & F.col("_s2").isNull(), F.lit("removed"))
        .when(before != after, F.lit("changed"))
    )
    return (
        agg.select(
            subj,
            pred,
            change.alias("change"),
            before.alias("obj_before"),
            after.alias("obj_after"),
        )
        .where(F.col("change").isNotNull())
    )


def sessionize(
    events: DataFrame,
    gap_s: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Gap-based sessionization -> per-KEY session rollup (key,
    session_idx, n_events, start_ep, end_ep, duration_s): consecutive
    events of one key belong to one session while the gap between them
    is <= ``gap_s`` seconds; a longer silence starts the next session.
    The standard carve-up of any event log — crawler fetch bursts per
    host, user visits per cookie, API calls per client — and the batch
    twin of Structured Streaming's session windows.

    Pinned exact-integer algebra: ep = unix_timestamp(ts);
    ``new = (ep - lag(ep) > gap_s)`` per key in ep order (first event
    starts session 1); ``session_idx`` = running sum of ``new``;
    rollup = count / min / max / (max - min) per (key, session_idx).
    Equal-timestamp ties need no tiebreak: a zero gap can never open a
    session, and every emitted stat is order-invariant within a tie
    run — the output is deterministic even though the intra-tie lag
    order is not.

    100 TB shape: ONE key-partitioned window (per-key histories are
    event-count-bounded; hub keys are AQE-skew territory, not a global
    sort) feeding ONE map-side-combinable aggregation; output is
    session-sized."""
    if gap_s < 0:
        raise ValueError("sessionize needs gap_s >= 0")
    marked = (
        events.select(
            F.col(key_col).alias("key"),
            F.unix_timestamp(F.col(ts_col)).cast("long").alias("_ep"),
        )
        .withColumn(
            "_new",
            F.when(
                (F.col("_ep") - F.lag("_ep").over(
                    Window.partitionBy("key").orderBy("_ep")
                )) > gap_s,
                F.lit(1),
            )
            .otherwise(F.lit(0)),
        )
        .withColumn(
            "session_idx",
            (
                F.sum("_new").over(
                    Window.partitionBy("key")
                    .orderBy("_ep")
                    .rowsBetween(Window.unboundedPreceding, 0)
                )
                + 1
            ).cast("long"),
        )
    )
    return (
        marked.groupBy("key", "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("_ep").alias("start_ep"),
            F.max("_ep").alias("end_ep"),
        )
        .select(
            F.col("key").alias(key_col),
            "session_idx",
            "n_events",
            "start_ep",
            "end_ep",
            (F.col("end_ep") - F.col("start_ep")).alias("duration_s"),
        )
    )
