"""Temporal KG state (snapshot / validity intervals) vs python oracles +
the snapshot==intervals-at-t equivalence property."""

import datetime as dt

from pyspark.sql import functions as F

from chunksilo_spark.operators.temporal import (
    snapshot_from_intervals,
    triple_intervals,
    triple_snapshot,
)


def _ts(s):
    return dt.datetime.fromisoformat(s)


# (subj, pred, obj, ts, obs_id) — re-observations, same-instant ties,
# never-reobserved keys, and a key first observed late
OBS = [
    ("e1", "ceo", "alice", "2024-01-01 00:00", 1),
    ("e1", "ceo", "bob", "2024-06-01 00:00", 2),
    ("e1", "ceo", "carol", "2024-06-01 00:00", 3),   # same-instant supersede
    ("e1", "hq", "berlin", "2024-02-01 00:00", 4),
    ("e2", "ceo", "dan", "2024-03-01 00:00", 5),
    ("e2", "ceo", "erin", "2024-09-01 00:00", 6),
    ("e3", "founded", "1999", "2024-08-15 00:00", 7),  # first seen late
]

CUTS = ["2023-12-31 00:00", "2024-01-01 00:00", "2024-05-31 23:59",
        "2024-06-01 00:00", "2024-08-20 00:00", "2025-01-01 00:00"]


def _python_snapshot(obs, cut):
    best = {}
    for s, p, o, t, i in obs:
        t = _ts(t)
        if t <= cut:
            k = (s, p)
            if k not in best or (t, i) > (best[k][0], best[k][1]):
                best[k] = (t, i, o)
    return sorted((s, p, o) for (s, p), (_, _, o) in best.items())


def _obs_df(spark):
    return spark.createDataFrame(
        [(s, p, o, _ts(t), i) for s, p, o, t, i in OBS],
        "subj string, pred string, obj string, ts timestamp, obs_id long",
    ).repartition(7)  # partition-order independence is part of the contract


class TestTripleSnapshot:
    def test_matches_python_oracle_at_every_cutoff(self, spark):
        df = _obs_df(spark)
        for cut in CUTS:
            got = sorted(
                (r["subj"], r["pred"], r["obj"])
                for r in triple_snapshot(df, cut).collect()
            )
            assert got == _python_snapshot(OBS, _ts(cut)), cut

    def test_same_instant_tie_breaks_by_obs_id(self, spark):
        snap = triple_snapshot(_obs_df(spark), "2024-06-01 00:00")
        row = snap.where("subj='e1' and pred='ceo'").collect()[0]
        assert row["obj"] == "carol" and row["obs_id"] == 3

    def test_payload_columns_travel_together(self, spark):
        # winning row's ts/obs_id/obj all come from the same observation
        snap = triple_snapshot(_obs_df(spark), "2025-01-01 00:00")
        row = snap.where("subj='e2' and pred='ceo'").collect()[0]
        assert (row["obj"], row["obs_id"], row["ts"]) == (
            "erin", 6, _ts("2024-09-01 00:00"))


class TestTripleIntervals:
    def test_intervals_close_and_stay_open(self, spark):
        iv = triple_intervals(_obs_df(spark)).collect()
        by_id = {r["obs_id"]: r for r in iv}
        assert len(iv) == len(OBS)  # one interval per observation
        # closed by the next observation of the same key
        assert by_id[1]["valid_to"] == _ts("2024-06-01 00:00")
        # same-instant supersede -> zero-length interval
        assert by_id[2]["valid_from"] == by_id[2]["valid_to"]
        # current beliefs are open
        for i in (3, 4, 6, 7):
            assert by_id[i]["valid_to"] is None, i

    def test_snapshot_equals_intervals_at_every_cutoff(self, spark):
        df = _obs_df(spark)
        iv = triple_intervals(df)
        for cut in CUTS:
            via_snap = sorted(
                (r["subj"], r["pred"], r["obj"], r["obs_id"])
                for r in triple_snapshot(df, cut).collect()
            )
            via_iv = sorted(
                (r["subj"], r["pred"], r["obj"], r["obs_id"])
                for r in snapshot_from_intervals(iv, cut).collect()
            )
            assert via_snap == via_iv, cut

    def test_pointintime_predicate_is_pushable(self, spark, tmp_path):
        # the range predicate must reach the parquet scan as PushedFilters
        out = str(tmp_path / "iv")
        triple_intervals(_obs_df(spark)).write.parquet(out)
        plan = snapshot_from_intervals(
            spark.read.parquet(out), "2024-06-01 00:00"
        )._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters" in plan and "valid_from" in plan
