"""Temporal KG state (snapshot / validity intervals) vs python oracles +
the snapshot==intervals-at-t equivalence property."""

import datetime as dt

from pyspark.sql import functions as F

from chunksilo_spark.operators import temporal as T
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


class TestTripleSupport:
    ROWS = [
        # (subj, pred, obj, ts, obs_id, source)
        ("e1", "ceo", "alice", "2024-01-01 00:00", 1, "s1"),
        ("e1", "ceo", "alice", "2024-01-15 00:00", 2, "s2"),
        ("e1", "ceo", "alice", "2024-01-29 00:00", 3, "s1"),
        ("e1", "ceo", "bob", "2024-01-30 00:00", 4, "s3"),
        ("e2", "hq", "berlin", "2024-01-10 00:00", 5, "s1"),
    ]
    AS_OF = "2024-02-01 00:00:00"
    HL = 7.0

    def _df(self, spark):
        return spark.createDataFrame(
            [(s, p, o, _ts(t), i, src) for s, p, o, t, i, src in self.ROWS],
            "subj string, pred string, obj string, ts timestamp, "
            "obs_id long, source string",
        ).repartition(3)

    def test_matches_python_oracle(self, spark):
        from chunksilo_spark.operators.temporal import triple_support

        as_of = _ts(self.AS_OF)
        want = {}
        for s, p, o, t, i, src in self.ROWS:
            k = (s, p, o)
            age_d = (as_of - _ts(t)).total_seconds() / 86400.0
            w = 0.5 ** (age_d / self.HL)
            e = want.setdefault(k, [0, set(), None, None, 0.0])
            e[0] += 1
            e[1].add(src)
            tt = _ts(t)
            e[2] = tt if e[2] is None or tt < e[2] else e[2]
            e[3] = tt if e[3] is None or tt > e[3] else e[3]
            e[4] += w
        got = {
            (r["subj"], r["pred"], r["obj"]): r
            for r in triple_support(
                self._df(spark), self.AS_OF,
                half_life_days=self.HL, source="source",
            ).collect()
        }
        assert set(got) == set(want)
        for k, (n, srcs, fs, ls, conf) in want.items():
            r = got[k]
            assert r["n_obs"] == n and r["n_sources"] == len(srcs)
            assert r["first_seen"] == fs and r["last_seen"] == ls
            assert abs(r["confidence"] - round(conf, 6)) < 2e-6

    def test_recency_outweighs_staleness(self, spark):
        from chunksilo_spark.operators.temporal import triple_support

        got = {
            (r["subj"], r["pred"], r["obj"]): r["confidence"]
            for r in triple_support(
                self._df(spark), self.AS_OF, half_life_days=7.0
            ).collect()
        }
        # one fresh bob observation beats... not alice (3 obs), but beats
        # a single observation from three weeks earlier
        assert got[("e1", "ceo", "bob")] > got[("e2", "hq", "berlin")]


class TestFunctionalConflicts:
    def test_top_vs_latest_disagree(self, spark):
        from chunksilo_spark.operators.temporal import functional_conflicts

        rows = [
            # alice supported 3x early; bob once but latest
            ("e1", "ceo", "alice", "2024-01-01 00:00", 1),
            ("e1", "ceo", "alice", "2024-01-02 00:00", 2),
            ("e1", "ceo", "alice", "2024-01-03 00:00", 3),
            ("e1", "ceo", "bob", "2024-01-10 00:00", 4),
            # non-conflicted key must not appear
            ("e2", "hq", "berlin", "2024-01-05 00:00", 5),
        ]
        df = spark.createDataFrame(
            [(s, p, o, _ts(t), i) for s, p, o, t, i in rows],
            "subj string, pred string, obj string, ts timestamp, obs_id long",
        ).repartition(4)
        out = functional_conflicts(df).collect()
        assert len(out) == 1
        r = out[0]
        assert (r["subj"], r["pred"]) == ("e1", "ceo")
        assert r["n_values"] == 2
        assert r["top_obj"] == "alice" and r["top_n_obs"] == 3
        assert r["latest_obj"] == "bob"

    def test_support_tie_breaks_to_greater_obj(self, spark):
        from chunksilo_spark.operators.temporal import functional_conflicts

        rows = [
            ("e1", "p", "aaa", "2024-01-01 00:00", 1),
            ("e1", "p", "zzz", "2024-01-02 00:00", 2),
        ]
        df = spark.createDataFrame(
            [(s, p, o, _ts(t), i) for s, p, o, t, i in rows],
            "subj string, pred string, obj string, ts timestamp, obs_id long",
        )
        r = functional_conflicts(df).collect()[0]
        assert r["top_obj"] == "zzz" and r["latest_obj"] == "zzz"


class TestSnapshotDiff:
    # obs log: (subj, pred, obj, ts, obs_id)
    OBS = [
        (1, "p", 10, "2024-01-01 00:00:00", 1),
        (1, "p", 11, "2024-01-20 00:00:00", 2),   # changed by t2
        (2, "p", 20, "2024-01-25 00:00:00", 3),   # added after t1
        (3, "p", 30, "2024-01-05 00:00:00", 4),   # unchanged -> dropped
        (4, "p", 40, "2024-03-01 00:00:00", 5),   # after both -> absent
        (5, "p", 50, "2024-01-10 00:00:00", 6),
        (5, "p", 50, "2024-01-22 00:00:00", 7),   # re-observed same obj
    ]
    T1 = "2024-01-15 00:00:00"
    T2 = "2024-02-01 00:00:00"

    def _df(self, spark):
        return spark.createDataFrame(
            self.OBS, "subj long, pred string, obj long, ts string, obs_id long"
        ).withColumn("ts", F.to_timestamp("ts"))

    def test_classification(self, spark):
        got = {
            (r["subj"], r["pred"]): (
                r["change"], r["obj_before"], r["obj_after"]
            )
            for r in T.snapshot_diff(self._df(spark), self.T1, self.T2).collect()
        }
        assert got == {
            (1, "p"): ("changed", 10, 11),
            (2, "p"): ("added", None, 20),
        }

    def test_reverse_cutoffs_flip_direction(self, spark):
        got = {
            (r["subj"], r["pred"]): r["change"]
            for r in T.snapshot_diff(self._df(spark), self.T2, self.T1).collect()
        }
        assert got == {(1, "p"): "changed", (2, "p"): "removed"}

    def test_consistent_with_two_snapshots(self, spark):
        df = self._df(spark)
        s1 = {
            (r["subj"], r["pred"]): r["obj"]
            for r in T.triple_snapshot(df, self.T1).collect()
        }
        s2 = {
            (r["subj"], r["pred"]): r["obj"]
            for r in T.triple_snapshot(df, self.T2).collect()
        }
        want = {}
        for k in set(s1) | set(s2):
            b, a = s1.get(k), s2.get(k)
            if b is None:
                want[k] = ("added", None, a)
            elif a is None:
                want[k] = ("removed", b, None)
            elif a != b:
                want[k] = ("changed", b, a)
        got = {
            (r["subj"], r["pred"]): (r["change"], r["obj_before"], r["obj_after"])
            for r in T.snapshot_diff(df, self.T1, self.T2).collect()
        }
        assert got == want


class TestSessionize:
    def _python(self, rows, gap):
        hist = {}
        for k, ep in rows:
            hist.setdefault(k, []).append(ep)
        out = {}
        for k, eps in hist.items():
            eps.sort()
            idx, start, last, n = 1, eps[0], eps[0], 0
            for ep in eps:
                if ep - last > gap:
                    out[(k, idx)] = (n, start, last, last - start)
                    idx, start, n = idx + 1, ep, 0
                n, last = n + 1, ep
            out[(k, idx)] = (n, start, last, last - start)
        return out

    def _run(self, spark, rows, gap):
        import datetime as dt

        from chunksilo_spark.operators.temporal import sessionize

        df = spark.createDataFrame(
            [
                (k, dt.datetime.fromtimestamp(ep, dt.timezone.utc))
                for k, ep in rows
            ],
            "user_id string, ts timestamp",
        )
        return {
            (r["user_id"], r["session_idx"]): (
                r["n_events"], r["start_ep"], r["end_ep"], r["duration_s"]
            )
            for r in sessionize(df, gap).collect()
        }

    def test_matches_python_replay(self, spark):
        base = 1_700_000_000
        rows = []
        for u in range(6):
            for i in range(12):
                # bursts with occasional long silences
                rows.append(
                    (f"u{u}", base + i * 100 + (i // 4) * 10_000 * (u + 1))
                )
        gap = 1000
        assert self._run(spark, rows, gap) == self._python(rows, gap)

    def test_tied_timestamps_are_order_invariant(self, spark):
        base = 1_700_000_000
        rows = [("u", base), ("u", base + 100), ("u", base + 100),
                ("u", base + 100), ("u", base + 5000)]
        got = self._run(spark, rows, 50)
        assert got == self._python(rows, 50)
        assert got[("u", 2)][0] == 3  # the tie run is ONE session

    def test_gap_boundary_inclusive_and_validation(self, spark):
        import pytest as _pytest

        from chunksilo_spark.operators.temporal import sessionize

        base = 1_700_000_000
        # gap EXACTLY equal to threshold stays in-session
        rows = [("u", base), ("u", base + 60), ("u", base + 121)]
        got = self._run(spark, rows, 60)
        assert list(got) == [("u", 1), ("u", 2)]
        assert got[("u", 1)] == (2, base, base + 60, 60)
        df = spark.createDataFrame([], "user_id string, ts timestamp")
        with _pytest.raises(ValueError):
            sessionize(df, -1)


class TestSessionizeVsBuiltin:
    def test_matches_spark_session_window(self, spark):
        """The window-based sessionize must carve the same sessions as
        the engine's own F.session_window aggregation. Correspondence
        for integer-second data: sessionize keeps a gap <= g in-session
        (inclusive), session_window merges events strictly closer than
        its gap parameter — so g seconds inclusive == session_window of
        g+1 seconds."""
        import datetime as dt

        import pyspark.sql.functions as F_

        from chunksilo_spark.operators.temporal import sessionize

        base = 1_700_000_000
        rows = []
        for u in range(5):
            for i in range(15):
                rows.append(
                    (f"u{u}", base + i * 37 * (u + 1) + (i // 5) * 900)
                )
        df = spark.createDataFrame(
            [
                (k, dt.datetime.fromtimestamp(ep, dt.timezone.utc))
                for k, ep in rows
            ],
            "user_id string, ts timestamp",
        )
        gap = 120
        mine = {
            (r["user_id"], r["start_ep"]): (r["n_events"], r["end_ep"])
            for r in sessionize(df, gap).collect()
        }
        builtin = {
            (r["user_id"], r["s"]): (r["n"], r["e"])
            for r in df.groupBy(
                "user_id", F_.session_window("ts", f"{gap + 1} seconds")
            )
            .agg(
                F_.count(F_.lit(1)).alias("n"),
                F_.min(F_.unix_timestamp("ts")).cast("long").alias("s"),
                F_.max(F_.unix_timestamp("ts")).cast("long").alias("e"),
            )
            .select("user_id", "s", "n", "e")
            .collect()
        }
        assert mine == builtin and len(mine) > 10
