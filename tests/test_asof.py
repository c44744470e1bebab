"""As-of join vs a plain-python oracle + pinned edge semantics."""

import datetime as dt

import pytest

from chunksilo_spark.operators.asof import asof_join, dedup_right_latest


def _ts(s):
    return dt.datetime.fromisoformat(s)


LEFT = [  # (user, ts, event)
    (1, "2024-01-05 10:00", "e1"),
    (1, "2024-01-10 00:00", "e2"),   # exactly at a state change
    (1, "2024-01-02 00:00", "e0"),   # before any state
    (2, "2024-03-01 12:00", "e3"),
    (3, "2024-01-01 00:00", "e4"),   # key with no right rows
]
RIGHT = [  # (user, ts, state)
    (1, "2024-01-03 00:00", "s1"),
    (1, "2024-01-10 00:00", "s2"),
    (2, "2024-02-28 00:00", "s3"),
    (4, "2024-01-01 00:00", "s9"),   # right-only key
]


def _python_asof(left, right):
    out = []
    for k, lts, ev in left:
        best = None
        for rk, rts, st in right:
            if rk == k and rts <= lts and (best is None or rts > best[0]):
                best = (rts, st)
        out.append((k, lts, ev, best[1] if best else None))
    return sorted(out)


class TestAsofJoin:
    def _dfs(self, spark):
        l = spark.createDataFrame(
            [(k, _ts(t), e) for k, t, e in LEFT],
            "user long, ts timestamp, event string",
        )
        r = spark.createDataFrame(
            [(k, _ts(t), s) for k, t, s in RIGHT],
            "user long, state_ts timestamp, state string",
        )
        return l, r

    def test_matches_python_oracle(self, spark):
        l, r = self._dfs(spark)
        got = sorted(
            (x["user"], x["ts"].strftime("%Y-%m-%d %H:%M"), x["event"], x["state"])
            for x in asof_join(l, r, on="user", left_ts="ts",
                               right_ts="state_ts").collect()
        )
        assert got == _python_asof(LEFT, RIGHT)

    def test_pinned_edges(self, spark):
        l, r = self._dfs(spark)
        by_ev = {
            x["event"]: x["state"]
            for x in asof_join(l, r, on="user", left_ts="ts",
                               right_ts="state_ts").collect()
        }
        assert by_ev["e2"] == "s2"   # at-or-before includes same instant
        assert by_ev["e0"] is None   # before any state
        assert by_ev["e4"] is None   # key with no right rows survives (outer)
        assert len(by_ev) == len(LEFT)

    def test_column_collision_raises(self, spark):
        l, r = self._dfs(spark)
        r2 = r.withColumnRenamed("state", "event")
        with pytest.raises(ValueError, match="collision"):
            asof_join(l, r2, on="user", left_ts="ts", right_ts="state_ts")

    def test_dedup_right_latest(self, spark):
        rows = [
            (1, _ts("2024-01-03 00:00"), 10, "a"),
            (1, _ts("2024-01-03 00:00"), 12, "b"),  # max id wins
            (1, _ts("2024-01-04 00:00"), 11, "c"),
        ]
        r = spark.createDataFrame(
            rows, "user long, ts timestamp, row_id long, state string"
        )
        got = sorted(
            (x["user"], x["ts"], x["row_id"], x["state"])
            for x in dedup_right_latest(r, on="user", ts="ts",
                                        tiebreak="row_id").collect()
        )
        assert got == [
            (1, _ts("2024-01-03 00:00"), 12, "b"),
            (1, _ts("2024-01-04 00:00"), 11, "c"),
        ]

    def test_empty_right(self, spark):
        l, r = self._dfs(spark)
        out = asof_join(l, r.where("user < 0"), on="user", left_ts="ts",
                        right_ts="state_ts").collect()
        assert len(out) == len(LEFT)
        assert all(x["state"] is None for x in out)
