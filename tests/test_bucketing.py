"""Bucketed layout: a join of two co-bucketed tables must run with NO
Exchange on either side (the write-once-shuffle-never-again guarantee),
and the results must equal the plain join."""

import pytest

from chunksilo_spark.sources import bucketing as B


@pytest.fixture()
def bucket_db(spark, tmp_path):
    db = "bucketdb_test"
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    spark.sql(f"CREATE DATABASE {db} LOCATION '{tmp_path}/wh'")
    yield db
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


def test_cobucketed_join_has_no_exchange(spark, bucket_db):
    docs = spark.range(0, 2000).selectExpr(
        "id AS doc_id", "concat('t', id) AS text"
    )
    meta = spark.range(0, 2000).selectExpr(
        "id AS doc_id", "id % 7 AS grp"
    )
    B.write_bucketed(docs, f"{bucket_db}.docs", "doc_id", 8)
    B.write_bucketed(meta, f"{bucket_db}.meta", "doc_id", 8)

    joined = B.cobucketed_join(
        spark, f"{bucket_db}.docs", f"{bucket_db}.meta", "doc_id"
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan  # the whole point of bucketing

    # and it is still a correct join
    assert joined.count() == 2000
    row = joined.where("doc_id = 42").collect()[0]
    assert row["text"] == "t42" and row["grp"] == 0


def test_mismatched_bucket_counts_coalesce_without_shuffle(spark, bucket_db):
    """Tables bucketed at different granularities (8 vs 4 — e.g. one table
    re-bucketed after growth) still join shuffle-free when
    coalesceBucketsInJoin is on: the finer side's buckets merge 2:1
    instead of either side exchanging."""
    a = spark.range(0, 1000).selectExpr("id AS k", "id * 2 AS v")
    b = spark.range(0, 1000).selectExpr("id AS k", "id * 3 AS w")
    B.write_bucketed(a, f"{bucket_db}.a8", "k", 8)
    B.write_bucketed(b, f"{bucket_db}.b4", "k", 4)
    spark.conf.set("spark.sql.bucketing.coalesceBucketsInJoin.enabled", True)
    try:
        joined = B.cobucketed_join(
            spark, f"{bucket_db}.a8", f"{bucket_db}.b4", "k"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == 1000
    finally:
        spark.conf.unset("spark.sql.bucketing.coalesceBucketsInJoin.enabled")


def test_bgp_star_join_on_bucketed_triples_no_exchange(spark, bucket_db):
    """The triple-store layout claim: a triples table bucketed by subj
    runs subject-star BGP joins (patterns sharing ?a) with ZERO Exchange
    — the per-query shuffle is paid once at materialization. This is the
    scale path for kg_bgp_match at 10^12 triples."""
    from chunksilo_spark.operators.bgp import bgp_match

    triples = spark.range(0, 3000).selectExpr(
        "id % 500 AS subj",
        "CASE WHEN id % 3 = 0 THEN 'p' WHEN id % 3 = 1 THEN 'q' "
        "ELSE 'r' END AS pred",
        "id % 97 AS obj",
    )
    B.write_bucketed(triples, f"{bucket_db}.triples", "subj", 8)
    t = spark.table(f"{bucket_db}.triples")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    try:
        res = bgp_match(t, [("?a", "p", "?x"), ("?a", "q", "?y")])
        plan = res._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # byte-identical to the unbucketed computation
        want = sorted(
            tuple(r)
            for r in bgp_match(
                triples, [("?a", "p", "?x"), ("?a", "q", "?y")]
            ).collect()
        )
        assert sorted(tuple(r) for r in res.collect()) == want
        assert want  # join actually produced rows
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
