"""Driver-contract sanity: entry() produces rows; every oracle key has a
query; flagship schema is stable."""

import __spark_entry__ as em


def test_oracle_keys_subset_of_queries():
    qs = set(em.queries())
    os_ = set(em.oracle_sql())
    missing = os_ - qs
    assert not missing, f"oracles without queries: {missing}"
    # non-SQL-expressible ops are allowed to lack oracles — list them so the
    # set is a conscious decision, not an accident
    no_oracle = qs - os_
    # kg_pipeline_mini (the full DAG) is the only oracle-less query; it is
    # pinned by pytest P/R == 1.0 vs the plain-Python oracle. d_simhash and
    # w2_rerank_topk gained SQL oracles in round 3 (md5-derived token hash;
    # the deterministic overlap reranker expressed as SQL).
    assert no_oracle == {
        "kg_pipeline_mini",
    }, f"unexpected oracle-less queries: {no_oracle}"


def test_entry_returns_rows(spark):
    df = em.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["doc_id", "lang", "source", "score"]


def test_fast_queries_nonempty(spark, sf_dir):
    for name in ["q1_pricing_summary", "t_lang_id", "d_exact", "u5_bm25"]:
        assert em.queries()[name](spark, sf_dir).count() > 0, name
