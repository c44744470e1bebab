"""Corpus profiler: deterministic repeat, sane estimates vs exact counts."""

from __future__ import annotations

import importlib.util
import os


def _load():
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts",
        "profile_corpus.py",
    )
    spec = importlib.util.spec_from_file_location("profile_corpus", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestProfileCorpus:
    def test_profile_deterministic_and_sane(self, spark, sf_dir):
        mod = _load()
        df = spark.read.parquet(f"{sf_dir}/documents.parquet")
        p1 = mod.build_profile(df, "doc_id", "text", "lang", "n_chars")
        p2 = mod.build_profile(df, "doc_id", "text", "lang", "n_chars")
        assert p1 == p2  # every sketch is deterministic, so the profile is
        assert p1["n_rows"] == df.count()
        exact = {
            r["lang"]: r["n"]
            for r in df.groupBy("lang").count().withColumnRenamed("count", "n").collect()
        }
        assert p1["group_mixture"] == exact
        # KMV estimates within ~1/sqrt(32) of exact per-group id counts
        for g, est in p1["distinct_ids_per_group"].items():
            assert abs(est - exact[g]) / exact[g] < 0.5, (g, est, exact[g])
        # heavy hitters ordered by estimate, head is the top language
        hh = p1["heavy_hitters"]
        assert hh[0]["value"] == max(exact, key=exact.get)
        assert all(
            hh[i]["est_count"] >= hh[i + 1]["est_count"]
            for i in range(len(hh) - 1)
        )
        # median within one 64-bin width of the exact median
        import numpy as np

        vals = [r["n_chars"] for r in df.select("n_chars").collect()]
        width = (max(vals) - min(vals)) / 64
        med = [q["est"] for q in p1["value_quantiles"] if q["q"] == 0.5][0]
        assert abs(med - float(np.quantile(vals, 0.5))) <= width + 1e-9

    def test_missing_optional_columns_skip_sections(self, spark):
        mod = _load()
        df = spark.createDataFrame([(1,), (2,)], "doc_id long")
        p = mod.build_profile(df, "doc_id", None, None, None)
        assert p == {"n_rows": 2}
