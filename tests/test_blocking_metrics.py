"""ER blocking quality (reduction ratio / pair completeness) vs a full
python re-derivation on the labeled alias corpus."""

from itertools import combinations

import pytest

from chunksilo_spark.functions.minhash import band_keys, minhash_signatures_batch
from chunksilo_spark.functions.triples import normalize_surface
from chunksilo_spark.operators.canon import blocking_metrics
from chunksilo_spark.sources.corpus import build_entity_pool


def _python_metrics():
    pool = build_entity_pool()
    labeled = {}  # norm -> set of entity ids (near-misses may collide)
    for eid, aliases in enumerate(pool):
        for a in aliases:
            labeled.setdefault(normalize_surface(a), set()).add(eid)
    norms = sorted(labeled)
    sigs = minhash_signatures_batch([n.split() for n in norms])
    banded = {}
    for norm, sig in zip(norms, sigs):
        for bk in band_keys(sig):
            banded.setdefault(bk, []).append(norm)
    cands = set()
    for group in banded.values():
        for a, b in combinations(sorted(set(group)), 2):
            cands.add((a, b))
    true = set()
    for eid in range(len(pool)):
        members = sorted(n for n, eids in labeled.items() if eid in eids)
        for a, b in combinations(members, 2):
            true.add((a, b))
    n = len(norms)
    covered = len(true & cands)
    return {
        "n_surfaces": n,
        "n_candidates": len(cands),
        "n_true_pairs": len(true),
        "n_covered": covered,
        "reduction_ratio": round(1.0 - len(cands) / (n * (n - 1) // 2), 6),
        "pair_completeness": round(covered / len(true), 6),
    }


@pytest.fixture(scope="module")
def labeled_surfaces(spark):
    pool = build_entity_pool()
    rows = [
        (eid, normalize_surface(a))
        for eid, aliases in enumerate(pool)
        for a in aliases
    ]
    return spark.createDataFrame(rows, "entity_id long, norm string")


class TestBlockingMetrics:
    def test_matches_python_rederivation(self, spark, labeled_surfaces):
        got = blocking_metrics(
            labeled_surfaces.select("norm"), labeled_surfaces
        ).collect()[0].asDict()
        assert got == _python_metrics()

    def test_fixture_quality_floor(self, spark, labeled_surfaces):
        """The production banding params must actually work on the alias
        distribution the pipeline canonicalizes: near-total comparison
        avoidance with high recall of true alias pairs."""
        row = blocking_metrics(
            labeled_surfaces.select("norm"), labeled_surfaces
        ).collect()[0]
        # measured on this fixture: RR 0.9845 (1.2k of 79k pairs
        # compared), PC 0.99 — floors set just under to catch parameter
        # regressions without pinning the exact banding
        assert row["reduction_ratio"] > 0.97
        assert row["pair_completeness"] >= 0.95
