"""Full local oracle gate inside pytest (VERDICT r3 item #7).

The driver's CORRECTNESS artifact caps at 50 queries in queries() insertion
order; round 3 proved the insertion-order tail can silently fall out of that
window.  This test runs the SAME DuckDB-vs-Spark check over the ENTIRE
query surface at sf0.001 every pytest run, so no registered query can lose
correctness coverage again regardless of dict ordering.
"""

import os
import sys

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"
    ),
)

from check_oracles import run_gate  # noqa: E402


def test_full_oracle_gate_all_queries(spark, sf_dir):
    failures = run_gate(spark, sf_dir)
    assert not failures, f"oracle gate failures: {failures}"
