import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Isolate the stateful entry queries' scratch dirs (incr_apply,
# kg_vector_search) from any concurrently-running manual check_oracles.py:
# both would otherwise rmtree/rebuild the same fixed /tmp paths mid-run.
# Must be set BEFORE __spark_entry__ is imported (module-level constants).
os.environ.setdefault(
    "CHUNKSILO_SCRATCH_ROOT", f"/tmp/chunksilo_pytest_{os.getpid()}"
)

from chunksilo_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("chunksilo_spark_tests", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session", autouse=True)
def _cleanup_scratch_root():
    yield
    import shutil

    root = os.environ.get("CHUNKSILO_SCRATCH_ROOT", "")
    if root.startswith("/tmp/chunksilo_pytest_"):
        shutil.rmtree(root, ignore_errors=True)
