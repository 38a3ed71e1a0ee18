from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from metricq_db_hta_spark import get_spark
from metricq_db_hta_spark import oracle as oracle_mod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pytest")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def duck(sf_dir):
    con = oracle_mod.connect(sf_dir)
    yield con
    con.close()


def backdate_tree(path: str) -> None:
    """Age every entry under ``path`` past the replay liveness window —
    crash-state fixtures model a writer that died in the past (shared by
    the durability suites; the liveness guard treats fresh trees as
    live writers)."""
    import time

    from metricq_db_hta_spark.streaming import store_meta

    old = time.time() - store_meta.REPLAY_LIVENESS_WINDOW_S - 60
    for dirpath, _dirs, files in os.walk(path):
        for p in [dirpath] + [os.path.join(dirpath, f) for f in files]:
            os.utime(p, (old, old))


def backdate_removal_intent(store: str) -> None:
    """Stamp every recorded removal intent as ancient — crash-state
    fixtures model a retention/erase pass that died in the past (the
    settle keeps FRESH alive-dir intents: they belong to a live op)."""
    from metricq_db_hta_spark.streaming import store_meta

    m = store_meta._read_intent_map(store)
    if m:
        store_meta._write_json_atomic(
            store_meta.removal_intent_path(store),
            {"batches": {str(k): 0.0 for k in m}},
        )
