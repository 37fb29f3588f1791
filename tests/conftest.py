from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from project_2_semantic_similarity_spark.session import get_spark  # noqa: E402

SF_SMOKE = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus=8)
    yield s
    # release every persisted replacement slot so cross-test memory
    # accounting (test_no_leaked_cache_entries) sees a clean teardown
    from project_2_semantic_similarity_spark.operators.cache import (
        clear_slots)

    clear_slots()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
