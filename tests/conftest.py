"""Shared Spark session + testdata fixtures."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_experiment_spark.session import get_session  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
# r13: overridable so the slow oracle mirror can run at a larger
# scale point (the full registry was swept value-exact at sf0.1 this
# round; SPARK_GRAFT_SF_CORRECTNESS=/root/testdata/sf0.1 repeats it
# through the ordinary test surface — budget ~35 min, and use a 16g
# driver heap: the streaming drains at sf0.1 exhaust Spark's 1g
# default, see BENCHNOTES r13).
SF_CORRECTNESS = os.environ.get("SPARK_GRAFT_SF_CORRECTNESS",
                                "/root/testdata/sf0.01")
REFERENCE_RESOURCES = "/root/reference/src/main/resources"


@pytest.fixture(scope="session")
def spark():
    s = get_session(app_name="mapreduce_experiment_spark-tests", cpus=8)
    yield s


@pytest.fixture(scope="session")
def sf_smoke():
    return SF_SMOKE


@pytest.fixture(scope="session")
def sf_correctness():
    return SF_CORRECTNESS
