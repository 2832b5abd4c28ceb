"""The local correctness gate: every registered query with an oracle
must match DuckDB at sf0.001 (fast) — mirroring the driver's sf0.01
check. Queries without an oracle get a rows-run smoke check."""

from __future__ import annotations

import pytest

from mapreduce_experiment_spark.plans.registry import SPECS
from tests.oracle_util import assert_matches, run_oracle

_specs = SPECS()


@pytest.mark.parametrize("name", sorted(_specs))
def test_query_vs_oracle_smoke_sf(spark, sf_smoke, name):
    spec = _specs[name]
    df = spec.fn(spark, sf_smoke)
    if spec.oracle is None:
        assert df.count() >= 0  # rows-only check, like the driver
    else:
        assert_matches(df, run_oracle(spec.oracle, sf_smoke), name)


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(_specs))
def test_query_vs_oracle_correctness_sf(spark, sf_correctness, name):
    """Full-fidelity mirror of the driver's t2 gate (sf0.01)."""
    spec = _specs[name]
    df = spec.fn(spark, sf_correctness)
    if spec.oracle is None:
        assert df.count() >= 0
    else:
        assert_matches(df, run_oracle(spec.oracle, sf_correctness), name)
