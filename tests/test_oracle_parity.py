"""Run every registered query against its DuckDB oracle at sf0.001 —
the local mirror of the driver's correctness gate. Strict value
equality on canonicalized cells."""

import pytest

from jly_flink_spark.plans import REGISTRY

from .oracle_harness import compare_query

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, name):
    res = compare_query(spark, name, SF)
    assert res.ok, str(res)
