"""The oracle harness must see what the driver sees.

Round 2 shipped five correctness failures that were invisible locally
because the old harness compared DuckDB via ``fetchall()`` (ints stay
ints, lists are handled) while the driver goes through pandas
``fetchdf()`` (HUGEINT → float64, list cells crash ``sort_values``).
These tests plant one instance of each bug class and assert the
harness now FAILS on them — if someone reverts the harness to a
dtype-blind comparison, this file goes red.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from jly_flink_spark.plans.registry import REGISTRY, QuerySpec

from .oracle_harness import compare_query

SF = "/root/testdata/sf0.001"


def _with_temp_spec(spark, spec: QuerySpec):
    REGISTRY[spec.name] = spec
    try:
        return compare_query(spark, spec.name, SF)
    finally:
        del REGISTRY[spec.name]


def test_uncast_integer_sum_is_detected(spark):
    """DuckDB sum(INTEGER) → HUGEINT → fetchdf float64 must mismatch
    Spark's int64 — the round-2 failure class (a)."""

    def spark_fn(spark, sf_dir):
        df = spark.read.parquet(f"{sf_dir}/region.parquet")
        return df.agg(F.sum("r_regionkey").alias("s"))

    res = _with_temp_spec(
        spark,
        QuerySpec(
            name="_harness_probe_uncast_sum",
            spark_fn=spark_fn,
            oracle="SELECT sum(r_regionkey) AS s FROM region",
        ),
    )
    assert not res.ok, "harness must flag uncast integer SUM (HUGEINT→float64)"

    res_cast = _with_temp_spec(
        spark,
        QuerySpec(
            name="_harness_probe_cast_sum",
            spark_fn=spark_fn,
            oracle="SELECT CAST(sum(r_regionkey) AS BIGINT) AS s FROM region",
        ),
    )
    assert res_cast.ok, str(res_cast)


def test_array_output_column_is_detected(spark):
    """List-typed output cells crash the driver's sort_values — the
    round-2 failure class (b). Both engines returning identical arrays
    must STILL fail."""

    def spark_fn(spark, sf_dir):
        df = spark.read.parquet(f"{sf_dir}/region.parquet")
        return df.select(
            "r_regionkey", F.array(F.lit(1), F.lit(2)).alias("arr")
        )

    res = _with_temp_spec(
        spark,
        QuerySpec(
            name="_harness_probe_array_col",
            spark_fn=spark_fn,
            oracle="SELECT r_regionkey, [1, 2] AS arr FROM region",
        ),
    )
    assert not res.ok, "harness must flag array-typed output columns"
    assert any("array" in p for p in res.problems)


def test_raw_date_output_is_tolerated(spark):
    """DuckDB fetchdf widens DATE to a midnight timestamp while Spark
    yields datetime.date. The driver hash-matched raw DATE outputs in
    rounds 1–2 (scalar_date_funcs), so its pandas bridge widens both
    sides — the harness must apply the same tolerance, not fail."""

    def spark_fn(spark, sf_dir):
        df = spark.read.parquet(f"{sf_dir}/orders.parquet")
        return (
            df.groupBy(F.col("o_orderdate").cast("date").alias("d"))
            .count()
            .select("d")
        )

    res = _with_temp_spec(
        spark,
        QuerySpec(
            name="_harness_probe_raw_date",
            spark_fn=spark_fn,
            oracle="SELECT DISTINCT CAST(o_orderdate AS DATE) AS d FROM orders",
        ),
    )
    assert res.ok, str(res)


def test_bench_and_probe_lists_stay_consistent():
    """Every benched query exists in the registry, every bench query
    has a baseline pin (and vice versa — an unpinned headline query
    silently escapes the regression gate), the pinned total equals
    the sum of pins, and the scale-probe list only names registry
    queries."""
    import json
    import os
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from bench import HEADLINE
    from tools.scale_probe import QUERIES as PROBE
    from jly_flink_spark.plans import REGISTRY

    assert set(HEADLINE) <= set(REGISTRY)
    assert set(PROBE) <= set(REGISTRY)
    with open(os.path.join(repo, "BENCH_BASELINE.json")) as f:
        base = json.load(f)
    assert set(base["queries"]) == set(HEADLINE)
    assert abs(sum(base["queries"].values()) - base["value"]) < 0.02
    assert all(v > 0 for v in base["queries"].values())


def test_bench_sentinel_print_contract():
    """The compact stdout line prints a FIXED sentinel query subset
    (r13 verdict task 2): every sentinel is a headline query, the list
    has no duplicates, and the worst-case line (3-digit seconds on
    every sentinel, a full 8-entry regressions map, elision fields)
    fits the driver's 2000-char stdout truncation with margin. If a
    sentinel query were removed from HEADLINE, or the list grew past
    the budget, this fails before the driver sees a broken line."""
    import json
    import os
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from bench import HEADLINE, SENTINEL_PRINT

    assert len(SENTINEL_PRINT) == len(set(SENTINEL_PRINT))
    assert set(SENTINEL_PRINT) <= set(HEADLINE)
    worst = {
        "metric": "headline_queries_total_runtime",
        "value": 9999.999,
        "unit": "sec",
        "sf": 0.1,
        "queries": {n: 999.999 for n in SENTINEL_PRINT},
        "full": "BENCH_local_r99_99.json",
        "queries_elided": len(HEADLINE) - len(SENTINEL_PRINT),
        "elided_sec": 9999.999,
        "regressions": {n: 99.99 for n in SENTINEL_PRINT[:8]},
        "regressions_elided": 99,
    }
    line = json.dumps(worst, separators=(",", ":"))
    assert len(line) < 1900, f"sentinel line too long: {len(line)}"
