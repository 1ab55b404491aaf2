"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``jly_flink_spark`` package; this module
only adapts its query registry to the driver contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's CDC
    delete-archival pipeline (SURVEY.md §2.1 T1–T7) end to end."""
    from jly_flink_spark.plans import REGISTRY

    return REGISTRY["cdc_delete_archive"].spark_fn(
        spark, "/root/testdata/sf0.001"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from jly_flink_spark.plans import queries_map

    return queries_map()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query (omitted for ops that are
    not SQL-expressible → driver records a rows-only check)."""
    from jly_flink_spark.plans import oracle_sql_map

    return oracle_sql_map()
