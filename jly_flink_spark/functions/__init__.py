"""Shared engine functions whose definitions are parity-critical:
they appear in BOTH Spark plans and DuckDB oracle SQL, so every user
must import the single definition — a drifted copy breaks the
value-hash gate silently.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Quantization scale for order-independent double sums. The SQL
# mirror is DSUM_SQL below — change them together or not at all.
DSUM_SCALE = 10_000


def dsum_col(col) -> Column:
    """Order-independent, engine-independent double sum: quantize each
    value with floor(x * 1e4) — a pure IEEE double multiply + floor,
    bit-identical on any engine — then sum exact integers
    (decimal(38,0), associative), then one double division. Immune to
    partitioning/fold order AND to Spark-vs-DuckDB double→decimal
    rounding differences (HALF_UP vs HALF_EVEN)."""
    e = col if not isinstance(col, str) else F.col(col)
    return (
        F.sum(F.floor(e * F.lit(DSUM_SCALE)).cast("decimal(38,0)")).cast(
            "double"
        )
        / DSUM_SCALE
    )


def dsum(col, alias: str) -> Column:
    return dsum_col(col).alias(alias)


def dsum_sql(expr: str) -> str:
    """The ANSI-SQL mirror of dsum_col for oracle strings."""
    return (
        f"CAST(SUM(CAST(FLOOR(({expr}) * {DSUM_SCALE}) AS DECIMAL(38,0)))"
        f" AS DOUBLE) / {DSUM_SCALE}"
    )
