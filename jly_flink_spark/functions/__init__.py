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


# md5-prefix uniform hash in [0, 1): first 8 hex chars as a fraction
# of 16^8. Per-row, engine-independent, stable under repartitioning —
# the deterministic replacement for rand() in splits/samples. SQL
# mirror: hash_frac_sql.
HASH_FRAC_DENOM = 4_294_967_296  # 16^8


def hash_frac(key_col) -> Column:
    return (
        F.conv(F.substring(F.md5(key_col.cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        .cast("double")
        / F.lit(float(HASH_FRAC_DENOM))
    )


def hash_frac_sql(key: str) -> str:
    return (
        "CAST(CAST('0x' || substring(md5(CAST("
        + key
        + " AS VARCHAR)), 1, 8) AS BIGINT) AS DOUBLE) / "
        + str(HASH_FRAC_DENOM)
    )
