"""Local stand-in for the driver's DuckDB correctness gate.

Runs a registered query on Spark and its oracle SQL on DuckDB over
the same parquet tables, then compares row count, column names, and
an order-insensitive value representation.

Fidelity note (round-3 fix): the driver compares *pandas* frames —
Spark via ``toPandas()``-equivalent collection and DuckDB via
``fetchdf()`` — so dtype coercions that pandas applies are visible
to the driver's value hash.  Two bug classes the old ``fetchall()``
harness could never see:

1. DuckDB ``SUM(INTEGER)`` returns HUGEINT, which ``fetchdf()``
   downcasts to float64 → ``"190.0" != "190"`` against Spark's
   int64.  Oracles must ``CAST(... AS BIGINT)``.
2. Array/list-typed output columns make the driver's
   ``sort_values`` raise ``unhashable type: 'list'``.  Registered
   queries must serialize arrays (``array_join`` / ``to_json``) on
   BOTH engines.

This harness therefore fetches both sides as pandas, canonicalizes
with numpy/pandas-aware rules, and *flags any array-typed cell as a
failure* even when both sides happen to agree.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import math
import os
from dataclasses import dataclass, field

import duckdb
import numpy as np
import pandas as pd

from jly_flink_spark.io import TABLES


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


_ARRAY_TYPES = (list, tuple, np.ndarray, dict)


def _canon(v) -> str:
    """Canonicalize a pandas/numpy cell for cross-system comparison."""
    if isinstance(v, _ARRAY_TYPES):
        # Driver-crashing type; canonicalized only for diff display.
        if isinstance(v, dict):
            return "{" + ",".join(
                f"{_canon(k)}:{_canon(x)}" for k, x in sorted(v.items())
            ) + "}"
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if v is None:
        return "∅"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "∅"
        return repr(f)  # int64 vs float64 drift must stay visible: 190 != 190.0
    if v is pd.NaT:
        return "∅"
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, pd.Timestamp):
        return v.tz_localize(None).isoformat(sep=" ") if v.tzinfo else v.isoformat(sep=" ")
    if isinstance(v, _dt.datetime):
        return pd.Timestamp(v).tz_localize(None).isoformat(sep=" ") if v.tzinfo else pd.Timestamp(v).isoformat(sep=" ")
    if isinstance(v, _dt.date):
        # DuckDB's fetchdf widens DATE to a midnight timestamp while
        # Spark yields datetime.date; the driver hash-matched raw DATE
        # outputs in r1/r2 (scalar_date_funcs), so its bridge widens
        # both sides. Canonicalize to midnight for the same tolerance.
        return pd.Timestamp(v).isoformat(sep=" ")
    if isinstance(v, np.datetime64):
        return pd.Timestamp(v).isoformat(sep=" ")
    if isinstance(v, _decimal.Decimal):
        return str(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _frame_to_rows(pdf: pd.DataFrame, cols: list[str]) -> tuple[list[tuple], bool]:
    """Sorted canonical row tuples + whether any cell is array-typed."""
    has_array = False
    out = []
    for row in pdf[cols].itertuples(index=False, name=None):
        canon_row = []
        for v in row:
            if isinstance(v, _ARRAY_TYPES):
                has_array = True
            canon_row.append(_canon(v))
        out.append(tuple(canon_row))
    out.sort()
    return out, has_array


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    problems: list[str] = field(default_factory=list)

    def __str__(self) -> str:
        status = "OK " if self.ok else "FAIL"
        msg = f"[{status}] {self.name}: spark={self.spark_rows} oracle={self.oracle_rows}"
        for p in self.problems:
            msg += f"\n    - {p}"
        return msg


def compare_query(spark, name: str, sf_dir: str, max_diff_report: int = 3) -> CompareResult:
    from jly_flink_spark.plans import REGISTRY

    spec = REGISTRY[name]
    sdf = spec.spark_fn(spark, sf_dir)
    spdf = sdf.toPandas()
    scols = sorted(spdf.columns)
    s_set, s_arrays = _frame_to_rows(spdf, scols)

    problems: list[str] = []
    if s_arrays:
        problems.append(
            "spark output has array/map-typed column — driver sort_values "
            "would crash; serialize with array_join/to_json"
        )

    if spec.oracle is None:
        # rows-only check
        return CompareResult(
            name, not problems, len(s_set), -1,
            problems + ["no oracle (rows-only)"],
        )

    con = duckdb_connect(sf_dir)
    try:
        opdf = con.execute(spec.oracle).fetchdf()
    finally:
        con.close()
    ocols = sorted(opdf.columns)
    o_set, o_arrays = _frame_to_rows(opdf, ocols)
    if o_arrays:
        problems.append(
            "oracle output has array/map-typed column — driver sort_values "
            "would crash; serialize with array_join/to_json"
        )

    if scols != ocols:
        problems.append(f"schema mismatch: spark={scols} oracle={ocols}")
    if len(s_set) != len(o_set):
        problems.append("row count mismatch")
    if scols == ocols and s_set != o_set:
        n_shown = 0
        for a, b in zip(s_set, o_set):
            if a != b:
                problems.append(f"value diff:\n      spark : {a}\n      oracle: {b}")
                n_shown += 1
                if n_shown >= max_diff_report:
                    break
        if n_shown == 0:
            problems.append("value multiset mismatch (length differs)")
    return CompareResult(name, not problems, len(s_set), len(o_set), problems)


def compare_all(spark, sf_dir: str, names=None) -> list[CompareResult]:
    from jly_flink_spark.plans import REGISTRY

    results = []
    for name in names or sorted(REGISTRY):
        try:
            results.append(compare_query(spark, name, sf_dir))
        except Exception as e:  # noqa: BLE001 — harness must report, not die
            results.append(
                CompareResult(name, False, -1, -1, [f"exception: {e!r:.500}"])
            )
    return results


if __name__ == "__main__":
    import sys

    from jly_flink_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    spark = get_spark("oracle_harness")
    results = compare_all(spark, sf_dir, names)
    n_fail = sum(not r.ok for r in results)
    for r in results:
        print(r)
    print(f"\n{len(results) - n_fail}/{len(results)} queries match")
    sys.exit(1 if n_fail else 0)
