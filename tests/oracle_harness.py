"""Local stand-in for the driver's DuckDB correctness gate.

Runs a registered query on Spark and its oracle SQL on DuckDB over
the same parquet tables, then compares row count, column names, and
an order-insensitive value representation. Strict string equality on
the canonicalized cells predicts the driver's value-hash check.
"""

from __future__ import annotations

import datetime as _dt
import math
import os
from dataclasses import dataclass, field

import duckdb

from jly_flink_spark.io import TABLES


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


def _canon(v) -> str:
    """Canonicalize a cell for cross-system comparison."""
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)  # full precision — mismatch here would break a hash
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


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
    srows = sdf.collect()
    scols = sorted(sdf.columns)
    s_set = sorted(
        tuple(_canon(r[c]) for c in scols) for r in srows
    )

    problems: list[str] = []
    if spec.oracle is None:
        ok = True  # rows-only check
        return CompareResult(name, ok, len(srows), -1, ["no oracle (rows-only)"])

    con = duckdb_connect(sf_dir)
    try:
        cur = con.execute(spec.oracle)
        ocols_raw = [d[0] for d in cur.description]
        orows = cur.fetchall()
    finally:
        con.close()
    ocols = sorted(ocols_raw)
    idx = [ocols_raw.index(c) for c in ocols]
    o_set = sorted(tuple(_canon(r[i]) for i in idx) for r in orows)

    if scols != ocols:
        problems.append(f"schema mismatch: spark={scols} oracle={ocols}")
    if len(srows) != len(orows):
        problems.append("row count mismatch")
    if scols == ocols and s_set != o_set:
        n_shown = 0
        for a, b in zip(s_set, o_set):
            if a != b:
                problems.append(f"value diff:\n      spark : {a}\n      oracle: {b}")
                n_shown += 1
                if n_shown >= max_diff_report:
                    break
        if not problems:
            problems.append("value multiset mismatch (length differs)")
    return CompareResult(name, not problems, len(srows), len(orows), problems)


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
