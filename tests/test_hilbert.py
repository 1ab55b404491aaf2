"""Hilbert index generators (sources/layout.py): both engine
renderings must match the classic xy2d reference point-for-point,
and the curve must hold the adjacency property that distinguishes it
from Z-order (consecutive indexes are always plane-adjacent)."""

import random

import duckdb

from jly_flink_spark.sources.layout import (
    HILBERT_BITS,
    hilbert_duckdb_ctes,
    hilbert_spark_sql,
    hilbert_xy2d_py,
)


def _sample_points(n_pts=80, bits=HILBERT_BITS, seed=7):
    rng = random.Random(seed)
    n = 1 << bits
    pts = [(0, 0), (1, 0), (0, 1), (n - 1, n - 1), (n - 1, 0), (0, n - 1)]
    pts += [(rng.randrange(n), rng.randrange(n)) for _ in range(n_pts)]
    return pts


def test_hilbert_spark_matches_reference(spark):
    pts = _sample_points()
    df = spark.createDataFrame(pts, "x long, y long")
    rows = df.selectExpr(
        "x", "y", hilbert_spark_sql("x", "y") + " AS d"
    ).collect()
    assert rows
    for r in rows:
        assert r["d"] == hilbert_xy2d_py(r["x"], r["y"]), (r["x"], r["y"])


def test_hilbert_duckdb_ctes_match_reference():
    """The oracle-side unrolled CTE chain must agree with the
    reference too — this is the rendering that dodges DuckDB 1.0's
    vectorized-lambda miscomputation (a list_reduce rendering of the
    same recurrence returns WRONG indexes on table columns there;
    see hilbert_spark_sql's docstring)."""
    con = duckdb.connect()
    con.execute("CREATE TABLE p(x BIGINT, y BIGINT)")
    pts = _sample_points()
    con.executemany("INSERT INTO p VALUES (?, ?)", pts)
    ctes, final = hilbert_duckdb_ctes("p", "x", "y", "x, y")
    rows = con.execute(f"WITH {ctes} SELECT x, y, hd FROM {final}").fetchall()
    assert len(rows) == len(pts)
    for x, y, d in rows:
        assert d == hilbert_xy2d_py(x, y), (x, y)


def test_hilbert_bijection_and_adjacency_small_grid():
    """Exhaustive bits=4 grid: xy2d is a bijection onto [0, 256) and
    consecutive indexes are ALWAYS 4-neighbors (|dx|+|dy| = 1) — the
    locality guarantee Z-order lacks (its quadrant seams jump) and
    the reason the Hilbert layout's bucket spans are tighter."""
    bits = 4
    n = 1 << bits
    d2xy = {}
    for x in range(n):
        for y in range(n):
            d = hilbert_xy2d_py(x, y, bits)
            assert d not in d2xy
            d2xy[d] = (x, y)
    assert sorted(d2xy) == list(range(n * n))
    for d in range(n * n - 1):
        (x1, y1), (x2, y2) = d2xy[d], d2xy[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1, (d, d2xy[d], d2xy[d + 1])
