"""Z-order layout (sources/layout.py): the Morton code must deliver
multi-dimensional locality — per-file footer spans tight in BOTH
dimensions — where a single-column sort is tight in one only."""

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from jly_flink_spark.io import load_table
from jly_flink_spark.sources.layout import (
    write_zorder_layout,
    zorder_scaled_sql,
)

from .conftest import SF_SMOKE

N_FILES = 8


def _file_spans(path, cols):
    """Per-parquet-file (max - min) span of each column, from footer
    stats only."""
    spans = {c: [] for c in cols}
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        mins = {c: None for c in cols}
        maxs = {c: None for c in cols}
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            for ci in range(row_group.num_columns):
                col = row_group.column(ci)
                name = col.path_in_schema
                if name in cols and col.statistics is not None:
                    st = col.statistics
                    if mins[name] is None or st.min < mins[name]:
                        mins[name] = st.min
                    if maxs[name] is None or st.max > maxs[name]:
                        maxs[name] = st.max
        for c in cols:
            assert mins[c] is not None, (f, c)
            spans[c].append(maxs[c] - mins[c])
    return spans


def _median(xs):
    xs = sorted(xs)
    return xs[len(xs) // 2]


def test_zorder_layout_tightens_both_dimensions(spark, tmp_path):
    ev = load_table(spark, SF_SMOKE, "events").select(
        F.col("user_id").cast("bigint").alias("x"),
        (F.unix_timestamp("ts").cast("bigint")).alias("t"),
    )
    t0 = ev.agg(F.min("t")).collect()[0][0]
    norm = ev.select("x", (F.col("t") - F.lit(t0)).alias("t"))
    full_x = norm.agg(F.max("x") - F.min("x")).collect()[0][0]
    full_t = norm.agg(F.max("t") - F.min("t")).collect()[0][0]

    # baseline: single-column sort on x — tight x, t spans ~ full
    base = str(tmp_path / "by_x")
    (
        norm.repartitionByRange(N_FILES, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(base)
    )
    # z-order on the range-normalized Morton code of (x, t)
    zdir = str(tmp_path / "zorder")
    x0 = norm.agg(F.min("x")).collect()[0][0]
    zed = norm.withColumn(
        "zval",
        F.expr(
            zorder_scaled_sql(
                f"(x - {x0})", str(full_x), "t", str(full_t)
            )
        ),
    )
    write_zorder_layout(zed, "zval", zdir, N_FILES)

    b = _file_spans(base, ["x", "t"])
    z = _file_spans(zdir, ["x", "t"])
    assert len(z["x"]) >= N_FILES // 2  # the layout actually sharded

    # the single-column layout cannot see time: its per-file t span
    # is essentially the full range
    assert _median(b["t"]) > 0.8 * full_t
    # z-order: BOTH dimensions substantially narrower than full
    # range. 8 files = 3 Morton bits split across 2 dims, so each
    # dim can expect 1-2 bits of pruning: spans around half the
    # range, never the full range a one-column sort leaves on its
    # blind dimension.
    assert _median(z["x"]) <= 0.6 * full_x, (z["x"], full_x)
    assert _median(z["t"]) <= 0.6 * full_t, (z["t"], full_t)
    # and time locality beats the x-sorted baseline by a wide margin
    assert _median(z["t"]) < 0.5 * _median(b["t"])


def test_optimize_zorder_rewrites_in_place(spark, tmp_path):
    """The maintenance pass: an unsorted live directory gains
    multi-dimensional footer locality in place, with identical data
    and no leftover helper columns."""
    from jly_flink_spark.sources.layout import optimize_zorder

    ev = load_table(spark, SF_SMOKE, "events").select(
        F.col("user_id").cast("bigint").alias("x"),
        F.unix_timestamp("ts").cast("bigint").alias("t"),
    )
    live = str(tmp_path / "live")
    ev.repartition(N_FILES).write.parquet(live)  # unsorted layout
    before = sorted(
        (r["x"], r["t"]) for r in spark.read.parquet(live).collect()
    )
    b = _file_spans(live, ["x", "t"])
    full_t = max(max(s for s in b["t"]), 1)

    optimize_zorder(spark, live, "x", "t", N_FILES)

    after_df = spark.read.parquet(live)
    assert set(after_df.columns) == {"x", "t"}
    after = sorted((r["x"], r["t"]) for r in after_df.collect())
    assert after == before  # rewrite, not a transformation
    z = _file_spans(live, ["x", "t"])
    assert _median(z["t"]) <= 0.6 * full_t
    assert not any(
        p.endswith(".old") for p in map(str, tmp_path.iterdir())
    )
