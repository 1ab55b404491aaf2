"""Data-layout maintenance: compaction and sorted layouts.

At 100 TB the dominant cost of a table is how it is laid out, not how
it is computed: a partition with 50k tiny files pays 50k open/seek
round-trips per scan, and an unsorted layout turns every selective
scan into a full read because min/max footer stats prune nothing.
These helpers are the two standard maintenance passes:

- `compact_parquet`: rewrite a directory into ~target-row files
  (repartition to the computed file count; `maxRecordsPerFile` caps
  stragglers). The reference has no file sinks at all (SURVEY.md
  §2.2), so this is additive scale infrastructure.
- `write_sorted_layout`: hive-partition by low-cardinality keys and
  sort rows *within* each file (`sortWithinPartitions`) so parquet
  row-group min/max stats make selective scans skip — the poor
  man's Z-order for single-column locality.

Both are pure Spark writers — no custom file management; the
atomicity story is the standard write-to-new-dir-then-swap.
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def compact_parquet(
    df: DataFrame,
    out_path: str,
    target_rows_per_file: int = 1_000_000,
    precomputed_count: int | None = None,
) -> int:
    """Rewrite `df` as ~equal parquet files of at most
    `target_rows_per_file` rows. Returns the file count written.

    The count pass is one cheap aggregate (parquet row-group metadata
    makes count(*) a footer read); the rewrite is one round-robin
    repartition — the minimum possible data movement for an exact
    file-count target. `maxRecordsPerFile` is belt-and-braces against
    a skewed round-robin.
    """
    n = precomputed_count if precomputed_count is not None else df.count()
    n_files = max(1, math.ceil(n / target_rows_per_file))
    (
        df.repartition(n_files)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", target_rows_per_file)
        .parquet(out_path)
    )
    return n_files


def compact_sorted(
    df: DataFrame,
    out_path: str,
    sort_cols: list[str],
    target_rows_per_file: int = 1_000_000,
    precomputed_count: int | None = None,
) -> int:
    """`compact_parquet` for layouts whose scans prune on footer
    stats: rewrite into ~equal files that are RANGE-SHARDED and
    within-file SORTED on `sort_cols`, so after compaction every file
    carries tight, disjoint min/max stats on the probe keys — the
    probe join skips whole files, not just row groups. Returns the
    file count written. (Round-robin compaction would scramble the
    keys and turn every probe back into a full scan.)"""
    n = precomputed_count if precomputed_count is not None else df.count()
    n_files = max(1, math.ceil(n / target_rows_per_file))
    cols = [F.col(c) for c in sort_cols]
    (
        df.repartitionByRange(n_files, *cols)
        .sortWithinPartitions(*cols)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", target_rows_per_file)
        .parquet(out_path)
    )
    return n_files


def swap_layout(path: str, new_path: str) -> None:
    """Promote a freshly rewritten layout: replace the live directory
    at `path` with `new_path` (two local-FS renames, then drop the
    old files). NOT atomic — the contract, stated plainly:

    - There is a microsecond-scale window between the two renames in
      which `path` does not exist; a reader resolving the path in
      that instant errors (a checkpointed stream re-runs the failed
      micro-batch on restart; running compaction inside the same
      serving loop, between epochs, avoids the window entirely). A
      crash inside the window strands the previous layout at
      `<path>.old` — recovery is renaming it back.
    - WRITERS MUST BE QUIESCED: a file appended into `path` after the
      compaction job's read snapshot is deleted by the swap with no
      error. Serialize appends and compaction on one maintenance
      timeline (e.g. both inside the same foreachBatch loop, between
      epochs — the pattern the compaction tests pin); never run them
      concurrently from separate jobs.

    On an object store this whole step is a table-format commit
    (Iceberg/Delta snapshot swap), which removes both caveats — the
    write-compacted-then-swap protocol is the same."""
    old = path.rstrip("/") + ".old"
    if os.path.exists(old):
        shutil.rmtree(old)
    os.rename(path, old)
    os.rename(new_path, path)
    shutil.rmtree(old)


def write_sorted_layout(
    df: DataFrame,
    out_path: str,
    partition_cols: list[str],
    sort_cols: list[str],
    files_per_partition: int = 1,
) -> None:
    """Hive-partitioned, within-file-sorted layout.

    repartition(partition_cols) routes each hive partition's rows to
    `files_per_partition` tasks (avoiding the one-file-per-input-task
    explosion `partitionBy` causes on a wide shuffle), then
    `sortWithinPartitions` orders rows inside each task so every
    written file has tight, non-overlapping-ish min/max footer stats
    on the sort keys. Readers filtering on sort_cols then skip whole
    row groups (predicate pushdown prunes on the stats).
    """
    keys = [F.col(c) for c in partition_cols]
    if files_per_partition > 1:
        # salt so one hive partition can fill several files in parallel
        # pmod, not %: F.hash is int32 and negative ~half the time;
        # % keeps the sign, which would double the salt domain
        salt = F.pmod(
            F.hash(*[F.col(c) for c in sort_cols]), files_per_partition
        )
        keys = keys + [salt]
    # The file writer requires rows ordered by the partition columns;
    # sorting (partition_cols, sort_cols) satisfies that requirement so
    # Spark skips its own (unstable) writer sort, which would otherwise
    # scramble the within-file order we just established.
    (
        df.repartition(*keys)
        .sortWithinPartitions(*partition_cols, *sort_cols)
        .write.mode("overwrite")
        .partitionBy(*partition_cols)
        .parquet(out_path)
    )


ZORDER_BITS = 22  # bits per dimension (covers ~48 days of seconds);
# 2 dims fit a 44-bit Morton code, positive int64 on both engines
# (DuckDB << overflows at 63)


def zorder_sql(x: str, y: str, bits: int = ZORDER_BITS) -> str:
    """Morton (Z-order) interleave of two NON-NEGATIVE bigint SQL
    expressions' low `bits` bits, as a dialect-shared fragment —
    `>> & <<` behave identically on Spark and DuckDB for in-range
    shifts, so the SAME generated text runs on both engines (the
    cross-engine trick the CDC whitespace class uses). Callers
    range-normalize the inputs first (offset timestamps, clamp
    negatives); interleaving low bits of un-normalized values
    destroys locality but never correctness."""
    terms = []
    for i in range(bits):
        terms.append(f"(((({x}) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((({y}) >> {i}) & 1) << {2 * i + 1})")
    return "(" + "\n + ".join(terms) + ")"


def write_zorder_layout(
    df: DataFrame,
    zval_col: str,
    out_path: str,
    n_files: int,
    drop_cols: list[str] | None = None,
) -> None:
    """The multi-dimension OPTIMIZE pass: range-partition on the
    precomputed Morton code and sort within each file, so parquet
    min/max footer stats are tight in EVERY interleaved dimension at
    once — a selective scan on either column prunes files/row-groups,
    where a single-column sort (`write_sorted_layout`) prunes only
    its own. One range shuffle, standard writer, no custom file
    management."""
    routed = df.repartitionByRange(
        n_files, F.col(zval_col)
    ).sortWithinPartitions(zval_col)
    if drop_cols:
        routed = routed.drop(*drop_cols)
    routed.write.mode("overwrite").parquet(out_path)


def zorder_scaled_sql(
    x: str, xmax: str, y: str, ymax: str, bits: int = ZORDER_BITS
) -> str:
    """Morton code with per-dimension RANGE NORMALIZATION: each input
    is scaled onto the full 2^bits grid from its [0, max] range
    before interleaving. Without this a narrow dimension (say an
    11-bit user id) only populates low bit positions and the code
    degenerates to a sort on the wide dimension — the classic
    Z-order imbalance (caught by tests/test_zorder.py). The scale is
    floor(v/(max+1) · 2^bits) — the division runs FIRST in double so
    arbitrarily wide int64 ranges never overflow — rendered as one
    dialect-shared fragment
    like `zorder_sql`. `xmax`/`ymax` are SQL expressions — typically
    columns from a broadcast 1-row bounds aggregate."""
    # Divide FIRST, in double: (x * 2^bits) in int64 overflows for
    # ranges above 2^41 (epoch-microsecond or snowflake-id columns) —
    # x/(max+1) <= 1 in double then scaled up never can, and the
    # dialect-shared text keeps both engines bit-identical.
    # least(..., 2^bits - 1): for ranges >= ~2^54 the double division
    # rounds to exactly 1.0 on near-max values, which would scale to
    # 2^bits (all-zero low bits → the LARGEST values land in the
    # BOTTOM bucket); the clamp pins them to the top cell instead.
    top = (1 << bits) - 1
    xs = (
        f"least(CAST(floor((({x}) / (({xmax}) + 1.0)) * {1 << bits})"
        f" AS BIGINT), {top})"
    )
    ys = (
        f"least(CAST(floor((({y}) / (({ymax}) + 1.0)) * {1 << bits})"
        f" AS BIGINT), {top})"
    )
    return zorder_sql(xs, ys, bits)


def optimize_zorder(
    spark,
    path: str,
    x_col: str,
    y_col: str,
    n_files: int,
    bits: int = ZORDER_BITS,
) -> None:
    """The OPTIMIZE maintenance pass: rewrite the live parquet
    directory at `path` into the range-normalized Z-order layout and
    promote it with the standard write-then-swap (same quiesced-writer
    /serialized-timeline contract as `swap_layout`). Bounds come from
    one scalar aggregate over the existing data; negatives clamp to 0
    (the normalization domain is [0, max]). The Morton column is
    dropped after routing — the layout IS the index, readers prune on
    the plain columns' footer stats."""
    df = spark.read.parquet(path)
    bounds = df.agg(
        F.min(x_col).alias("mnx"),
        F.max(x_col).alias("mxx"),
        F.min(y_col).alias("mny"),
        F.max(y_col).alias("mxy"),
    )
    # MIN-max normalization: subtracting the floor matters — raw
    # epoch seconds carry a huge constant offset, and scaling by the
    # max alone collapses every value into the top sliver of the
    # grid (constant high bits → the interleave degenerates to a
    # sort on the other column; caught by the in-place test).
    zed = df.crossJoin(F.broadcast(bounds)).withColumn(
        "__zval",
        F.expr(
            zorder_scaled_sql(
                f"({x_col} - mnx)",
                "(mxx - mnx)",
                f"({y_col} - mny)",
                "(mxy - mny)",
                bits,
            )
        ),
    )
    tmp = path.rstrip("/") + ".zorder_new"
    write_zorder_layout(
        zed, "__zval", tmp, n_files,
        drop_cols=["__zval", "mnx", "mxx", "mny", "mxy"],
    )
    swap_layout(path, tmp)


HILBERT_BITS = 16  # bits per dimension: d < 2^32, 16 fold steps —
# the Hilbert curve's better locality (no Z-shape jumps) costs a
# stateful per-level rotation, so the code is a 16-step state machine
# rather than zorder_sql's stateless bit-interleave


def _hilbert_step_fields(n: int, s: str) -> dict[str, str]:
    """The xy2d level step (the classic quadrant-rotate recurrence):
    given state fields rendered by @X@/@Y@/@D@ and the level cell
    size expression `s`, produce the next {x, y, d} SQL snippets.
    rx/ry pick the quadrant, d accrues s²·quadrant-order, and for
    ry=0 the frame flips (rx=1) then transposes — the rotation that
    keeps adjacent d-values adjacent in the plane. s² multiplies as
    BIGINT explicitly (an int32 literal cell size would overflow
    Spark's ANSI multiply at s ≥ 2^16)."""
    rx = f"(CASE WHEN (@X@ & {s}) > 0 THEN 1 ELSE 0 END)"
    ry = f"(CASE WHEN (@Y@ & {s}) > 0 THEN 1 ELSE 0 END)"
    quad = (
        f"(CASE WHEN {rx} = 0 AND {ry} = 0 THEN 0"
        f" WHEN {rx} = 0 THEN 1 WHEN {ry} = 0 THEN 3 ELSE 2 END)"
    )
    return {
        "x": (
            f"CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1"
            f" THEN {n - 1} - @Y@ ELSE @Y@ END) ELSE @X@ END"
        ),
        "y": (
            f"CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1"
            f" THEN {n - 1} - @X@ ELSE @X@ END) ELSE @Y@ END"
        ),
        "d": f"@D@ + (CAST({s} AS BIGINT) * {s}) * {quad}",
    }


def hilbert_spark_sql(x: str, y: str, bits: int = HILBERT_BITS) -> str:
    """Hilbert index d of NON-NEGATIVE bigint point expressions
    (low `bits` bits) as ONE Spark SQL `aggregate` fold over the
    descending cell sizes — the whole 16-level state machine is a
    single per-row expression (no join, no shuffle, no UDF).

    NOT dialect-shared (unlike zorder_sql): DuckDB 1.0's vectorized
    lambda evaluation miscomputes this very fold when the lambda body
    repeats the rx/ry subexpressions across struct fields (verified:
    correct under constant inputs and when a string side-channel
    field forces row-wise evaluation, wrong on table columns) — the
    oracle therefore unrolls the SAME step recurrence as a CTE chain
    (`hilbert_duckdb_ctes`), where plain projections evaluate
    correctly."""
    f = _hilbert_step_fields(1 << bits, "s")
    step = {
        k: v.replace("@X@", "acc.x").replace("@Y@", "acc.y")
        .replace("@D@", "acc.d")
        for k, v in f.items()
    }
    svals = ", ".join(str(1 << k) for k in range(bits - 1, -1, -1))
    return (
        f"aggregate(array({svals}),"
        f" named_struct('x', CAST({x} AS BIGINT),"
        f" 'y', CAST({y} AS BIGINT), 'd', CAST(0 AS BIGINT)),"
        " (acc, s) -> named_struct("
        f"'x', CAST({step['x']} AS BIGINT),"
        f" 'y', CAST({step['y']} AS BIGINT),"
        f" 'd', CAST({step['d']} AS BIGINT))"
        ").d"
    )


def hilbert_duckdb_ctes(
    src: str,
    x: str,
    y: str,
    keys: str,
    bits: int = HILBERT_BITS,
    prefix: str = "hil",
) -> tuple[str, str]:
    """The DuckDB mirror of `hilbert_spark_sql` as an unrolled CTE
    chain (one projection per level, generated from the SAME step
    fields — see that function's docstring for why not list_reduce):
    returns (cte_sql_fragment, final_relation_name); the final
    relation has columns `keys` + hd (the Hilbert index). `keys` is a
    comma-joined passthrough column list from `src`."""
    blocks = [
        f"{prefix}0 AS (\n"
        f"  SELECT {keys}, CAST({x} AS BIGINT) AS hx,"
        f" CAST({y} AS BIGINT) AS hy, CAST(0 AS BIGINT) AS hd"
        f"\n  FROM {src}\n)"
    ]
    n = 1 << bits
    for i, k in enumerate(range(bits - 1, -1, -1)):
        f = _hilbert_step_fields(n, str(1 << k))
        step = {
            kk: v.replace("@X@", "hx").replace("@Y@", "hy")
            .replace("@D@", "hd")
            for kk, v in f.items()
        }
        blocks.append(
            f"{prefix}{i + 1} AS (\n"
            f"  SELECT {keys}, CAST({step['x']} AS BIGINT) AS hx,"
            f" CAST({step['y']} AS BIGINT) AS hy,"
            f" CAST({step['d']} AS BIGINT) AS hd"
            f"\n  FROM {prefix}{i}\n)"
        )
    return ",\n".join(blocks), f"{prefix}{bits}"


def hilbert_xy2d_py(x: int, y: int, bits: int = HILBERT_BITS) -> int:
    """Pure-Python reference (tests): the classic xy2d loop."""
    n = 1 << bits
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = n - 1 - x
                y = n - 1 - y
            x, y = y, x
        s //= 2
    return d
