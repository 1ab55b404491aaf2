"""Distributed global-order analytics: rank / dense_rank /
row_number / ntile over a TOTAL ordering of the whole table, without
funneling it through a single-task `Window.orderBy` (the plan Spark
emits for an unpartitioned window — fine on one machine, a stall at
100 TB).

Same decomposition as the sharded prefix sum in
`plans/training_queries.py::batch_by_token_budget`:

1. Assign an order-preserving shard id: shard order IS key order,
   and rows with EQUAL keys land in one shard (boundaries are key
   comparisons), so rank/dense_rank ties never straddle shards.
2. Per-shard window (parallel) computes local row_number / rank /
   dense_rank.
3. Per-shard row and distinct-key counts (a tiny frame, one row per
   shard) turn into exclusive prefix offsets; broadcast-joined back,
   `global = local + offset` exactly.
4. ntile(k) is pure arithmetic on the exact global row_number and
   total count (first n%k buckets get one extra row — the standard
   SQL semantics).

Two shard-id flavors:

- **Deterministic boundaries** (numeric keys, the default path):
  approx-quantile boundaries computed as a 1-row aggregate and
  broadcast into the plan; shard = count of boundaries below the
  key — a pure FUNCTION of the key, so the local branch and the
  offsets branch are byte-identical subtrees and ReuseExchange
  shares the ONE shuffle. No checkpoint, no materialization job
  (the r6 `batch_by_token_budget` lesson: `spark_partition_id()`
  forces a lineage-truncating checkpoint whose materialization
  cost is paid on every fresh plan build). Boundary VALUES never
  affect correctness — any monotone assignment that keeps equal
  keys together yields the exact global order once offsets are
  added — so approx_percentile's approximation is harmless.
- **`repartitionByRange` + `spark_partition_id()`** (fallback for
  non-numeric keys, where approx_percentile can't draw
  boundaries): partition-id shards are only stable if computed
  once, so this path stages (io.stage) before branching.

Every stage is bounded-parallel; nothing funnels through a single
task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..io import stage


_NUMERIC_PREFIXES = (
    "tinyint",
    "smallint",
    "int",
    "bigint",
    "float",
    "double",
    "decimal",
)


def _is_numeric(df: DataFrame, key: str) -> bool:
    dt = dict(df.dtypes).get(key, "")
    return dt.startswith(_NUMERIC_PREFIXES)


def resolve_shards(df: DataFrame, n_shards: int | None) -> int:
    """Shard fan-out for the global-order decompositions: the
    caller's explicit value, else the cluster's
    ``defaultParallelism`` (min 2) — the same sizing rule the
    blocked-GEMM kernel uses for its block count. A fixed constant
    here would cap a 1000-core cluster at 32-way prefix sums; deriving
    from the context makes the fan-out follow the deployment, and on
    the local[32] harness resolves to the same 32 as before."""
    if n_shards is not None:
        return n_shards
    return max(df.sparkSession.sparkContext.defaultParallelism, 2)


def boundary_sharded(
    df: DataFrame, key: str, desc: bool = False, n_shards: int | None = None
) -> DataFrame:
    """Stamp `_shard`: an order-preserving shard id that is a pure
    deterministic FUNCTION of the key (numeric keys only).

    Boundaries are the (1/n, 2/n, …) approx-quantiles of the key,
    computed as a one-row aggregate and broadcast; a row's shard is
    the count of boundaries strictly below its key (flipped for
    desc order). Equal keys always share a shard, shard ordinals
    follow key order, and — because no `spark_partition_id()` is
    involved — the frame can be branched without a checkpoint:
    Catalyst sees identical subtrees and reuses the one exchange.
    Boundary skew only unbalances shard sizes (same failure mode as
    the range partitioner), never correctness.
    """
    n_shards = resolve_shards(df, n_shards)
    if n_shards < 2:
        return df.withColumn("_shard", F.lit(0))
    probs = ", ".join(str(i / n_shards) for i in range(1, n_shards))
    bnds = df.agg(
        F.expr(
            f"approx_percentile(`{key}`, array({probs}), 10000)"
        ).alias("_bnds")
    )
    below = F.expr(f"size(filter(_bnds, b -> b < `{key}`))")
    shard = (F.lit(n_shards - 1) - below) if desc else below
    return (
        df.crossJoin(F.broadcast(bnds))
        .withColumn("_shard", shard)
        .drop("_bnds")
    )


def sharded_local_ranks(
    df: DataFrame,
    key: str,
    desc: bool = False,
    tiebreak: tuple[str, ...] = (),
    n_shards: int | None = None,
) -> DataFrame:
    """Stage 1 of the decomposition (exposed so plan tests can pin
    its shape — the checkpoint in `global_rank_analytics` hides the
    lineage behind an RDD scan): range partition on the key, stamp
    `_shard`, compute per-shard `_lrn`/`_lrk`/`_ldr`."""
    n_shards = resolve_shards(df, n_shards)
    sort_key = F.col(key).desc() if desc else F.col(key).asc()
    tb = [F.col(c) for c in tiebreak]
    ranged = df.repartitionByRange(n_shards, sort_key).withColumn(
        "_shard", F.spark_partition_id()
    )
    w_full = Window.partitionBy("_shard").orderBy(sort_key, *tb)
    w_peer = Window.partitionBy("_shard").orderBy(sort_key)
    return (
        ranged.withColumn("_lrn", F.row_number().over(w_full))
        .withColumn("_lrk", F.rank().over(w_peer))
        .withColumn("_ldr", F.dense_rank().over(w_peer))
    )


def global_rank_analytics(
    df: DataFrame,
    key: str,
    desc: bool = False,
    tiebreak: tuple[str, ...] = (),
    n_shards: int | None = None,
    ntile: int | None = None,
    with_total: bool = False,
    row_number_only: bool = False,
) -> DataFrame:
    """Append exact global `g_row_number`, `g_rank`, `g_dense_rank`
    (ordered by ``key`` asc/desc; row_number tie-broken by
    ``tiebreak``) and optionally `g_ntile` columns.

    `rank`/`dense_rank` follow ORDER BY key only (SQL peer-group
    semantics); `row_number`/`ntile` follow the full
    (key, *tiebreak) total order. With ``with_total`` the exact
    global row count is kept as `g_total` (already computed for the
    offsets — callers that need `count(*) OVER ()` get it for free
    instead of adding their own global window).

    ``row_number_only`` drops the `g_rank`/`g_dense_rank` outputs
    and with them the peer-group windows AND the distinct-key pass
    in the offsets branch — on the numeric path the stats branch
    collapses to a plain per-shard `count(*)` over the reused
    exchange, no WindowExec at all. ntile/row_number callers
    (ntile is arithmetic on the exact row number) should use it:
    at dim-sized frames the operator is fixed-overhead-dominated
    and this trims the dominant branch.
    """
    if _is_numeric(df, key):
        # Deterministic-shard path: no checkpoint; the stats branch
        # below is the same subtree as the output branch, so the one
        # _shard exchange is shared (ReuseExchange), and per-shard
        # counts come from the window output itself (row count =
        # max local row_number, distinct keys = max local
        # dense_rank) so no second aggregation shape is introduced.
        sort_key = F.col(key).desc() if desc else F.col(key).asc()
        tb = [F.col(c) for c in tiebreak]
        w_full = Window.partitionBy("_shard").orderBy(sort_key, *tb)
        w_peer = Window.partitionBy("_shard").orderBy(sort_key)
        sharded = boundary_sharded(df, key, desc, n_shards)
        if row_number_only:
            local = sharded.withColumn(
                "_lrn", F.row_number().over(w_full)
            )
            stats = sharded.groupBy("_shard").agg(
                F.count("*").alias("_n"),
                F.lit(0).alias("_nd"),
            )
        else:
            local = (
                sharded.withColumn("_lrn", F.row_number().over(w_full))
                .withColumn("_lrk", F.rank().over(w_peer))
                .withColumn("_ldr", F.dense_rank().over(w_peer))
            )
            stats = local.groupBy("_shard").agg(
                F.max("_lrn").alias("_n"),
                F.max("_ldr").alias("_nd"),
            )
    else:
        local = sharded_local_ranks(df, key, desc, tiebreak, n_shards)
        # _shard comes from spark_partition_id(), which is only
        # stable if the sharded frame is computed ONCE: the stats
        # branch and the final join would otherwise recompute the
        # range partitioning independently (AQE may coalesce
        # differently, sampling may draw different boundaries) and
        # the offsets would misalign. Stage so both branches read
        # the same materialization — io.stage makes the cut durable
        # on a preemptible cluster (spark.jly.staging.mode=reliable);
        # the operator is a full-table analytic either way.
        local = local.transform(stage)
        stats = local.groupBy("_shard").agg(
            F.count("*").alias("_n"),
            F.count_distinct(key).alias("_nd"),
        )

    # One row per shard — prefix offsets over ≤ n_shards rows.
    w_off = Window.orderBy("_shard").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_all = Window.partitionBy(F.lit(1))
    stats = (
        stats.withColumn(
            "_off", F.coalesce(F.sum("_n").over(w_off), F.lit(0))
        )
        .withColumn(
            "_doff", F.coalesce(F.sum("_nd").over(w_off), F.lit(0))
        )
        .withColumn("_total", F.sum("_n").over(w_all))
        .select("_shard", "_off", "_doff", "_total")
    )

    out = local.join(F.broadcast(stats), "_shard").withColumn(
        "g_row_number", F.col("_off") + F.col("_lrn")
    )
    if not row_number_only:
        out = out.withColumn(
            "g_rank", F.col("_off") + F.col("_lrk")
        ).withColumn("g_dense_rank", F.col("_doff") + F.col("_ldr"))
    if ntile is not None:
        rn, n, k = F.col("g_row_number"), F.col("_total"), F.lit(ntile)
        base = F.floor(n / k)
        rem = n % k
        big = rem * (base + 1)  # rows covered by the size-(base+1) buckets
        out = out.withColumn(
            "g_ntile",
            F.when(rn <= big, F.floor((rn - 1) / (base + 1)) + 1)
            .otherwise(rem + F.floor((rn - big - 1) / base) + 1)
            .cast("int"),
        )
    if with_total:
        out = out.withColumn("g_total", F.col("_total"))
    return out.drop("_shard", "_lrn", "_lrk", "_ldr", "_off", "_doff", "_total")


def sharded_prefix_sum(
    df: DataFrame,
    value: str,
    key: str,
    desc: bool = False,
    tiebreak: tuple[str, ...] = (),
    n_shards: int | None = None,
) -> DataFrame:
    """Append `g_cum`: the exact INCLUSIVE running sum of ``value``
    in total (key asc/desc, *tiebreak) order — i.e.
    ``sum(value) OVER (ORDER BY key [DESC], tiebreak ROWS UNBOUNDED
    PRECEDING)`` — without the single-task plan Spark emits for an
    unpartitioned ordered window.

    Same decomposition as `global_rank_analytics`: order-preserving
    shards (shard order = key order; equal keys share a shard so the
    tiebreak resolves ties locally), per-shard running sum in
    parallel, then per-shard value totals → broadcast exclusive
    prefix offsets, `global = local + offset` exactly. Shard totals
    come from `sum(value)` (not `max` of the running sum) so
    negative values are handled. Numeric ordering keys take the
    deterministic boundary-shard path (no checkpoint — the offsets
    branch is the same subtree as the output branch, ReuseExchange
    shares the one shuffle); non-numeric keys fall back to
    `repartitionByRange` + `spark_partition_id()`, which must be
    checkpointed for shard stability.
    """
    sort_key = F.col(key).desc() if desc else F.col(key).asc()
    tb = [F.col(c) for c in tiebreak]
    w = (
        Window.partitionBy("_shard")
        .orderBy(sort_key, *tb)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    if _is_numeric(df, key):
        local = boundary_sharded(df, key, desc, n_shards).withColumn(
            "_lcum", F.sum(value).over(w)
        )
    else:
        ranged = df.repartitionByRange(
            resolve_shards(df, n_shards), sort_key
        ).withColumn("_shard", F.spark_partition_id())
        local = ranged.withColumn("_lcum", F.sum(value).over(w))
        # _shard is spark_partition_id(): stable only if the sharded
        # frame is computed once — truncate lineage so the offsets
        # branch and the final join read the same materialization
        # (see global_rank_analytics for the full rationale).
        local = local.transform(stage)
    off_w = Window.orderBy("_shard").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        local.groupBy("_shard")
        .agg(F.sum(value).alias("_stot"))
        .withColumn(
            "_off", F.coalesce(F.sum("_stot").over(off_w), F.lit(0))
        )
        .select("_shard", "_off")
    )
    return (
        local.join(F.broadcast(offsets), "_shard")
        .withColumn("g_cum", F.col("_lcum") + F.col("_off"))
        .drop("_shard", "_lcum", "_off")
    )
