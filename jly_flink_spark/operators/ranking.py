"""Distributed global-order analytics: rank / dense_rank /
row_number / ntile over a TOTAL ordering of the whole table, without
funneling it through a single-task `Window.orderBy` (the plan Spark
emits for an unpartitioned window — fine on one machine, a stall at
100 TB).

Same decomposition as the sharded prefix sum in
`plans/training_queries.py::batch_by_token_budget`:

1. `repartitionByRange` on the ordering key: shard id order IS key
   order, and rows with EQUAL keys land in one shard (boundaries are
   key comparisons), so rank/dense_rank ties never straddle shards.
2. Per-shard window (parallel) computes local row_number / rank /
   dense_rank.
3. Per-shard row and distinct-key counts (a tiny frame, one row per
   shard) turn into exclusive prefix offsets; broadcast-joined back,
   `global = local + offset` exactly.
4. ntile(k) is pure arithmetic on the exact global row_number and
   total count (first n%k buckets get one extra row — the standard
   SQL semantics).

Two full-data shuffles (range partition + per-shard window hash)
replace the one single-task global sort; every stage is
bounded-parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sharded_local_ranks(
    df: DataFrame,
    key: str,
    desc: bool = False,
    tiebreak: tuple[str, ...] = (),
    n_shards: int = 32,
) -> DataFrame:
    """Stage 1 of the decomposition (exposed so plan tests can pin
    its shape — the checkpoint in `global_rank_analytics` hides the
    lineage behind an RDD scan): range partition on the key, stamp
    `_shard`, compute per-shard `_lrn`/`_lrk`/`_ldr`."""
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
    n_shards: int = 32,
    ntile: int | None = None,
) -> DataFrame:
    """Append exact global `g_row_number`, `g_rank`, `g_dense_rank`
    (ordered by ``key`` asc/desc; row_number tie-broken by
    ``tiebreak``) and optionally `g_ntile` columns.

    `rank`/`dense_rank` follow ORDER BY key only (SQL peer-group
    semantics); `row_number`/`ntile` follow the full
    (key, *tiebreak) total order.
    """
    local = sharded_local_ranks(df, key, desc, tiebreak, n_shards)
    # _shard comes from spark_partition_id(), which is only stable if
    # the sharded frame is computed ONCE: the stats branch and the
    # final join would otherwise recompute the range partitioning
    # independently (AQE may coalesce differently, sampling may draw
    # different boundaries) and the offsets would misalign. Truncate
    # lineage so both branches read the same materialization. At
    # cluster scale this is persist-to-storage; the operator is a
    # full-table analytic either way.
    local = local.localCheckpoint(eager=False)

    # One row per shard — prefix offsets over ≤ n_shards rows.
    stats = local.groupBy("_shard").agg(
        F.count("*").alias("_n"),
        F.count_distinct(key).alias("_nd"),
    )
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

    out = (
        local.join(F.broadcast(stats), "_shard")
        .withColumn("g_row_number", F.col("_off") + F.col("_lrn"))
        .withColumn("g_rank", F.col("_off") + F.col("_lrk"))
        .withColumn("g_dense_rank", F.col("_doff") + F.col("_ldr"))
    )
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
    return out.drop("_shard", "_lrn", "_lrk", "_ldr", "_off", "_doff", "_total")
