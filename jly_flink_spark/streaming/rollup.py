"""Incrementally-maintained rollup (continuous aggregate): a
streaming hourly aggregate of the event stream upserted into a
parquet store, partition-by-partition.

The batch query `events_multigrain_rollup` recomputes the rollup from
scratch; this is its streaming refresh: Structured Streaming keeps
the running per-(window, key) aggregate in state, update-mode emits
exactly the groups each micro-batch touched with their FULL
recomputed values, and `foreachBatch` overwrites exactly those
(window, key) partitions of the store — dynamic partition overwrite,
so untouched history is never rewritten.

Idempotency: replaying an epoch rewrites the same partitions with the
same values (the state store, not the batch, is the source of truth
for the aggregate), so the store converges under at-least-once
delivery. This is the materialized-view maintenance pattern the
reference's OLAP targets (AnalyticDB/StarRocks) do server-side;
here it is explicit and file-backed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import dsum


def hourly_rollup_plan(sdf: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """The streaming aggregate: count + order-independent quantized
    sum per (hour window, event_type). The watermark IS the lateness
    SLA: windows older than max(event time) - watermark are finalized
    and their state evicted; rows arriving later than that are
    dropped by the aggregation (and with the partition-overwrite
    upsert, an evicted window's re-created partial state would
    CLOBBER the finalized partition — so size the watermark to the
    real lateness bound, never below it)."""
    return (
        sdf.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            dsum(F.col("value"), "sum_value"),
        )
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd-HH").alias(
                "hour_key"
            ),
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def upsert_writer(store_path: str):
    """foreachBatch upsert: each updated (hour, event_type) group
    replaces its own partition directory. Partitioning on BOTH the
    window and the group key is what makes per-group overwrite safe —
    an epoch that touches only some event_types of an hour must not
    clobber the others."""

    def write(batch_df: DataFrame, epoch_id: int) -> None:
        (
            batch_df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("hour_key", "event_type")
            .parquet(store_path)
        )

    return write


def run_hourly_rollup_once(
    spark: SparkSession,
    src_path: str,
    src_schema,
    store_path: str,
    checkpoint: str,
    watermark: str = "1 hour",
) -> None:
    """Drain the file-source backlog into the rollup store and stop
    (the batch-triggered form of the always-on continuous aggregate)."""
    sdf = spark.readStream.schema(src_schema).parquet(src_path)
    q = (
        hourly_rollup_plan(sdf, watermark)
        .writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(upsert_writer(store_path))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


# ---------------------------------------------------------------------------
# Changelog delta tiles: the streaming half of the IVM story.
# `plans/cdc_queries.py::cdc_ivm_view_evolution` is the batch audit —
# one changelog pass folding i/u/d ops into per-(event_type, day)
# delta tiles, then a replay window. This maintains the SAME tiles
# continuously; tests/test_streaming.py::TestIvmBatchStreamParity
# drives both halves from one changelog (split/late/replayed
# delivery) and asserts the streaming store converges to the batch
# tiles and view values exactly.
# ---------------------------------------------------------------------------


def ivm_tile_plan(sdf: DataFrame, watermark: str = "90 days") -> DataFrame:
    """Per-(day window, event_type) changelog delta tile: op counts
    and the net value delta (inserts +after, deletes −before,
    updates after−before) — byte-identical arithmetic to the batch
    query's tile stage (exact bigint cents, so order of arrival
    cannot change any value). Update-mode emits each touched tile's
    FULL recomputed value from state, which is what makes the
    partition upsert converge under split and late delivery: a
    tile's partition always holds the state-store truth, never a
    partial increment."""
    return (
        sdf.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day"), "event_type")
        .agg(
            F.sum((F.col("op") == "i").cast("int"))
            .cast("bigint")
            .alias("n_i"),
            F.sum((F.col("op") == "u").cast("int"))
            .cast("bigint")
            .alias("n_u"),
            F.sum((F.col("op") == "d").cast("int"))
            .cast("bigint")
            .alias("n_d"),
            F.sum(
                F.coalesce(F.col("after_cents"), F.lit(0))
                - F.coalesce(F.col("before_cents"), F.lit(0))
            )
            .cast("bigint")
            .alias("delta_cents"),
        )
        .select(
            (F.unix_timestamp(F.col("window.start")) / 86400)
            .cast("bigint")
            .alias("day"),
            "event_type",
            "n_i",
            "n_u",
            "n_d",
            "delta_cents",
        )
    )


def ivm_upsert_writer(store_path: str):
    """foreachBatch upsert for the tile store, partitioned by
    (day, event_type) — same dynamic-partition-overwrite contract as
    `upsert_writer`: an epoch replaces exactly the tiles it touched
    with state-store truth, so sink-level replays (at-least-once)
    are idempotent."""

    def write(batch_df: DataFrame, epoch_id: int) -> None:
        (
            batch_df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("day", "event_type")
            .parquet(store_path)
        )

    return write


def run_ivm_tiles_once(
    spark: SparkSession,
    src_path: str,
    src_schema,
    store_path: str,
    checkpoint: str,
    watermark: str = "90 days",
) -> None:
    """Drain the changelog backlog into the tile store and stop."""
    sdf = spark.readStream.schema(src_schema).parquet(src_path)
    q = (
        ivm_tile_plan(sdf, watermark)
        .writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(ivm_upsert_writer(store_path))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
