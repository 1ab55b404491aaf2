"""Bucketed-table co-located joins: the storage-level shuffle
elimination the scale docs promise, demonstrated with real plans —
two tables bucketed on the join key must hash-join with ZERO shuffle
exchanges, and results must equal the plain join exactly."""

import contextlib
import io

from pyspark.sql import functions as F

from jly_flink_spark.io import load_table, write_bucketed

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    orders = load_table(spark, SF_DIR, "orders")
    customer = load_table(spark, SF_DIR, "customer")
    write_bucketed(
        orders.select("o_orderkey", "o_custkey", "o_totalprice"),
        str(tmp_path / "b_orders"),
        "b_orders",
        ["o_custkey"],
        n_buckets=8,
    )
    write_bucketed(
        customer.select("c_custkey", "c_name"),
        str(tmp_path / "b_customer"),
        "b_customer",
        ["c_custkey"],
        n_buckets=8,
    )
    try:
        bo, bc = spark.table("b_orders"), spark.table("b_customer")
        # forbid broadcast so the shuffle-free-ness comes from
        # bucketing, not from the dim being tiny at this SF
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = bo.join(
                bc, bo.o_custkey == bc.c_custkey
            ).select("o_orderkey", "c_name", "o_totalprice")
            plan = _plan(joined)
            assert "Exchange hashpartitioning" not in plan, plan
            got = joined.count()
        finally:
            spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold",
                str(64 * 1024 * 1024),
            )
        want = orders.join(
            customer, orders.o_custkey == customer.c_custkey
        ).count()
        assert got == want
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_partitioned_write_prunes_scan(spark, tmp_path):
    """write_partitioned: a filter on the partition column must reach
    the scan as a PartitionFilter (directories pruned before any file
    opens), results must equal the unpartitioned filter, and each
    partition directory must hold ONE data file (no tasks×values
    small-file explosion)."""
    import glob
    import os

    from jly_flink_spark.io import write_partitioned

    events = load_table(spark, SF_DIR, "events").withColumn(
        "day", F.to_date("ts")
    )
    path = str(tmp_path / "events_by_day")
    write_partitioned(events, path, ["day"], sort_cols=["user_id", "ts"])

    some_day = events.groupBy("day").count().orderBy(F.desc("count")).first()["day"]
    back = spark.read.parquet(path).filter(F.col("day") == F.lit(some_day))
    plan = _plan(back)
    assert "PartitionFilters: [" in plan and "isnotnull(day" in plan, plan

    want = events.filter(F.col("day") == F.lit(some_day)).count()
    assert back.count() == want and want > 0

    day_dirs = glob.glob(os.path.join(path, "day=*"))
    assert len(day_dirs) > 1  # actually partitioned
    for d in day_dirs:
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert len(files) == 1, (d, files)
