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
