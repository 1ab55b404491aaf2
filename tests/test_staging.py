"""The fan-out staging helper (`io.stage`) and the cluster-derived
shard fan-out (`ranking.resolve_shards`).

`stage` is the ONE lineage-cut used by every operator with a
compute-once fan-out or an iterative loop. The test matrix proves the
config switch changes the PHYSICAL staging (executor-local blocks vs
a durable checkpoint directory) while leaving values untouched — the
property that lets the local harness run 'local' and a preemptible
100-TB cluster run 'reliable' without touching operator code.
"""

import os

import pytest

from jly_flink_spark.io import (
    STAGING_DIR_CONF,
    STAGING_MODE_CONF,
    stage,
    stage_eager,
)


def _clear_staging_conf(spark):
    spark.conf.unset(STAGING_MODE_CONF)
    spark.conf.unset(STAGING_DIR_CONF)


@pytest.fixture()
def staging_conf(spark):
    yield spark
    _clear_staging_conf(spark)


class TestStage:
    def test_local_mode_truncates_lineage(self, staging_conf):
        spark = staging_conf
        df = spark.range(100).transform(stage)
        # localCheckpoint replaces the logical plan with a scan over
        # executor-resident blocks — no parquet/checkpoint files.
        assert df.count() == 100
        assert "LogicalRDD" in df._jdf.queryExecution().analyzed().toString()

    def test_reliable_mode_writes_to_staging_dir(self, staging_conf, tmp_path):
        spark = staging_conf
        ckdir = str(tmp_path / "stage")
        spark.conf.set(STAGING_MODE_CONF, "reliable")
        spark.conf.set(STAGING_DIR_CONF, ckdir)
        df = stage_eager(spark.range(50))
        assert df.count() == 50
        # The cut is now durable: checkpoint files exist under the
        # configured directory (this is what survives executor loss).
        found = [
            os.path.join(root, f)
            for root, _, files in os.walk(ckdir)
            for f in files
        ]
        assert found, "reliable staging wrote nothing to the staging dir"

    def test_mode_switch_changes_physical_staging_only(
        self, staging_conf, tmp_path
    ):
        spark = staging_conf
        df = spark.range(1000).selectExpr(
            "id", "id % 7 as k", "id * 1.5 as v"
        )
        local_rows = sorted(stage(df).collect())
        spark.conf.set(STAGING_MODE_CONF, "reliable")
        spark.conf.set(STAGING_DIR_CONF, str(tmp_path / "stage2"))
        reliable_rows = sorted(stage(df).collect())
        assert local_rows == reliable_rows

    def test_reliable_mode_without_dir_raises(self, staging_conf):
        spark = staging_conf
        # only when no checkpoint dir was ever set on the context
        if spark.sparkContext.getCheckpointDir() is not None:
            pytest.skip("context already has a checkpoint dir")
        spark.conf.set(STAGING_MODE_CONF, "reliable")
        with pytest.raises(ValueError, match=STAGING_DIR_CONF):
            stage(spark.range(1))

    def test_unknown_mode_raises(self, staging_conf):
        spark = staging_conf
        spark.conf.set(STAGING_MODE_CONF, "bogus")
        with pytest.raises(ValueError, match="bogus"):
            stage(spark.range(1))

    def test_lazy_stage_defers_job(self, staging_conf):
        # eager=False must not launch a job at call time: an
        # iterative loop stages every round but only the last frame
        # is ever executed.
        spark = staging_conf
        tracker = spark.sparkContext.statusTracker()
        before = len(tracker.getJobIdsForGroup(None) or [])
        stage(spark.range(10**6))
        after = len(tracker.getJobIdsForGroup(None) or [])
        assert after == before


class TestResolveShards:
    def test_default_follows_cluster_parallelism(self, spark):
        from jly_flink_spark.operators.ranking import resolve_shards

        df = spark.range(10)
        # resolve_shards floors at 2 so single-core runners still
        # shard; assert the same expression the implementation uses.
        assert resolve_shards(df, None) == max(
            spark.sparkContext.defaultParallelism, 2
        )

    def test_explicit_value_wins(self, spark):
        from jly_flink_spark.operators.ranking import resolve_shards

        assert resolve_shards(spark.range(1), 7) == 7

    def test_derived_shards_produce_exact_ranks(self, spark):
        # end-to-end with the DERIVED fan-out (no explicit n_shards):
        # global ranks must equal the single-window reference.
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from jly_flink_spark.operators.ranking import (
            global_rank_analytics,
        )

        df = spark.range(500).selectExpr("id", "id % 37 as val")
        got = {
            r["id"]: (r["g_row_number"], r["g_rank"], r["g_dense_rank"])
            for r in global_rank_analytics(
                df, "val", tiebreak=("id",)
            ).collect()
        }
        w = Window.orderBy("val", "id")
        wp = Window.orderBy("val")
        want = {
            r["id"]: (r["rn"], r["rk"], r["dr"])
            for r in df.select(
                "id",
                F.row_number().over(w).alias("rn"),
                F.rank().over(wp).alias("rk"),
                F.dense_rank().over(wp).alias("dr"),
            ).collect()
        }
        assert got == want


class TestStagingModeOnRealQueries:
    """End-to-end evidence for the r7-verdict staging task: registry
    queries that stage at fan-out points must produce IDENTICAL rows
    under local and reliable staging — the property that makes the
    config switch safe to flip on a cluster without re-verifying
    every operator."""

    @pytest.mark.parametrize(
        "name",
        [
            # sharded-rank fallback path (ranking.py stage) exercised
            # via the RFM pipeline, and an iterative stage chain
            "customer_rfm_segments",
            "events_markov_stationary",
        ],
    )
    def test_results_identical_across_modes(
        self, staging_conf, tmp_path, name
    ):
        from jly_flink_spark.plans import REGISTRY

        spark = staging_conf
        sf = "/root/testdata/sf0.001"
        local_rows = sorted(
            map(tuple, REGISTRY[name].spark_fn(spark, sf).collect())
        )
        spark.conf.set(STAGING_MODE_CONF, "reliable")
        spark.conf.set(STAGING_DIR_CONF, str(tmp_path / "stage"))
        reliable_rows = sorted(
            map(tuple, REGISTRY[name].spark_fn(spark, sf).collect())
        )
        assert reliable_rows == local_rows and local_rows


class TestCostAwareFanOut:
    """ensure_min_parallelism's min_bytes_per_task gate (round 12):
    the fan-out must SKIP when Catalyst's size estimate says the
    scan can't feed every task the declared bytes, and FIRE when it
    can — asserted on partition counts, because a silently-disabled
    gate measures exactly like a working one on a warm cache (the
    py4j BigInt .toString() bug shipped and was caught only by a
    partition-count check)."""

    def test_small_input_skips_fanout(self, spark):
        from jly_flink_spark.io import (
            ensure_min_parallelism,
            load_table,
        )

        docs = load_table(
            spark, "/root/testdata/sf0.001", "documents"
        ).select("doc_id", "text")
        assert docs.rdd.getNumPartitions() <= 2
        gated = ensure_min_parallelism(
            docs, keys=["doc_id"], min_bytes_per_task=1 << 20
        )
        # sf0.001 documents are a few hundred KB — far below
        # 1 MiB/task × parallelism, so the gate must skip
        assert (
            gated.rdd.getNumPartitions()
            == docs.rdd.getNumPartitions()
        )

    def test_tiny_threshold_fans_out(self, spark):
        from jly_flink_spark.io import (
            ensure_min_parallelism,
            load_table,
        )

        docs = load_table(
            spark, "/root/testdata/sf0.001", "documents"
        ).select("doc_id", "text")
        fanned = ensure_min_parallelism(
            docs, keys=["doc_id"], min_bytes_per_task=1
        )
        assert (
            fanned.rdd.getNumPartitions()
            == spark.sparkContext.defaultParallelism
        )

    def test_ungated_always_fans(self, spark):
        from jly_flink_spark.io import (
            ensure_min_parallelism,
            load_table,
        )

        docs = load_table(
            spark, "/root/testdata/sf0.001", "documents"
        ).select("doc_id", "text")
        fanned = ensure_min_parallelism(docs)
        assert (
            fanned.rdd.getNumPartitions()
            == spark.sparkContext.defaultParallelism
        )
