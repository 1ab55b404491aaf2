"""Source/format coverage (SURVEY.md §2.2 'file-format scans' /
'generic sinks'): every format round-trips through write→read with
identical values, and bucketed tables give shuffle-free co-located
joins — the 100 TB join strategy."""

import contextlib
import io
import os

import pytest
from pyspark.sql import functions as F

from jly_flink_spark.io import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def nation(spark):
    return load_table(spark, SF, "nation")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


class TestFormatRoundTrip:
    @pytest.mark.parametrize("fmt", ["parquet", "json", "csv", "orc"])
    def test_round_trip(self, spark, nation, tmp_path, fmt):
        path = str(tmp_path / fmt)
        w = nation.write.format(fmt).mode("overwrite")
        if fmt == "csv":
            w = w.option("header", True)
        w.save(path)
        r = spark.read.format(fmt)
        if fmt == "csv":
            r = r.option("header", True).schema(nation.schema)
        elif fmt == "json":
            r = r.schema(nation.schema)
        assert _rows(r.load(path)) == _rows(nation)

    def test_partitioned_write_prunes(self, spark, tmp_path):
        """partitionBy directory layout + partition pruning: the scan
        of one partition must not list the others (the T7 routing-key
        layout — write.partitionBy(db_tb_name) — at archive scale)."""
        orders = load_table(spark, SF, "orders")
        path = str(tmp_path / "by_priority")
        orders.write.partitionBy("o_orderpriority").mode("overwrite").parquet(path)
        back = spark.read.parquet(path).filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            back.explain("formatted")
        plan = buf.getvalue()
        assert "PartitionFilters" in plan
        expected = orders.filter(F.col("o_orderpriority") == "1-URGENT").count()
        assert back.count() == expected


class TestBucketedJoin:
    def test_bucketed_join_has_no_shuffle(self, spark, tmp_path):
        """Bucketing both join sides on the key makes the sort-merge
        join exchange-free: each bucket pair joins locally. This is
        the co-located join strategy for repeated 100 TB fact-fact
        joins (pay the shuffle once at write time, never at read)."""
        orders = load_table(spark, SF, "orders")
        lineitem = load_table(spark, SF, "lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        (
            orders.write.bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .mode("overwrite")
            .saveAsTable("b_orders")
        )
        (
            lineitem.write.bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .mode("overwrite")
            .saveAsTable("b_lineitem")
        )
        try:
            joined = spark.table("b_lineitem").join(
                spark.table("b_orders").hint("merge"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                joined.explain("formatted")
            plan = buf.getvalue()
            assert "SortMergeJoin" in plan
            assert "Exchange hashpartitioning" not in plan, plan
            # and it computes the right thing
            assert joined.count() == lineitem.join(
                orders, F.col("l_orderkey") == F.col("o_orderkey")
            ).count()
        finally:
            spark.sql("DROP TABLE IF EXISTS b_orders")
            spark.sql("DROP TABLE IF EXISTS b_lineitem")
            import shutil

            shutil.rmtree("spark-warehouse", ignore_errors=True)


class TestLayoutMaintenance:
    def test_compact_parquet_hits_file_target(self, spark, tmp_path):
        """60k lineitem rows at 10k rows/file → exactly 6 files, same
        content."""
        import glob

        from jly_flink_spark.io import load_table
        from jly_flink_spark.sources.layout import compact_parquet

        li = load_table(spark, "/root/testdata/sf0.01", "lineitem")
        n = li.count()
        out = str(tmp_path / "compacted")
        n_files = compact_parquet(
            li, out, target_rows_per_file=10_000, precomputed_count=n
        )
        assert n_files == -(-n // 10_000)
        files = glob.glob(f"{out}/*.parquet")
        assert len(files) == n_files
        back = spark.read.parquet(out)
        assert back.count() == n
        # no file exceeds the cap
        for f in files:
            assert spark.read.parquet(f).count() <= 10_000

    def test_sorted_layout_files_are_sorted_and_partitioned(
        self, spark, tmp_path
    ):
        """Each hive partition dir holds files whose rows are sorted on
        the sort key — the property parquet min/max pruning needs."""
        import glob

        from jly_flink_spark.io import load_table
        from jly_flink_spark.sources.layout import write_sorted_layout

        o = load_table(spark, "/root/testdata/sf0.01", "orders")
        out = str(tmp_path / "sorted_layout")
        write_sorted_layout(
            o, out, partition_cols=["o_orderstatus"], sort_cols=["o_orderdate"]
        )
        part_dirs = glob.glob(f"{out}/o_orderstatus=*")
        assert len(part_dirs) >= 2
        import pyarrow.parquet as pq

        for d in part_dirs:
            for f in glob.glob(f"{d}/*.parquet"):
                col = pq.read_table(f, columns=["o_orderdate"]).column(
                    "o_orderdate"
                )
                vals = col.to_pylist()
                assert vals == sorted(vals)

    def test_sorted_layout_scan_prunes_partitions(self, spark, tmp_path):
        """Reading with a partition-key filter must scan only the
        matching hive partition (PartitionFilters in the plan)."""
        import contextlib
        import io as _io

        from jly_flink_spark.io import load_table
        from jly_flink_spark.sources.layout import write_sorted_layout

        o = load_table(spark, "/root/testdata/sf0.01", "orders")
        out = str(tmp_path / "pruned_layout")
        write_sorted_layout(
            o, out, partition_cols=["o_orderstatus"], sort_cols=["o_orderdate"]
        )
        df = spark.read.parquet(out).filter(F.col("o_orderstatus") == "F")
        buf = _io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        assert "PartitionFilters" in plan
        assert "o_orderstatus" in plan.split("PartitionFilters")[1].split("\n")[0]


class TestSchemaEvolution:
    def test_merge_schema_reads_evolved_table(self, spark, tmp_path):
        """A table whose later files gained a column must read as the
        union schema with nulls backfilled (mergeSchema) — the append
        pattern every long-lived dataset hits."""
        out = str(tmp_path / "evolving")
        spark.createDataFrame(
            [(1, "a")], "id long, name string"
        ).write.parquet(out)
        spark.createDataFrame(
            [(2, "b", 9.5)], "id long, name string, score double"
        ).write.mode("append").parquet(out)
        df = spark.read.option("mergeSchema", "true").parquet(out)
        assert set(df.columns) == {"id", "name", "score"}
        rows = {r["id"]: r["score"] for r in df.collect()}
        assert rows == {1: None, 2: 9.5}


class TestBinaryFileIngestion:
    def test_binary_file_source_feeds_multimodal_pipeline(
        self, spark, tmp_path
    ):
        """Raw media files on disk → binaryFile source → the
        multimodal feature extractor: the real ingestion path for
        image/audio payloads (each file one row, content as binary,
        path/length metadata free)."""
        import os

        from pyspark.sql import functions as F_

        from jly_flink_spark.operators import multimodal

        media_dir = str(tmp_path / "media")
        os.makedirs(media_dir)
        planted = {
            0: multimodal.encode_png(320, 200, 3, b"png-body"),
            1: multimodal.encode_jpeg(64, 48, 1, b"jpeg-body"),
            2: multimodal.encode_wav(2, 16000, b"wav-body"),
            3: multimodal.encode_png(7, 5, 1, b""),
            4: b"not a media file at all",
            5: multimodal.encode_png(320, 200, 3, b"x")[:12],  # truncated
        }
        for i, payload in planted.items():
            with open(f"{media_dir}/doc_{i}.bin", "wb") as f:
                f.write(payload)

        raw = spark.read.format("binaryFile").load(media_dir)
        assert {"path", "length", "content"} <= set(raw.columns)
        media = raw.select(
            F_.regexp_extract(F_.col("path"), r"doc_(\d+)\.bin", 1)
            .cast("long")
            .alias("doc_id"),
            F_.lit("unknown").alias("media_type"),
            F_.col("content").alias("payload"),
        )
        feats = {
            r["doc_id"]: r
            for r in multimodal.extract_media_headers(media).collect()
        }
        assert len(feats) == 6
        assert (feats[0]["width"], feats[0]["height"],
                feats[0]["channels"]) == (320, 200, 3)
        assert (feats[1]["width"], feats[1]["height"],
                feats[1]["channels"]) == (64, 48, 1)
        assert (feats[2]["channels"], feats[2]["sample_rate"]) == (
            2, 16000,
        )
        assert feats[2]["width"] is None
        assert (feats[3]["width"], feats[3]["height"]) == (7, 5)
        for bad in (4, 5):  # garbage and truncated → typed NULL rows
            assert feats[bad]["width"] is None
            assert feats[bad]["sample_rate"] is None
            assert feats[bad]["n_bytes"] == len(planted[bad])


class TestObserveMetrics:
    def test_observe_counts_guard_drops_in_one_pass(self, spark):
        """df.observe() attaches accumulator-style metrics to the
        plan — the streaming-safe way to count guard drops without a
        second scan (the reference logs dropped rows per event,
        StartJob.java:128-151; observe() is the aggregate analog)."""
        from pyspark.sql import Observation
        from pyspark.sql import functions as F_

        from jly_flink_spark.io import load_table

        ev = load_table(spark, "/root/testdata/sf0.001", "events")
        obs = Observation("guards")
        observed = ev.observe(
            obs,
            F_.count(F_.lit(1)).alias("n_total"),
            F_.sum(
                F_.when(F_.col("value") < 10, 1).otherwise(0)
            ).alias("n_low"),
        )
        kept = observed.filter(F_.col("value") >= 10).count()
        m = obs.get
        assert m["n_total"] == ev.count()
        assert m["n_total"] - m["n_low"] == kept


class TestKafkaCdcFrontend:
    """envelopes_from_kafka over Kafka-shaped record frames (the
    production Debezium topology; the kafka scan itself needs the
    connector package, but the transformation is source-agnostic)."""

    def _kafka_frame(self, spark, records):
        # (topic, value) with the kafka source's full column set
        rows = [
            (
                None,
                v.encode("utf-8") if v is not None else None,
                t,
                0,
                i,
            )
            for i, (t, v) in enumerate(records)
        ]
        return spark.createDataFrame(
            rows,
            "key binary, value binary, topic string, partition int, "
            "offset long",
        )

    def test_wrapped_bare_and_tombstone(self, spark):
        from jly_flink_spark.sources.kafka_cdc import envelopes_from_kafka

        bare = (
            '{"op":"d","ts_ms":1754000000000,'
            '"source":{"db":"demo","table":"t_orders"},'
            '"before":{"id":"1","amount":"10.50"}}'
        )
        wrapped = (
            '{"schema":{"type":"struct"},"payload":'
            '{"op":"d","ts_ms":1754000001000,'
            '"source":{"db":"demo","table":"t_items"},'
            '"before":{"id":"2"}}}'
        )
        kdf = self._kafka_frame(
            spark,
            [
                ("src-0.demo.t_orders", bare),
                ("src-1.demo.t_items", wrapped),
                ("src-0.demo.t_orders", None),  # tombstone
            ],
        )
        env = envelopes_from_kafka(kdf)
        rows = {r["instance_name"]: r for r in env.collect()}
        assert set(rows) == {"src-0", "src-1"}  # tombstone dropped
        r0, r1 = rows["src-0"], rows["src-1"]
        assert (r0["op"], r0["ts_ms"], r0["source_table"]) == (
            "d", 1754000000000, "t_orders",
        )
        # decimal-as-string survives verbatim in the raw pre-image
        assert '"amount":"10.50"' in r0["before"]
        assert (r1["op"], r1["source_table"]) == ("d", "t_items")

    def test_feeds_the_pipeline(self, spark):
        from jly_flink_spark.config import demo_task_config
        from jly_flink_spark.pipeline import build_pipeline
        from jly_flink_spark.sources.kafka_cdc import envelopes_from_kafka

        records = [
            (
                "src-0.demo.t_orders",
                '{"op":"d","ts_ms":1754000000000,'
                '"source":{"db":"demo","table":"t_orders"},'
                '"before":{"id":"9"}}',
            ),
            (
                "src-0.demo.t_orders",
                '{"op":"i","ts_ms":1754000001000,'
                '"source":{"db":"demo","table":"t_orders"},'
                '"after":{"id":"10"}}',
            ),
        ]
        env = envelopes_from_kafka(self._kafka_frame(spark, records))
        target = build_pipeline(spark, env, demo_task_config())
        got = target.collect()
        assert [r["id"] for r in got] == ["9"]
        assert got[0]["db_tb_name"] == "demo_t_orders"
        assert got[0]["fb_no"] == "FB0"
