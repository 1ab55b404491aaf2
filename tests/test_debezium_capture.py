"""Executable contract for the live-CDC boundary (SURVEY §2.1 S1).

The reference attaches directly to the MySQL binlog
(StartJob.java:63-74, MySqlSource.builder() + Json deserialization
with decimal.handling.mode=string); the decided Spark architecture is
MySQL → Debezium → Kafka → spark.readStream. The offline container
has no Kafka, so this suite drives the SAME adapter code
(`sources.kafka_cdc.envelopes_from_kafka`) with a RECORDED capture —
`tests/fixtures/debezium_mysql_capture.jsonl`, full-fidelity Debezium
MySQL envelopes (schema-wrapped and bare payloads, snapshot reads,
insert/update/delete, string-mode decimals, gtid/transaction blocks,
delete tombstones) laid out as Kafka records (topic/key/value) — both
as a batch frame and through a real Structured Streaming query.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from jly_flink_spark.config import demo_task_config
from jly_flink_spark.pipeline import build_pipeline
from jly_flink_spark.sources.kafka_cdc import envelopes_from_kafka

CAPTURE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "fixtures",
    "debezium_mysql_capture.jsonl",
)

KAFKA_SCHEMA = "topic string, key string, value string"

# What the reference pipeline must archive from this capture: ONLY
# deletes, only subscribed tables (t_orders/t_items — t_audit is not
# in the task config, so its topic is never subscribed), id from the
# pre-image, fb_no by instance.
EXPECTED = {
    ("101", "demo_t_orders", "FB0"),
    ("7", "demo_t_items", "FB1"),
    ("55", "demo_t_orders", "FB2"),
}


def _records(subscribed_only: bool = False):
    with open(CAPTURE, encoding="utf-8") as f:
        recs = [json.loads(line) for line in f if line.strip()]
    if subscribed_only:
        # Table scoping is SOURCE-side, exactly like the reference's
        # MySqlSource.tableList (StartJob.java:66): the production
        # wiring subscribes only to `<prefix>.<db>.<table>` topics of
        # configured tables (read_mysql_cdc_stream's subscribePattern)
        # — unconfigured tables never enter the stream.
        tables = set(demo_task_config().tables)
        recs = [r for r in recs if r["topic"].split(".")[-1] in tables]
    return recs


def _batch_frame(spark, subscribed_only: bool = False):
    recs = _records(subscribed_only)
    return spark.createDataFrame(
        [(r["topic"], r["key"], r["value"]) for r in recs], KAFKA_SCHEMA
    )


def test_capture_fixture_is_realistic():
    """The capture must carry the envelope features the adapter claims
    to handle — guards against the fixture decaying into toy data."""
    recs = _records()
    values = [r["value"] for r in recs]
    assert any(v is None for v in values), "needs a delete tombstone"
    payloads = []
    for v in values:
        if v is None:
            continue
        doc = json.loads(v)
        payloads.append(doc["payload"] if "payload" in doc else doc)
    assert any("schema" in json.loads(v) for v in values if v), (
        "needs schemas.enable=true envelopes"
    )
    assert any("schema" not in json.loads(v) for v in values if v), (
        "needs a bare (schemas.enable=false) payload"
    )
    ops = {p["op"] for p in payloads}
    assert {"r", "c", "u", "d"} <= ops
    # decimal.handling.mode=string: numeric columns arrive as strings
    deletes = [p for p in payloads if p["op"] == "d"]
    assert any(
        isinstance(p["before"].get("amount"), str)
        or isinstance(p["before"].get("unit_price"), str)
        for p in deletes
    )
    srcs = [p["source"] for p in payloads]
    assert {s["connector"] for s in srcs} == {"mysql"}
    assert any(s.get("gtid") for s in srcs)


def test_capture_batch_through_pipeline(spark):
    env = envelopes_from_kafka(_batch_frame(spark, subscribed_only=True))
    target = build_pipeline(spark, env, demo_task_config())
    got = {
        (r["id"], r["db_tb_name"], r["fb_no"]) for r in target.collect()
    }
    assert got == EXPECTED


def test_unsubscribed_table_is_scoped_at_source_not_pipeline(spark):
    """The pipeline itself is table-agnostic (the reference never sees
    unconfigured tables — MySqlSource.tableList scopes them at the
    source): feeding the FULL capture surfaces the t_audit delete too,
    which is why production wiring must subscribe per-table topics."""
    env = envelopes_from_kafka(_batch_frame(spark))
    target = build_pipeline(spark, env, demo_task_config())
    got = {
        (r["id"], r["db_tb_name"], r["fb_no"]) for r in target.collect()
    }
    assert got == EXPECTED | {("900", "demo_t_audit", "FB1")}


def test_capture_decimal_string_survives(spark):
    """decimal.handling.mode=string must survive verbatim through the
    raw-JSON pre-image extraction (S2) — '0.0001' would be corrupted
    by any float round-trip."""
    env = envelopes_from_kafka(_batch_frame(spark))
    deletes = env.filter(F.col("op") == "d").collect()
    befores = [r["before"] for r in deletes]
    assert any('"unit_price":"0.0001"' in b for b in befores)
    assert any('"amount":"19.99"' in b for b in befores)


def test_capture_streaming_end_to_end(spark, tmp_path):
    """Replay the capture through a real Structured Streaming query:
    file source (one Kafka-shaped record per line) → envelope adapter
    → reference pipeline → memory sink."""
    src_dir = tmp_path / "capture"
    src_dir.mkdir()
    # split across two files → two micro-batches with
    # maxFilesPerTrigger=1, proving the adapter is incremental
    recs = _records(subscribed_only=True)
    half = len(recs) // 2
    for i, chunk in enumerate((recs[:half], recs[half:])):
        with open(src_dir / f"part_{i}.jsonl", "w", encoding="utf-8") as f:
            for r in chunk:
                f.write(json.dumps(r) + "\n")

    stream = (
        spark.readStream.schema(KAFKA_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src_dir))
    )
    target = build_pipeline(
        spark, envelopes_from_kafka(stream), demo_task_config()
    )
    q = (
        target.writeStream.format("memory")
        .queryName("debezium_capture")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["id"], r["db_tb_name"], r["fb_no"])
        for r in spark.sql("SELECT * FROM debezium_capture").collect()
    }
    assert got == EXPECTED
