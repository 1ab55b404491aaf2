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
# pre-image, fb_no by instance. 301 is the snapshot→binlog case (read
# in the snapshot phase, deleted in the binlog phase), 700/701 the
# two-table single transaction, 800 the post-ADD-COLUMN delete.
EXPECTED = {
    ("101", "demo_t_orders", "FB0"),
    ("7", "demo_t_items", "FB1"),
    ("55", "demo_t_orders", "FB2"),
    ("301", "demo_t_items", "FB0"),
    ("700", "demo_t_orders", "FB2"),
    ("701", "demo_t_items", "FB2"),
    ("800", "demo_t_items", "FB1"),
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
    # snapshot → binlog phase transition: the snapshot phase markers
    # ("first"/"true" … "last") must precede binlog-phase events
    assert {"first", "last"} <= {s["snapshot"] for s in srcs}
    # a transaction block spanning TWO tables (same tx id)
    tx_tables = {
        (p["transaction"]["id"], p["source"]["table"])
        for p in payloads
        if p.get("transaction")
    }
    by_tx: dict[str, set] = {}
    for txid, tbl in tx_tables:
        by_tx.setdefault(txid, set()).add(tbl)
    assert any(len(tbls) >= 2 for tbls in by_tx.values()), (
        "needs one transaction spanning two tables"
    )
    # mid-stream schema change: a column appearing in later envelopes
    # of a table that earlier envelopes of the SAME table lack
    items_fields = [
        set(p["before"] or p["after"] or {})
        for p in payloads
        if p["source"]["table"] == "t_items"
    ]
    assert any("discount" in f for f in items_fields)
    assert any(f and "discount" not in f for f in items_fields)


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


def _run_capture_stream(spark, tmp_path, chunks, queryName):
    """Replay Kafka-shaped record chunks as one file each → one
    micro-batch each (maxFilesPerTrigger=1) through the envelope
    adapter + reference pipeline into a memory sink. Returns
    (archived tuples, per-epoch guard-counter Rows)."""
    from jly_flink_spark.pipeline import observe_guard_drops

    src_dir = tmp_path / "capture"
    src_dir.mkdir()
    for i, chunk in enumerate(chunks):
        with open(src_dir / f"part_{i}.jsonl", "w", encoding="utf-8") as f:
            for r in chunk:
                f.write(json.dumps(r) + "\n")

    stream = (
        spark.readStream.schema(KAFKA_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src_dir))
    )
    env = observe_guard_drops(envelopes_from_kafka(stream))
    target = build_pipeline(spark, env, demo_task_config())
    q = (
        target.writeStream.format("memory")
        .queryName(queryName)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        epochs = [
            (p.get("observedMetrics") or {}).get("guards")
            for p in q.recentProgress
        ]
    finally:
        q.stop()
    got = {
        (r["id"], r["db_tb_name"], r["fb_no"])
        for r in spark.sql(f"SELECT * FROM {queryName}").collect()
    }
    return got, [e for e in epochs if e is not None]


def test_capture_streaming_end_to_end(spark, tmp_path):
    """Replay the capture through a real Structured Streaming query:
    file source (one Kafka-shaped record per line) → envelope adapter
    → reference pipeline → memory sink, split across two micro-batches
    to prove the adapter is incremental."""
    recs = _records(subscribed_only=True)
    half = len(recs) // 2
    got, _ = _run_capture_stream(
        spark, tmp_path, (recs[:half], recs[half:]), "debezium_capture"
    )
    assert got == EXPECTED


def test_snapshot_to_binlog_phase_transition(spark, tmp_path):
    """Debezium's snapshot phase (op:"r", snapshot first…last) then
    the binlog phase, split at the phase boundary exactly as a
    restarted connector would deliver them. Snapshot reads must NOT
    archive (they are not deletes) but MUST be counted — and the
    binlog-phase delete of a row the snapshot read archives with the
    snapshot-consistent pre-image intact."""
    recs = _records(subscribed_only=True)

    def phase(r):
        doc = json.loads(r["value"]) if r["value"] else None
        if doc is None:
            return "binlog"  # tombstones trail their binlog delete
        p = doc.get("payload", doc)
        return (
            "snapshot"
            if p["source"]["snapshot"] in ("true", "first", "last")
            else "binlog"
        )

    snap = [r for r in recs if phase(r) == "snapshot"]
    binlog = [r for r in recs if phase(r) == "binlog"]
    assert snap and binlog
    got, epochs = _run_capture_stream(
        spark, tmp_path, (snap, binlog), "debezium_phases"
    )
    assert got == EXPECTED
    # every record of every epoch lands in exactly one counter bucket:
    # archived + dropped(guards) + non-delete ops; nothing vanishes
    tot = {}
    for e in epochs:
        for k, v in e.asDict().items():
            tot[k] = tot.get(k, 0) + v
    n_input = len([r for r in recs if r["value"] is not None])
    accounted = tot["n_archived"] + tot["n_not_delete"] + (
        tot["n_blank_table"] + tot["n_null_before"] + tot["n_no_id"]
        + tot["n_bad_ts"]
    )
    assert accounted == n_input, (tot, n_input)
    assert tot["n_archived"] == len(EXPECTED)
    # the snapshot-read row's delete carried the snapshot pre-image
    row = [t for t in got if t[0] == "301"]
    assert row == [("301", "demo_t_items", "FB0")]


def test_multi_table_transaction_across_micro_batches(spark, tmp_path):
    """One MySQL transaction touching t_orders AND t_items whose two
    events arrive in DIFFERENT micro-batches (Kafka gives no
    transactional batching across topics): both deletes must archive
    exactly once, with the batch boundary falling mid-transaction."""
    recs = _records(subscribed_only=True)

    def tx_order(r):
        if not r["value"]:
            return None
        doc = json.loads(r["value"])
        p = doc.get("payload", doc)
        tx = p.get("transaction")
        return tx and tx.get("total_order")

    split = next(i for i, r in enumerate(recs) if tx_order(r) == 2)
    assert any(tx_order(r) == 1 for r in recs[:split])  # straddles
    got, _ = _run_capture_stream(
        spark, tmp_path, (recs[:split], recs[split:]), "debezium_tx"
    )
    assert got == EXPECTED
    assert {t for t in got if t[0] in ("700", "701")} == {
        ("700", "demo_t_orders", "FB2"),
        ("701", "demo_t_items", "FB2"),
    }


def test_schema_change_rides_through_verbatim(spark, tmp_path):
    """Mid-stream ALTER TABLE ADD COLUMN: envelopes after the DDL
    carry the new column in schema block and row images. The raw-JSON
    pre-image path (S2) must surface the new column verbatim in the
    archived `before` — no fixed schema to fall out of."""
    env = envelopes_from_kafka(_batch_frame(spark, subscribed_only=True))
    target = build_pipeline(spark, env, demo_task_config())
    row = target.filter(F.col("id") == "800").collect()
    assert len(row) == 1
    pre_image = json.loads(row[0]["data_json"])
    # the new column is present, and decimals are still strings
    assert pre_image["discount"] == "0.2000"
    assert pre_image["unit_price"] == "9.9900"
