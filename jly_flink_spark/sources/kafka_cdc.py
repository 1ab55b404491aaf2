"""Kafka/Debezium front-end for the MySQL binlog CDC source (S1).

The reference embeds flink-connector-mysql-cdc (StartJob.java:63-74:
`MySqlSource.builder()` with host/port/credentials, database+table
lists, a JsonDebeziumDeserializationSchema with
`decimal.handling.mode=string`, and `StartupOptions.latest()`).
Spark has no binlog reader; the standard production topology is

    MySQL → Debezium (Kafka Connect) → Kafka
          → spark.readStream.format("kafka") → this module.

`read_mysql_cdc_stream` wires the Kafka reader (requires the
spark-sql-kafka connector package on the cluster — not present in the
offline test container), and `envelopes_from_kafka` — a pure
DataFrame transformation, fully tested offline against Kafka-shaped
record frames — turns Kafka records (key/value binary, topic,
partition, offset, timestamp) into the flattened envelope frame
`pipeline.build_pipeline` consumes.

Debezium specifics handled:

- optional schema envelope: with the JSON converter's
  `schemas.enable=true` the value is `{"schema": ..., "payload":
  {...}}`; with it off, the bare payload. Both parse.
- tombstones: Debezium emits a null-value record after each delete
  for log compaction; these carry no envelope and are dropped (the
  quarantine path still catches *malformed* JSON separately).
- decimal-as-string parity (S2, SURVEY §2.1): the pre-image is
  extracted as a RAW JSON string via `get_json_object`, never through
  a typed schema, so `decimal.handling.mode=string` values survive
  verbatim (reference StartJob.java:59-61).
- instance identity: Debezium topics are
  `<topic.prefix>.<db>.<table>`; the prefix identifies the source
  instance — the role `instance_name` plays for the reference's
  per-instance streams (StartJob.java:52-58, union T5).

At scale: one Kafka partition per binlog shard; the transformation is
narrow (no shuffle), so source parallelism flows straight through to
the pipeline's filter/project stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def envelopes_from_kafka(
    kafka_df: DataFrame, drop_tombstones: bool = True
) -> DataFrame:
    """Kafka record frame → flattened envelope frame
    (instance_name, op, ts_ms, source_table, before).

    Works identically on a streaming frame from the kafka source and
    on a batch frame with the same columns (how the offline tests
    drive it)."""
    val = F.col("value").cast("string")
    # Unwrap {"schema":..., "payload": {...}} if present, else use the
    # bare value. get_json_object returns the payload's JSON text, so
    # the pre-image stays an opaque string either way.
    p = F.coalesce(F.get_json_object(val, "$.payload"), val)
    out = kafka_df
    if drop_tombstones:
        out = out.filter(F.col("value").isNotNull())
    return out.select(
        F.substring_index(F.col("topic"), ".", 1).alias("instance_name"),
        F.get_json_object(p, "$.op").alias("op"),
        F.get_json_object(p, "$.ts_ms").cast("long").alias("ts_ms"),
        F.get_json_object(p, "$.source.table").alias("source_table"),
        F.get_json_object(p, "$.before").alias("before"),
    )


def read_mysql_cdc_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    subscribe_pattern: str,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """The production source wiring: Kafka topics carrying Debezium
    envelopes → envelope frame.

    Mirrors the reference's source options: `startingOffsets=latest`
    ≈ StartupOptions.latest() (StartJob.java:70), and
    `maxOffsetsPerTrigger` plays the count-based batch trigger role
    (T8) at the source instead of the sink. Requires the
    spark-sql-kafka-0-10 package on the classpath."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribePattern", subscribe_pattern)
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", "false")
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option(
            "maxOffsetsPerTrigger", str(max_offsets_per_trigger)
        )
    return envelopes_from_kafka(reader.load())
