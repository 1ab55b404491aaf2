"""Event-time windowing queries (SURVEY.md §2.2 'streaming windows'):
tumbling, sliding, and session windows over the `events` table.

The reference has none of these (explicitly noWatermarks,
StartJob.java:76-80 — S3); they are additive capabilities. Each query
is registered in batch mode with a DuckDB oracle; the identical plan
runs under readStream (tests/test_streaming.py proves it on a
file-source stream with watermarks), because Structured Streaming
executes the same logical plan incrementally.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io import load_table
from .registry import register
from .relational_queries import _DSUM, _dsum


@register(
    "events_tumbling_hourly",
    oracle=f"""
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
       event_type,
       count(*) AS n_events,
       {_DSUM('value')} AS sum_value
FROM events
GROUP BY 1, 2
""",
    tags=("streaming", "window", "headline"),
    doc="Tumbling 1-hour event-time windows per event type. In "
    "streaming: groupBy(window(ts, '1 hour'), event_type) behind a "
    "watermark; identical logical plan.",
)
def events_tumbling_hourly(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n_events"), _dsum("value", "sum_value"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@register(
    "events_sliding_windows",
    oracle="""
SELECT window_start, count(*) AS n_events
FROM (
  SELECT time_bucket(INTERVAL '30 minutes', ts) AS window_start FROM events
  UNION ALL
  SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes' FROM events
)
GROUP BY window_start
""",
    tags=("streaming", "window"),
    doc="Sliding windows (1 h length, 30 min hop): every event lands "
    "in two windows — the oracle expands the two shifted buckets "
    "explicitly, Spark uses window(ts, '1 hour', '30 minutes').",
)
def events_sliding_windows(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("window.start").alias("window_start"),
            "n_events",
        )
    )


@register(
    "events_session_windows",
    oracle="""
WITH ordered AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   >= INTERVAL '30 minutes'
              THEN 1 ELSE 0 END AS new_sess
  FROM events
),
sess AS (
  SELECT user_id, ts,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM ordered
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL '30 minutes' AS session_end,
       count(*) AS n_events
FROM sess
GROUP BY user_id, sid
""",
    tags=("streaming", "window", "session"),
    doc="Per-user session windows with a 30-minute inactivity gap "
    "(session_window merges events whose gap windows overlap, i.e. "
    "diff < gap; the oracle reproduces that with lag + running sum). "
    "Streaming mode uses the same session_window expr behind a "
    "watermark.",
)
def events_session_windows(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


@register(
    "events_json_props",
    oracle="""
SELECT event_type,
       count(*) AS n,
       min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
            AS BIGINT) AS sum_k
FROM events
GROUP BY event_type
""",
    tags=("streaming", "json"),
    doc="JSON payload aggregation over the event stream's props column "
    "(the T1/T3 JSON-extraction primitive in aggregate form; integer "
    "sums are exact — no quantization needed).",
)
def events_json_props(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
        F.sum(k).alias("sum_k"),
    )


@register(
    "events_variant_props",
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
            AS BIGINT) AS sum_k,
       CAST(sum(CASE WHEN CAST(json_extract_string(props, '$.k')
                          AS BIGINT) % 7 = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_k_mod7,
       CAST(sum(1) AS BIGINT) AS n_missing,
       CAST(count(DISTINCT array_to_string(list_sort(json_keys(props)),
                                           ',')) AS BIGINT)
         AS n_shapes
FROM events
GROUP BY event_type
""",
    tags=("streaming", "json", "variant"),
    doc="VARIANT-typed payload analytics (Spark 4's binary "
    "semi-structured type): props parses ONCE to variant "
    "(parse_json), then variant_get extracts typed fields, "
    "try_variant_get probes an absent path NULL-safely (counted — "
    "all rows, pinning the missing-path contract), and "
    "the sorted top-level key list fingerprints each payload's "
    "shape (distinct-counted per group — the schema-drift monitor "
    "over a variant column). The shape fingerprint is the ENGINE-"
    "NEUTRAL sorted key list (json_object_keys / json_keys), not "
    "engine-native schema strings (schema_of_variant vs "
    "json_structure type numeric leaves differently, so their "
    "parity held only for the generator's payload shapes — round-10 "
    "ADVICE). The engine path differs from events_json_props' "
    "get_json_object: variant decodes the JSON text a single time "
    "into a binary tree that every subsequent extraction walks "
    "without re-parsing — the scale answer for multi-field "
    "extraction over wide payloads.",
)
def events_variant_props(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    v = e.select(
        "event_type", "props", F.parse_json("props").alias("v")
    )
    k = F.variant_get("v", "$.k", "bigint")
    missing = F.try_variant_get("v", "$.missing", "bigint")
    return v.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(k).cast("bigint").alias("sum_k"),
        F.sum((k % 7 == 0).cast("int")).cast("bigint").alias("n_k_mod7"),
        F.sum(missing.isNull().cast("int"))
        .cast("bigint")
        .alias("n_missing"),
        F.count_distinct(
            F.array_join(F.array_sort(F.json_object_keys("props")), ",")
        )
        .cast("bigint")
        .alias("n_shapes"),
    )
