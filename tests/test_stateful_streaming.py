"""Custom stateful operators (applyInPandasWithState): first-seen
dedup across micro-batches and event-time sessionization closing on
watermark timers — streaming results checked against batch-computed
golden frames on the same data."""

import json
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from jly_flink_spark.streaming.stateful import first_seen_filter, sessionize


def _write_json_files(path, batches):
    os.makedirs(path, exist_ok=True)
    for i, rows in enumerate(batches):
        fp = os.path.join(path, f"b{i:03d}.json")
        with open(fp, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        # The file source orders batches by modification time; pin
        # strictly increasing mtimes so batch order is deterministic.
        os.utime(fp, (1_700_000_000 + i, 1_700_000_000 + i))


def _drain(stream_df, tmp_path, name):
    out = []
    q = (
        stream_df.writeStream.foreachBatch(
            lambda df, eid: out.extend(df.collect())
        )
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(processingTime="0.2 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return out


class TestFirstSeenFilter:
    def test_dedup_across_batches(self, spark, tmp_path):
        # id=a appears in batches 0 and 2; id=b twice inside batch 1.
        batches = [
            [{"id": "a", "ts": 100, "v": "x1"}],
            [{"id": "b", "ts": 200, "v": "y1"}, {"id": "b", "ts": 250, "v": "y2"}],
            [{"id": "a", "ts": 300, "v": "x2"}, {"id": "c", "ts": 310, "v": "z1"}],
        ]
        src = str(tmp_path / "src")
        _write_json_files(src, batches)
        stream = (
            spark.readStream.schema("id string, ts long, v string")
            .option("maxFilesPerTrigger", 1)
            .json(src)
        )
        rows = _drain(
            first_seen_filter(stream, "id", "ts", ["v"]), tmp_path, "fsf"
        )
        got = {(r["id"], r["ts"], r["v"]) for r in rows}
        assert got == {("a", 100, "x1"), ("b", 200, "y1"), ("c", 310, "z1")}

    def test_restart_keeps_state(self, spark, tmp_path):
        """State survives a checkpoint restart: a key seen before the
        restart must not re-emit after it."""
        src = str(tmp_path / "src")
        ckpt = str(tmp_path / "ckpt")
        _write_json_files(src, [[{"id": "k", "ts": 1, "v": "first"}]])
        stream_df = lambda: first_seen_filter(  # noqa: E731
            spark.readStream.schema("id string, ts long, v string")
            .option("maxFilesPerTrigger", 1)
            .json(src),
            "id",
            "ts",
            ["v"],
        )
        out1 = []
        q = (
            stream_df()
            .writeStream.foreachBatch(lambda df, eid: out1.extend(df.collect()))
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        assert [r["v"] for r in out1] == ["first"]

        _write_json_files(
            str(tmp_path / "src"),
            [[], [{"id": "k", "ts": 2, "v": "replay"}, {"id": "m", "ts": 3, "v": "new"}]],
        )
        out2 = []
        q = (
            stream_df()
            .writeStream.foreachBatch(lambda df, eid: out2.extend(df.collect()))
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        assert [r["v"] for r in out2] == ["new"]


class TestSessionize:
    def test_sessions_match_batch_session_window(self, spark, tmp_path):
        # Two users, clear 1-gap-separated sessions, plus a far-future
        # flush event per user so the watermark closes every real
        # session deterministically.
        gap_s = 60
        base = 1_700_000_000  # epoch seconds
        events = []
        for uid, offsets in [
            (1, [0, 10, 20, 200, 210, 1000]),
            (2, [5, 500, 505, 520]),
        ]:
            for off in offsets:
                events.append(
                    {"user_id": uid, "ts_s": base + off, "value": 1.5}
                )
        flush = [
            {"user_id": uid, "ts_s": base + 100_000, "value": 0.0}
            for uid in (1, 2)
        ]
        src = str(tmp_path / "sess_src")
        _write_json_files(src, [events, flush])

        def with_ts(df):
            return df.withColumn(
                "ts", F.timestamp_seconds(F.col("ts_s"))
            ).select("user_id", "ts", "value")

        stream = with_ts(
            spark.readStream.schema("user_id long, ts_s long, value double")
            .option("maxFilesPerTrigger", 1)
            .json(src)
        )
        rows = _drain(
            sessionize(stream, "user_id", "ts", "value", gap_s),
            tmp_path,
            "sess",
        )
        got = {
            (r["user_id"], r["session_start"], r["session_end"], r["n_events"], r["q_sum"])
            for r in rows
        }

        # Batch golden: session_window with the same gap + quantized sum
        # (flush events excluded — their sessions never close).
        batch = with_ts(
            spark.read.schema("user_id long, ts_s long, value double").json(src)
        ).filter(F.col("ts_s") < base + 100_000)
        golden_df = (
            batch.groupBy(
                F.session_window("ts", f"{gap_s} seconds"), "user_id"
            )
            .agg(
                F.count("*").alias("n_events"),
                F.sum(F.floor(F.col("value") * 10000).cast("long")).alias("q_sum"),
            )
            .select(
                "user_id",
                F.unix_millis("session_window.start").alias("session_start"),
                # session_window.end = last_ts + gap; ours reports last_ts
                (F.unix_millis("session_window.end") - gap_s * 1000).alias(
                    "session_end"
                ),
                "n_events",
                "q_sum",
            )
        )
        golden = {
            (r["user_id"], r["session_start"], r["session_end"], r["n_events"], r["q_sum"])
            for r in golden_df.collect()
        }
        assert got == golden
        assert len(got) == 5  # 3 sessions for user 1, 2 for user 2


class TestSessionizeLateEvents:
    def test_late_event_within_watermark_merges(self, spark, tmp_path):
        """A late-but-within-watermark event arriving in a LATER batch
        with t earlier than the session's current end must merge into
        the live session without moving its end backwards. (Regression:
        the merge used `last = t` unconditionally, so the next on-time
        event could wrongly close the session at the earlier time.)"""
        gap_s = 60
        base = 1_700_000_000
        batches = [
            [{"user_id": 1, "ts_s": base + o, "value": 1.5} for o in (0, 30)],
            # t=+10 is LATE (session end is already +30) but inside the
            # 100 s watermark; +80 is on-time and within gap of +30.
            [{"user_id": 1, "ts_s": base + o, "value": 1.5} for o in (10, 80)],
            [{"user_id": 1, "ts_s": base + 100_000, "value": 0.0}],
        ]
        src = str(tmp_path / "late_src")
        _write_json_files(src, batches)
        stream = (
            spark.readStream.schema("user_id long, ts_s long, value double")
            .option("maxFilesPerTrigger", 1)
            .json(src)
            .withColumn("ts", F.timestamp_seconds(F.col("ts_s")))
            .select("user_id", "ts", "value")
        )
        rows = _drain(
            sessionize(
                stream, "user_id", "ts", "value", gap_s,
                watermark="100 seconds",
            ),
            tmp_path,
            "late",
        )
        got = {
            (r["user_id"], r["session_start"], r["session_end"],
             r["n_events"], r["q_sum"])
            for r in rows
        }
        # One merged session [+0, +80] with all four events.
        assert got == {
            (1, base * 1000, (base + 80) * 1000, 4, 4 * 15000)
        }


class TestStreamStreamJoin:
    def test_interval_join_matches_batch(self, spark, tmp_path):
        """Stream-stream inner join with watermarks + time bound (the
        Structured Streaming form of Flink's interval join): each
        purchase joins views by the same user within [-60s, 0] of it.
        Both sides buffer in watermark-bounded state; the identical
        plan in batch is the golden result."""
        base = 1_700_000_000
        views = [
            {"user_id": 1, "ts_s": base + o, "event_id": 100 + i}
            for i, o in enumerate([0, 30, 120])
        ] + [{"user_id": 2, "ts_s": base + 10, "event_id": 200}]
        purchases = [
            {"user_id": 1, "ts_s": base + 50, "order_id": 900},
            {"user_id": 1, "ts_s": base + 125, "order_id": 901},
            {"user_id": 2, "ts_s": base + 300, "order_id": 902},
        ]
        vdir, pdir = str(tmp_path / "views"), str(tmp_path / "purchases")
        _write_json_files(vdir, [views])
        _write_json_files(pdir, [purchases])

        def load(dirname, schema, stream):
            r = (
                spark.readStream if stream else spark.read
            ).schema(schema)
            df = r.json(dirname)
            return df.withColumn("ts", F.timestamp_seconds(F.col("ts_s")))

        def join(v, p):
            v = v.select(
                F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts"),
                "event_id",
            )
            p = p.select(
                F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"),
                "order_id",
            )
            if v.isStreaming:
                v = v.withWatermark("v_ts", "10 seconds")
                p = p.withWatermark("p_ts", "10 seconds")
            return v.join(
                p,
                (F.col("v_user") == F.col("p_user"))
                & (F.col("v_ts") <= F.col("p_ts"))
                & (F.col("v_ts") >= F.col("p_ts") - F.expr("interval 60 seconds")),
            ).select("p_user", "order_id", "event_id")

        vs, ps = "user_id long, ts_s long, event_id long", "user_id long, ts_s long, order_id long"
        got = {
            (r["p_user"], r["order_id"], r["event_id"])
            for r in _drain(
                join(load(vdir, vs, True), load(pdir, ps, True)),
                tmp_path,
                "ssj",
            )
        }
        golden = {
            (r["p_user"], r["order_id"], r["event_id"])
            for r in join(load(vdir, vs, False), load(pdir, ps, False)).collect()
        }
        assert got == golden
        assert got == {(1, 900, 100), (1, 900, 101), (1, 901, 102)}


class TestSessionizeWatermarkSemantics:
    """The two failure modes of an eager single-candidate sessionizer
    (review findings, round 3): sessions must close on WATERMARK, not
    on in-batch gaps, and far-earlier late events must open their own
    session instead of gluing to one they don't belong to."""

    def _run(self, spark, tmp_path, batches, gap_s, wm, name):
        src = str(tmp_path / f"{name}_src")
        _write_json_files(src, batches)
        stream = (
            spark.readStream.schema("user_id long, ts_s long, value double")
            .option("maxFilesPerTrigger", 1)
            .json(src)
            .withColumn("ts", F.timestamp_seconds(F.col("ts_s")))
            .select("user_id", "ts", "value")
        )
        rows = _drain(
            sessionize(stream, "user_id", "ts", "value", gap_s,
                       watermark=wm),
            tmp_path,
            name,
        )
        return {
            (r["user_id"], r["session_start"], r["session_end"],
             r["n_events"])
            for r in rows
        }

    def test_in_batch_gap_does_not_close_early(self, spark, tmp_path):
        """batch1 has t=0 and t=31 (gap 30s apart-plus): an eager
        implementation emits [0,0] immediately; then batch2's late
        t=25 (within the 100s watermark) BRIDGES the two candidates —
        the correct output is ONE session [0,31] with 3 events,
        exactly what batch session_window computes on {0,25,31}."""
        base = 1_700_000_000
        got = self._run(
            spark, tmp_path,
            [
                [{"user_id": 1, "ts_s": base + o, "value": 1.0}
                 for o in (0, 31)],
                [{"user_id": 1, "ts_s": base + 25, "value": 1.0}],
                [{"user_id": 1, "ts_s": base + 100_000, "value": 0.0}],
            ],
            gap_s=30, wm="100 seconds", name="bridge",
        )
        assert got == {(1, base * 1000, (base + 31) * 1000, 3)}

    def test_far_earlier_late_event_opens_own_session(self, spark, tmp_path):
        """batch1 t=100; batch2's late t=40 is MORE than gap (30s)
        before it — merging would bridge a 60s silence. Correct:
        two sessions [40,40] and [100,100]."""
        base = 1_700_000_000
        got = self._run(
            spark, tmp_path,
            [
                [{"user_id": 1, "ts_s": base + 100, "value": 1.0}],
                [{"user_id": 1, "ts_s": base + 40, "value": 1.0}],
                [{"user_id": 1, "ts_s": base + 100_000, "value": 0.0}],
            ],
            gap_s=30, wm="120 seconds", name="split",
        )
        assert got == {
            (1, (base + 40) * 1000, (base + 40) * 1000, 1),
            (1, (base + 100) * 1000, (base + 100) * 1000, 1),
        }

    def test_zero_gap_rejected_at_api_boundary(self, spark):
        """gap_seconds=0 degenerates every event to its own instantly-
        closed session AND voids the 'newest candidate stays open'
        assumption the state write relies on — reject it up front
        instead of corrupting state mid-stream (round-3 advice)."""
        import pytest

        df = spark.createDataFrame(
            [(1, 0, 1.0)], "user_id long, ts_s long, value double"
        ).withColumn("ts", F.timestamp_seconds(F.col("ts_s")))
        for bad in (0, -5):
            with pytest.raises(ValueError, match="gap_seconds"):
                sessionize(df, "user_id", "ts", "value", bad)

    def test_event_exactly_at_gap_boundary_merges(self, spark, tmp_path):
        """Close-vs-merge boundary consistency (round-3 advice): the
        merge rule is inclusive (ts - last <= gap), so a candidate
        must stay OPEN while an in-watermark event at exactly
        ts == last + gap could still arrive. batch1 t=0; batch2
        advances the watermark so that wm == last + gap exactly;
        batch3's t=30 (== last + gap, >= wm → not late) must merge
        into [0,30], not land in a session of its own."""
        base = 1_700_000_000
        got = self._run(
            spark, tmp_path,
            [
                [{"user_id": 1, "ts_s": base, "value": 1.0}],
                # wm after this batch = (base+40) - 10s delay = base+30
                # == last(base) + gap(30): candidate must NOT close.
                [{"user_id": 2, "ts_s": base + 40, "value": 1.0}],
                [{"user_id": 1, "ts_s": base + 30, "value": 1.0}],
                [{"user_id": 1, "ts_s": base + 100_000, "value": 0.0}],
            ],
            gap_s=30, wm="10 seconds", name="gapedge",
        )
        assert (1, base * 1000, (base + 30) * 1000, 2) in got


class TestLatestStateStream:
    """Streaming changelog compaction (the incremental form of the
    batch cdc_latest_state_compaction query): per-batch upsert
    emissions, stale-late-event suppression, tie determinism."""

    def _run(self, spark, tmp_path, batches, name):
        from jly_flink_spark.streaming.stateful import latest_state_stream

        src = str(tmp_path / f"{name}_src")
        _write_json_files(src, batches)
        stream = spark.readStream.schema(
            "user_id long, ts long, event_id long, val string"
        ).option("maxFilesPerTrigger", 1).json(src)
        emissions = []
        q = (
            latest_state_stream(stream, "user_id", "ts", "event_id", "val")
            .writeStream.outputMode("update")
            .foreachBatch(
                lambda df, eid: emissions.append(
                    {(r["user_id"]): (r["last_ts"], r["last_tie"], r["val"])
                     for r in df.collect()}
                )
            )
            .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
            .trigger(processingTime="0.2 seconds")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return [e for e in emissions if e]

    def test_upserts_match_batch_compaction(self, spark, tmp_path):
        batches = [
            [{"user_id": 1, "ts": 100, "event_id": 1, "val": "a"},
             {"user_id": 2, "ts": 100, "event_id": 2, "val": "x"}],
            # newer for 1; STALE (older ts) for 2 → no emission for 2
            [{"user_id": 1, "ts": 200, "event_id": 3, "val": "b"},
             {"user_id": 2, "ts": 50, "event_id": 4, "val": "stale"}],
            # equal ts for 1: higher event_id wins (tie determinism)
            [{"user_id": 1, "ts": 200, "event_id": 9, "val": "c"}],
        ]
        emissions = self._run(spark, tmp_path, batches, "upsert")
        # batch 1: both keys new
        assert emissions[0] == {1: (100, 1, "a"), 2: (100, 2, "x")}
        # batch 2: only key 1 changed — key 2's stale update suppressed
        assert emissions[1] == {1: (200, 3, "b")}
        # batch 3: same ts, higher tie wins
        assert emissions[2] == {1: (200, 9, "c")}
        # folding the upserts reproduces the batch row_number()=1 view
        view = {}
        for e in emissions:
            view.update(e)
        assert view == {1: (200, 9, "c"), 2: (100, 2, "x")}

    def test_lower_tie_at_same_ts_is_stale(self, spark, tmp_path):
        batches = [
            [{"user_id": 5, "ts": 300, "event_id": 7, "val": "keep"}],
            [{"user_id": 5, "ts": 300, "event_id": 6, "val": "old"}],
        ]
        emissions = self._run(spark, tmp_path, batches, "tie")
        assert emissions == [{5: (300, 7, "keep")}]

    def _run_with_ops(self, spark, tmp_path, batches, name):
        from jly_flink_spark.streaming.stateful import latest_state_stream

        src = str(tmp_path / f"{name}_src")
        _write_json_files(src, batches)
        stream = spark.readStream.schema(
            "user_id long, ts long, event_id long, val string, op string"
        ).option("maxFilesPerTrigger", 1).json(src)
        emissions = []
        q = (
            latest_state_stream(
                stream, "user_id", "ts", "event_id", "val", op_col="op"
            )
            .writeStream.outputMode("update")
            .foreachBatch(
                lambda df, eid: emissions.append(
                    {r["user_id"]: (r["last_ts"], r["val"], r["op"])
                     for r in df.collect()}
                )
            )
            .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
            .trigger(processingTime="0.2 seconds")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return [e for e in emissions if e]

    def test_delete_emits_tombstone_and_blocks_stale_resurrection(
        self, spark, tmp_path
    ):
        """CDC semantics (reference ChangeType.java op codes): a
        delete that becomes the latest record emits op='d' with NULL
        value; a LATE pre-delete update must NOT resurrect the key
        (the tombstone holds the high-water mark); a genuinely newer
        update does resurrect it with op='u'."""
        batches = [
            [{"user_id": 1, "ts": 100, "event_id": 1, "val": "a",
              "op": "c"}],
            [{"user_id": 1, "ts": 200, "event_id": 2, "val": None,
              "op": "d"}],
            # late pre-delete update: older ts → suppressed entirely
            [{"user_id": 1, "ts": 150, "event_id": 3, "val": "ghost",
              "op": "u"}],
            # newer insert resurrects the key
            [{"user_id": 1, "ts": 300, "event_id": 4, "val": "back",
              "op": "c"}],
        ]
        emissions = self._run_with_ops(spark, tmp_path, batches, "tomb")
        assert emissions == [
            {1: (100, "a", "u")},
            {1: (200, None, "d")},
            {1: (300, "back", "u")},
        ]

    def test_without_op_col_schema_is_unchanged(self, spark, tmp_path):
        batches = [
            [{"user_id": 9, "ts": 10, "event_id": 1, "val": "v"}],
        ]
        emissions = self._run(spark, tmp_path, batches, "noop_schema")
        assert emissions == [{9: (10, 1, "v")}]


_TTL_BASE = 1_700_000_000_000  # epoch ms — realistic event times so
#                                watermark arithmetic behaves


class TestLatestStateTombstoneEviction:
    """Bounded tombstone state (round-4 verdict): with eventtime_col
    the upsert view evicts op='d' high-water marks once the watermark
    passes their ts — state grows with live keys + one
    watermark-delay of recent deletes, not the all-time deleted-key
    universe — while suppression of late pre-delete updates still
    holds INSIDE the watermark, and post-eviction stragglers are
    late-filtered before they can resurrect anything."""

    def _run_ttl(self, spark, tmp_path, batches, name, delay="10 seconds"):
        from jly_flink_spark.streaming.stateful import latest_state_stream

        src = str(tmp_path / f"{name}_src")
        _write_json_files(src, batches)
        stream = (
            spark.readStream.schema(
                "user_id long, ts long, event_id long, val string, "
                "op string"
            )
            .option("maxFilesPerTrigger", 1)
            .json(src)
            .withColumn("evt", F.timestamp_millis(F.col("ts")))
        )
        emissions = []
        q = (
            latest_state_stream(
                stream, "user_id", "ts", "event_id", "val",
                op_col="op", eventtime_col="evt", watermark_delay=delay,
            )
            .writeStream.outputMode("update")
            .foreachBatch(
                lambda df, eid: emissions.append(
                    {r["user_id"]: (r["last_ts"], r["val"], r["op"])
                     for r in df.collect()}
                )
            )
            .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
            .trigger(processingTime="0.2 seconds")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        state_rows = [
            p["stateOperators"][0]["numRowsTotal"]
            for p in q.recentProgress
            if p.get("stateOperators")
        ]
        return [e for e in emissions if e], state_rows

    @pytest.mark.slow
    def test_state_stays_flat_under_delete_heavy_stream(
        self, spark, tmp_path
    ):
        n_del = 20
        batches = [
            # create then delete 20 keys
            [{"user_id": i, "ts": _TTL_BASE, "event_id": 1,
              "val": "v", "op": "c"} for i in range(n_del)],
            [{"user_id": i, "ts": _TTL_BASE + 1_000, "event_id": 2,
              "val": None, "op": "d"} for i in range(n_del)],
            # live keys far enough ahead to push the watermark past
            # every tombstone's ts (delay = 10s)
            [{"user_id": 100, "ts": _TTL_BASE + 60_000, "event_id": 3,
              "val": "live", "op": "c"}],
            [{"user_id": 101, "ts": _TTL_BASE + 70_000, "event_id": 4,
              "val": "live", "op": "c"}],
        ]
        emissions, state_rows = self._run_ttl(
            spark, tmp_path, batches, "flat"
        )
        # the deletes all emitted their tombstones before eviction
        assert emissions[1] == {
            i: (_TTL_BASE + 1_000, None, "d") for i in range(n_del)
        }
        # state really held the tombstones at the peak…
        assert max(state_rows) >= n_del
        # …and the watermark evicted them: only the live keys remain
        assert state_rows[-1] == 2, state_rows

    @pytest.mark.slow
    def test_late_suppression_still_holds_inside_watermark(
        self, spark, tmp_path
    ):
        batches = [
            [{"user_id": 1, "ts": _TTL_BASE, "event_id": 1,
              "val": "a", "op": "c"}],
            [{"user_id": 1, "ts": _TTL_BASE + 5_000, "event_id": 2,
              "val": None, "op": "d"}],
            # late pre-delete update, INSIDE the watermark (wm is
            # ~delete_ts - 10s): tombstone still in state → suppressed
            [{"user_id": 1, "ts": _TTL_BASE + 2_000, "event_id": 3,
              "val": "ghost", "op": "u"}],
            # genuinely newer insert resurrects with op='u'
            [{"user_id": 1, "ts": _TTL_BASE + 20_000, "event_id": 4,
              "val": "back", "op": "c"}],
        ]
        emissions, _ = self._run_ttl(spark, tmp_path, batches, "supp")
        assert emissions == [
            {1: (_TTL_BASE, "a", "u")},
            {1: (_TTL_BASE + 5_000, None, "d")},
            {1: (_TTL_BASE + 20_000, "back", "u")},
        ]

    def test_post_eviction_stragglers_are_late_filtered(
        self, spark, tmp_path
    ):
        batches = [
            [{"user_id": 1, "ts": _TTL_BASE, "event_id": 1,
              "val": "a", "op": "c"}],
            [{"user_id": 1, "ts": _TTL_BASE + 1_000, "event_id": 2,
              "val": None, "op": "d"}],
            # clock key: watermark jumps past the tombstone → evicted
            [{"user_id": 2, "ts": _TTL_BASE + 60_000, "event_id": 3,
              "val": "clock", "op": "c"}],
            # pre-delete straggler now BELOW the watermark: Spark does
            # NOT pre-filter late rows for applyInPandasWithState, so
            # the OPERATOR's own ts < wm drop must discard it —
            # eviction never re-opens the resurrection window
            [{"user_id": 1, "ts": _TTL_BASE + 500, "event_id": 4,
              "val": "ghost", "op": "u"}],
        ]
        emissions, state_rows = self._run_ttl(
            spark, tmp_path, batches, "strag"
        )
        assert emissions == [
            {1: (_TTL_BASE, "a", "u")},
            {1: (_TTL_BASE + 1_000, None, "d")},
            {2: (_TTL_BASE + 60_000, "clock", "u")},
        ]
        assert state_rows[-1] == 1, state_rows  # only the clock key


class TestKmvDistinctStream:
    """Incremental KMV sketch: streaming estimate == batch formula on
    the union of all batches; no-change batches emit nothing; replays
    are absorbed idempotently."""

    def _run(self, spark, tmp_path, batches, name, k=8):
        from pyspark.sql import functions as F

        from jly_flink_spark.streaming.stateful import kmv_distinct_stream

        src = str(tmp_path / f"{name}_src")
        _write_json_files(src, batches)
        stream = spark.readStream.schema(
            "grp string, v long"
        ).option("maxFilesPerTrigger", 1).json(src)
        hashed = stream.select(
            "grp",
            F.conv(
                F.substring(F.md5(F.col("v").cast("string")), 1, 14),
                16,
                10,
            ).cast("bigint").alias("h"),
        )
        emissions = []
        q = (
            kmv_distinct_stream(hashed, "grp", "h", k=k)
            .writeStream.outputMode("update")
            .foreachBatch(
                lambda df, eid: emissions.append(
                    {r["grp"]: (r["kmv_estimate"], r["kd"])
                     for r in df.collect()}
                )
            )
            .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
            .trigger(processingTime="0.2 seconds")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return [e for e in emissions if e]

    @staticmethod
    def _py_kmv(values, k=8, hash_space=16**14):
        import hashlib

        hs = sorted(
            {
                int(hashlib.md5(str(v).encode()).hexdigest()[:14], 16)
                for v in values
            }
        )[:k]
        if len(hs) < k:
            return len(hs), len(hs)
        return (k - 1) * hash_space // hs[-1], k

    def test_stream_equals_batch_union_and_suppresses_nochange(
        self, spark, tmp_path
    ):
        b1 = [{"grp": "g", "v": v} for v in range(30)]
        b2 = [{"grp": "g", "v": v} for v in range(30, 60)]
        replay = list(b1)  # duplicate delivery of batch 1
        emissions = self._run(
            spark, tmp_path, [b1, b2, replay], "kmv", k=8
        )
        # batch 1: sketch of 0..29
        assert emissions[0]["g"] == self._py_kmv(range(30))
        # final state: sketch of the union — possibly unchanged by b2
        # (if no new value hashed below the current k-th min, nothing
        # is emitted); the last emission must equal the union sketch
        assert emissions[-1]["g"] == self._py_kmv(range(60)) or (
            len(emissions) == 1
            and self._py_kmv(range(60)) == self._py_kmv(range(30))
        )
        # the replay of batch 1 must emit NOTHING (idempotent merge)
        assert len(emissions) <= 2

    def test_zero_and_negative_hashes_degrade_not_crash(
        self, spark, tmp_path
    ):
        """Caller-supplied hash columns may contain 0/negatives (the
        md5 path never does); the k-th min then hits the max(·,1)
        divisor guard — the estimate degrades instead of a
        ZeroDivisionError killing the query."""
        from jly_flink_spark.streaming.stateful import (
            kmv_distinct_stream,
        )

        src = str(tmp_path / "kmvz_src")
        _write_json_files(
            src, [[{"grp": "g", "h": -5}, {"grp": "g", "h": 0}]]
        )
        stream = spark.readStream.schema(
            "grp string, h long"
        ).option("maxFilesPerTrigger", 1).json(src)
        emissions = []
        q = (
            kmv_distinct_stream(stream, "grp", "h", k=2)
            .writeStream.outputMode("update")
            .foreachBatch(
                lambda df, eid: emissions.append(
                    {r["grp"]: (r["kmv_estimate"], r["kd"])
                     for r in df.collect()}
                )
            )
            .option("checkpointLocation", str(tmp_path / "kmvz_ckpt"))
            .trigger(processingTime="0.2 seconds")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        emissions = [e for e in emissions if e]
        # k-th smallest of {-5, 0} is 0 → guarded divisor → finite est
        assert emissions and emissions[-1]["g"][1] == 2


class TestQuantileSketchStream:
    """Incremental bottom-k quantile sketch: streaming estimates ==
    the batch agg_quantile_sketch machinery on the union of all
    batches; replays absorbed idempotently; no-change suppression."""

    def _run(self, spark, tmp_path, batches, name, k=8):
        from pyspark.sql import functions as F

        from jly_flink_spark.streaming.stateful import (
            quantile_sketch_stream,
        )

        src = str(tmp_path / f"{name}_src")
        _write_json_files(src, batches)
        stream = spark.readStream.schema(
            "grp string, rid long, qv long"
        ).option("maxFilesPerTrigger", 1).json(src)
        hashed = stream.select(
            "grp", "rid", "qv",
            F.conv(
                F.substring(F.md5(F.col("rid").cast("string")), 1, 14),
                16,
                10,
            ).cast("bigint").alias("h"),
        )
        emissions = []
        q = (
            quantile_sketch_stream(hashed, "grp", "h", "rid", "qv", k=k)
            .writeStream.outputMode("update")
            .foreachBatch(
                lambda df, eid: emissions.append(
                    {r["grp"]: (r["n_sample"], r["q25"], r["q50"], r["q90"])
                     for r in df.collect()}
                )
            )
            .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
            .trigger(processingTime="0.2 seconds")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return [e for e in emissions if e]

    @staticmethod
    def _batch_reference(spark, rows, k=8):
        """The batch query's own expression shape (rank by (h, id)
        <= k, Spark `percentile`) over the union — the parity
        target."""
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        df = spark.createDataFrame(rows, "grp string, rid long, qv long")
        h = F.conv(
            F.substring(F.md5(F.col("rid").cast("string")), 1, 14),
            16,
            10,
        ).cast("bigint")
        w = Window.partitionBy("grp").orderBy("h", "rid")
        s = (
            df.select("grp", "rid", "qv", h.alias("h"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
        )
        out = (
            s.groupBy("grp")
            .agg(
                F.count("*").alias("n_sample"),
                F.percentile("qv", F.lit([0.25, 0.5, 0.9])).alias("_q"),
            )
            .collect()
        )
        return {
            r["grp"]: (
                r["n_sample"],
                r["_q"][0],
                r["_q"][1],
                r["_q"][2],
            )
            for r in out
        }

    def test_stream_equals_batch_union(self, spark, tmp_path):
        b1 = [{"grp": "g", "rid": i, "qv": i * 37 % 1000} for i in range(20)]
        b2 = [
            {"grp": "g", "rid": i, "qv": i * 37 % 1000}
            for i in range(20, 40)
        ]
        replay = list(b1)  # duplicate delivery
        emissions = self._run(
            spark, tmp_path, [b1, b2, replay], "qsk", k=8
        )
        assert emissions, "no emissions"
        # first batch: sketch of rows 0..19
        assert emissions[0]["g"] == self._batch_reference(
            spark, b1, k=8
        )["g"]
        # final: sketch of the union, bit-equal to the batch shape;
        # the replay emitted nothing (set-union idempotence)
        union_ref = self._batch_reference(spark, b1 + b2, k=8)["g"]
        assert emissions[-1]["g"] == union_ref
        assert len(emissions) <= 2


class TestEwmaStream:
    """Streaming EWMA fold == the batch events_ewma_fixedpoint query
    on the same rows, including out-of-order and duplicated
    delivery."""

    def _run(self, spark, tmp_path, batches, name):
        from jly_flink_spark.streaming.stateful import ewma_stream

        src = str(tmp_path / f"src_{name}")
        _write_json_files(src, batches)
        stream = (
            spark.readStream.schema(
                "user_id long, ts_ms long, event_id long, vq long"
            )
            .option("maxFilesPerTrigger", 1)
            .json(src)
        )
        out = []
        q = (
            ewma_stream(stream)
            .writeStream.outputMode("update")
            .foreachBatch(lambda df, eid: out.extend(df.collect()))
            .option(
                "checkpointLocation", str(tmp_path / f"ckpt_{name}")
            )
            .trigger(processingTime="0.2 seconds")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return out

    @staticmethod
    def _batch_rows(sf_dir):
        """The batch-side rows: same quantization as the registry
        query (floor(value*1000), epoch-millis ts)."""
        import duckdb

        con = duckdb.connect()
        rows = con.execute(
            f"""
            SELECT user_id,
                   CAST(epoch_ms(ts) AS BIGINT) AS ts_ms,
                   event_id,
                   CAST(floor(value * 1000) AS BIGINT) AS vq
            FROM read_parquet('{sf_dir}/events.parquet')
            """
        ).fetchall()
        con.close()
        return [
            {
                "user_id": r[0],
                "ts_ms": r[1],
                "event_id": r[2],
                "vq": r[3],
            }
            for r in rows
        ]

    def test_stream_matches_batch_query(self, spark, tmp_path):
        sf_dir = "/root/testdata/sf0.001"
        rows = self._batch_rows(sf_dir)
        # Adversarial delivery: shuffle deterministically so batches
        # interleave users and arrive out of event order, and replay
        # the middle batch wholesale (at-least-once delivery).
        rows.sort(key=lambda r: (r["event_id"] * 2654435761) % 2**32)
        third = len(rows) // 3
        batches = [
            rows[:third],
            rows[third : 2 * third],
            rows[third : 2 * third],  # replayed batch
            rows[2 * third :],
        ]
        out = self._run(spark, tmp_path, batches, "ewma_parity")
        last = {}
        for r in out:  # update mode: last emit per key wins
            last[r.user_id] = r.ewma_milli

        from jly_flink_spark.plans import REGISTRY

        batch = {
            r.user_id: r.ewma_milli
            for r in REGISTRY["events_ewma_fixedpoint"]
            .spark_fn(spark, sf_dir)
            .collect()
        }
        assert last == batch

    def test_late_event_outside_full_tail_is_ignored(
        self, spark, tmp_path
    ):
        # 64 events fill the tail; a later-delivered event with an
        # EARLIER ts than all of them must not change the fold (the
        # batch query would not include it in the last-64 either).
        first = [
            {"user_id": 1, "ts_ms": 1000 + i, "event_id": i, "vq": 100}
            for i in range(64)
        ]
        late = [{"user_id": 1, "ts_ms": 1, "event_id": 999, "vq": 0}]
        out = self._run(
            spark, tmp_path, [first, late], "ewma_late"
        )
        assert [r.ewma_milli for r in out] == [100]  # one emit only


class TestEwmaStepProperty:
    """Schedule-fuzz the EXACT ewma_stream state transition (the
    extracted pure ewma_step) against the batch fold: arbitrary
    event sets delivered as arbitrary batch partitions with
    duplication and reordering must converge to the batch answer
    after every prefix-closed schedule."""

    def test_schedules_converge_to_batch(self):
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        from jly_flink_spark.streaming.stateful import (
            ewma_fold,
            ewma_step,
        )

        events = st.lists(
            st.tuples(
                st.integers(0, 5),       # ts (coarse → heavy ties)
                st.integers(0, 10_000),  # value
            ),
            min_size=1,
            max_size=40,
        )
        schedule = st.lists(
            st.lists(st.integers(0, 39), max_size=15), max_size=8
        )

        @given(events=events, sched=schedule, tail=st.integers(1, 6))
        @settings(
            max_examples=300,
            deadline=None,
            suppress_health_check=[HealthCheck.too_slow],
        )
        def run(events, sched, tail):
            evs = [
                (ts, i, v) for i, (ts, v) in enumerate(events)
            ]  # unique ids
            # Deliver per the schedule (indices mod len, so batches
            # duplicate and reorder freely), then one final batch
            # with everything — at-least-once delivery always
            # eventually delivers each event.
            state = None
            for batch in sched:
                rows = [evs[j % len(evs)] for j in batch]
                state, _ = ewma_step(state, rows, tail)
            state, emit = ewma_step(state, evs, tail)
            # Batch reference: fold the (ts, id)-sorted last `tail`.
            ordered = sorted(evs)[-tail:]
            want = ewma_fold([v for _, _, v in ordered])
            if emit is None:
                # final batch changed nothing → state already holds
                # the converged tail; recompute from it
                ks, ids, vqs = state
                got = ewma_fold(list(vqs))
            else:
                got = emit[0]
            assert got == want

        run()


def test_ewma_step_rewritten_value_reemits():
    """A re-delivered (ts, id) carrying a DIFFERENT value must update
    state and re-emit (last-write-wins) — not be silently dropped
    because the tail's key set is unchanged."""
    from jly_flink_spark.streaming.stateful import ewma_step

    state, emit = ewma_step(None, [(1, 1, 100), (2, 2, 300)], tail=4)
    assert emit == ((100 + 300) >> 1, 2)
    # same keys, same values → no emit, state unchanged
    state2, emit2 = ewma_step(state, [(1, 1, 100)], tail=4)
    assert emit2 is None and state2 == state
    # same keys, REWRITTEN value → state updated and re-emitted
    state3, emit3 = ewma_step(state, [(1, 1, 500)], tail=4)
    assert emit3 == ((500 + 300) >> 1, 2)
    assert list(state3[2]) == [500, 300]


class TestCodebookDriftStream:
    """Streaming count-codebook monitor == the batch information-
    theory queries on the same observations: entropy per group
    mirrors events_entropy_by_type, KL vs the corpus-mixture
    reference mirrors text_kl_source_drift — bit-exact after any
    prefix, with a replayed batch absorbed by the dedup horizon."""

    def _run(self, spark, tmp_path, batches, name, **kw):
        from jly_flink_spark.streaming.stateful import (
            codebook_drift_stream,
        )

        src = str(tmp_path / f"src_{name}")
        _write_json_files(src, batches)
        stream = (
            spark.readStream.schema(
                "grp string, bucket long, obs_id string, ts long"
            )
            .option("maxFilesPerTrigger", 1)
            .json(src)
            .withColumn("ets", (F.col("ts") / 1000).cast("timestamp"))
        )
        out = []
        q = (
            codebook_drift_stream(
                stream, "grp", "bucket", "obs_id", "ets", **kw
            )
            .writeStream.outputMode("update")
            .foreachBatch(lambda df, eid: out.extend(df.collect()))
            .option(
                "checkpointLocation", str(tmp_path / f"ckpt_{name}")
            )
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return out

    def test_entropy_matches_batch_query(self, spark, tmp_path):
        """events_entropy_by_type parity: stream the events corpus
        (identical bucketing expression), replay the middle batch —
        final per-type entropy equals the registry query."""
        import duckdb

        sf_dir = "/root/testdata/sf0.001"
        con = duckdb.connect()
        rows = con.execute(
            f"""
            SELECT event_type AS grp,
                   least(CAST(floor(value / 50.0) AS BIGINT), 9)
                     AS bucket,
                   CAST(event_id AS VARCHAR) AS obs_id,
                   CAST(epoch_ms(ts) AS BIGINT) AS ts
            FROM read_parquet('{sf_dir}/events.parquet')
            """
        ).fetchall()
        con.close()
        recs = [
            {"grp": r[0], "bucket": r[1], "obs_id": r[2], "ts": r[3]}
            for r in rows
        ]
        recs.sort(key=lambda r: (hash(r["obs_id"]) % 997))
        third = len(recs) // 3
        batches = [
            recs[:third],
            recs[third : 2 * third],
            recs[third : 2 * third],  # replayed wholesale
            recs[2 * third :],
        ]
        out = self._run(
            spark, tmp_path, batches, "entropy",
            n_buckets=10, dedup_delay="365 days",
        )
        last = {}
        for r in out:
            last[r["grp"]] = (
                r["n_obs"], r["n_buckets"], r["entropy_micro"],
            )

        from jly_flink_spark.plans import REGISTRY

        batch = {
            r["event_type"]: (
                r["n_events"], r["n_buckets"], r["entropy_micro"],
            )
            for r in REGISTRY["events_entropy_by_type"]
            .spark_fn(spark, sf_dir)
            .collect()
        }
        assert last == batch

    def test_kl_matches_batch_query(self, spark, tmp_path):
        """text_kl_source_drift parity: bucket the corpus tokens with
        the registry query's identical md5 expression, stream them
        per source with the corpus mixture as the reference codebook
        — final per-source KL equals the registry query."""
        from jly_flink_spark.io import load_table
        from jly_flink_spark.operators import text
        from jly_flink_spark.plans.northstar_queries import KL_BUCKETS

        sf_dir = "/root/testdata/sf0.001"
        docs = load_table(spark, sf_dir, "documents")
        occ = (
            docs.select(
                F.col("source").alias("grp"),
                F.explode(text.tokens(F.col("text"))).alias("tok"),
            )
            .select(
                "grp",
                (
                    F.conv(
                        F.substring(F.md5(F.col("tok")), 1, 14), 16, 10
                    )
                    .cast("bigint")
                    % KL_BUCKETS
                ).alias("bucket"),
            )
            .collect()
        )
        reference = [0] * KL_BUCKETS
        for r in occ:
            reference[r["bucket"]] += 1
        recs = [
            {
                "grp": r["grp"],
                "bucket": r["bucket"],
                "obs_id": str(i),
                "ts": 1_700_000_000_000 + i,
            }
            for i, r in enumerate(occ)
        ]
        half = len(recs) // 2
        batches = [recs[:half], recs[half:], recs[half:]]  # replay
        out = self._run(
            spark, tmp_path, batches, "kl",
            n_buckets=KL_BUCKETS, reference=reference,
            dedup_delay="365 days",
        )
        last = {}
        for r in out:
            last[r["grp"]] = (r["n_obs"], r["kl_micro"])

        from jly_flink_spark.plans import REGISTRY

        batch = {
            r["source"]: (r["n_tokens"], r["kl_micro"])
            for r in REGISTRY["text_kl_source_drift"]
            .spark_fn(spark, sf_dir)
            .collect()
        }
        assert last == batch

    def test_reference_support_violation_raises(self, spark, tmp_path):
        import pytest

        batches = [[
            {"grp": "a", "bucket": 1, "obs_id": "x",
             "ts": 1_700_000_000_000},
        ]]
        with pytest.raises(Exception, match="reference"):
            self._run(
                spark, tmp_path, batches, "viol",
                n_buckets=4, reference=[5, 0, 5, 5],
            )

    def test_measures_pure_edges(self):
        from jly_flink_spark.streaming.stateful import (
            codebook_measures,
        )

        assert codebook_measures([0, 0]) == (0, 0, 0, None)
        # single bucket: entropy exactly 0 (qln(n) - n*qln(n)//n)
        n, used, e, kl = codebook_measures([7, 0])
        assert (n, used, e) == (7, 1, 0)
        # uniform reference, uniform counts: KL == 0 exactly
        n, used, e, kl = codebook_measures([3, 3], [10, 10])
        assert kl == 0


class TestPatternQuantifiedStream:
    """Streaming bounded-tail run-algebra matcher == the batch
    events_pattern_quantified reduction on the same rows (every
    sf0.001 user fits the 256-tail, so the bounded-history caveat is
    inactive), under adversarial delivery."""

    def test_hand_fixture_run_counts(self):
        from jly_flink_spark.streaming.stateful import (
            pattern_count_runs,
        )

        m = {"v": "view", "c": "click", "p": "purchase"}
        cases = {
            "v v p p": (1, 2, 0),     # greedy v+ eats both views
            "v c c p": (0, 0, 0),     # click? admits at most one
            "v p v p": (2, 2, 0),
            "c p": (0, 0, 0),
            "v c p": (1, 1, 1),
            "v": (0, 0, 0),
            "v v v c p p": (1, 3, 1),
            "p v": (0, 0, 0),
            "v c v p": (1, 1, 0),     # 2nd view matches; 1st fails
        }
        for seq, want in cases.items():
            got = pattern_count_runs([m[c] for c in seq.split()])
            assert got == want, (seq, got, want)

    def test_stream_totals_match_batch_query(self, spark, tmp_path):
        """Cross-implementation check: the summed final per-user
        emits must equal the REGISTRY query's global rollup (Spark
        run-algebra plan vs the pure-Python tail fold), with a
        replayed batch and hash-shuffled delivery."""
        import duckdb

        from jly_flink_spark.streaming.stateful import (
            pattern_quantified_stream,
        )

        sf_dir = "/root/testdata/sf0.001"
        con = duckdb.connect()
        rows = con.execute(
            f"""
            SELECT user_id, CAST(epoch_ms(ts) AS BIGINT) AS ts_ms,
                   event_id, event_type
            FROM read_parquet('{sf_dir}/events.parquet')
            """
        ).fetchall()
        con.close()
        recs = [
            {
                "user_id": r[0],
                "ts_ms": r[1],
                "event_id": r[2],
                "event_type": r[3],
            }
            for r in rows
        ]
        recs.sort(key=lambda r: (r["event_id"] * 2654435761) % 2**32)
        third = len(recs) // 3
        batches = [
            recs[:third],
            recs[third : 2 * third],
            recs[third : 2 * third],  # replayed wholesale
            recs[2 * third :],
        ]
        src = str(tmp_path / "src_pat")
        _write_json_files(src, batches)
        stream = spark.readStream.schema(
            "user_id long, ts_ms long, event_id long, event_type string"
        ).option("maxFilesPerTrigger", 1).json(src)
        out = []
        q = (
            pattern_quantified_stream(stream)
            .writeStream.outputMode("update")
            .foreachBatch(lambda df, eid: out.extend(df.collect()))
            .option("checkpointLocation", str(tmp_path / "ckpt_pat"))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        last = {}
        for r in out:  # update mode: last emit per key wins
            last[r["user_id"]] = (r["n_matches"], r["n_views"])

        from jly_flink_spark.plans import REGISTRY

        [batch] = (
            REGISTRY["events_pattern_quantified"]
            .spark_fn(spark, sf_dir)
            .collect()
        )
        assert sum(v[0] for v in last.values()) == batch["n_matches"]
        assert (
            sum(v[1] for v in last.values())
            == batch["n_views_consumed"]
        )

    def test_schedules_converge_to_sorted_fold(self):
        """Delivery invariance: arbitrary duplicated/reordered batch
        schedules must land pattern_step's state on the sorted-tail
        fold of the full event set."""
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        from jly_flink_spark.streaming.stateful import (
            pattern_count_runs,
            pattern_step,
        )

        types = ("view", "click", "purchase")
        events = st.lists(
            st.tuples(st.integers(0, 5), st.integers(0, 2)),
            min_size=1,
            max_size=30,
        )
        schedule = st.lists(
            st.lists(st.integers(0, 29), max_size=12), max_size=6
        )

        @given(events=events, sched=schedule, tail=st.integers(2, 8))
        @settings(
            max_examples=200,
            deadline=None,
            suppress_health_check=[HealthCheck.too_slow],
        )
        def run(events, sched, tail):
            evs = [
                (ts, i, types[t]) for i, (ts, t) in enumerate(events)
            ]
            state = None
            for batch in sched:
                rows = [evs[j % len(evs)] for j in batch]
                state, _ = pattern_step(state, rows, tail)
            state, emit = pattern_step(state, evs, tail)
            ordered = [t for _, _, t in sorted(evs)][-tail:]
            want = pattern_count_runs(ordered)
            got = (
                emit[:3]
                if emit is not None
                else pattern_count_runs(list(state[2]))
            )
            assert got == want

        run()


class TestCusumStream:
    """Streaming CUSUM drift alarm == the batch
    events_changepoint_cusum query on the same data: the frozen
    reference mean comes from the batch derivation (the train/serve
    split), day-count tiles arrive split/late/replayed, and the final
    per-type emits must equal the batch query's rows exactly."""

    @staticmethod
    def _daily_tiles(sf_dir):
        import duckdb

        con = duckdb.connect()
        rows = con.execute(
            f"""
            SELECT event_type,
                   CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
                   CAST(count(*) AS BIGINT) AS n
            FROM read_parquet('{sf_dir}/events.parquet')
            GROUP BY event_type, day
            """
        ).fetchall()
        mus = con.execute(
            f"""
            SELECT event_type,
                   CAST(sum(n) * 1000000 // count(*) AS BIGINT)
            FROM (
              SELECT event_type,
                     CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
                     count(*) AS n
              FROM read_parquet('{sf_dir}/events.parquet')
              GROUP BY event_type, day
            ) GROUP BY event_type
            """
        ).fetchall()
        con.close()
        tiles = [
            {"event_type": r[0], "day": r[1], "n": r[2]} for r in rows
        ]
        return tiles, {r[0]: int(r[1]) for r in mus}

    def test_stream_matches_batch_query(self, spark, tmp_path):
        from jly_flink_spark.plans import REGISTRY
        from jly_flink_spark.streaming.stateful import cusum_stream

        sf_dir = "/root/testdata/sf0.001"
        tiles, mus = self._daily_tiles(sf_dir)
        # adversarial delivery: interleave types/days, deliver a
        # PARTIAL tile first (count 1) that the true tile later
        # overwrites (last-write-wins), and replay a whole batch
        tiles.sort(key=lambda r: (r["day"] * 2654435761) % 97)
        partials = [
            {**tiles[0], "n": 1},
            {**tiles[7], "n": 1},
        ]
        third = len(tiles) // 3
        batches = [
            partials,
            tiles[:third],
            tiles[third : 2 * third],
            tiles[third : 2 * third],  # replayed wholesale
            tiles[2 * third :],
        ]
        src = str(tmp_path / "cusum_src")
        _write_json_files(src, batches)
        stream = (
            spark.readStream.schema(
                "event_type string, day long, n long"
            )
            .option("maxFilesPerTrigger", 1)
            .json(src)
        )
        out = []
        q = (
            cusum_stream(stream, mus)
            .writeStream.outputMode("update")
            .foreachBatch(lambda df, eid: out.extend(df.collect()))
            .option("checkpointLocation", str(tmp_path / "cusum_ckpt"))
            .trigger(processingTime="0.2 seconds")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        last = {}
        for r in out:
            last[r.event_type] = (
                r.peak_micro,
                r.first_alarm_day,
                r.n_alarm_days,
                r.n_days,
            )
        batch = {
            r.event_type: (
                r.peak_micro,
                r.first_alarm_day,
                r.n_alarm_days,
                r.n_days,
            )
            for r in REGISTRY["events_changepoint_cusum"]
            .spark_fn(spark, sf_dir)
            .collect()
        }
        assert last == batch and last

    def test_step_is_schedule_invariant(self):
        """Any partition/order/duplication of the same final tiles
        converges to the same fold — the pure-step property."""
        import random

        from jly_flink_spark.streaming.stateful import (
            cusum_fold,
            cusum_step,
        )

        rng = random.Random(8)
        tiles = {d: rng.randrange(0, 6) for d in range(100, 130)}
        want = cusum_fold(tiles, 2_000_000, 250_000, 3_000_000)
        for trial in range(25):
            items = list(tiles.items())
            # stale partial writes first, then the true values in a
            # shuffled, duplicated, arbitrarily-chunked schedule
            sched = [(d, max(0, c - 1)) for d, c in items[:5]] + items
            rng.shuffle(sched)
            sched += sched[: rng.randrange(0, 8)]
            # true values must land last per day for LWW convergence:
            # re-append the final tiles in one closing batch
            state = None
            emit = None
            i = 0
            while i < len(sched):
                j = i + rng.randrange(1, 7)
                state, e = cusum_step(
                    state, sched[i:j], 2_000_000
                )
                if e is not None:
                    emit = e
                i = j
            state, e = cusum_step(state, items, 2_000_000)
            if e is not None:
                emit = e
            assert emit == want, trial
