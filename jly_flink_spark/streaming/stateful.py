"""Custom stateful streaming operators via applyInPandasWithState —
the Spark analog of Flink's KeyedProcessFunction + keyed state +
timers (a surface the reference never uses; its only state is the
sink buffer, SrSink.java:159-185).

Two operators:

- `first_seen_filter`: emit each key's first row exactly once across
  all micro-batches (state = a seen-marker per key). Generalizes the
  reference's Stream-Load label dedup (K4) from batch-level to
  row-level: replayed delete events archive once, no matter how often
  the source re-delivers them.
- `sessionize`: event-time session aggregation with a gap timeout,
  built on event-time timers + watermarks. Emits one row per closed
  session; sessions close when the watermark passes last_ts + gap.

State is kept per key, partitioned by the groupBy hash shuffle — at
cluster scale state shards across executors and lives in the state
store behind the checkpoint dir.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_FIRST_SEEN_STATE = "seen byte"


def first_seen_filter(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    payload_cols: list[str],
) -> DataFrame:
    """Streaming exactly-once-per-key filter: the first row (by
    ``ts_col``, then input order) for each ``key_col`` passes;
    every later duplicate — same batch or any later batch — drops.
    """
    out_schema = ", ".join(
        [f"{key_col} string", f"{ts_col} long"]
        + [f"{c} string" for c in payload_cols]
    )

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            return
        first = None
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            cand = pdf.sort_values(ts_col, kind="stable").iloc[:1]
            if first is None or cand[ts_col].iloc[0] < first[ts_col].iloc[0]:
                first = cand
        if first is not None:
            state.update((1,))
            yield first[[key_col, ts_col, *payload_cols]]

    return df.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=_FIRST_SEEN_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_SESSION_STATE = "start long, last long, n long, qsum long"


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    gap_seconds: int,
    watermark: str = "10 seconds",
    quant: int = 10_000,
) -> DataFrame:
    """Event-time sessionization: one output row per closed session
    `(key, session_start, session_end, n_events, q_sum)`.

    A session closes when the event-time watermark passes
    ``last_ts + gap`` (event-time timer), exactly like the batch
    `session_window()` semantics. ``q_sum`` is the quantized integer
    sum of ``value_col`` (floor(v*quant)), keeping stream and batch
    results bit-identical.
    """
    gap_ms = gap_seconds * 1000

    out_schema = (
        f"{key_col} long, session_start long, session_end long, "
        "n_events long, q_sum long"
    )

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            start, last, n, qsum = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    key_col: [key[0]],
                    "session_start": [start],
                    "session_end": [last],
                    "n_events": [n],
                    "q_sum": [qsum],
                }
            )
            return

        rows = pd.concat(list(pdfs), ignore_index=True)
        if len(rows) == 0:
            return
        ts_ms = (
            rows[ts_col].astype("int64") // 1_000_000
        )  # pandas datetime64[ns] → epoch ms
        import numpy as np

        qv = np.floor(rows[value_col].to_numpy() * quant).astype("int64")
        order = ts_ms.argsort(kind="stable").to_numpy()

        if state.exists:
            start, last, n, qsum = state.get
        else:
            start, last, n, qsum = None, None, 0, 0

        closed = []
        for i in order:
            t = int(ts_ms.iloc[i])
            v = int(qv[i])
            if start is None:
                start, last, n, qsum = t, t, 1, v
            elif t - last > gap_ms:
                closed.append((start, last, n, qsum))
                start, last, n, qsum = t, t, 1, v
            else:
                # Merge. A late-but-within-watermark event from a
                # later batch can have t < last (or even t < start);
                # min/max keeps the session interval monotone —
                # the end never moves backwards, the live session
                # never wrongly closes at an earlier time.
                start = min(start, t)
                last = max(last, t)
                n, qsum = n + 1, qsum + v
        state.update((start, last, n, qsum))
        # Clamp strictly above the current watermark:
        # setTimeoutTimestamp at/below the watermark is invalid when a
        # late event leaves last + gap behind the stream's progress.
        wm_ms = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(last + gap_ms, wm_ms + 1))
        if closed:
            yield pd.DataFrame(
                {
                    key_col: [key[0]] * len(closed),
                    "session_start": [c[0] for c in closed],
                    "session_end": [c[1] for c in closed],
                    "n_events": [c[2] for c in closed],
                    "q_sum": [c[3] for c in closed],
                }
            )

    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=_SESSION_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def dedup_within_watermark(
    sdf: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    delay: str = "10 minutes",
) -> DataFrame:
    """Streaming deduplication with bounded state:
    ``dropDuplicatesWithinWatermark`` keeps one row per key among all
    rows whose event times fall within the watermark delay of each
    other, and — unlike plain ``dropDuplicates`` on a stream — EVICTS
    key state once the watermark passes, so state size is bounded by
    the key arrival rate × delay instead of growing forever.

    This is the built-in answer to streaming exactly-once dedup when
    duplicates arrive close together (CDC redelivery, at-least-once
    sources); `first_seen_filter` above is the unbounded-state custom
    variant for keys that can reappear arbitrarily late.
    """
    return sdf.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
        keys
    )
