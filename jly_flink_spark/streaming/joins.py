"""Stream-stream joins: event-time interval join with watermark-bound
state.

The reference job never joins two streams (it is a single-stream
archival pipeline — SURVEY.md scope finding), but a general engine
needs the operator family; this is the Structured Streaming native
form of the batch `join_asof_events` / `join_range_banded` queries.

Semantics: inner-join rows from two streams on equality keys where
the right event's time lies in `[left_ts + lower, left_ts + upper]`.
Spark derives state retention from BOTH watermarks plus the interval
bounds, so state is bounded: a left row can be dropped once the
right watermark passes `left_ts + upper`, and vice versa — no
unbounded buffering (the classic stream-join failure mode at scale).

At 100 TB-rates: the join shuffles both streams by the equality keys
(a time-range-only condition would force a broadcast-everything
plan); keep the watermark delay as tight as ingestion skew allows —
state size is proportional to rate × (delay + interval width).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    lower: str = "0 seconds",
    upper: str = "30 minutes",
    left_watermark: str = "10 minutes",
    right_watermark: str = "10 minutes",
) -> DataFrame:
    """Event-time interval join of two streaming frames.

    `on` — equality key columns present on both sides (the shuffle
    keys); `right_ts` must fall within
    `[left_ts + lower, left_ts + upper]` (negative `lower` like
    "-5 minutes" allows right events slightly before the left).
    Columns are prefixed l_/r_ to keep both sides' payloads without
    collision. Works identically on batch frames (the oracle path in
    tests): watermarks are a no-op there.
    """
    lw = left.withWatermark(left_ts, left_watermark)
    rw = right.withWatermark(right_ts, right_watermark)
    lsel = lw.select(
        *[F.col(k).alias(f"l_{k}") for k in on],
        *[
            F.col(c).alias(f"l_{c}")
            for c in left.columns
            if c not in on
        ],
    )
    rsel = rw.select(
        *[F.col(k).alias(f"r_{k}") for k in on],
        *[
            F.col(c).alias(f"r_{c}")
            for c in right.columns
            if c not in on
        ],
    )
    lts, rts = F.col(f"l_{left_ts}"), F.col(f"r_{right_ts}")
    cond: Column = (
        rts >= lts + F.expr(f"INTERVAL {lower.lstrip('+')}")
    ) & (rts <= lts + F.expr(f"INTERVAL {upper}"))
    for k in on:
        cond = cond & (F.col(f"l_{k}") == F.col(f"r_{k}"))
    return lsel.join(rsel, cond, "inner")
