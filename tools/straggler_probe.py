"""One-query straggler NAMER: run a registered query on the 10x
corpus and print every completed stage with its REST `name` and
callsite `details` head, task quantiles, and shuffle volumes — the
diagnostic the round-10 probe lacked (it recorded stage IDs only, so
the admission gate's one straggler stage could not be attributed to
an operator line). Usage:

    python -m tools.straggler_probe pipeline_streaming_admission \
        [--corpus /tmp/x10/x10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from tools.scale_probe import _rest  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("--corpus", default="/tmp/x10/x10")
    ap.add_argument("--min-tasks", type=int, default=8)
    args = ap.parse_args()

    from jly_flink_spark.plans import REGISTRY
    from jly_flink_spark.session import get_spark

    spark = get_spark(
        "straggler_probe", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    import time

    t0 = time.time()
    df = REGISTRY[args.query].spark_fn(spark, args.corpus)
    df.write.format("noop").mode("overwrite").save()
    wall = time.time() - t0

    rows = []
    for st in _rest(spark, "/stages?status=COMPLETE"):
        if st["numCompleteTasks"] < args.min_tasks:
            continue
        sid = st["stageId"]
        try:
            summ = _rest(
                spark,
                f"/stages/{sid}/{st['attemptId']}/taskSummary"
                "?quantiles=0.5,1.0",
            )
            med_ms, max_ms = summ["executorRunTime"]
        except Exception:
            continue
        rows.append(
            {
                "stage": sid,
                "name": st.get("name", ""),
                "details_head": (st.get("details") or "").split("\n")[
                    0
                ][:200],
                "tasks": st["numCompleteTasks"],
                "median_ms": med_ms,
                "max_ms": max_ms,
                "skew": round(max_ms / med_ms, 1) if med_ms else None,
                "sh_read_mb": round(st["shuffleReadBytes"] / 2**20, 1),
                "sh_write_mb": round(
                    st["shuffleWriteBytes"] / 2**20, 1
                ),
            }
        )
    rows.sort(key=lambda r: r["stage"])
    print(f"wall: {wall:.1f}s  stages>={args.min_tasks} tasks: {len(rows)}")
    for r in rows:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
