"""Profile ONE registered query: run it end-to-end (noop sink) with
the Spark UI enabled, then dump every completed stage with its
task-time totals, shuffle volumes, and the repo call-sites from the
stage details — the map from probe stage numbers to code lines that
docs/SCALE_PROBE.md's histograms lack.

Run: python tools/profile_stages.py pipeline_streaming_admission \
        [--sf-dir /root/testdata/sf0.1] [--top 20]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.join(HERE, "tools"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--top", type=int, default=20)
    args = ap.parse_args()

    from scale_probe import _rest  # reuse the probe's REST helper

    from jly_flink_spark.plans import REGISTRY
    from jly_flink_spark.session import get_spark

    spark = get_spark(
        "profile_stages", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.setJobDescription(f"profile:{args.query}")

    import time

    t0 = time.perf_counter()
    df = REGISTRY[args.query].spark_fn(spark, args.sf_dir)
    df.write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    print(f"# {args.query} @ {args.sf_dir}: wall {wall:.2f}s\n")

    job_of = {}
    jobs = _rest(spark, "/jobs")
    for jb in jobs:
        for sid in jb.get("stageIds", []):
            job_of[sid] = jb["jobId"]
    print("# jobs:")
    for jb in sorted(jobs, key=lambda j: j["jobId"]):
        nm = (jb.get("description") or jb.get("name", ""))[:90]
        sids = sorted(jb.get("stageIds", []))
        print(f"#  job {jb['jobId']:>3}  stages={sids}  {nm}")
    print()

    rows = []
    for st in _rest(spark, "/stages?status=COMPLETE"):
        sid = st["stageId"]
        med = max_ms = 0.0
        try:
            ts = _rest(
                spark,
                f"/stages/{sid}/{st['attemptId']}/taskSummary",
            )
            med = ts["executorRunTime"][2]
            max_ms = ts["executorRunTime"][4]
        except Exception:  # noqa: BLE001 — summary may be evicted
            pass
        sites = []
        for ln in (st.get("details") or "").splitlines():
            if "jly_flink_spark" in ln or "plans/" in ln:
                m = re.search(r"([\w/]+\.py:\d+)", ln)
                if m and m.group(1) not in sites:
                    sites.append(m.group(1))
        rows.append(
            {
                "job": job_of.get(sid, -1),
                "id": sid,
                "tasks": st["numCompleteTasks"],
                "total_s": st["executorRunTime"] / 1000.0,
                "med_s": med / 1000.0,
                "max_s": max_ms / 1000.0,
                "rd_mb": st.get("shuffleReadBytes", 0) / 1e6,
                "wr_mb": st.get("shuffleWriteBytes", 0) / 1e6,
                "name": st.get("name", "")[:70],
                "sites": sites[:4],
            }
        )
    rows.sort(key=lambda r: -r["total_s"])
    tot = sum(r["total_s"] for r in rows)
    print(f"# {len(rows)} stages, {tot:.0f} task-seconds total")
    for r in rows[: args.top]:
        print(
            f"stage {r['id']:>5} job={r['job']:>3} tasks={r['tasks']:>3} "
            f"cpu={r['total_s']:7.1f}s med={r['med_s']:6.2f}s "
            f"max={r['max_s']:6.2f}s rd={r['rd_mb']:7.1f}MB "
            f"wr={r['wr_mb']:7.1f}MB  {r['name']}"
        )
        for s in r["sites"]:
            print(f"             {s}")


if __name__ == "__main__":
    main()
