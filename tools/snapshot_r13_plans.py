"""Snapshot `.explain("formatted")` for the queries touched in the
round-13 optimization pass, into plans/r13/<query>_{before,after}.txt.

"before" = the plan at the round-12 close (commit 3101e2c, checked
out under --before-root); "after" = the current tree. New queries
registered this round have no "before" (a note file is written).

Run:  python tools/snapshot_r13_plans.py after
      python tools/snapshot_r13_plans.py before --root /tmp/r12_close
(the two halves run as separate processes so each side imports its
own jly_flink_spark).
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import re
import sys

TOUCHED = [
    # first perf wave (int8 quantize Arrow kernel + fan-out)
    "ann_cosine_int8_adc",
    "ann_mmr_rerank",
    # gopher re-shape (tokenize-once + literal-n gram arrays + stack)
    "curation_gopher_repetition",
    # staged-total fixes (corpus scan ran twice)
    "mixture_temperature_weights",
    "training_shard_assignment",
    # second perf wave (raw-text fan-out + explode_outer traps)
    "dedup_substring_spans",
    "dedup_ppjoin_pairs",
    "curation_dup_chunk_fraction",
    # packed-sum guard (advice item; plan gains one guard projection)
    "graph_adamic_adar_topk",
    # third perf wave (cross-action recompute cuts: staged losers2 /
    # verify token arrays / shared tokenize in the dedup chain)
    "pipeline_streaming_admission",
    "pipeline_streaming_admission_v5",
    "pipeline_training_corpus_v3",
    "dedup_canonical_representatives",
    "dedup_connected_components",
    # new this round — after only
    "dedup_url_canonicalize",
    "contamination_benchmark_report",
    "pipeline_web_ingest",
]
NEW_IN_R13 = {
    "dedup_url_canonicalize",
    "contamination_benchmark_report",
    "pipeline_web_ingest",
}

SF_DIR = "/root/testdata/sf0.001"


def plan_of(registry, spark, name: str) -> str:
    df = registry[name].spark_fn(spark, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    text = buf.getvalue()
    text = re.sub(r"#\d+", "#N", text)
    text = re.sub(r"plan_id=\d+", "plan_id=N", text)
    text = re.sub(r"\[id=#?N?\d*\]", "", text)
    return text.rstrip() + "\n"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("side", choices=["before", "after"])
    ap.add_argument("--root", default=None, help="source tree root")
    args = ap.parse_args()

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    root = args.root or here
    sys.path.insert(0, root)

    from jly_flink_spark.plans import REGISTRY  # noqa: E402
    from jly_flink_spark.session import get_spark  # noqa: E402

    out_dir = os.path.join(here, "plans", "r13")
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("snapshot_r13_plans")
    spark.sparkContext.setLogLevel("ERROR")

    for name in TOUCHED:
        path = os.path.join(out_dir, f"{name}_{args.side}.txt")
        if args.side == "before" and name in NEW_IN_R13:
            with open(path, "w", encoding="utf-8") as f:
                f.write(
                    f"{name}: registered new in round 13 — "
                    "no pre-round plan exists.\n"
                )
            print(f"{name}: new in r13 (note written)")
            continue
        if name not in REGISTRY:
            print(f"{name}: NOT IN REGISTRY at this tree, skipped")
            continue
        try:
            text = plan_of(REGISTRY, spark, name)
        except Exception as e:  # noqa: BLE001
            text = f"ERROR building plan: {e!r}\n"
        with open(path, "w", encoding="utf-8") as f:
            f.write(text)
        print(f"{name}: wrote {path}")


if __name__ == "__main__":
    main()
