"""Snapshot `.explain("formatted")` for the queries touched in the
round-14 optimization pass, into plans/r14/<query>_{before,after}.txt.

"before" = the plan at the round-13 close (commit f66a9eb, checked
out under --root); "after" = the current tree.

Run:  python tools/snapshot_r14_plans.py after
      python tools/snapshot_r14_plans.py before --root /tmp/r13_close
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
    # wave 1: bitset verify tier + admission stage fusion
    "pipeline_streaming_admission",
    "pipeline_streaming_admission_v5",
    "pipeline_training_corpus_v2",
    "pipeline_training_corpus_v3",
    "pipeline_training_corpus_v4",
    "dedup_connected_components",
    "dedup_canonical_representatives",
    # wave 2: chunk-graph builder dedup + fan-out (8 builders)
    "graph_pagerank_dup_chunks",
    "graph_triangles_dup_chunks",
    "graph_bfs_reachability",
    "graph_clustering_coeff_buckets",
    "graph_adamic_adar_topk",
    "graph_degree_assortativity",
    "graph_degree_distribution",
    "graph_kcore_peel",
    "graph_link_prediction_topk",
    "graph_jaccard_linkpred_topk",
    # wave 3: Arrow kernels for K-means/PQ assignment + int8 quantize
    "embedding_kmeans_clusters",
    "dedup_semantic_clusters",
    "pipeline_embedding_curation",
    "embedding_silhouette_by_cluster",
    "embedding_pq_adc",
    "ann_ivf_pq_refine",
    "ann_ivf_pq_residual",
]

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

    out_dir = os.path.join(here, "plans", "r14")
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("snapshot_r14_plans")
    spark.sparkContext.setLogLevel("ERROR")

    for name in TOUCHED:
        path = os.path.join(out_dir, f"{name}_{args.side}.txt")
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
