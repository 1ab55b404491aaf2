"""Scale probe: run the heavy corpus operators one decade above the
bench gate (sf0.1 × FACTOR replication ≈ sf1) and verify the scale
design empirically, not just by plan inspection:

- wall-time per query (single run — this is a probe, not the gate)
- per-stage task-time quantiles from the Spark UI REST API; flag any
  stage whose max task time exceeds 4× its median (straggler = skew
  the AQE/salting/bucket-cap story failed to absorb)
- shuffle read/write volumes per stage (does the shuffle grow ~linear
  with the corpus, or super-linear = a blow-up)

Corpus construction (never writes to /root/testdata):

- documents ×FACTOR with REPLICA-TAGGED tokens (`tok` → `tok_k`):
  plain replication would make every doc a 10-way exact duplicate and
  inflate LSH candidate pairs ~C(10,2)× per group — a dup-structure
  no real sf1 corpus has. Tagging keeps each replica's INTERNAL
  near-dup structure identical to sf0.1 while replicas stay disjoint,
  so candidate volume scales ~linearly, which is the honest scaling
  shape for dedup_minhash_candidates.
- embeddings ×FACTOR with a deterministic per-replica rotation of the
  vector (circular shift by k): preserves norms and the intra-replica
  cosine structure, keeps replicas from being trivial duplicates.
  Blocked all-pairs / IVF costs are structure-light anyway — they
  scale with n, which is the point.
- orders + lineitem ×FACTOR with per-replica o_orderkey/l_orderkey
  offsets (FK between them intact) and custkey/partkey/suppkey
  UNCHANGED — facts grow a decade while dimensions stay, the standard
  warehouse shape, so dim joins stay broadcastable and per-customer
  window partitions get 10× deeper (a real stress for range frames).
- events ×FACTOR with per-replica event_id AND user_id offsets: the
  user universe grows 10× while each user's event stream keeps its
  sf0.1 shape — the honest growth for per-user as-of joins and
  sessionization (offsetting only event_id would instead give every
  user 10 interleaved copies of the same timestamps). The CDC
  pipeline queries synthesize their envelopes from events, so they
  scale with it.
- remaining tables (dims) symlinked from the source sf dir.

Usage:
    python -m tools.scale_probe [--factor 10] [--keep-corpus] [--full]

--full probes the ENTIRE bench headline set (one decade ratio per
benched query, TPC-H joins/windows included) instead of the default
heavy-corpus-operator list. Writes docs/SCALE_PROBE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time
import urllib.request

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

SRC_SF = "/root/testdata/sf0.1"
QUERIES = [
    "dedup_exact_corpus",
    "dedup_minhash_candidates",
    "dedup_simhash_hamming",
    "dedup_embedding_cosine",
    "ann_cosine_ivf",
    # the two bench entries that trade sf0.1 fixed overhead for scale
    # architecture — their decade ratio is the evidence the trade won
    "batch_by_token_budget",
    # round-4 additions with corpus-heavy plans: the chunk self-join
    # graph + 3 unrolled shuffle iterations, and the chunk-df join
    "graph_pagerank_dup_chunks",
    "curation_dup_chunk_fraction",
    # int8 ADC serving: brute-force scan shape over quantized codes
    "ann_cosine_int8_adc",
    # round-5 iterative ML: multi-pass scans of checkpointed slim
    # tables (epochs/rounds) — decade ratio shows whether the
    # fixed per-pass orchestration stays amortized as data grows
    "quality_classifier_train",
    "embedding_kmeans_clusters",
    # round-5 third wave: cluster-bucketed near-dup (per-cluster
    # pair work must stay flat as the corpus grows), the Bloom
    # probe scan, and the vocabulary-table merge rounds (corpus
    # touched once; rounds must be corpus-size-independent)
    "dedup_semantic_clusters",
    "contamination_bloom_prefilter",
    "bpe_train_merges",
    "graph_triangles_dup_chunks",
]
STRAGGLER_RATIO = 4.0
MIN_TASKS = 8          # quantiles are noise below this
MIN_MEDIAN_MS = 500    # sub-second tasks: scheduler jitter dominates


def build_corpus(out_dir: str, factor: int) -> None:
    import numpy as np
    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)
    # symlinks FIRST, embeddings LAST: main() uses embeddings.parquet
    # as the build-complete marker, so an interrupted build (missing
    # symlinks/documents) is rebuilt, never resumed half-made
    for t in "region nation customer supplier part".split():
        dst = os.path.join(out_dir, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(SRC_SF, f"{t}.parquet"), dst)

    def replicate(
        table: str,
        offset_cols: list[str],
        spans: dict[str, int] | None = None,
    ) -> dict[str, int]:
        """×factor replication with per-replica offsets on the given
        key columns (span = max+1, so replicas are disjoint); pass
        `spans` to shift an FK by the SAME span as its parent key.
        Replica 0 stays byte-identical. Returns the spans used."""
        t = pd.read_parquet(os.path.join(SRC_SF, f"{table}.parquet"))
        if spans is None:
            spans = {c: int(t[c].max()) + 1 for c in offset_cols}
        parts = []
        for k in range(factor):
            rep = t.copy()
            for c in offset_cols:
                rep[c] = rep[c] + k * spans[c]
            parts.append(rep)
        pd.concat(parts, ignore_index=True).to_parquet(
            os.path.join(out_dir, f"{table}.parquet")
        )
        return spans

    # facts grow, dims don't: lineitem's FK shifts by ORDERS' span
    # (deriving it from max(l_orderkey) would silently corrupt the FK
    # whenever the highest-keyed order has no lineitems);
    # cust/part/supp keys untouched; events offset user_id too so the
    # user universe grows instead of stacking copies per user
    o_spans = replicate("orders", ["o_orderkey"])
    replicate(
        "lineitem",
        ["l_orderkey"],
        spans={"l_orderkey": o_spans["o_orderkey"]},
    )
    replicate("events", ["event_id", "user_id"])

    docs = pd.read_parquet(os.path.join(SRC_SF, "documents.parquet"))
    n_docs = len(docs)
    doc_parts = []
    for k in range(factor):
        rep = docs.copy()
        rep["doc_id"] = rep["doc_id"] + k * n_docs
        if k > 0:  # replica 0 stays byte-identical to sf0.1
            tag = f"_{k}"
            rep["text"] = [
                " ".join(t + tag for t in txt.split())
                for txt in rep["text"]
            ]
            rep["n_chars"] = rep["text"].str.len()
        doc_parts.append(rep)
    pd.concat(doc_parts, ignore_index=True).to_parquet(
        os.path.join(out_dir, "documents.parquet")
    )

    emb = pd.read_parquet(os.path.join(SRC_SF, "embeddings.parquet"))
    n_emb = len(emb)
    emb_parts = []
    for k in range(factor):
        rep = emb.copy()
        rep["vec_id"] = rep["vec_id"] + k * n_emb
        if k > 0:
            rep["embedding"] = [
                np.roll(np.asarray(v, dtype="float32"), k).tolist()
                for v in rep["embedding"]
            ]
        emb_parts.append(rep)
    pd.concat(emb_parts, ignore_index=True).to_parquet(
        os.path.join(out_dir, "embeddings.parquet")
    )


def _rest(spark, path: str):
    port = spark.sparkContext.uiWebUrl.rsplit(":", 1)[1]
    app = spark.sparkContext.applicationId
    url = f"http://localhost:{port}/api/v1/applications/{app}{path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read().decode("utf-8"))


def stage_report(
    spark, after_stage: int
) -> tuple[list[dict], int]:
    """(report, max_stage_seen): completed stages newer than
    `after_stage` with task-time quantiles (REST taskSummary) and
    shuffle volumes. max_stage_seen covers EVERY listed stage — also
    small and taskSummary-failed ones — so the caller's watermark
    always advances past this run and a skipped stage can never be
    misattributed to the next query's report."""
    out = []
    max_seen = after_stage
    for st in _rest(spark, "/stages?status=COMPLETE"):
        sid = st["stageId"]
        if sid <= after_stage:
            continue
        max_seen = max(max_seen, sid)
        if st["numCompleteTasks"] < MIN_TASKS:
            continue
        try:
            summ = _rest(
                spark,
                f"/stages/{sid}/{st['attemptId']}/taskSummary"
                "?quantiles=0.5,1.0",
            )
            med_ms, max_ms = summ["executorRunTime"]
        except Exception:
            continue
        out.append(
            {
                "stage": sid,
                "tasks": st["numCompleteTasks"],
                "median_task_ms": med_ms,
                "max_task_ms": max_ms,
                "shuffle_read_mb": st["shuffleReadBytes"] / 2**20,
                "shuffle_write_mb": st["shuffleWriteBytes"] / 2**20,
                "straggler": (
                    med_ms >= MIN_MEDIAN_MS
                    and max_ms > STRAGGLER_RATIO * med_ms
                ),
            }
        )
    return out, max_seen


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--out-dir", default="/tmp/jly_scale_probe")
    ap.add_argument("--keep-corpus", action="store_true")
    ap.add_argument(
        "--full",
        action="store_true",
        help="probe the whole bench headline set (TPC-H joins/"
        "windows/CDC included), not just the heavy corpus operators",
    )
    args = ap.parse_args()

    global QUERIES
    if args.full:
        from bench import HEADLINE

        # the whole bench headline set (order-preserving dedup: the
        # default probe list and HEADLINE overlap)
        QUERIES = list(dict.fromkeys(HEADLINE))

    corpus = os.path.join(args.out_dir, f"x{args.factor}")
    if not os.path.exists(os.path.join(corpus, "embeddings.parquet")):
        t0 = time.time()
        build_corpus(corpus, args.factor)
        print(f"corpus built in {time.time() - t0:.1f}s → {corpus}")

    from jly_flink_spark.plans import REGISTRY
    from jly_flink_spark.session import get_spark

    spark = get_spark(
        "scale_probe", extra_conf={"spark.ui.enabled": "true"}
    )
    def run(name: str, sf_dir: str) -> float:
        t0 = time.time()
        df = REGISTRY[name].spark_fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    # warm the JVM/codegen once so neither measurement eats the
    # first-query compilation cost
    run(QUERIES[0], SRC_SF)

    results = {}
    last_stage = -1
    for name in QUERIES:
        # same-session sf0.1 reference, measured back-to-back with the
        # scaled run — the cleanest apples-to-apples ratio available
        ref_wall = run(name, SRC_SF)
        _, last_stage = stage_report(spark, last_stage)
        wall = run(name, corpus)
        stages, last_stage = stage_report(spark, last_stage)
        results[name] = {
            "wall_s": round(wall, 2),
            "ref_wall_s": round(ref_wall, 2),
            "stages": stages,
        }
        worst = max(
            (s["max_task_ms"] / max(s["median_task_ms"], 1) for s in stages),
            default=0,
        )
        print(
            f"{name}: {wall:.2f}s ({wall / ref_wall:.1f}x of sf0.1's "
            f"{ref_wall:.2f}s), {len(stages)} stages≥{MIN_TASKS}t, "
            f"worst max/median {worst:.1f}x, "
            f"stragglers {sum(s['straggler'] for s in stages)}"
        )

    report = os.path.join(HERE, "docs", "SCALE_PROBE.md")
    with open(report, "w", encoding="utf-8") as f:
        probed = (
            "the FULL bench headline set (TPC-H joins/windows/CDC "
            "included; --full)"
            if args.full
            else "the heavy corpus operators"
        )
        f.write(
            f"# Scale probe — sf0.1 × {args.factor} (≈ sf1)\n\n"
            f"Single-run wall times for {probed} one\n"
            "decade above the bench gate, with per-stage task-time\n"
            "quantiles from the Spark UI REST API. Generated by\n"
            "`python -m tools.scale_probe`; corpus construction is\n"
            "described in that module's docstring (replica-tagged\n"
            "tokens / rotated vectors so duplicate structure stays\n"
            f"sf0.1-shaped). Straggler = max task > {STRAGGLER_RATIO}×\n"
            f"median in any stage with ≥{MIN_TASKS} tasks and median ≥\n"
            f"{MIN_MEDIAN_MS} ms. sf0.1 reference walls are measured\n"
            "in the SAME session back-to-back with the scaled run;\n"
            f"ratio ≤ {args.factor}x on a {args.factor}x corpus means"
            " the operator scaled at-most-linearly this decade.\n\n"
            f"| query | wall (s) | sf0.1 wall (s) | ratio |"
            " worst max/median task | stragglers |"
            " peak stage shuffle (MB w) |\n"
            "|---|---|---|---|---|---|---|\n"
        )
        for name, r in results.items():
            worst = max(
                (
                    s["max_task_ms"] / max(s["median_task_ms"], 1)
                    for s in r["stages"]
                ),
                default=0,
            )
            n_strag = sum(s["straggler"] for s in r["stages"])
            peak_w = max(
                (s["shuffle_write_mb"] for s in r["stages"]), default=0
            )
            ref = r["ref_wall_s"]
            ref_s = f"{ref:.2f}"
            ratio = f"{r['wall_s'] / ref:.1f}x"
            f.write(
                f"| {name} | {r['wall_s']} | {ref_s} | {ratio} |"
                f" {worst:.1f}x | {n_strag} | {peak_w:.1f} |\n"
            )
        f.write("\nRaw per-stage detail:\n\n```json\n")
        json.dump(results, f, indent=1)
        f.write("\n```\n")
    print(f"wrote {report}")

    if not args.keep_corpus:
        shutil.rmtree(args.out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
