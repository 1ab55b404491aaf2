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
    # round-6: the flagship pipeline with the learned gate (dedup
    # chain + GD epochs + broadcast gating composed in one plan) and
    # the KMV sketch set algebra — benched r6, so probed here per the
    # bench/baseline/probe lock convention
    "pipeline_training_corpus_v2",
    "agg_kmv_source_overlap",
    # round-7 heavies: the df-capped winnowing pair join (candidate
    # volume grows with duplication density), joint-subspace PQ
    # training + ADC (iterative corpus passes), and the basket-local
    # co-occurrence pair space
    "dedup_winnow_pairs",
    "embedding_pq_adc",
    "orders_item_neighbors_topk",
    # round-8 heavies: residual IVF-PQ (trains residual codebooks +
    # builds the pruned layout per corpus), the degree-weighted wedge
    # join (candidate volume grows with duplication density), the
    # Apriori candidate space (frequent-pair joins), and the
    # user-keyed banded attribution join (touch volume grows with
    # per-user activity density)
    "ann_ivf_pq_residual",
    "graph_adamic_adar_topk",
    "itemsets_apriori_triples",
    "events_attribution_linear",
    # round-9: exact substring dedup — shingle volume is corpus
    # tokens and duplicated-run volume grows with duplication
    # density, the classic superlinear risk for an ExactSubstr pass
    "dedup_substring_spans",
    # round-9: pixel-tier banding (pair volume grows with image
    # duplication density), the iterative bipartite HITS scorer, and
    # the six-stage curation pipeline (v2 + retention gate + source
    # cap — the per-source window is the new scaled axis)
    "multimodal_phash_near_dups",
    "graph_hits_authorities",
    "pipeline_training_corpus_v3",
    # round-10: the audio-tier banding (PCM planting is 448 samples
    # per doc — the widest per-row media kernel — and pair volume
    # grows with duplication density) and the streaming admission
    # gate's batch equivalent (the v3 chain + the image stage, the
    # per-epoch policy every foreachBatch runs)
    "multimodal_audio_near_dups",
    "pipeline_streaming_admission",
    # round-10 second wave: the KN trigram scorer (type-table volume
    # grows with distinct trigrams — five rollups + the cost join
    # back to corpus instances must stay linear), WordPiece training
    # (two shuffles per round over the vocabulary table, which must
    # stay corpus-size-independent), and the recursive-CTE BFS (per-
    # level frontier joins against the duplication graph — frontier
    # volume grows with duplication density)
    "text_trigram_kn_perplexity",
    "wordpiece_train_merges",
    "graph_bfs_reachability",
    # round-10 second wave (cont.): exact-threshold PPJoin — prefix-
    # bucket candidate volume grows with duplication density, the
    # classic superlinear risk the rare-first order must bound
    "dedup_ppjoin_pairs",
    # round-10 third wave: the video tier (16 frame-hash rows per
    # clip; temporally-aligned pair volume grows with duplication
    # density)
    "multimodal_video_near_dups",
    # round-11: the v5 admission gate (ALL THREE media tiers + the
    # KN σ-gate per epoch — the heaviest composed plan in the repo)
    # and the DoReMi step (two LM cost-table trainings in one plan;
    # trigram-type volume is the scaled axis)
    "pipeline_streaming_admission_v5",
    "mixture_doremi_weights",
    # round-12 additions (the r11 newcomers, verdict task 8): ANN
    # serving-quality evals run BOTH the pruned and exact chains —
    # the exact side must stay the bounded query-batch shape as the
    # corpus grows; the minhash estimate error is per-LSH-candidate
    # (candidate volume grows with duplication density); Heaps fit
    # is one token aggregation + a log-N checkpoint rollup;
    # readability is a pure per-doc scan rollup; curriculum order is
    # the sharded global rank over the whole admitted corpus
    "ann_recall_at_k",
    "ann_hard_negatives",
    "dedup_minhash_estimate_error",
    "text_heaps_fit",
    "text_readability_scores",
    "training_curriculum_order",
    # round-13 additions (the r12 newcomers, verdict task 1, plus
    # this round's two): the MMR re-rank runs the int8 serving tier
    # + a bounded greedy; the mixture/shard audits are one corpus
    # aggregation each (the staged-total fix is what the row
    # certifies); the Gopher suite explodes five n-gram families off
    # one fanned scan (the exact shape that hid a 2-task 79 s pole
    # in r12); URL canonicalization is scan-local string algebra;
    # the decontamination report probes the corpus against a
    # broadcast multi-benchmark shingle index
    "ann_mmr_rerank",
    "mixture_temperature_weights",
    "training_shard_assignment",
    "curation_gopher_repetition",
    "dedup_url_canonicalize",
    "contamination_benchmark_report",
    # the composed ingest funnel: two keep-first windows + three
    # host rollups, every exchanged row slim (text never shuffles)
    "pipeline_web_ingest",
]
STRAGGLER_RATIO = 4.0
MIN_TASKS = 8          # quantiles are noise below this
MIN_MEDIAN_MS = 500    # sub-second tasks: scheduler jitter dominates
# Stages whose MEDIAN task is tens of ms are pure scheduler jitter —
# a 15 ms median vs a 90 ms max prints as "6x skew" while describing
# nothing (the r8 verdict chased two such phantoms). The reported
# worst max/median only considers stages doing real per-task work;
# the straggler FLAG keeps its stricter MIN_MEDIAN_MS bar.
WORST_MIN_MEDIAN_MS = 100


def worst_ratio(stages: list[dict]) -> float:
    return max(
        (
            s["max_task_ms"] / s["median_task_ms"]
            for s in stages
            if s["median_task_ms"] >= WORST_MIN_MEDIAN_MS
        ),
        default=0.0,
    )

# --dims probe list: queries whose REDUCTION is dimension-sized
# (|customers|, |parts|, |suppliers|, |docs|). The default corpus
# grows facts with UNCHANGED dim keys (by design — dims stay
# broadcastable), which makes a single-task stage over a dim-sized
# frame structurally INVISIBLE to the decade ratio (the r6-verdict
# blind spot: the scale-broken RFM/ABC global windows probed
# 1.0–1.2×). The dims corpus grows customer/part/supplier ×factor
# (new keys; each fact replica re-points to its own dim replica) so
# a dim-sized single-task stage now shows up as a superlinear row.
DIM_QUERIES = [
    "customer_survival_km",         # per-customer spells -> KM fold
    "customer_rfm_segments",        # ntile over |customers|
    "lineitem_abc_classes",         # running sum over |parts|
    "text_vocab_growth",            # row_number over |docs|
    "window_rank_dense",            # rank/dense_rank over |suppliers|
    "pareto_front_parts",           # brand staircase over |parts|
    "tpch_q10_returned_items",      # |customers|-sized join output
    "supplier_nation_hhi",          # per-supplier revenue reduction
]


# Parquet row-group cap for the probe corpus. pandas/pyarrow's
# default writes one near-file-sized row group per single-file
# table; Spark's byte-range file splits then degenerate (only the
# task holding a row-group START reads anything), which the r8
# probe surfaced as a fake 35x max/median "skew" on every scan
# stage (26 tasks, one doing all the IO). A production corpus is
# many ~128MB files; bounding the row group restores that
# many-splits shape so the probe measures the PLAN, not a
# single-file fixture artifact.
PROBE_ROW_GROUP = 131_072


def build_corpus(
    out_dir: str, factor: int, scale_dims: bool = False
) -> None:
    """×factor corpus for the decade probe. Default: facts grow,
    dims are symlinked 1× (keys unchanged — dims stay broadcastable,
    the realistic shape for most fact-side operators). With
    ``scale_dims``, customer/part/supplier ALSO grow ×factor with
    NEW keys and each fact replica re-points its FKs to its own dim
    replica (per-dim-row fact distribution preserved) — the corpus
    that makes dim-sized reductions (RFM, ABC, rank-over-suppliers)
    actually grow, closing the probe blind spot where a single-task
    stage over a dim-sized frame reads as 1.0×."""
    import numpy as np
    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)
    # symlinks FIRST, embeddings LAST: main() uses embeddings.parquet
    # as the build-complete marker, so an interrupted build (missing
    # symlinks/documents) is rebuilt, never resumed half-made
    small_dims = (
        "region nation"
        if scale_dims
        else "region nation customer supplier part"
    )
    for t in small_dims.split():
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
        `spans` to shift an FK by the SAME span as its parent key
        (a None entry falls back to the column's own max+1).
        Replica 0 stays byte-identical. Returns the spans used."""
        t = pd.read_parquet(os.path.join(SRC_SF, f"{table}.parquet"))
        spans = {
            c: (
                (spans or {}).get(c)
                if (spans or {}).get(c) is not None
                else int(t[c].max()) + 1
            )
            for c in offset_cols
        }
        parts = []
        for k in range(factor):
            rep = t.copy()
            for c in offset_cols:
                rep[c] = rep[c] + k * spans[c]
            parts.append(rep)
        pd.concat(parts, ignore_index=True).to_parquet(
            os.path.join(out_dir, f"{table}.parquet"),
            row_group_size=PROBE_ROW_GROUP,
        )
        return spans

    if scale_dims:
        # dims grow too: replica k of every fact row points at
        # replica k of its dim rows, so per-customer order counts,
        # per-part revenue shares etc. keep their 1× distribution
        # while the dim universes grow ×factor
        c_spans = replicate("customer", ["c_custkey"])
        p_spans = replicate("part", ["p_partkey"])
        s_spans = replicate("supplier", ["s_suppkey"])
        o_spans = replicate(
            "orders",
            ["o_orderkey", "o_custkey"],
            spans={
                "o_orderkey": None,
                "o_custkey": c_spans["c_custkey"],
            },
        )
        replicate(
            "lineitem",
            ["l_orderkey", "l_partkey", "l_suppkey"],
            spans={
                "l_orderkey": o_spans["o_orderkey"],
                "l_partkey": p_spans["p_partkey"],
                "l_suppkey": s_spans["s_suppkey"],
            },
        )
        replicate("events", ["event_id", "user_id"])
    else:
        # facts grow, dims don't: lineitem's FK shifts by ORDERS'
        # span (deriving it from max(l_orderkey) would silently
        # corrupt the FK whenever the highest-keyed order has no
        # lineitems); cust/part/supp keys untouched; events offset
        # user_id too so the user universe grows instead of stacking
        # copies per user
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
        os.path.join(out_dir, "documents.parquet"),
        row_group_size=PROBE_ROW_GROUP,
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
        os.path.join(out_dir, "embeddings.parquet"),
        row_group_size=PROBE_ROW_GROUP,
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


# ---------------------------------------------------------------------
# Streaming probe (--streaming): the stateful/stream operators at 1x
# vs FACTORx source volume, with per-epoch batch durations and state
# sizes from StreamingQueryProgress — the measured decade the batch
# table above has had since round 3.
# ---------------------------------------------------------------------
N_SOURCE_FILES = 20            # chunk files per source at 1x
FILES_PER_TRIGGER = 2          # → ~10 micro-batches per run


def _drive_stream(build_writer, checkpoint: str) -> dict:
    """Start the stream, drain it, and fold its progress history into
    {epochs, input_rows, batch_ms median/max, state rows/bytes}."""
    q = build_writer(checkpoint).start()
    t0 = time.time()
    try:
        q.processAllAvailable()
    finally:
        wall = time.time() - t0
        progress = list(q.recentProgress)
        q.stop()
    durs, rows, srows, sbytes = [], 0, [], []
    for p in progress:
        if isinstance(p, str):
            p = json.loads(p)
        if p.get("numInputRows", 0) == 0 and not p.get("stateOperators"):
            continue
        durs.append(p.get("durationMs", {}).get("triggerExecution", 0))
        rows += p.get("numInputRows", 0)
        for op in p.get("stateOperators", []):
            srows.append(op.get("numRowsTotal", 0))
            sbytes.append(op.get("memoryUsedBytes", 0))
    durs.sort()
    return {
        "wall_s": round(wall, 2),
        "epochs": len(durs),
        "input_rows": rows,
        "batch_ms_p50": durs[len(durs) // 2] if durs else 0,
        "batch_ms_max": durs[-1] if durs else 0,
        "state_rows_final": srows[-1] if srows else None,
        "state_rows_max": max(srows) if srows else None,
        "state_mb_max": (
            round(max(sbytes) / 2**20, 2) if sbytes else None
        ),
    }


def _prep_event_files(spark, sf_dir: str, out: str, n_files: int):
    """Chunked parquet of the slim event projection the stateful
    operators consume: ms timestamps, md5 hash, 1e4-quantized value —
    the same derivations the batch twins use."""
    from pyspark.sql import functions as F

    from jly_flink_spark.io import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        (F.unix_micros("ts") / 1000).cast("long").alias("ts_ms"),
        F.conv(
            F.substring(F.md5(F.col("event_id").cast("string")), 1, 14),
            16,
            10,
        )
        .cast("bigint")
        .alias("h"),
        F.floor(F.col("value") * 10_000).cast("bigint").alias("qv"),
    )
    ev.repartition(n_files).write.mode("overwrite").parquet(out)
    return ev.schema


def _stream_scenarios(spark, sf_dir: str, work: str, n_files: int):
    """{name: writer-builder} over sources prepared under `work`."""
    from pyspark.sql import functions as F

    from jly_flink_spark.io import load_table
    from jly_flink_spark.operators import dedup
    from jly_flink_spark.streaming.stateful import (
        codebook_drift_stream,
        ewma_stream,
        kmv_distinct_stream,
        latest_state_stream,
        pattern_quantified_stream,
        quantile_sketch_stream,
    )

    ev_src = os.path.join(work, "events_src")
    schema = _prep_event_files(spark, sf_dir, ev_src, n_files)

    def ev_stream():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", FILES_PER_TRIGGER)
            .parquet(ev_src)
        )

    def writer(out_df, mode):
        def build(ckpt):
            return (
                out_df.writeStream.outputMode(mode)
                .foreachBatch(lambda df, eid: df.write.format("noop")
                              .mode("overwrite").save())
                .option("checkpointLocation", ckpt)
            )

        return build

    scenarios = {
        # upsert view: state grows with the KEY universe (the
        # contract), epochs must not slow as it fills
        "latest_state_stream": writer(
            latest_state_stream(
                ev_stream(), "user_id", "ts_ms", "event_id", "event_type"
            ),
            "update",
        ),
        # sketches: state bounded at groups x K regardless of volume
        "kmv_distinct_stream": writer(
            kmv_distinct_stream(
                ev_stream().select("event_type", "h"), "event_type", "h"
            ),
            "update",
        ),
        "quantile_sketch_stream": writer(
            quantile_sketch_stream(
                ev_stream().select("event_type", "h", "event_id", "qv"),
                "event_type",
                "h",
                "event_id",
                "qv",
            ),
            "update",
        ),
        # drift monitor: codebook state bounded at |types|·buckets
        # longs; the dedup stage's state is bounded by the watermark
        # horizon, not stream length
        "codebook_drift_stream": writer(
            codebook_drift_stream(
                ev_stream().select(
                    "event_type",
                    F.least(
                        F.floor(F.col("qv") / 500_000), F.lit(9)
                    )
                    .cast("long")
                    .alias("bucket"),
                    "event_id",
                    (F.col("ts_ms") / 1000)
                    .cast("timestamp")
                    .alias("ets"),
                ),
                "event_type",
                "bucket",
                "event_id",
                "ets",
                n_buckets=10,
            ),
            "update",
        ),
        # bounded-tail CEP: state capped at 3*tail entries per user;
        # per-epoch cost is the tail fold, volume-independent
        "pattern_quantified_stream": writer(
            pattern_quantified_stream(
                ev_stream().select(
                    "user_id", "ts_ms", "event_id", "event_type"
                )
            ),
            "update",
        ),
        # bounded-tail fold: state capped at 3*tail longs per user —
        # must stay flat as volume grows; keys scale the state axis
        "ewma_stream": writer(
            ewma_stream(
                ev_stream().select(
                    "user_id",
                    "ts_ms",
                    "event_id",
                    F.col("qv").alias("vq"),
                )
            ),
            "update",
        ),
    }

    # stream-static LSH probe: zero streaming state; the scaled axis
    # is the INDEX (corpus bands) the arriving docs join against
    docs = load_table(spark, sf_dir, "documents")
    idx_path = os.path.join(work, "lsh_index")
    dedup.persist_lsh_index(docs, idx_path)
    new_src = os.path.join(work, "newdocs_src")
    (
        docs.sample(0.05, seed=7)
        .select((F.col("doc_id") + 10_000_000).alias("doc_id"), "text")
        .repartition(n_files)
        .write.mode("overwrite")
        .parquet(new_src)
    )
    index = spark.read.parquet(idx_path)
    new_stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", FILES_PER_TRIGGER)
        .parquet(new_src)
    )
    scenarios["stream_near_dup_candidates"] = writer(
        dedup.stream_near_dup_candidates(new_stream, index), "append"
    )

    # stream-static dHash probe (round 9): the pixel-tier twin —
    # zero streaming state, the scaled axis is the image index
    from jly_flink_spark.operators import multimodal as mm

    dh_path = os.path.join(work, "dhash_index")
    mm.persist_dhash_index(
        mm.documents_as_pixel_media(docs), dh_path
    )
    dh_index = spark.read.parquet(dh_path)
    new_stream2 = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", FILES_PER_TRIGGER)
        .parquet(new_src)
    )
    scenarios["stream_image_near_dups"] = writer(
        mm.stream_image_near_dups(
            mm.documents_as_pixel_media(new_stream2), dh_index
        ),
        "append",
    )
    return scenarios


def _prep_binlog_series(spark, sf_dir: str, out: str, n_files: int):
    """The events table as JSON envelope lines across a rotated
    binlog series — n_files grows with the factor, so the probe
    scales FILE count and event volume together."""
    from pyspark.sql import functions as F

    from jly_flink_spark.io import load_table

    os.makedirs(out, exist_ok=True)
    ev = load_table(spark, sf_dir, "events")
    lines = ev.select(
        F.to_json(
            F.struct(
                F.lit("d").alias("op"),
                (F.unix_micros("ts") / 1000).cast("long").alias("ts_ms"),
                F.struct(
                    F.lit("demo").alias("db"),
                    F.col("event_type").alias("table"),
                ).alias("source"),
                F.struct("event_id", "user_id", "value").alias("before"),
            )
        ).alias("line")
    ).collect()
    per = max(1, -(-len(lines) // n_files))
    total = 0
    for i in range(n_files):
        chunk = lines[i * per : (i + 1) * per]
        if not chunk:
            break
        with open(
            os.path.join(out, f"binlog.{i + 1:06d}"), "w",
            encoding="utf-8",
        ) as f:
            for r in chunk:
                f.write(r["line"] + "\n")
            total += len(chunk)
    return total


def streaming_probe(spark, corpus: str, factor: int) -> dict:
    import shutil as _sh

    from jly_flink_spark.sources.binlog_source import read_binlog_stream

    # recentProgress is capped at numRecentProgressUpdates (default
    # 100) — a factor-10 run spans ~100 micro-batches, so the default
    # silently evicts the earliest epochs from every reported metric
    spark.conf.set(
        "spark.sql.streaming.numRecentProgressUpdates", "2000"
    )
    results: dict[str, dict] = {}
    for label, sf_dir, files in (
        ("1x", SRC_SF, N_SOURCE_FILES),
        (f"{factor}x", corpus, N_SOURCE_FILES * factor),
    ):
        work = f"/tmp/jly_stream_probe_{label}"
        _sh.rmtree(work, ignore_errors=True)
        os.makedirs(work)
        for name, build in _stream_scenarios(
            spark, sf_dir, work, files
        ).items():
            m = _drive_stream(
                build, os.path.join(work, f"ckpt_{name}")
            )
            results.setdefault(name, {})[label] = m
            print(f"[{label}] {name}: {m}")

        blog = os.path.join(work, "binlogs")
        n_rows = _prep_binlog_series(spark, sf_dir, blog, files)
        t0 = time.time()
        (
            read_binlog_stream(spark, blog)
            .writeStream.outputMode("append")
            .foreachBatch(lambda df, eid: df.write.format("noop")
                          .mode("overwrite").save())
            .option(
                "checkpointLocation", os.path.join(work, "ckpt_blog")
            )
            .start()
            .processAllAvailable()
        )
        wall = time.time() - t0
        m = {
            "wall_s": round(wall, 2),
            "files": files,
            "rows": n_rows,
            "rows_per_s": int(n_rows / wall),
        }
        for q in spark.streams.active:
            q.stop()
        results.setdefault("binlog_tailer", {})[label] = m
        print(f"[{label}] binlog_tailer: {m}")
        _sh.rmtree(work, ignore_errors=True)
    return results


def _write_streaming_section(results: dict, factor: int) -> None:
    report = os.path.join(HERE, "docs", "SCALE_PROBE.md")
    lines = [
        "\n## Streaming probe — 1x vs "
        f"{factor}x source volume\n\n"
        "Per-operator micro-batch metrics from StreamingQueryProgress "
        "(file sources chunked so each run spans ~10 epochs; batch "
        "durations are per-epoch `triggerExecution`). Bounded-state "
        "operators (KMV / quantile sketch) must hold state FLAT at "
        f"{factor}x; the upsert view's state grows with its key "
        "universe by contract; the LSH probe and the binlog tailer "
        "are stateless.\n\n"
        "| operator | scale | epochs | input rows | batch ms p50 | "
        "batch ms max | state rows (final) | state MB (max) |\n"
        "|---|---|---|---|---|---|---|---|\n"
    ]
    for name, by_scale in results.items():
        for label, m in by_scale.items():
            if name == "binlog_tailer":
                lines.append(
                    f"| {name} | {label} | 1 | {m['rows']} |"
                    f" {m['wall_s'] * 1000:.0f} | — | stateless |"
                    f" {m['rows_per_s']} rows/s |\n"
                )
            else:
                lines.append(
                    f"| {name} | {label} | {m['epochs']} |"
                    f" {m['input_rows']} | {m['batch_ms_p50']} |"
                    f" {m['batch_ms_max']} |"
                    f" {m['state_rows_final']} | {m['state_mb_max']} |\n"
                )
    # replace-or-append (the _write_dims_section discipline): a
    # re-run refreshes its own section instead of stacking duplicates
    old = ""
    if os.path.exists(report):
        old = open(report, encoding="utf-8").read()
        i = old.find("\n## Streaming probe")
        while i >= 0:
            j = old.find("\n## ", i + 1)
            old = old[:i] + (old[j:] if j >= 0 else "")
            i = old.find("\n## Streaming probe")
    with open(report, "w", encoding="utf-8") as f:
        f.write(old)
        f.writelines(lines)
    print(f"wrote streaming section to {report}")


def _write_dims_section(
    report: str, results: dict, factor: int
) -> None:
    """Replace-or-append the `## Dim-scaled probe` section: a re-run
    refreshes its own section without duplicating it and without
    touching the main table or the streaming section."""
    head = "\n## Dim-scaled probe"
    body = [
        f"{head} — customer/part/supplier ×{factor}\n\n"
        "The default probe corpus grows FACTS with unchanged dim "
        "keys (dims stay broadcastable), so a single-task stage over "
        "a dim-sized frame is structurally invisible to its decade "
        "ratio — the r6-verdict blind spot. This corpus grows the "
        "customer/part/supplier universes too (new keys; each fact "
        f"replica re-points to its own dim replica ×{factor}), so "
        "the queries below — all dim-sized reductions — now measure "
        "their reduction's scaling, not just their fact scan's. "
        "Generated by `python -m tools.scale_probe --dims`.\n\n"
        "| query | wall (s) | sf0.1 wall (s) | ratio |"
        " worst max/median task | stragglers |\n"
        "|---|---|---|---|---|---|\n"
    ]
    for name, r in results.items():
        worst = worst_ratio(r["stages"])
        n_strag = sum(s["straggler"] for s in r["stages"])
        body.append(
            f"| {name} | {r['wall_s']} | {r['ref_wall_s']:.2f} |"
            f" {r['wall_s'] / r['ref_wall_s']:.1f}x | {worst:.1f}x |"
            f" {n_strag} |\n"
        )
    old = ""
    if os.path.exists(report):
        old = open(report, encoding="utf-8").read()
        i = old.find(head)
        if i >= 0:
            j = old.find("\n## ", i + 1)
            old = old[:i] + (old[j:] if j >= 0 else "")
    with open(report, "w", encoding="utf-8") as f:
        f.write(old)
        f.writelines(body)


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
    ap.add_argument(
        "--streaming",
        action="store_true",
        help="probe the streaming operators (stateful sketches, "
        "upsert view, LSH probe, binlog tailer) at 1x vs FACTORx "
        "source volume; appends a section to docs/SCALE_PROBE.md",
    )
    ap.add_argument(
        "--dims",
        action="store_true",
        help="probe the dim-sized reductions (RFM/ABC/rank-over-"
        "suppliers/...) on a corpus whose customer/part/supplier "
        "universes ALSO grow xFACTOR — the default corpus keeps dim "
        "keys unchanged, which hides single-task stages over "
        "dim-sized frames; appends a section to docs/SCALE_PROBE.md",
    )
    args = ap.parse_args()

    global QUERIES
    if args.dims:
        QUERIES = list(DIM_QUERIES)
    elif args.full:
        from bench import HEADLINE

        # the whole bench headline set (order-preserving dedup: the
        # default probe list and HEADLINE overlap)
        QUERIES = list(dict.fromkeys(HEADLINE))

    suffix = "_dims" if args.dims else ""
    corpus = os.path.join(args.out_dir, f"x{args.factor}{suffix}")
    if not os.path.exists(os.path.join(corpus, "embeddings.parquet")):
        t0 = time.time()
        build_corpus(corpus, args.factor, scale_dims=args.dims)
        print(f"corpus built in {time.time() - t0:.1f}s → {corpus}")

    from jly_flink_spark.plans import REGISTRY
    from jly_flink_spark.session import get_spark

    spark = get_spark(
        "scale_probe", extra_conf={"spark.ui.enabled": "true"}
    )

    if args.streaming:
        results = streaming_probe(spark, corpus, args.factor)
        _write_streaming_section(results, args.factor)
        if not args.keep_corpus:
            shutil.rmtree(args.out_dir, ignore_errors=True)
        return

    def run(name: str, sf_dir: str) -> float:
        t0 = time.time()
        df = REGISTRY[name].spark_fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        # Drop this query's localCheckpoint blocks before the next
        # one: 30 back-to-back 10x queries otherwise accumulate
        # checkpointed RDDs in the single local JVM until a
        # broadcast build OOMs (bit the round-10 probe on the KN
        # scorer). gc.collect() releases the py4j refs so the
        # ContextCleaner can unpersist; the timing window above has
        # already closed, so cleanup cost is not billed to the query.
        del df
        import gc

        gc.collect()
        spark.catalog.clearCache()
        return wall

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
        worst = worst_ratio(stages)
        print(
            f"{name}: {wall:.2f}s ({wall / ref_wall:.1f}x of sf0.1's "
            f"{ref_wall:.2f}s), {len(stages)} stages≥{MIN_TASKS}t, "
            f"worst max/median {worst:.1f}x, "
            f"stragglers {sum(s['straggler'] for s in stages)}"
        )

    report = os.path.join(HERE, "docs", "SCALE_PROBE.md")
    if args.dims:
        _write_dims_section(report, results, args.factor)
        print(f"wrote dim-scaled section → {report}")
        if not args.keep_corpus:
            shutil.rmtree(args.out_dir, ignore_errors=True)
        return
    # a batch re-run must not destroy the streaming/dims sections
    # the --streaming/--dims modes appended — carry them over
    streaming_section = ""
    if os.path.exists(report):
        old = open(report, encoding="utf-8").read()
        cut = min(
            (
                i
                for i in (
                    old.find("\n## Streaming probe"),
                    old.find("\n## Dim-scaled probe"),
                )
                if i >= 0
            ),
            default=-1,
        )
        if cut >= 0:
            streaming_section = old[cut:]
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
            worst = worst_ratio(r["stages"])
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
        f.write(streaming_section)
    print(f"wrote {report}")

    if not args.keep_corpus:
        shutil.rmtree(args.out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
