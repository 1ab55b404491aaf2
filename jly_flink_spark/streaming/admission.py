"""Streaming corpus-admission gate — the composed ingest path.

The reference job's whole purpose is continuous admission of CDC
records into an analytical store (`StartJob.java`: tail → validate →
route → sink). This module is that shape for the TRAINING-CORPUS
surface: one `foreachBatch` body that runs the batch pipeline
`pipeline_training_corpus_v3`'s admission policy incrementally over
arriving documents, probing the persisted incremental indexes this
repo already maintains (exact-fingerprint ledger, MinHash-LSH band
index, winnowing fingerprint index, dHash band index) plus the static
benchmark decontamination set, and writing admitted state back to all
of them in the same epoch.

Policy stages (the batch pipeline's order, one image stage added):

1. exact dedup     — intra-batch min-doc_id per fingerprint, then
                     drop any fingerprint already in the ledger
2. text near-dup   — MinHash-LSH candidates (intra-batch buckets +
                     index probes), exact-Jaccard ≥ 0.8 verify, drop
                     doc_b of each verified (doc_a < doc_b) pair
3. decontamination — Bloom prefilter + exact trigram verify against
                     the static benchmark shingle set; benchmark ids
                     themselves never admit
3i. image near-dup — dHash Hamming-LSH pairs (intra-batch bands +
                     index probes), drop doc_b (min-id wins) —
                     the stage the text pipeline cannot express
4. quality gate    — frozen fixed-point classifier weights (model
                     state, like IVF centroids), p > 500
5. ExactSubstr     — intra-batch `substring_cut_retention` (exact
                     span mass, = the batch pipeline) AND the
                     incremental winnow-containment probe vs the
                     indexed corpus (cross-batch duplication)
6. per-source cap  — deterministic md5 rank, offset by the admitted
                     ledger's running per-source counts

Batch↔stream parity contract: with EMPTY state and the whole corpus
as one batch, stages 1-6 equal `pipeline_training_corpus_v3` exactly
(stage 3i off; the registered `pipeline_streaming_admission` query is
the hash-checked batch equivalent WITH the image stage). Across
micro-batches the gate is keep-first: already-admitted documents are
never revoked, so a duplicate pair split across batches keeps its
EARLIER member — under doc_id-ordered arrival that is the batch
policy's min-id rule; out-of-order arrival can admit both sides of a
pair (the price every streaming dedup pays; the batch pipeline is the
periodic reconciliation path).

Replay idempotence: every index/ledger probe first anti-joins the
CURRENT batch's doc_ids out of the state it reads, so a foreachBatch
epoch replayed after a mid-epoch failure sees exactly the pre-epoch
state and reproduces its decisions bit-for-bit; the replayed appends
duplicate rows physically, which the probes ignore (distinct-based)
and the next compaction drains — the LSM contract shared by all
three indexes (`compact_lsh_index` / `compact_winnow_index` /
`compact_dhash_index`).

Scale shape at 100 TB ingest: per micro-batch, every probe is an
equijoin of the (small) batch against an index pruned by sorted-file
min/max statistics (band_key / h / (b, bkey) sort orders at write
time), candidate verification touches only collided pairs, quality
and decontamination are stateless per-row expressions (the Bloom
words and classifier weights are broadcast literals), and the only
global state consulted is the per-source admitted COUNT — a
groupBy over the slim ledger projection. Nothing rescans the corpus.

Reference parity: StartJob.java:63-146 (validate → route → sink on
one stream), SrStreamLoadClient.java:44 (idempotent epoch labels);
the admission policy itself mirrors plans/training_queries.py's
pipeline_training_corpus_v3 (round-9 verified).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..io import stage
from ..operators import dedup
from ..operators import multimodal as mm
from ..operators.bloom import bloom_probe_expr, build_bloom_words
from ..operators.classifier import score_quality
from ..operators.text import fingerprint, tokens, trigram_shingles

# admission thresholds — shared with the batch pipeline
MIN_JACCARD = 0.8
BENCH_MAX_DOC = 20
QUALITY_MIN_P = 500  # exclusive, = pipeline v2/v3's p > 500
# a doc whose duplicated span mass exceeds half is cut (batch stage 5
# keeps retention_ppm >= RETENTION_MIN_PPM; the cross-batch winnow
# containment mirrors the same half-mass boundary)
RETENTION_MIN_PPM = 500_000
CONTAIN_CUT_PPM = 500_000
WINNOW_MAX_DF = 50

_LEDGER_SCHEMA = (
    "doc_id long, source string, lang string, text string, fp string,"
    " passed2 boolean, passed3 boolean, passed4 boolean,"
    " passed5 boolean, admitted boolean"
)


@dataclass
class AdmissionPaths:
    """Filesystem layout of the gate's persistent state — one root,
    four artifacts. The ledger holds one row per exact-dedup survivor
    with its stage flags (the corpus store + audit trail); the three
    indexes are the probe accelerators maintained by the existing
    LSM append/tombstone/compact contracts."""

    root: str

    @property
    def ledger(self) -> str:
        return os.path.join(self.root, "ledger")

    @property
    def lsh(self) -> str:
        return os.path.join(self.root, "lsh_bands")

    @property
    def winnow(self) -> str:
        return os.path.join(self.root, "winnow_fps")

    @property
    def dhash(self) -> str:
        return os.path.join(self.root, "dhash_bands")

    @property
    def bench(self) -> str:
        return os.path.join(self.root, "bench_shingles")


@dataclass
class AdmissionState:
    """The gate's state as FRAMES, so the policy is a pure function
    testable without a filesystem: ledger rows (kept1 docs + flags),
    LSH bands of kept1 docs, winnow fingerprints of kept4 docs, dHash
    bands of kept3 docs, the static benchmark shingle set, and its
    Bloom words (broadcast model state)."""

    ledger: DataFrame
    lsh_bands: DataFrame
    winnow_fps: DataFrame
    dhash_bands: DataFrame
    bench_shingles: DataFrame
    bloom_words: list


def empty_state(spark, bench_docs: DataFrame | None = None) -> AdmissionState:
    """State for a cold start: empty ledger/indexes plus the static
    benchmark decontamination set built from ``bench_docs`` (or an
    empty one)."""
    ledger = spark.createDataFrame([], _LEDGER_SCHEMA)
    lsh = spark.createDataFrame([], "band_key string, doc_id long")
    win = spark.createDataFrame([], "doc_id long, h long, n_fp long")
    dh = spark.createDataFrame(
        [], "doc_id long, dhash long, b int, bkey long"
    )
    if bench_docs is not None:
        bench = _bench_shingle_set(bench_docs)
    else:
        bench = spark.createDataFrame([], "shingle string")
    bench = stage(bench, eager=True)
    words = build_bloom_words(bench)
    return AdmissionState(ledger, lsh, win, dh, bench, words)


def _bench_shingle_set(bench_docs: DataFrame) -> DataFrame:
    """Distinct trigram shingles of the benchmark — the static
    decontamination reference (model state, built once)."""
    return (
        bench_docs.select(tokens(F.col("text")).alias("ts"))
        .select(F.explode(trigram_shingles(F.col("ts"))).alias("shingle"))
        .distinct()
    )


def init_admission_state(spark, paths: AdmissionPaths, bench_docs: DataFrame) -> None:
    """One-time setup: persist the benchmark shingle set and create
    the empty ledger. Index directories are created lazily by the
    first append (parquet append on a fresh path)."""
    _bench_shingle_set(bench_docs).write.mode("overwrite").parquet(
        paths.bench
    )
    spark.createDataFrame([], _LEDGER_SCHEMA).write.mode(
        "overwrite"
    ).parquet(paths.ledger)


def load_state(spark, paths: AdmissionPaths) -> AdmissionState:
    """Read the persisted state, tombstone-aware where the index
    supports deletion. Missing index dirs (nothing appended yet)
    load as empty frames."""
    s = empty_state(spark)

    def _read(path, fallback):
        try:
            return spark.read.parquet(path)
        except Exception:  # noqa: BLE001 — fresh path, no files yet
            return fallback

    ledger = _read(paths.ledger, s.ledger)
    lsh = _read(paths.lsh, s.lsh_bands)
    win = _read(paths.winnow, s.winnow_fps)
    dh = _read(paths.dhash, s.dhash_bands)
    bench = stage(_read(paths.bench, s.bench_shingles), eager=True)
    words = build_bloom_words(bench)
    return AdmissionState(ledger, lsh, win, dh, bench, words)


def admission_decisions(
    spark,
    batch: DataFrame,
    state: AdmissionState,
    weights: dict[str, int],
    source_cap: int | None = None,
    enable_image_gate: bool = True,
) -> DataFrame:
    """The pure admission policy: one micro-batch of documents
    (doc_id, source, lang, text) against the given state → the
    decisions frame (one row per exact-dedup survivor of the batch,
    `_LEDGER_SCHEMA` columns). Performs no writes; `admit_batch`
    wraps it with state I/O. The returned frame is STAGED (computed
    once) — callers fan out to the ledger append, the index appends,
    and the admitted projection without re-running the probes.

    ``source_cap``: absolute per-source budget for streaming;
    ``None`` replays the batch pipeline's RELATIVE cap
    max(SOURCE_CAP_MIN, n5 // SOURCE_CAP_DEN) over the running
    stage-5 survivor count — exact in single-batch mode, monotone
    (cap only grows) across batches.
    """
    from ..plans.curation_queries import SOURCE_CAP_DEN, SOURCE_CAP_MIN

    batch = batch.select("doc_id", "source", "lang", "text")
    batch_ids = stage(batch.select("doc_id").distinct(), eager=True)

    # Replay idempotence: a replayed epoch's own half-written rows
    # must not influence its decisions — every piece of state the
    # probes read excludes the current batch's doc_ids, restoring
    # exactly the pre-epoch view.
    def _pre_epoch(df):
        return df.join(F.broadcast(batch_ids), "doc_id", "left_anti")

    ledger = _pre_epoch(state.ledger)
    lsh_idx = _pre_epoch(state.lsh_bands)
    win_idx = _pre_epoch(state.winnow_fps)
    dh_idx = _pre_epoch(state.dhash_bands)

    # ---- stage 1: exact dedup (keep min doc_id; ledger keeps first)
    slim = batch.select("doc_id", fingerprint(F.col("text")).alias("fp"))
    winners = slim.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    led_fps = ledger.select("fp").distinct()
    kept1_ids = winners.join(led_fps, "fp", "left_anti").select("doc_id")
    kept1 = (
        batch.join(slim, "doc_id")
        .join(kept1_ids, "doc_id", "left_semi")
        .transform(stage)
    )

    # ---- stage 2: text near-dup (LSH → exact Jaccard ≥ 0.8)
    intra = dedup.minhash_candidate_pairs(kept1)
    cross = (
        dedup.stream_near_dup_candidates(kept1, lsh_idx)
        # the batch pipeline's asymmetric rule: doc_b of an (a < b)
        # pair drops — the index doc must be the SMALLER id for the
        # batch doc to lose (index docs are kept1 docs, admitted or
        # not, exactly like the batch operator's pair universe)
        .filter(F.col("corpus_doc_id") < F.col("new_doc_id"))
        .select(
            F.col("corpus_doc_id").alias("doc_a"),
            F.col("new_doc_id").alias("doc_b"),
        )
        .distinct()
    )
    cands = intra.unionAll(cross).distinct()
    # verification needs both sides' text: batch docs + the index
    # docs actually named by a candidate (slim semi-join, no corpus scan)
    idx_docs = ledger.select("doc_id", "text").join(
        cands.select(F.col("doc_a").alias("doc_id")).distinct(),
        "doc_id",
        "left_semi",
    )
    verify_universe = kept1.select("doc_id", "text").unionAll(idx_docs)
    near = dedup.verify_candidates_jaccard(
        verify_universe, cands, min_jaccard=MIN_JACCARD
    )
    losers2 = near.select(F.col("doc_b").alias("doc_id")).distinct()
    kept2 = kept1.join(losers2, "doc_id", "left_anti")

    # ---- stage 3: benchmark decontamination (Bloom prefilter +
    # exact verify; benchmark ids themselves never admit)
    kept2 = kept2.filter(F.col("doc_id") >= BENCH_MAX_DOC)
    sh = kept2.select(
        "doc_id", tokens(F.col("text")).alias("ts")
    ).select(
        "doc_id",
        F.explode(trigram_shingles(F.col("ts"))).alias("shingle"),
    )
    # Bloom has no false negatives, so the exact verify join only
    # sees the prefiltered survivors — the broadcast bench set is
    # touched by a fraction of the shingles
    sh_hit = sh.filter(bloom_probe_expr(state.bloom_words, F.col("shingle")))
    contaminated = (
        sh_hit.join(F.broadcast(state.bench_shingles), "shingle", "left_semi")
        .select("doc_id")
        .distinct()
    )
    kept3 = kept2.join(contaminated, "doc_id", "left_anti").transform(stage)

    # ---- stage 3i: image near-dup (dHash Hamming-LSH, min-id wins)
    if enable_image_gate:
        media = mm.documents_as_pixel_media(kept3)
        hashes = mm.pixel_dhash_frame(media).filter(
            F.col("dhash").isNotNull()
        )
        bands = mm.dhash_bands(hashes).transform(stage)
        x = bands.select(
            F.col("doc_id").alias("doc_a"),
            F.col("dhash").alias("ha"),
            "b",
            "bkey",
        )
        y = bands.select(
            F.col("doc_id").alias("doc_b"),
            F.col("dhash").alias("hb"),
            "b",
            "bkey",
        )
        ham_intra = (
            x.join(y, ["b", "bkey"])
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b", "ha", "hb")
            .distinct()
        )
        cross_img = (
            bands.join(
                dh_idx.select(
                    F.col("doc_id").alias("doc_a"),
                    F.col("dhash").alias("ha"),
                    "b",
                    "bkey",
                ),
                ["b", "bkey"],
            )
            .filter(F.col("doc_a") < F.col("doc_id"))
            .select(
                "doc_a",
                F.col("doc_id").alias("doc_b"),
                "ha",
                F.col("dhash").alias("hb"),
            )
            .distinct()
        )
        hamming = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
        losers_img = (
            ham_intra.unionAll(cross_img)
            .filter(hamming <= mm.DHASH_HAM_MAX)
            .select(F.col("doc_b").alias("doc_id"))
            .distinct()
        )
        kept3 = kept3.join(losers_img, "doc_id", "left_anti").transform(
            stage
        )

    # ---- stage 4: frozen-weights quality gate
    scored = score_quality(kept3, weights)
    kept4 = kept3.join(
        scored.filter(F.col("p") > QUALITY_MIN_P).select("doc_id"),
        "doc_id",
        "left_semi",
    ).transform(stage)

    # ---- stage 5: ExactSubstr retention (intra-batch exact) AND
    # winnow containment vs the indexed corpus (cross-batch)
    ret = dedup.substring_cut_retention(kept4)
    keep_ret = ret.filter(
        F.col("retention_ppm") >= RETENTION_MIN_PPM
    ).select("doc_id")
    contain = dedup.winnow_containment_vs_index(
        kept4, win_idx, max_df=WINNOW_MAX_DF
    )
    cut_cross = contain.filter(
        F.col("contain_ppm") > CONTAIN_CUT_PPM
    ).select("doc_id")
    kept5 = (
        kept4.join(keep_ret, "doc_id", "left_semi")
        .join(cut_cross, "doc_id", "left_anti")
        .transform(stage)
    )

    # ---- stage 6: per-source cap (md5 rank, offset by the running
    # admitted counts). Counts and n5 are scalar model state over
    # slim ledger projections — the batch pipeline's n5 discipline.
    if source_cap is None:
        n5_prior = (
            ledger.filter(F.col("passed5")).select("doc_id").distinct().count()
        )
        n5 = n5_prior + kept5.count()
        cap = max(SOURCE_CAP_MIN, n5 // SOURCE_CAP_DEN)
    else:
        cap = int(source_cap)
    prior_counts = (
        ledger.filter(F.col("admitted"))
        .groupBy("source")
        .agg(F.count_distinct("doc_id").alias("n_admitted"))
    )
    ranked = (
        kept5.join(F.broadcast(prior_counts), "source", "left")
        .withColumn(
            "n_admitted", F.coalesce("n_admitted", F.lit(0))
        )
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("source").orderBy(
                    F.md5(F.col("doc_id").cast("string")), "doc_id"
                )
            ),
        )
    )
    admitted_ids = ranked.filter(
        F.col("n_admitted") + F.col("rnk") <= F.lit(cap)
    ).select("doc_id")

    # ---- decisions frame: every kept1 row with its stage flags
    def _flag(ids_df, name):
        return ids_df.select("doc_id", F.lit(True).alias(name))

    decisions = (
        kept1.select("doc_id", "source", "lang", "text", "fp")
        .join(_flag(kept2.select("doc_id"), "passed2"), "doc_id", "left")
        .join(_flag(kept3.select("doc_id"), "passed3"), "doc_id", "left")
        .join(_flag(kept4.select("doc_id"), "passed4"), "doc_id", "left")
        .join(_flag(kept5.select("doc_id"), "passed5"), "doc_id", "left")
        .join(_flag(admitted_ids, "admitted"), "doc_id", "left")
        .select(
            "doc_id",
            "source",
            "lang",
            "text",
            "fp",
            *[
                F.coalesce(c, F.lit(False)).alias(c)
                for c in (
                    "passed2",
                    "passed3",
                    "passed4",
                    "passed5",
                    "admitted",
                )
            ],
        )
    )
    return stage(decisions, eager=True)


def admit_batch(
    spark,
    batch: DataFrame,
    paths: AdmissionPaths,
    weights: dict[str, int],
    source_cap: int | None = None,
    enable_image_gate: bool = True,
) -> DataFrame:
    """The foreachBatch body: load state, decide, write admitted
    state back to the ledger AND all three indexes in this epoch,
    return the admitted documents. At-least-once: a replay re-appends
    identical rows (decisions are replay-invariant — see
    `admission_decisions`), the probes ignore physical duplicates,
    and the periodic `compact_admission_state` drains them."""
    state = load_state(spark, paths)
    decisions = admission_decisions(
        spark,
        batch,
        state,
        weights,
        source_cap=source_cap,
        enable_image_gate=enable_image_gate,
    )

    # write-back, one artifact per stage-reference corpus:
    # ledger ← every kept1 row (flags included)
    decisions.write.mode("append").parquet(paths.ledger)
    # LSH bands ← kept1 docs (stage-2's pair universe)
    dedup.append_to_lsh_index(
        decisions.select("doc_id", "text"), paths.lsh
    )
    # dHash bands ← kept3 docs (stage-3i's pair universe)
    if enable_image_gate:
        mm.append_to_dhash_index(
            mm.documents_as_pixel_media(
                decisions.filter(F.col("passed3")).select("doc_id", "text")
            ),
            paths.dhash,
        )
    # winnow fingerprints ← kept4 docs (stage-5's span universe)
    dedup.append_to_winnow_index(
        decisions.filter(F.col("passed4")).select("doc_id", "text"),
        paths.winnow,
    )
    return decisions.filter(F.col("admitted")).select(
        "doc_id", "source", "lang", "text"
    )


def compact_admission_state(spark, paths: AdmissionPaths) -> None:
    """Maintenance pass over all four artifacts — the shared LSM
    compaction contract (serialize with appends on one timeline).
    The ledger dedups whole rows: replays append bit-identical rows,
    and one row per kept1 doc is the invariant."""
    from ..sources.layout import compact_sorted, swap_layout

    dedup.compact_lsh_index(spark, paths.lsh)
    dedup.compact_winnow_index(spark, paths.winnow)
    mm.compact_dhash_index(spark, paths.dhash)
    tmp = paths.ledger.rstrip("/") + ".compacting"
    compact_sorted(
        spark.read.parquet(paths.ledger).dropDuplicates(["doc_id"]),
        tmp,
        ["doc_id"],
        4_000_000,
    )
    swap_layout(paths.ledger, tmp)


def run_admission_stream(
    spark,
    docs_stream: DataFrame,
    paths: AdmissionPaths,
    weights: dict[str, int],
    checkpoint_dir: str,
    admitted_dir: str,
    source_cap: int | None = None,
    enable_image_gate: bool = True,
):
    """Wire the gate onto a streaming frame: each micro-batch runs
    `admit_batch` and lands its admitted documents under
    ``admitted_dir`` (partitioned parquet, append). Returns the
    started StreamingQuery; callers own stop/await."""

    def _body(batch_df, epoch_id):
        admitted = admit_batch(
            batch_df.sparkSession,
            batch_df,
            paths,
            weights,
            source_cap=source_cap,
            enable_image_gate=enable_image_gate,
        )
        admitted.write.mode("append").parquet(admitted_dir)

    return (
        docs_stream.writeStream.outputMode("append")
        .foreachBatch(_body)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
