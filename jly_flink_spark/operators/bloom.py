"""Broadcast Bloom-filter decontamination: the constant-size scale
path next to the exact broadcast-set join of
`contamination_ngram_overlap` (plans/training_queries.py).

The exact pass broadcasts the benchmark's DISTINCT shingle SET, whose
size grows with the benchmark; the Bloom pass compresses it to a
FIXED bit array (BLOOM_WORDS int64 words — ~1 KB here, a few MB at
production sizing) that rides into every task as a plain literal
array column. Probing is then a pure per-row expression — k md5
positions, element_at + shiftright bit tests inside whole-stage
codegen — with ZERO join and zero shuffle on the corpus side; only
the surviving candidates reach the (cheap, exact) verification join.
This is the standard two-phase shape: Bloom never misses (no false
negatives, so decontamination stays sound) and false positives cost
only a verification lookup.

Engine-portable bit arithmetic: positions come from the same
14-hex-digit md5 prefix the CMS/KMV sketches use; words hold
BLOOM_WORD_BITS = 62 bits each because DuckDB's BIGINT `<<` raises on
a 1 << 63 overflow (Java's wraps) — capping the shift at 61 keeps
every word positive and every shift identical on both engines, so
the whole filter (build + probe + verify) is value-hash
oracle-checkable.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..io import stage

BLOOM_WORDS = 256  # int64 words in the bit array (~31% fill on the
# sf0.01 benchmark shingle set → ~1% FP/shingle; size m ∝ benchmark
# n at production scale)
BLOOM_WORD_BITS = 62  # bits used per word (see module docstring)
BLOOM_M = BLOOM_WORDS * BLOOM_WORD_BITS  # 15872 bits
BLOOM_K = 4  # hash functions per shingle


def _with_km_halves(shingle, body):
    """Evaluate `body(h1, h2)` with the Kirsch-Mitzenmacher halves of
    ONE md5 digest bound as lambda variables — pos_i = (h1 + i·h2)
    mod m derives all BLOOM_K positions from a single hash. KM's
    original result is literally about Bloom filters: k derived
    functions preserve the asymptotic FP rate of k independent ones;
    here it also quarters the dominant cost (md5) of build and probe.
    The singleton-array `transform` binding matters: Spark does NOT
    reliably CSE a repeated md5 across expression copies (measured
    1.3× slower without it), but a lambda variable is evaluated once
    per row by construction. i·h2 ≤ 3·2^56 stays far inside int64.
    Mirrors the MinHash signature scheme (operators/dedup.py)."""

    def outer(d):
        h1 = F.conv(F.substring(d, 1, 14), 16, 10).cast("bigint")
        h2 = F.conv(F.substring(d, 17, 14), 16, 10).cast("bigint")
        return F.get(
            F.transform(
                F.array(F.struct(h1.alias("h1"), h2.alias("h2"))),
                lambda h: body(h["h1"], h["h2"]),
            ),
            0,
        )

    return F.get(F.transform(F.array(F.md5(shingle)), outer), 0)


def _km_pos(h1, h2, i: int):
    return (h1 + F.lit(i) * h2) % BLOOM_M


def build_bloom_words(bench_shingles: DataFrame) -> list[int]:
    """Aggregate the benchmark shingle set into the dense word array.

    Distributed build: positions are exploded and bit_or-combined
    map-side, so at most BLOOM_WORDS partial rows per partition reach
    the one tiny shuffle. The collect is model state — BLOOM_WORDS
    int64s regardless of benchmark size (the IVF-centroid /
    classifier-weights train-offline boundary), never corpus data."""
    rows = (
        bench_shingles.select(
            F.explode(
                _with_km_halves(
                    F.col("shingle"),
                    lambda h1, h2: F.array(
                        *[
                            _km_pos(h1, h2, i)
                            for i in range(BLOOM_K)
                        ]
                    ),
                )
            ).alias("pos")
        )
        .select(
            F.expr(f"pos div {BLOOM_WORD_BITS}").alias("word"),
            (F.col("pos") % BLOOM_WORD_BITS).alias("bit"),
        )
        .groupBy("word")
        .agg(
            F.bit_or(
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT))")
            ).alias("wval")
        )
        .collect()
    )
    words = [0] * BLOOM_WORDS
    for r in rows:
        words[int(r["word"])] = int(r["wval"])
    return words


def _shiftright_col(value, amount):
    """shiftright with a COLUMN shift amount: the SQL function allows
    it; the Python F.shiftright wrapper only takes an int literal."""
    return F.call_function("shiftright", value, amount.cast("int"))


def bloom_probe_expr(words: list[int], shingle_col):
    """Boolean Column: all BLOOM_K bit tests hit — a pure per-row
    expression over the literal word array (no join, whole-stage
    codegen). word = pos div 62 is computed as exact bigint
    arithmetic ((pos - pos % 62) / 62 on values < BLOOM_M = 15872,
    exact in double before the int cast)."""
    barr = F.array(*[F.lit(w).cast("bigint") for w in words])

    def tests(h1, h2):
        cond = None
        for i in range(BLOOM_K):
            pos = _km_pos(h1, h2, i)
            bit = pos % BLOOM_WORD_BITS
            word_idx = ((pos - bit) / BLOOM_WORD_BITS).cast("int")
            wval = F.element_at(barr, word_idx + 1)
            test = _shiftright_col(wval, bit).bitwiseAND(F.lit(1)) == 1
            cond = test if cond is None else (cond & test)
        return cond

    return _with_km_halves(shingle_col, tests)


def bloom_contamination(
    docs: DataFrame, bench_max_doc: int = 20
) -> DataFrame:
    """(doc_id, n_bloom_hits, n_exact_hits) for corpus docs flagged by
    the Bloom prefilter: n_bloom_hits counts the doc's distinct
    shingles whose k bits all hit; n_exact_hits counts how many of
    those candidates verify against the true benchmark set
    (n_bloom_hits >= n_exact_hits always; a doc the exact pass flags
    ALWAYS appears here — Bloom has no false negatives)."""
    from .text import doc_shingles

    sh = doc_shingles(docs)
    bench = (
        sh.filter(F.col("doc_id") < bench_max_doc)
        .select("shingle")
        .distinct()
        # referenced twice (filter build collects it NOW; the
        # verification join runs later) — checkpoint so the bench
        # scan + shingle explode + distinct run once
        .transform(stage)
    )
    words = build_bloom_words(bench)
    corpus = sh.filter(F.col("doc_id") >= bench_max_doc)
    cand = corpus.filter(bloom_probe_expr(words, F.col("shingle")))
    return (
        cand.join(
            F.broadcast(bench.withColumn("in_bench", F.lit(1))),
            "shingle",
            "left",
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_bloom_hits"),
            F.sum(F.coalesce(F.col("in_bench"), F.lit(0)))
            .cast("bigint")
            .alias("n_exact_hits"),
        )
    )
