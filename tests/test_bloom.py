"""Bloom-filter decontamination (operators/bloom.py): soundness
(no false negatives) against the exact pass, and filter invariants."""

from jly_flink_spark.plans import REGISTRY

from .conftest import SF_SMOKE


def test_bloom_prefilter_sound_vs_exact_pass(spark):
    """Bloom never misses: every doc the exact broadcast-set pass
    (contamination_ngram_overlap) flags must appear in the Bloom
    output, with n_exact_hits equal to the exact pass's shingle
    count — the property that makes the prefilter safe to use for
    decontamination. And the filter's one-sidedness: candidates can
    only exceed verified hits, never undershoot."""
    bloom = {
        r["doc_id"]: r
        for r in REGISTRY["contamination_bloom_prefilter"]
        .spark_fn(spark, SF_SMOKE)
        .collect()
    }
    exact = {
        r["doc_id"]: r["n_shared_shingles"]
        for r in REGISTRY["contamination_ngram_overlap"]
        .spark_fn(spark, SF_SMOKE)
        .collect()
    }
    assert exact, "exact pass found no contamination — fixture broken"
    for doc_id, n_shared in exact.items():
        assert doc_id in bloom, f"false negative: doc {doc_id}"
        assert bloom[doc_id]["n_exact_hits"] == n_shared, (doc_id, n_shared)
    for r in bloom.values():
        assert r["n_bloom_hits"] >= r["n_exact_hits"] >= 0, r
    # docs with zero verified hits are pure false positives — the
    # cost side of the trade; with ~31% fill some must exist, and
    # they are what the verification join exists to catch
    assert any(r["n_exact_hits"] == 0 for r in bloom.values()) or len(
        bloom
    ) == len(exact)


def test_bloom_word_array_portable_bit_range(spark):
    """Every built word stays positive (bits capped at 61): the
    invariant that keeps DuckDB's overflow-checked << and Java's
    wrapping << identical."""
    from jly_flink_spark.io import load_table
    from jly_flink_spark.operators.bloom import (
        BLOOM_WORDS,
        build_bloom_words,
    )
    from jly_flink_spark.operators.text import doc_shingles
    from pyspark.sql import functions as F

    docs = load_table(spark, SF_SMOKE, "documents")
    bench = (
        doc_shingles(docs.filter(F.col("doc_id") < 20))
        .select("shingle")
        .distinct()
    )
    words = build_bloom_words(bench)
    assert len(words) == BLOOM_WORDS
    assert all(0 <= w < (1 << 62) for w in words)
    assert sum(bin(w).count("1") for w in words) > 0
