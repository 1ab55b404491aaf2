"""Persisted audio/video band indexes: the LSM contract the dHash
tier already pins (tombstone-before-reappend conflict, probe replay
invariance), parametrized over both media tiers (round-11 verdict
task 9 + ADVICE item 1).

Reference parity note: the reference (xiaoyunwen/jly-flink) keeps
sink-side idempotence via load labels (SrStreamLoadClient.java); the
media indexes carry the analogous at-least-once discipline one layer
down — physical replays must never change probe decisions, and
content conflicts must fail loudly with a recovery recipe.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jly_flink_spark.io import load_table
from jly_flink_spark.operators import multimodal as mm

SF = "/root/testdata/sf0.001"


def _tier(name):
    if name == "audio":
        return dict(
            media=mm.documents_as_audio_media,
            append=mm.append_to_audio_index,
            read=mm.read_audio_index,
            compact=mm.compact_audio_index,
            delete=mm.delete_from_audio_index,
            conflict_match="conflicting afp",
        )
    return dict(
        media=mm.documents_as_video_media,
        append=mm.append_to_video_index,
        read=mm.read_video_index,
        compact=mm.compact_video_index,
        delete=mm.delete_from_video_index,
        conflict_match="conflicting vh",
    )


@pytest.fixture(scope="module")
def corpus(spark):
    return load_table(spark, SF, "documents")


@pytest.mark.parametrize("tier", ["audio", "video"])
def test_compaction_rejects_conflicting_reappend(
    spark, corpus, tmp_path, tier
):
    """Re-appending a doc with CHANGED samples/frames and no prior
    tombstone must make compaction fail loudly on the conflicting
    hash, and the prescribed tombstone → compact → re-append
    recovery must succeed — the dhash-tier contract, one modality
    over."""
    from pyspark.errors.exceptions.captured import (
        SparkRuntimeException,
    )

    t = _tier(tier)
    path = str(tmp_path / f"{tier}_idx")
    t["append"](t["media"](corpus), path)
    # prepend the edit: the planted media sample the first 64 tokens,
    # so only a prefix change shifts the fingerprint; skip
    # malformed-payload docs (NULL hash, never indexed)
    changed = (
        corpus.filter(F.col("doc_id") % mm.MALFORMED_MOD != 0)
        .limit(1)
        .select(
            "doc_id",
            F.concat(
                F.lit("wholly new planted content "), F.col("text")
            ).alias("text"),
        )
    )
    t["append"](t["media"](changed), path)
    with pytest.raises(
        SparkRuntimeException, match=t["conflict_match"]
    ):
        t["compact"](spark, path)
    doc_id = changed.head()["doc_id"]
    t["delete"](spark, path, [doc_id])
    t["compact"](spark, path)
    t["append"](t["media"](changed), path)
    assert t["compact"](spark, path) >= 1


@pytest.mark.parametrize("tier", ["audio", "video"])
def test_tier_losers_replay_invariant(spark, tmp_path, tier):
    """ADVICE r11 item 1 regression: the admission tier probes must
    make the SAME decisions against a replayed (at-least-once,
    pre-compaction) index as against a clean one — including the
    band-bucket cap, which must count distinct docs, not physical
    rows. The fixture pins the exact failure mode: 12 identical
    clips fill each band bucket to 12 ≤ cap(16) clean, but a
    replayed epoch doubles the PHYSICAL rows to 24 > cap — a
    raw-row count then suppresses the bucket and silently admits a
    true duplicate. (Batch id 998: 999 is 27x37 -> malformed.)"""
    from jly_flink_spark.streaming.admission import (
        _audio_tier_losers,
        _video_tier_losers,
    )

    t = _tier(tier)
    fn = _audio_tier_losers if tier == "audio" else _video_tier_losers
    text = "alpha beta gamma delta " * 32  # 128 tokens, same media
    family = spark.createDataFrame(
        [(int(i), text) for i in range(1, 13)],  # ids 1..12, none %37
        "doc_id long, text string",
    )
    clean = str(tmp_path / "clean")
    replayed = str(tmp_path / "replayed")
    t["append"](t["media"](family), clean)
    t["append"](t["media"](family), replayed)
    t["append"](t["media"](family), replayed)  # duplicate epoch
    batch = spark.createDataFrame(
        [(998, text)], "doc_id long, text string"
    )
    got_clean = {
        r["doc_id"]
        for r in fn(batch, t["read"](spark, clean)).collect()
    }
    got_replayed = {
        r["doc_id"]
        for r in fn(batch, t["read"](spark, replayed)).collect()
    }
    # the batch copy must lose to the indexed family either way
    assert got_clean == {998}
    assert got_replayed == got_clean
