"""Multimodal columns: images/audio/video as opaque binary columns
with typed metadata, processed through Arrow-batched pandas
transforms.

The Spark-side plumbing is real and tested: schema contract,
`mapInPandas` batch iteration (Arrow transfer, no per-row Python),
partition-count preservation, deterministic batch shapes. The actual
media decode is STUBBED (`decode_image_stub`) because no image/audio
libraries exist in this container — the stub is a clearly-marked
deterministic fake keyed on the binary payload, so tests pin the
plumbing end to end. Swapping in a real decoder (PIL / torchaudio /
ffmpeg) changes only the function body, not the Spark plan.

At 100 TB: binary payloads dominate partition size — size
`spark.sql.files.maxPartitionBytes` down (payloads don't compress in
shuffle) and never groupBy/join on the binary column itself; route
by the metadata columns and let the binary ride along.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Schema of the decoded-feature output: metadata carried through,
# features appended. Mirrors a real image pipeline's (width, height,
# channels, feature vector) contract.
FEATURE_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes bigint, "
    "width int, height int, channels int, feature0 double"
)


def documents_as_media(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Adapter making an opaque-binary media table from the documents
    corpus: payload = utf-8 bytes of the text (a deterministic stand-in
    for image/audio bytes), media_type from doc_id, n_bytes metadata."""
    t = F.col(text_col)
    return docs.select(
        "doc_id",
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode(t, "UTF-8").alias("payload"),
        F.length(F.encode(t, "UTF-8")).alias("n_bytes"),
    )


def decode_image_stub(payload: bytes) -> tuple[int, int, int, float]:
    """STUB decoder (no media libs in this container): deterministic
    fake dimensions/feature derived from the payload bytes. A real
    implementation would `PIL.Image.open(io.BytesIO(payload))` etc.
    Raising NotImplementedError here would also be contract-valid; the
    deterministic fake is used so the distributed plumbing is testable.
    """
    n = len(payload)
    checksum = sum(payload[:64]) if n else 0
    width = 16 + (checksum % 64)
    height = 16 + (n % 64)
    channels = 3
    feature0 = float((checksum * 31 + n) % 1000) / 1000.0
    return width, height, channels, feature0


def extract_features(media: DataFrame) -> DataFrame:
    """Decode/feature-extract over the binary column with mapInPandas:
    Arrow-batched, one Python roundtrip per batch (not per row), binary
    payload dropped from the output so only slim features shuffle."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            decoded = pdf["payload"].map(decode_image_stub)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "channels": [d[2] for d in decoded],
                    "feature0": [d[3] for d in decoded],
                }
            )

    return media.mapInPandas(batches, FEATURE_SCHEMA)


def media_stats(media: DataFrame) -> DataFrame:
    """Byte-size stats per media type — metadata-only plan: Catalyst
    prunes the binary column out of the scan entirely."""
    return media.groupBy("media_type").agg(
        F.count("*").alias("n_files"),
        F.sum("n_bytes").cast("bigint").alias("total_bytes"),
        F.min("n_bytes").cast("bigint").alias("min_bytes"),
        F.max("n_bytes").cast("bigint").alias("max_bytes"),
    )


FRAME_SCHEMA = (
    "doc_id bigint, media_type string, frame_idx int, "
    "frame_payload binary, frame_bytes bigint"
)


def n_frames_for(media_type: str, n_bytes: int) -> int:
    """Deterministic stub frame count: videos sample n_bytes%5+1
    frames, other media contribute none. (A real implementation asks
    the container format for duration/fps.)"""
    return (n_bytes % 5 + 1) if media_type == "video" else 0


def frame_sample(media: DataFrame) -> DataFrame:
    """Frame sampling: one input video row fans out to N frame rows
    (1→N generator through mapInPandas). Frame extraction is STUBBED
    as byte-range slices of the payload; a real build swaps in ffmpeg
    keyframe extraction with the identical schema/fan-out contract.
    Frames carry slim metadata; the full payload is NOT replicated
    per frame — each frame holds only its slice."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {
                "doc_id": [],
                "media_type": [],
                "frame_idx": [],
                "frame_payload": [],
                "frame_bytes": [],
            }
            for _, r in pdf.iterrows():
                k = n_frames_for(r["media_type"], r["n_bytes"])
                payload = r["payload"]
                for i in range(k):
                    chunk = payload[i * 16 : (i + 1) * 16]
                    rows["doc_id"].append(r["doc_id"])
                    rows["media_type"].append(r["media_type"])
                    rows["frame_idx"].append(i)
                    rows["frame_payload"].append(chunk)
                    rows["frame_bytes"].append(len(chunk))
            if rows["doc_id"]:
                yield pd.DataFrame(rows)

    return media.mapInPandas(batches, FRAME_SCHEMA)


RESIZED_SCHEMA = (
    "doc_id bigint, media_type string, width int, height int, "
    "resized_payload binary, n_bytes bigint"
)


def resize_images(media: DataFrame, max_dim: int = 32) -> DataFrame:
    """Resize stub: clamp stub-decoded dimensions to ``max_dim`` and
    emit a proportionally truncated payload (a real build calls
    PIL.Image.thumbnail and re-encodes; schema and plan are identical).
    Only image rows are resized — others pass through untouched, the
    mixed-modality routing a real pipeline needs."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            out = {
                "doc_id": [], "media_type": [], "width": [],
                "height": [], "resized_payload": [], "n_bytes": [],
            }
            for _, r in pdf.iterrows():
                w, h, _, _ = decode_image_stub(r["payload"])
                payload = r["payload"]
                if r["media_type"] == "image" and max(w, h) > max_dim:
                    scale = max_dim / max(w, h)
                    w, h = max(1, int(w * scale)), max(1, int(h * scale))
                    payload = payload[: max(1, int(len(payload) * scale))]
                out["doc_id"].append(r["doc_id"])
                out["media_type"].append(r["media_type"])
                out["width"].append(w)
                out["height"].append(h)
                out["resized_payload"].append(payload)
                out["n_bytes"].append(len(payload))
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, RESIZED_SCHEMA)
