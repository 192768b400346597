"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Decode is real at the CONTAINER level: ``real_decoder`` parses PNG/JPEG/GIF
dimensions and WAV audio parameters from the actual byte layouts
(stdlib-only — see ``media_header``) into a metadata feature vector;
pixel/sample-level decode (the part that genuinely needs PIL/librosa/
ffmpeg, absent from this container) plugs in by replacing that one hook.
``fake_decoder`` remains as the deterministic stand-in for pipeline-shape
tests.  Everything Spark-side is real and tested either way: schema, Arrow
batch shape, mapInPandas signatures, partitioning, and the feature pipeline
(decode → feature-extract → resize/frame-sample metadata).

At 100 TB the binary payloads dominate I/O, so the operators here:
- never shuffle raw bytes (features are extracted in the map stage, bytes
  are dropped before any wide transformation);
- push column pruning: a metadata-only query never reads the blob column
  (parquet columnar layout gives this for free);
- bound Arrow batch bytes via maxRecordsPerBatch (decode memory is
  per-batch, not per-partition).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# media table shape: media_id long, kind string, mime string, width int,
# height int, duration_ms int, payload binary  (see synthetic_media_df)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("sha256", StringType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


_FORMAT_IDS = {"png": 1.0, "jpeg": 2.0, "gif": 3.0, "wav": 4.0}


def media_header(payload: bytes) -> dict:
    """Stdlib-only container-header decode: PNG / JPEG / GIF dimensions and
    WAV audio parameters, parsed from the real byte layout (no image/audio
    libraries needed — this is what the container formats themselves
    guarantee).  Returns {format, width, height, depth, channels} for
    images, {format, channels, sample_rate, bits} for WAV; raises
    ValueError on anything unrecognized/truncated."""
    import struct

    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        # IHDR is mandatory-first: length(4) type(4) at offset 8, data at 16
        if len(payload) < 26 or payload[12:16] != b"IHDR":
            raise ValueError("truncated PNG")
        w, h = struct.unpack(">II", payload[16:24])
        bit_depth, color_type = payload[24], payload[25]
        channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type, 0)
        return {
            "format": "png", "width": w, "height": h,
            "depth": bit_depth, "channels": channels,
        }
    if payload[:2] == b"\xff\xd8":  # JPEG SOI; walk segments to SOFn
        i = 2
        while i + 1 < len(payload):
            if payload[i] != 0xFF:
                raise ValueError("corrupt JPEG segment stream")
            # the spec allows any number of 0xFF FILL bytes before the
            # marker byte (ADVICE r06: treating a fill byte as the marker
            # read a bogus segment length and rejected valid files)
            j = i + 1
            while j < len(payload) and payload[j] == 0xFF:
                j += 1
            if j >= len(payload):
                break
            marker = payload[j]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i = j + 1  # standalone marker, no length field
                continue
            if marker in (0xDA, 0xD9):
                # SOS/EOI before any SOFn: entropy-coded data follows (or
                # the stream ended) — bail out cleanly instead of walking
                # into compressed bytes
                break
            if j + 9 >= len(payload):
                break
            seg_len = struct.unpack(">H", payload[j + 1 : j + 3])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                depth = payload[j + 3]
                h, w = struct.unpack(">HH", payload[j + 4 : j + 8])
                channels = payload[j + 8]
                return {
                    "format": "jpeg", "width": w, "height": h,
                    "depth": depth, "channels": channels,
                }
            i = j + 1 + seg_len
        raise ValueError("no SOF marker in JPEG")
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        if len(payload) < 11:
            raise ValueError("truncated GIF")
        w, h = struct.unpack("<HH", payload[6:10])
        depth = (payload[10] & 0x07) + 1  # global color table bits/pixel
        return {
            "format": "gif", "width": w, "height": h,
            "depth": depth, "channels": 1,
        }
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        if len(payload) < 36 or payload[12:16] != b"fmt ":
            raise ValueError("truncated WAV")
        channels, sample_rate = struct.unpack("<HI", payload[22:28])
        bits = struct.unpack("<H", payload[34:36])[0]
        return {
            "format": "wav", "channels": channels,
            "sample_rate": sample_rate, "bits": bits,
        }
    raise ValueError("unrecognized media container")


def real_decoder(payload: bytes, kind: str, mime: str) -> np.ndarray:
    """Real (stdlib) decode: container header → 16-dim metadata feature
    vector [format_id, width, height, depth, channels, sample_rate,
    log1p(bytes), 0…].  Pixel/sample-level decode (the part that genuinely
    needs PIL/librosa/ffmpeg) plugs in by replacing this hook; the Spark
    plumbing (Arrow batches, schema, byte-dropping before shuffles) is
    identical either way."""
    meta = media_header(bytes(payload))
    vec = np.zeros(16, dtype=np.float32)
    vec[0] = _FORMAT_IDS.get(meta["format"], 0.0)
    vec[1] = float(meta.get("width", 0))
    vec[2] = float(meta.get("height", 0))
    vec[3] = float(meta.get("depth", meta.get("bits", 0)))
    vec[4] = float(meta.get("channels", 0))
    vec[5] = float(meta.get("sample_rate", 0))
    vec[6] = np.float32(np.log1p(len(payload)))
    return vec


def fake_decoder(payload: bytes, kind: str, mime: str) -> np.ndarray:
    """Deterministic stand-in: a 16-dim float vector derived from the
    payload's sha256 — stable across machines, good enough to exercise the
    whole pipeline shape end-to-end."""
    h = hashlib.sha256(payload).digest()
    return (np.frombuffer(h[:16], dtype=np.uint8).astype(np.float32) / 255.0)


def extract_features(
    media: DataFrame,
    decoder=fake_decoder,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """binary payload → (media_id, kind, n_bytes, sha256, feature[16]).

    One Arrow-batched pass; bytes never leave the map stage.
    """
    cols = [id_col, "kind", "mime", payload_col]
    src = media.select(*cols)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            kinds = pdf["kind"].to_numpy(dtype=object)
            mimes = pdf["mime"].to_numpy(dtype=object)
            payloads = pdf[payload_col].to_numpy(dtype=object)
            feats, shas, nbytes = [], [], []
            for i in range(len(ids)):
                p = payloads[i] if payloads[i] is not None else b""
                vec = decoder(bytes(p), kinds[i], mimes[i])
                feats.append([float(x) for x in vec])
                shas.append(hashlib.sha256(bytes(p)).hexdigest())
                nbytes.append(len(p))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "kind": pd.Series(kinds, dtype=object),
                    "n_bytes": pd.Series(nbytes, dtype="int64"),
                    "sha256": pd.Series(shas, dtype=object),
                    "feature": pd.Series(feats, dtype=object),
                }
            )

    return src.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(
    media: DataFrame, every_ms: int = 1000, id_col: str = "media_id"
) -> DataFrame:
    """Video frame-sampling plan: (media_id, frame_no, ts_ms) rows from the
    duration metadata alone — no payload read (column pruning verified in
    tests).  The actual frame decode is the stubbed decoder's job."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            id_col,
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(
                        (F.col("duration_ms") / every_ms).cast("int") - 1, F.lit(0)
                    ),
                )
            ).alias("frame_no"),
        )
        .withColumn("ts_ms", F.col("frame_no") * every_ms)
    )


def synthetic_media_df(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests (no external data)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * (4 + i % 7)
        rows.append(
            (
                i,
                kind,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                64 + i if kind == "image" else None,
                48 + i if kind == "image" else None,
                1000 * (1 + i % 10) if kind != "image" else None,
                bytearray(payload),
            )
        )
    return spark.createDataFrame(
        rows,
        "media_id long, kind string, mime string, width int, height int, "
        "duration_ms int, payload binary",
    )
