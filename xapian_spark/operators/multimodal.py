"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The image/audio decode libraries are not available in this container, so the
DECODE step is stubbed (deterministic fake via ``fake_decoder``, or
``NotImplementedError`` via ``real_decoder``), but everything Spark-side is
real and tested: schema, Arrow batch shape, mapInPandas signatures,
partitioning, and the feature pipeline (decode → feature-extract →
resize/frame-sample metadata).

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


def real_decoder(payload: bytes, kind: str, mime: str) -> np.ndarray:
    """The production decode hook — plug PIL/librosa/ffmpeg here."""
    raise NotImplementedError(
        "media decode libraries are not available in this environment; "
        "use fake_decoder for tests or inject a real decoder"
    )


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
