"""Multimodal column operators: image/audio/video as opaque ``binary``
columns with typed metadata, processed in Arrow-batched mapInPandas.

The decode libraries (Pillow / torchaudio / decord) are NOT in this
container, so the decode step is a clearly-marked deterministic fake behind
the same schema (or raises NotImplementedError when strict=True). The
Spark-side plumbing — schemas, batch shapes, partitioning, UDF signatures —
is real and tested; a cluster deployment swaps only the codec function.

Operators:
  * attach_media_meta  — typed metadata struct from the binary header.
  * decode_image       — binary -> fixed-size feature vector (stub codec).
  * sample_frames      — video binary -> N frame rows (flatMap shape).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 16

MEDIA_META_SCHEMA = (
    "media_type string, byte_len int, header_hex string"
)


def attach_media_meta(df: DataFrame, binary_col: str = "media") -> DataFrame:
    """Typed metadata for an opaque binary column — pure native SQL
    (magic-byte sniffing via hex prefixes, P10-style when-chain)."""
    head = F.hex(F.substring(F.col(binary_col), 1, 4))
    media_type = (
        F.when(head.startswith("89504E47"), "image/png")
        .when(head.startswith("FFD8"), "image/jpeg")
        .when(head.startswith("494433"), "audio/mpeg")
        .when(head.startswith("1A45DFA3"), "video/webm")
        .otherwise("application/octet-stream")
    )
    return df.withColumn(
        "media_meta",
        F.struct(
            media_type.alias("media_type"),
            F.length(F.col(binary_col)).alias("byte_len"),
            head.alias("header_hex"),
        ),
    )


def _fake_decode(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """STUB CODEC — deterministic fake. A real deployment replaces this with
    Pillow/torchvision decode + a feature extractor; everything around it
    (Arrow batching, schema, partition shape) stays identical."""
    digest = hashlib.sha256(bytes(payload)).digest()
    arr = np.frombuffer(digest[: dim * 2], dtype=np.uint16).astype(np.float64)
    return list(arr / 65535.0)


def decode_image(df: DataFrame, binary_col: str = "media",
                 strict: bool = False) -> DataFrame:
    """binary -> features array<double> via Arrow-batched mapInPandas.

    strict=True raises NotImplementedError (the honest posture when fake
    features are unacceptable); default emits the deterministic stub."""
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", features array<double>"

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if strict:
            raise NotImplementedError(
                "image decode requires Pillow/torchvision (not in container); "
                "swap _fake_decode for the real codec on a cluster"
            )
        for pdf in it:
            yield pdf.assign(features=[_fake_decode(p) for p in pdf[binary_col]])

    return df.mapInPandas(run, schema=out_schema)


def sample_frames(df: DataFrame, n_frames: int = 4,
                  binary_col: str = "media",
                  key_cols: tuple[str, ...] = ("doc_id",)) -> DataFrame:
    """video binary -> one row per sampled frame (flatMap shape: the video
    analogue of the doc->pages explode). Frame payloads are deterministic
    stub slices; a real codec yields decoded frames at the same schema."""
    keys = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                     for f in df.schema.fields if f.name in key_cols)
    out_schema = f"{keys}, frame_no int, frame_payload binary"

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            # vectorized explode: each input row repeats n_frames times
            # (pandas repeat/tile, no per-row iterrows); only the payload
            # slice is a per-cell op, unavoidable until the real codec
            # (which consumes the whole batch) replaces it
            base = pdf[list(key_cols)].loc[pdf.index.repeat(n_frames)].reset_index(drop=True)
            base["frame_no"] = np.tile(np.arange(n_frames, dtype=np.int32), len(pdf))
            payloads = [bytes(p) for p in pdf[binary_col]]
            steps = [max(1, len(p) // n_frames) for p in payloads]
            base["frame_payload"] = [
                payloads[j][i * steps[j]: (i + 1) * steps[j]] or b"\x00"
                for j in range(len(payloads))
                for i in range(n_frames)
            ]
            yield base

    return df.mapInPandas(run, schema=out_schema)
