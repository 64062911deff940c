"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata,
processed in Arrow-batched ``mapInPandas`` stages.

The Spark-side machinery here is real and tested: binary columns, fixed
output schema, batch iteration, partition-preserving map. The *decoder* is
pluggable: real image/audio/video libraries are not present in this
environment, so the default decoder is a clearly-marked deterministic fake
(features derived arithmetically from the payload bytes) and
:func:`real_decode` raises ``NotImplementedError`` until a codec backend
(PIL / torchaudio / pyav) is installed.

Reference parity: spider-go treats payloads as opaque JSON strings handed to
worker handlers (/root/reference/pkg/spider/worker.go:39-67,
message.go:14-24); media spans in the crawl's interleaved documents
(media_ref spans) are the same idea with bytes. Scale: feature extraction is
a pure map stage — no shuffle; batch size is governed by
``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_FEATURES = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("media_kind", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("digest", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("frame_count", IntegerType(), True),
    ]
)

_KINDS = ("image", "audio", "video")


def encode_ppm(width: int, height: int, rgb: "np.ndarray") -> bytes:
    """Write a binary P6 PPM (the simplest real raster format: ASCII
    header ``P6\\n<w> <h>\\n255\\n`` + width×height×3 raw RGB bytes)."""
    import numpy as np

    rgb = np.asarray(rgb, dtype=np.uint8)
    if rgb.size != width * height * 3:
        raise ValueError(
            f"pixel buffer has {rgb.size} bytes, need {width * height * 3}"
        )
    return f"P6\n{width} {height}\n255\n".encode("ascii") + rgb.tobytes()


def decode_ppm(payload: bytes) -> dict:
    """REAL byte-level image decode for binary P6 PPM: parse the ASCII
    header (magic, dimensions, maxval — '#' comment lines allowed, per the
    format), then interpret exactly width×height×3 pixel bytes with numpy
    and return integer-exact channel statistics. Malformed input fails
    loudly with a diagnostic ValueError — a decoder that guesses is worse
    than none at 100 TB."""
    import numpy as np

    if payload[:2] != b"P6":
        raise ValueError(f"not a P6 PPM (magic {payload[:2]!r})")
    # tokenize the header: three whitespace-separated fields after the
    # magic, skipping '#' comments
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if pos < len(payload) and payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PPM header")
        fields.append(payload[start:pos])
    width, height, maxval = (int(f) for f in fields)
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval} (only 8-bit)")
    pos += 1  # exactly one whitespace byte after maxval, per spec
    n = width * height * 3
    pixels = np.frombuffer(payload, dtype=np.uint8, count=-1, offset=pos)
    if pixels.size != n:
        raise ValueError(
            f"PPM pixel payload has {pixels.size} bytes, header promises {n}"
        )
    rgb = pixels.reshape(height, width, 3).astype(np.int64)
    return {
        "width": width,
        "height": height,
        "n_pixels": width * height,
        "sum_r": int(rgb[:, :, 0].sum()),
        "sum_g": int(rgb[:, :, 1].sum()),
        "sum_b": int(rgb[:, :, 2].sum()),
    }


def real_decode(payload: bytes, kind: str) -> dict:
    """Real codec dispatch: binary P6 PPM images decode byte-for-byte
    (header parse + numpy pixel stats, :func:`decode_ppm`); other
    containers still require an external codec backend (PIL/pyav) and
    raise until one is installed."""
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    raise NotImplementedError(
        "real media decoding beyond P6 PPM requires a codec backend "
        "(PIL/pyav); use fake_decode for deterministic tests"
    )


def fake_decode(n_bytes: "pd.Series", kind: "pd.Series") -> "pd.DataFrame":
    """DETERMINISTIC FAKE decoder: feature values are pure arithmetic on the
    payload size (stable across engines/runs; replace with real_decode when
    codecs exist). Vectorized over the batch."""
    width = ((n_bytes * 7) % 1024).astype("int32")
    height = ((n_bytes * 13) % 768).astype("int32")
    frames = ((n_bytes % 120) + 1).astype("int32")
    return pd.DataFrame(
        {
            "width": width.where(kind != "audio", other=pd.NA).astype("Int32"),
            "height": height.where(kind != "audio", other=pd.NA).astype("Int32"),
            "frame_count": frames.where(kind == "video", other=pd.NA).astype("Int32"),
        }
    )


def extract_media_features(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Arrow-batched feature extraction over a binary payload column.

    Input: df with (id_col: long, payload_col: binary). Output:
    MEDIA_FEATURES rows, one per input row; media_kind assigned
    deterministically by id (until real container sniffing exists).
    """
    import hashlib

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            payloads = pdf[payload_col]
            n_bytes = payloads.map(len).astype("int64")
            kind = pdf[id_col].map(lambda i: _KINDS[int(i) % 3])
            digest = payloads.map(lambda b: hashlib.md5(bytes(b)).hexdigest())
            feats = fake_decode(n_bytes, kind)
            out = pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "media_kind": kind,
                    "n_bytes": n_bytes,
                    "digest": digest,
                }
            )
            yield pd.concat([out, feats], axis=1)

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(extract, MEDIA_FEATURES)
