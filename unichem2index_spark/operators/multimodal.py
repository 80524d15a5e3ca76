"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The decode step is STUBBED (the image/audio libraries are not in this
container): ``decode_image_meta`` raises ``NotImplementedError`` unless
``fake=True``, in which case a deterministic fake decoder exercises the
real Spark-side plumbing — schema, Arrow batch shape, ``mapInPandas``
signature, partitioning — exactly as a real decoder would.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta_json", T.StringType(), True),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("sha256", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def media_from_documents(d: DataFrame) -> DataFrame:
    """Derive a deterministic fake media table from the documents corpus
    (text bytes as payload) — the binary-column plumbing fixture."""
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return d.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.col("text").cast("binary").alias("payload"),
        F.to_json(F.struct("lang", "source")).alias("meta_json"),
    )


def _fake_decode(payload: bytes, kind: str) -> dict:
    """Deterministic fake decode: dimensions/features derived from a sha256
    of the payload. A real build swaps this one function for PIL/ffmpeg."""
    h = hashlib.sha256(payload or b"").digest()
    width = 64 + h[0]
    height = 64 + h[1]
    feat = [b / 255.0 for b in h[:8]]
    return {"width": width, "height": height, "feature": feat}


def decode_media(df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode / feature-extract binary media via ``mapInPandas``.

    Arrow-batched; one Python worker pass, no per-row Python UDF calls.
    """
    if not fake:
        raise NotImplementedError(
            "real media decoding requires PIL/ffmpeg (absent in this "
            "container); call with fake=True for the deterministic stub"
        )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                raw = bytes(payload) if payload is not None else b""
                d = _fake_decode(raw, kind)
                rows.append(
                    {
                        "media_id": int(mid),
                        "kind": kind,
                        "n_bytes": len(raw),
                        "sha256": hashlib.sha256(raw).hexdigest(),
                        "width": d["width"] if kind == "image" else None,
                        "height": d["height"] if kind == "image" else None,
                        "feature": d["feature"],
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in DECODED_SCHEMA.fields]
            )

    return df.select("media_id", "kind", "payload").mapInPandas(
        fn, DECODED_SCHEMA
    )


def binary_meta(spark, t) -> DataFrame:
    """SQL-checkable slice of the binary plumbing: byte length + md5 of the
    payload column (engine-identical on UTF-8 text payloads)."""
    media = media_from_documents(t["documents"])
    return media.select(
        "media_id",
        "kind",
        F.length("payload").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"),
    ).orderBy("media_id")
