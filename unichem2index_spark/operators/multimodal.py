"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

Two decode paths, both Arrow-batched through one ``mapInPandas`` pass:

* ``fake=True`` — deterministic stub (dims/features derived from a
  sha256), for plumbing tests on arbitrary payloads.
* ``fake=False`` — REAL decode: pure-Python magic-byte header parsers
  (PNG IHDR, GIF logical screen, JPEG SOF, WAV fmt chunk — no
  PIL/ffmpeg, which are absent in this container) extract
  width/height/sample-rate, plus a deterministic 8-bin byte-histogram
  feature over the payload. Unrecognized payloads decode to format
  'unknown' with null dims rather than raising. A deployment with real
  media libraries swaps ``_parse_header``/``_byte_histogram`` for
  PIL/ffmpeg calls — the Spark-side plumbing (schema, partitioning,
  batch shape) is identical.
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
        T.StructField("format", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("sha256", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


# --------------------------------------------------------------------------
# Pure-Python magic-byte header parsers (unit-testable without Spark)
# --------------------------------------------------------------------------
def _parse_png(b: bytes) -> dict | None:
    # 8-byte signature, then the IHDR chunk: len(4) 'IHDR' width(4BE) height(4BE)
    if len(b) < 24 or b[:8] != b"\x89PNG\r\n\x1a\n" or b[12:16] != b"IHDR":
        return None
    return {
        "format": "png",
        "width": int.from_bytes(b[16:20], "big"),
        "height": int.from_bytes(b[20:24], "big"),
    }


def _parse_gif(b: bytes) -> dict | None:
    if len(b) < 10 or b[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    return {
        "format": "gif",
        "width": int.from_bytes(b[6:8], "little"),
        "height": int.from_bytes(b[8:10], "little"),
    }


def _parse_jpeg(b: bytes) -> dict | None:
    # Walk marker segments to the first SOF (frame header) for dims.
    if len(b) < 4 or b[:2] != b"\xff\xd8":
        return None
    i = 2
    while i + 9 < len(b):
        if b[i] != 0xFF:
            return None
        marker = b[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:  # no payload
            i += 2
            continue
        seg_len = int.from_bytes(b[i + 2 : i + 4], "big")
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            return {
                "format": "jpeg",
                "height": int.from_bytes(b[i + 5 : i + 7], "big"),
                "width": int.from_bytes(b[i + 7 : i + 9], "big"),
            }
        i += 2 + seg_len
    return None


def _parse_wav(b: bytes) -> dict | None:
    # RIFF....WAVE, then chunk walk to 'fmt ': channels(2LE) sample_rate(4LE)
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    i = 12
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        clen = int.from_bytes(b[i + 4 : i + 8], "little")
        if cid == b"fmt " and i + 16 <= len(b):
            return {
                "format": "wav",
                "channels": int.from_bytes(b[i + 10 : i + 12], "little"),
                "sample_rate": int.from_bytes(b[i + 12 : i + 16], "little"),
            }
        i += 8 + clen + (clen % 2)
    return None


def _parse_header(b: bytes) -> dict:
    """Dispatch on magic bytes; {'format': 'unknown'} when unrecognized."""
    for parser in (_parse_png, _parse_gif, _parse_jpeg, _parse_wav):
        meta = parser(b)
        if meta is not None:
            return meta
    return {"format": "unknown"}


def _byte_histogram(b: bytes, bins: int = 8) -> list[float]:
    """Deterministic content feature: normalized byte histogram."""
    if not b:
        return [0.0] * bins
    counts = [0] * bins
    for x in b:
        counts[x * bins // 256] += 1
    n = float(len(b))
    return [c / n for c in counts]


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
    ``fake=False`` (default) runs the real magic-byte header parsers +
    byte-histogram feature; ``fake=True`` runs the deterministic stub.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                raw = bytes(payload) if payload is not None else b""
                if fake:
                    d = _fake_decode(raw, kind)
                    meta = {"format": "fake"}
                    width = d["width"] if kind == "image" else None
                    height = d["height"] if kind == "image" else None
                    feature = d["feature"]
                else:
                    meta = _parse_header(raw)
                    width = meta.get("width")
                    height = meta.get("height")
                    feature = _byte_histogram(raw)
                rows.append(
                    {
                        "media_id": int(mid),
                        "kind": kind,
                        "format": meta["format"],
                        "n_bytes": len(raw),
                        "sha256": hashlib.sha256(raw).hexdigest(),
                        "width": width,
                        "height": height,
                        "sample_rate": meta.get("sample_rate"),
                        "channels": meta.get("channels"),
                        "feature": feature,
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


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("out_width", T.IntegerType(), False),
        T.StructField("out_height", T.IntegerType(), False),
        T.StructField("thumb", T.BinaryType(), False),
        T.StructField("thumb_sha256", T.StringType(), False),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("byte_offset", T.LongType(), False),
        T.StructField("frame", T.BinaryType(), False),
        T.StructField("frame_sha256", T.StringType(), False),
    ]
)


def resize_images(
    df: DataFrame, out_width: int = 32, out_height: int = 32
) -> DataFrame:
    """Resize plumbing for image binary columns via ``mapInPandas`` —
    one Arrow-batched pass, images only (`kind = 'image'` is pruned
    BEFORE the Python worker, so audio/video bytes never cross the
    Arrow boundary).

    The "resample" here is a deterministic byte-space nearest-neighbor
    stride to out_width*out_height bytes — a STUB for the pixel-space
    op (PIL is absent in this container); a real deployment replaces
    the two stride lines with ``PIL.Image.resize``. Everything the
    cluster cares about is real: pruned input, batch shape, fixed-size
    binary output column, one output row per image."""
    n_out = int(out_width) * int(out_height)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                if not raw:
                    thumb = bytes(n_out)
                else:
                    # nearest-neighbor stride in byte space (stub for
                    # PIL.Image.resize — same shape contract)
                    idx = [(i * len(raw)) // n_out for i in range(n_out)]
                    thumb = bytes(raw[i] for i in idx)
                rows.append(
                    {
                        "media_id": int(mid),
                        "out_width": int(out_width),
                        "out_height": int(out_height),
                        "thumb": thumb,
                        "thumb_sha256": hashlib.sha256(thumb).hexdigest(),
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in RESIZED_SCHEMA.fields]
            )

    return (
        df.where(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(fn, RESIZED_SCHEMA)
    )


def sample_frames(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame-sampling plumbing for video binary columns: one input row
    fans out to ``n_frames`` output rows (media_id, frame_idx, frame)
    through a single ``mapInPandas`` pass — the 1→N batch shape a real
    ffmpeg keyframe sampler produces, with videos pruned before Python.

    Frames are deterministic equal-stride byte windows (STUB for the
    ffmpeg seek+decode; a real build replaces the slicing with
    ``ffmpeg -ss <ts> -frames:v 1``). Offsets are emitted so downstream
    ops can reason about position without touching the bytes."""
    k = int(n_frames)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                n = len(raw)
                win = max(1, n // (k * 2)) if n else 1
                for fi in range(k):
                    off = (fi * n) // k if n else 0
                    frame = raw[off : off + win] if n else b""
                    rows.append(
                        {
                            "media_id": int(mid),
                            "frame_idx": fi,
                            "byte_offset": off,
                            "frame": frame,
                            "frame_sha256": hashlib.sha256(frame).hexdigest(),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAME_SCHEMA.fields]
            )

    return (
        df.where(F.col("kind") == "video")
        .select("media_id", "payload")
        .mapInPandas(fn, FRAME_SCHEMA)
    )
