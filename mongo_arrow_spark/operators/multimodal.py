"""Multimodal (image/audio/video) column plumbing.

Follows the reference's Binary-with-subtype model (reference
types.py:148-182): media is an opaque ``binary`` payload column plus typed
metadata. The Spark-side plumbing — schema, Arrow-batched mapInPandas
decode, partition sizing — is real and tested; the codec call itself is
STUBBED (decode libs are not in this container) behind
``NotImplementedError`` with a deterministic fake used by tests.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)


def attach_payload(
    df: DataFrame, source_col: str = "text", id_col: str = "doc_id", mime: str = "application/octet-stream"
) -> DataFrame:
    """Build a media table from any column by encoding it as binary —
    the plumbing equivalent of ingesting image bytes."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(source_col).cast("string"), "UTF-8").alias("payload"),
        F.lit(mime).alias("mime"),
        F.create_map(
            F.lit("origin"), F.lit(source_col), F.lit("codec"), F.lit("identity")
        ).alias("meta"),
    )


def payload_stats(df: DataFrame) -> DataFrame:
    """Cheap JVM-side facts about payloads: size + sha256 — the integrity /
    dedup pass you run before any expensive decode."""
    return df.select(
        "media_id",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.sha2("payload", 256).alias("sha256"),
        "mime",
    )


def _decode_real(payload: bytes, mime: str):  # pragma: no cover - stub
    """Real codec hook. Image/audio libs are not available in this
    container; deployments monkeypatch or subclass this."""
    raise NotImplementedError(
        "media decode requires codec libraries (PIL/ffmpeg) not present here"
    )


def _decode_fake(payload: bytes, mime: str) -> tuple[int, int, float]:
    """Deterministic fake decode used for plumbing tests: derives
    (width, height, duration) from payload bytes."""
    n = len(payload)
    return (n % 640 + 1, (n * 7) % 480 + 1, round(n / 1000.0, 3))


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_s", T.DoubleType()),
    ]
)


def decode_media(df: DataFrame, use_fake: bool = True, batch_hint: int = 1024) -> DataFrame:
    """Decode/feature-extract via Arrow-batched mapInPandas.

    The partitioning contract is the scale story: payload bytes stay in
    executor-local Arrow batches, Python sees pandas chunks of
    ``batch_hint`` rows, and output is a narrow typed frame — at 100 TB
    the decode cost dominates and parallelism is (input splits ×
    spark.sql.files.maxPartitionBytes), so size input files accordingly.
    """
    decode = _decode_fake if use_fake else _decode_real

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "n_bytes": pdf["payload"].map(len),
            }
            decoded = [decode(p, m) for p, m in zip(pdf["payload"], pdf["mime"])]
            out["width"] = [d[0] for d in decoded]
            out["height"] = [d[1] for d in decoded]
            out["duration_s"] = [d[2] for d in decoded]
            yield pd.DataFrame(out)

    return df.select("media_id", "payload", "mime").mapInPandas(
        run, schema=DECODED_SCHEMA
    )


def frame_sample(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plumbing: emit (media_id, frame_no) rows for every
    n-th frame of a fake 100-frame clip — the explode pattern real video
    sampling uses (posexplode over decoded frame arrays)."""
    return df.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.lit(99), F.lit(every_n))
        ).alias("frame_no"),
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes_out", T.LongType()),
    ]
)


def _resize_fake(payload: bytes, mime: str, target_w: int) -> tuple[int, int, int]:
    """Deterministic fake resize: aspect-preserving downscale to at most
    ``target_w`` wide; output byte count scales with the pixel ratio.
    Mirrors what a PIL/ffmpeg-backed hook returns: (w, h, bytes)."""
    w, h, _ = _decode_fake(payload, mime)
    new_w = min(target_w, w)
    new_h = max(1, round(h * new_w / w))
    n_out = len(payload) * (new_w * new_h) // max(1, w * h)
    return (new_w, new_h, n_out)


def resize_media(
    df: DataFrame, target_w: int = 256, use_fake: bool = True, batch_hint: int = 1024
) -> DataFrame:
    """Resize plumbing via Arrow-batched mapInPandas — identical batch /
    schema / partitioning contract to decode_media; the real transform is
    the same stubbed codec hook. Output is narrow typed rows, payload
    bytes never leave the executor."""
    if not use_fake:
        _decode_real(b"", "")  # raises NotImplementedError with context

    def run(batches):
        for pdf in batches:
            resized = [
                _resize_fake(p, m, target_w)
                for p, m in zip(pdf["payload"], pdf["mime"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [r[0] for r in resized],
                    "height": [r[1] for r in resized],
                    "n_bytes_out": [r[2] for r in resized],
                }
            )

    return df.select("media_id", "payload", "mime").mapInPandas(
        run, schema=RESIZED_SCHEMA
    )
