"""Multimodal (image/audio/video) column plumbing (driver mandate).

Opaque media as `binary` columns + typed metadata structs; decode /
feature-extract / resize / frame-sample as Arrow-batched pandas
functions over mapInPandas. The media codec libraries are NOT in this
container, so the decode kernels are stubbed (NotImplementedError or a
clearly-marked deterministic fake) — the Spark-side contract (schema,
batch shape, partitioning) is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # 'image'|'audio'|'video'
        T.StructField("payload", T.BinaryType(), True),  # opaque encoded bytes
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def synthesize_media(df: DataFrame, id_col: str, kind: str = "image") -> DataFrame:
    """Deterministic fake media: payload = md5-seeded bytes from the id.
    Stands in for real encoded media so the plumbing is exercised."""
    payload = F.unbase64(F.base64(F.encode(F.md5(F.col(id_col).cast("string")), "utf-8")))
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(kind).alias("kind"),
        payload.alias("payload"),
        F.struct(
            F.lit("application/x-fake").alias("mime"),
            F.lit(64).cast("int").alias("width"),
            F.lit(64).cast("int").alias("height"),
            F.lit(1000).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def _decode_real(payload: bytes, kind: str):  # pragma: no cover - stub
    """Real decode hook. Requires PIL/ffmpeg-class libs (absent here)."""
    raise NotImplementedError("media codecs not available in this environment; use fake_features")


def extract_features(media: DataFrame, batch_hint: int = 1024, use_fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over mapInPandas.

    Fake kernel: 4-dim feature from payload byte statistics —
    deterministic so tests can assert exact values. Real kernel would
    decode via _decode_real; same schema either way.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not use_fake:  # pragma: no cover
                _decode_real(None, "")
            feats = []
            for p in pdf["payload"]:
                b = bytes(p) if p is not None else b""
                n = max(len(b), 1)
                feats.append(
                    [
                        float(len(b)),
                        float(sum(b) % 256),
                        float(b[0] if b else 0),
                        float(sum(b) / n),
                    ]
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(bytes(p)) if p is not None else 0 for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return media.mapInPandas(kernel, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
    ]
)


def resize_images(media: DataFrame, width: int, height: int, use_fake: bool = True) -> DataFrame:
    """Resize kernel over mapInPandas. The fake kernel re-encodes the
    payload to a deterministic (width*height)-byte tiling of the input
    bytes; the real kernel would decode+resample via _decode_real with
    the identical schema and batch shape."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in batches:
            if not use_fake:  # pragma: no cover
                _decode_real(None, "image")
            out = []
            for p in pdf["payload"]:
                b = bytes(p) if p is not None else b"\x00"
                reps = (target // len(b)) + 1
                out.append((b * reps)[:target])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": out,
                    "width": [width] * len(pdf),
                    "height": [height] * len(pdf),
                }
            )

    return media.mapInPandas(kernel, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def sample_frames(media: DataFrame, every_ms: int = 250, use_fake: bool = True) -> DataFrame:
    """Frame sampling (1→N rows per video) over mapInPandas. Fake
    kernel: one frame per every_ms of meta.duration_ms, frame bytes =
    payload slice — deterministic row explosion with the real
    operator's schema and fan-out shape."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not use_fake:  # pragma: no cover
                _decode_real(None, "video")
            ids, idxs, frames = [], [], []
            for mid, p, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                b = bytes(p) if p is not None else b""
                dur = int(meta["duration_ms"]) if meta is not None else 0
                n_frames = max(dur // every_ms, 1)
                for i in range(n_frames):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(b[i % max(len(b), 1) :] + b[: i % max(len(b), 1)])
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return media.mapInPandas(kernel, schema=FRAME_SCHEMA)
