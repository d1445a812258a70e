"""Multimodal (image/audio/video) column plumbing (driver mandate).

Opaque media as `binary` columns + typed metadata structs; decode /
feature-extract / resize / frame-sample as Arrow-batched pandas
kernels over mapInPandas.

The decode path is REAL: a dependency-free 24-bit BMP codec
(struct/numpy only — encode, parse, nearest-neighbor resample), so the
full pipeline payload-bytes → pixel array → features/resize/re-encode
runs end-to-end in this container. Synthesized media payloads are
genuine BMP files derived deterministically from the row id. Heavier
codecs (JPEG/PNG/ffmpeg) follow the same kernel contract — decode() on
payload bytes inside an Arrow batch — and would slot into _decode()
unchanged; payloads that are not BMP fall back to byte-statistics
features rather than failing the batch.

Scale shape: one mapInPandas pass, no shuffle; per-batch memory is
bounded by spark.sql.execution.arrow.maxRecordsPerBatch × payload
size, so 100 TB of media shards across executors with no driver
involvement.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Pure-numpy 24-bit BMP codec (BITMAPINFOHEADER, bottom-up, BGR,
# rows padded to 4 bytes) — the standard uncompressed Windows bitmap.
# ---------------------------------------------------------------------------


def encode_bmp(pixels: np.ndarray) -> bytes:
    """H×W×3 uint8 RGB array → BMP file bytes."""
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError(f"expected H*W*3 RGB array, got shape {pixels.shape}")
    h, w, _ = pixels.shape
    row_size = (w * 3 + 3) & ~3  # rows padded to 4-byte boundary
    image_size = row_size * h
    file_size = 54 + image_size
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, image_size, 2835, 2835, 0, 0)
    rows = np.zeros((h, row_size), dtype=np.uint8)
    bgr = pixels[:, :, ::-1]  # RGB → BGR
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    return header + info + rows[::-1].tobytes()  # bottom-up row order


def decode_bmp(payload: bytes) -> np.ndarray:
    """BMP file bytes → H×W×3 uint8 RGB array. Raises ValueError on
    anything that is not a 24-bit uncompressed BITMAPINFOHEADER BMP."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if hdr_size < 40 or bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP: hdr={hdr_size} bpp={bpp} comp={compression}")
    bottom_up = h > 0
    h = abs(h)
    row_size = (w * 3 + 3) & ~3
    raw = np.frombuffer(payload, dtype=np.uint8, count=row_size * h, offset=data_offset)
    rows = raw.reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR → RGB


def bmp_file_size(payload: bytes, offset: int = 0) -> int:
    """Declared file size from a BMP header at `offset` (for splitting
    concatenated BMP streams — video = concatenated frame bitmaps)."""
    if payload[offset : offset + 2] != b"BM":
        raise ValueError("not a BMP header")
    return struct.unpack_from("<I", payload, offset + 2)[0]


def resize_nearest(pixels: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample (pure index arithmetic — deterministic)."""
    h, w, _ = pixels.shape
    ys = (np.arange(height) * h) // height
    xs = (np.arange(width) * w) // width
    return pixels[ys][:, xs]


def synth_pixels(media_id: int, width: int = 8, height: int = 8) -> np.ndarray:
    """Deterministic per-id test image: linear-congruential byte pattern."""
    n = width * height * 3
    seed = (media_id * 2654435761 + 12345) & 0xFFFFFFFF
    idx = np.arange(n, dtype=np.uint64)
    vals = (seed + idx * 1103515245 + (idx**2) * 12820163) % 256
    return vals.astype(np.uint8).reshape(height, width, 3)


# ---------------------------------------------------------------------------
# Spark-side schemas + operators
# ---------------------------------------------------------------------------

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

_IMG_W, _IMG_H = 8, 8
_FRAME_MS = 250  # synthetic video: one 8×8 frame per 250 ms


def synthesize_media(df: DataFrame, id_col: str, kind: str = "image") -> DataFrame:
    """Deterministic real media from row ids: images are genuine 24-bit
    BMP files; 'video' payloads are 4 concatenated BMP frames (frame f =
    pixels of id*1000+f); 'audio' is a raw PCM-ish byte ramp."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = []
            for mid in ids:
                if kind == "image":
                    payloads.append(encode_bmp(synth_pixels(int(mid), _IMG_W, _IMG_H)))
                elif kind == "video":
                    payloads.append(
                        b"".join(
                            encode_bmp(synth_pixels(int(mid) * 1000 + f, _IMG_W, _IMG_H))
                            for f in range(4)
                        )
                    )
                else:  # audio: deterministic byte ramp
                    seed = int(mid) % 251
                    payloads.append(bytes((seed + i) % 256 for i in range(256)))
            mime = {"image": "image/bmp", "video": "video/x-bmp-frames"}.get(
                kind, "audio/x-raw"
            )
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "kind": kind,
                    "payload": payloads,
                    "meta": [
                        {
                            "mime": mime,
                            "width": _IMG_W,
                            "height": _IMG_H,
                            "duration_ms": 4 * _FRAME_MS if kind == "video" else 1000,
                        }
                    ]
                    * len(ids),
                }
            )

    return df.mapInPandas(kernel, schema=MEDIA_SCHEMA)


def _image_features(img: np.ndarray) -> list[float]:
    """Decoded-pixel features: dims + per-channel means + global std."""
    means = img.reshape(-1, 3).mean(axis=0)
    return [
        float(img.shape[1]),
        float(img.shape[0]),
        float(means[0]),
        float(means[1]),
        float(means[2]),
        float(img.astype(np.float64).std()),
    ]


def _byte_features(b: bytes) -> list[float]:
    """Fallback for non-BMP payloads (audio / foreign formats)."""
    n = max(len(b), 1)
    arr = np.frombuffer(b, dtype=np.uint8) if b else np.zeros(1, dtype=np.uint8)
    return [-1.0, -1.0, float(arr.mean()), float(arr.min()), float(arr.max()), float(arr.std())]


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over mapInPandas.

    BMP payloads are DECODED (real pixel parse) and featurized as
    [width, height, mean_r, mean_g, mean_b, std]; non-BMP payloads get
    byte-statistics features with the same 6-dim schema.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, sizes = [], []
            for p in pdf["payload"]:
                b = bytes(p) if p is not None else b""
                sizes.append(len(b))
                try:
                    feats.append(_image_features(decode_bmp(b)))
                except ValueError:
                    feats.append(_byte_features(b))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": sizes,
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


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Real resize: decode BMP → nearest-neighbor resample → re-encode
    BMP, per Arrow batch. Output payloads are themselves valid BMPs."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p in pdf["payload"]:
                b = bytes(p) if p is not None else b""
                img = decode_bmp(b)  # non-BMP input is a hard error: resize needs pixels
                out.append(encode_bmp(resize_nearest(img, width, height)))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": out,
                    "width": np.full(len(pdf), width, dtype=np.int32),
                    "height": np.full(len(pdf), height, dtype=np.int32),
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


def sample_frames(media: DataFrame, every_ms: int = 250) -> DataFrame:
    """Frame sampling (1→N rows) over mapInPandas: the payload is a
    concatenated-BMP stream (each header declares its size — real
    container parse), sampled every `every_ms` of meta.duration_ms."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, p, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                b = bytes(p) if p is not None else b""
                # split the concatenated-BMP stream by declared sizes
                offsets = []
                pos = 0
                while pos + 54 <= len(b) and b[pos : pos + 2] == b"BM":
                    size = bmp_file_size(b, pos)
                    if size <= 0 or pos + size > len(b):
                        break
                    offsets.append((pos, size))
                    pos += size
                dur = int(meta["duration_ms"]) if meta is not None else 0
                n_avail = len(offsets)
                if n_avail == 0:
                    continue
                frame_ms = max(dur // n_avail, 1)
                step = max(every_ms // frame_ms, 1)
                for out_i, src_i in enumerate(range(0, n_avail, step)):
                    off, size = offsets[src_i]
                    ids.append(mid)
                    idxs.append(out_i)
                    frames.append(b[off : off + size])
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame": pd.Series(frames, dtype=object),
                }
            )

    return media.mapInPandas(kernel, schema=FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# Perceptual hash (pHash): DCT low-frequency sign pattern as a 64-bit
# image fingerprint — the blocking key for image near-dup dedup (the
# L2 banded-dedup story applied to the L5 media column).
# ---------------------------------------------------------------------------

_DCT8 = np.cos(np.pi * (2 * np.arange(8)[None, :] + 1) * np.arange(8)[:, None] / 16.0)


def phash64(img: np.ndarray) -> int:
    """64-bit DCT perceptual hash of an 8x8 RGB image (deterministic
    float64 math: grayscale mean -> 2D DCT-II via the fixed 8x8 basis ->
    one bit per coefficient, set when above the median of the 63 AC
    coefficients; DC contributes bit 0 as literal 0)."""
    gray = img.astype(np.float64).mean(axis=2)
    coeff = _DCT8 @ gray @ _DCT8.T
    flat = coeff.ravel()
    med = np.median(flat[1:])
    bits = flat[1:] > med
    h = 0
    for b in bits:
        h = (h << 1) | int(b)
    return h - (1 << 63) if h >= (1 << 63) else h  # store as signed int64


PHASH_SCHEMA = "media_id long, phash long, n_bytes long"


def phash_images(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Arrow-batched pHash over mapInPandas: decode each BMP payload and
    fingerprint it; non-BMP payloads hash their raw bytes' head via the
    same bit-packing (stable, format-agnostic fallback). One narrow pass,
    no shuffle — the hash (8 bytes) replaces the payload in every
    downstream dedup exchange."""

    def kernel(batches):
        for pdf in batches:
            out_id, out_h, out_n = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(p) if p is not None else b""
                try:
                    img = decode_bmp(b)
                    h = phash64(img)
                except Exception:
                    arr = np.frombuffer(b[:64].ljust(64, b"\0"), dtype=np.uint8)
                    h = phash64(arr[: 8 * 8 * 1].reshape(8, 8, 1).repeat(3, axis=2))
                out_id.append(int(mid))
                out_h.append(h)
                out_n.append(len(b))
            yield pd.DataFrame({"media_id": out_id, "phash": out_h, "n_bytes": out_n})

    return media.select("media_id", "payload").mapInPandas(kernel, schema=PHASH_SCHEMA)


# --------------------------------------------------------------------------
# Real audio path (new round 4): 16-bit little-endian PCM codec +
# decoded-sample features — the audio counterpart of the BMP image
# kernels above. No external audio library: PCM16 is a raw sample
# format, fully decodable with numpy alone, so the decode is REAL (the
# container-format parse an mp3/flac path would need is the only thing
# a production deployment would swap in).
# --------------------------------------------------------------------------
_SR = 8000  # synth sample rate (Hz)


def encode_pcm16(samples: np.ndarray) -> bytes:
    """float samples in [-1, 1] → 16-bit little-endian PCM bytes."""
    q = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    return (q * 32767.0).round().astype("<i2").tobytes()


def decode_pcm16(payload: bytes) -> np.ndarray:
    """16-bit little-endian PCM bytes → float64 samples in [-1, 1]."""
    return np.frombuffer(payload, dtype="<i2").astype(np.float64) / 32767.0


def synth_audio(media_id: int, n: int = 4096, sr: int = _SR) -> np.ndarray:
    """Deterministic sine burst per id: frequency 100+20·(id mod 50) Hz,
    amplitude 0.5 — known ground truth for RMS/ZCR golden tests."""
    freq = 100.0 + 20.0 * (int(media_id) % 50)
    t = np.arange(n, dtype=np.float64) / sr
    return 0.5 * np.sin(2.0 * np.pi * freq * t)


def _audio_features(samples: np.ndarray, sr: int = _SR) -> list[float]:
    """RMS, peak, zero-crossing rate (Hz), duration (s)."""
    n = max(len(samples), 1)
    rms = float(np.sqrt(np.mean(samples**2))) if len(samples) else 0.0
    peak = float(np.max(np.abs(samples))) if len(samples) else 0.0
    crossings = int(np.count_nonzero(np.diff(np.signbit(samples)))) if len(samples) > 1 else 0
    dur = len(samples) / sr
    zcr = crossings / dur / 2.0 if dur > 0 else 0.0  # crossings per period ≈ 2f
    return [rms, peak, zcr, dur, float(n)]


def synthesize_audio(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic REAL PCM16 audio column from row ids."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = [encode_pcm16(synth_audio(int(mid))) for mid in ids]
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "kind": "audio",
                    "payload": payloads,
                    "meta": [
                        {
                            "mime": "audio/L16",
                            "width": 0,
                            "height": 0,
                            "duration_ms": int(4096 * 1000 / _SR),
                        }
                    ]
                    * len(ids),
                }
            )

    return df.mapInPandas(kernel, schema=MEDIA_SCHEMA)


AUDIO_FEATURES_SCHEMA = (
    "media_id long, rms double, peak double, zcr_hz double, duration_s double, n_samples double"
)


def extract_audio_features(media: DataFrame) -> DataFrame:
    """Decode PCM16 payloads and compute sample-domain features — one
    Arrow-batched mapInPandas pass, no shuffle, payload never leaves
    the executor."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "media_id": [],
                "rms": [],
                "peak": [],
                "zcr_hz": [],
                "duration_s": [],
                "n_samples": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                feats = _audio_features(decode_pcm16(bytes(payload)))
                rows["media_id"].append(int(mid))
                rows["rms"].append(feats[0])
                rows["peak"].append(feats[1])
                rows["zcr_hz"].append(feats[2])
                rows["duration_s"].append(feats[3])
                rows["n_samples"].append(feats[4])
            yield pd.DataFrame(rows)

    return media.mapInPandas(kernel, schema=AUDIO_FEATURES_SCHEMA)
