"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Real decode libraries (Pillow / torchaudio / ffmpeg) are not present in this
container, so the *decode* step is stubbed behind an import-try with a
deterministic fake; everything Spark-side — schema, Arrow batch shape,
``mapInPandas`` signature, partition sizing — is real and tested. Swapping
the stub for a real decoder changes only the marked function body.

Pattern: media rows can be MBs each, so feature extraction uses
``mapInPandas`` (streamed Arrow batches; no per-group materialization) and
callers should lower ``spark.sql.execution.arrow.maxRecordsPerBatch`` /
``spark.sql.files.maxPartitionBytes`` when payloads are large.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

try:  # real decoder, if ever available
    from PIL import Image  # type: ignore # noqa: F401

    _HAVE_PIL = True
except Exception:  # pragma: no cover
    _HAVE_PIL = False


IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("embedding", ArrayType(DoubleType())),
    ]
)


_GOLD = np.uint64(0x9E3779B97F4A7C15)


def _mix64(x: np.ndarray) -> np.ndarray:
    """SplitMix64 finalizer — vectorized uint64 bit mixer (wrapping mults)."""
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _decode_batch(payloads: list[bytes], emb_dim: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """STUB decoder, batch form: deterministic pseudo-decode from each
    payload's md5 digest. Row-independent (the same payload decodes to the
    same features regardless of batch/partition placement) and vectorized:
    the only per-row Python is the md5 call — a real decoder would pay a
    per-row decode there too. Replace with PIL/ffmpeg here; callers and
    schema don't change. Returns (width, height, embeddings[n, emb_dim])."""
    n = len(payloads)
    digests = b"".join(hashlib.md5(p).digest() for p in payloads)
    raw = np.frombuffer(digests, dtype=np.uint8).reshape(n, 16)
    width = (64 + raw[:, 0] % 192).astype(np.int32)
    height = (64 + raw[:, 1] % 192).astype(np.int32)
    seeds = raw[:, 2:10].copy().view(np.uint64).ravel()
    # counter-mode PRNG: one mixed word per (row, slot), then Box-Muller —
    # all-NumPy, no per-row Generator construction
    half = (emb_dim + 1) // 2
    ctr = np.arange(1, 2 * half + 1, dtype=np.uint64) * _GOLD
    words = _mix64(seeds[:, None] + ctr[None, :])
    u = (words >> np.uint64(11)).astype(np.float64) * 2.0**-53
    u1 = np.clip(u[:, :half], 1e-300, None)
    u2 = u[:, half:]
    r = np.sqrt(-2.0 * np.log(u1))
    emb = np.concatenate([r * np.cos(2 * np.pi * u2), r * np.sin(2 * np.pi * u2)], axis=1)[:, :emb_dim]
    norms = np.linalg.norm(emb, axis=1, keepdims=True)
    emb = emb / np.where(norms == 0, 1.0, norms)
    return width, height, emb


def _fake_decode(payload: bytes, emb_dim: int) -> tuple[int, int, np.ndarray]:
    """Single-row twin of :func:`_decode_batch` (kept for direct callers)."""
    w, h, emb = _decode_batch([payload], emb_dim)
    return int(w[0]), int(h[0]), emb[0]


def extract_image_features(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    kind_col: str = "kind",
    emb_dim: int = 16,
) -> DataFrame:
    """binary payload → (dims, embedding) via Arrow-batched mapInPandas."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if _HAVE_PIL and (pdf[kind_col] == "image").any():  # pragma: no cover
                raise NotImplementedError("real decoder path: wire PIL here")
            data = [bytes(p) if p is not None else b"" for p in pdf[payload_col]]
            width, height, emb = _decode_batch(data, emb_dim)
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].to_numpy(dtype=np.int64),
                    "kind": pdf[kind_col].astype(str),
                    "n_bytes": np.fromiter((len(b) for b in data), dtype=np.int64, count=len(data)),
                    "width": width,
                    "height": height,
                    "embedding": list(emb),
                }
            )

    return df.select(id_col, kind_col, payload_col).mapInPandas(run, IMAGE_FEATURES_SCHEMA)


FRAME_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("frame_idx", IntegerType()),
        StructField("ts_offset_s", DoubleType()),
        StructField("embedding", ArrayType(DoubleType())),
    ]
)

_FRAME_STRIDE = np.uint64(0xD1B54A32D192ED03)  # distinct counter plane per frame


def _frame_embeddings(payloads: list[bytes], n_frames: int, emb_dim: int) -> np.ndarray:
    """STUB frame decoder, batch form: frame f of a payload gets features
    from the same counter-mode PRNG as :func:`_decode_batch` with the
    counter offset into frame plane f — deterministic per (payload, frame),
    independent of batching/partitioning. A real decoder would seek and
    decode keyframes here. Returns (n_rows, n_frames, emb_dim)."""
    n = len(payloads)
    digests = b"".join(hashlib.md5(p).digest() for p in payloads)
    raw = np.frombuffer(digests, dtype=np.uint8).reshape(n, 16)
    seeds = raw[:, 2:10].copy().view(np.uint64).ravel()
    half = (emb_dim + 1) // 2
    ctr = np.arange(1, 2 * half + 1, dtype=np.uint64) * _GOLD
    frame_off = np.arange(n_frames, dtype=np.uint64) * _FRAME_STRIDE
    # (n, n_frames, slots) wrapped-add counter grid, one mix per cell
    words = _mix64(seeds[:, None, None] + frame_off[None, :, None] + ctr[None, None, :])
    u = (words >> np.uint64(11)).astype(np.float64) * 2.0**-53
    u1 = np.clip(u[..., :half], 1e-300, None)
    u2 = u[..., half:]
    r = np.sqrt(-2.0 * np.log(u1))
    emb = np.concatenate([r * np.cos(2 * np.pi * u2), r * np.sin(2 * np.pi * u2)], axis=2)[..., :emb_dim]
    norms = np.linalg.norm(emb, axis=2, keepdims=True)
    return emb / np.where(norms == 0, 1.0, norms)


def sample_frame_features(
    df: DataFrame,
    n_frames: int = 4,
    frame_interval_s: float = 1.0,
    id_col: str = "media_id",
    payload_col: str = "payload",
    kind_col: str = "kind",
    emb_dim: int = 16,
) -> DataFrame:
    """Frame sampling: each media row explodes into ``n_frames`` feature
    rows (frame_idx, ts_offset_s, embedding) — the temporal-media twin of
    :func:`extract_image_features`. The fan-out happens INSIDE the Arrow
    batch (one mapInPandas pass, no join/explode shuffle); output rows are
    n_frames× the input, so size upstream partitions accordingly."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            data = [bytes(p) if p is not None else b"" for p in pdf[payload_col]]
            emb = _frame_embeddings(data, n_frames, emb_dim)  # (n, F, d)
            n = len(data)
            yield pd.DataFrame(
                {
                    "media_id": np.repeat(pdf[id_col].to_numpy(dtype=np.int64), n_frames),
                    "kind": np.repeat(pdf[kind_col].astype(str).to_numpy(), n_frames),
                    "frame_idx": np.tile(np.arange(n_frames, dtype=np.int32), n),
                    "ts_offset_s": np.tile(
                        np.arange(n_frames, dtype=np.float64) * frame_interval_s, n
                    ),
                    "embedding": list(emb.reshape(n * n_frames, emb_dim)),
                }
            )

    return df.select(id_col, kind_col, payload_col).mapInPandas(run, FRAME_FEATURES_SCHEMA)


def resize_image_features(
    df: DataFrame,
    target_w: int,
    target_h: int,
    id_col: str = "media_id",
    payload_col: str = "payload",
    kind_col: str = "kind",
    emb_dim: int = 16,
) -> DataFrame:
    """Resize-then-featurize: features of the payload AS RENDERED at
    (target_w, target_h) — a real pipeline re-extracts after resizing, so the
    stub derives the embedding from (payload digest, target dims) rather than
    reusing the native-size features. Same IMAGE_FEATURES_SCHEMA with
    width/height pinned to the targets."""

    dims_off = np.uint64((target_w << 20) ^ target_h) * _FRAME_STRIDE

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            data = [bytes(p) if p is not None else b"" for p in pdf[payload_col]]
            n = len(data)
            digests = b"".join(hashlib.md5(p).digest() for p in data)
            raw = np.frombuffer(digests, dtype=np.uint8).reshape(n, 16)
            seeds = raw[:, 2:10].copy().view(np.uint64).ravel() + dims_off
            half = (emb_dim + 1) // 2
            ctr = np.arange(1, 2 * half + 1, dtype=np.uint64) * _GOLD
            words = _mix64(seeds[:, None] + ctr[None, :])
            u = (words >> np.uint64(11)).astype(np.float64) * 2.0**-53
            u1 = np.clip(u[:, :half], 1e-300, None)
            u2 = u[:, half:]
            r = np.sqrt(-2.0 * np.log(u1))
            emb = np.concatenate(
                [r * np.cos(2 * np.pi * u2), r * np.sin(2 * np.pi * u2)], axis=1
            )[:, :emb_dim]
            norms = np.linalg.norm(emb, axis=1, keepdims=True)
            emb = emb / np.where(norms == 0, 1.0, norms)
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].to_numpy(dtype=np.int64),
                    "kind": pdf[kind_col].astype(str),
                    "n_bytes": np.fromiter((len(b) for b in data), dtype=np.int64, count=n),
                    "width": np.full(n, target_w, dtype=np.int32),
                    "height": np.full(n, target_h, dtype=np.int32),
                    "embedding": list(emb),
                }
            )

    return df.select(id_col, kind_col, payload_col).mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def synthesize_media(spark, n_rows: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (binary payloads) for tests/benches."""
    from pyspark.sql import functions as F

    base = spark.range(n_rows).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.xxhash64("id", F.lit(seed)), 3) + 1).cast("int"),
        ).alias("kind"),
        F.encode(
            F.concat(F.lit("payload-"), F.md5(F.concat(F.col("id").cast("string"), F.lit(f":{seed}")))),
            "utf-8",
        ).alias("payload"),
    )
    return base


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("duration_s", DoubleType()),
        StructField("embedding", ArrayType(DoubleType())),
    ]
)

_AUDIO_STRIDE = np.uint64(0xEB44ACCAB455D165)  # distinct counter plane for audio


def extract_audio_features(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    kind_col: str = "kind",
    emb_dim: int = 16,
) -> DataFrame:
    """Audio twin of :func:`extract_image_features`: binary payload →
    (sample_rate, duration, embedding) via Arrow-batched ``mapInPandas``.
    The STUB derives waveform metadata and a unit-norm "mel-band" embedding
    from the payload digest on a distinct counter plane (deterministic per
    payload, independent of batching/partitioning); a real decoder
    (torchaudio/ffmpeg — not in this container) replaces only the marked
    block, schema and callers unchanged."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            data = [bytes(p) if p is not None else b"" for p in pdf[payload_col]]
            n = len(data)
            # --- STUB decode (replace with torchaudio.load / ffprobe) ---
            digests = b"".join(hashlib.md5(p).digest() for p in data)
            raw = np.frombuffer(digests, dtype=np.uint8).reshape(n, 16)
            rates = np.array([8000, 16000, 22050, 44100], dtype=np.int32)
            sample_rate = rates[raw[:, 0] % 4]
            duration = np.round(0.5 + (raw[:, 1].astype(np.float64) * 256 + raw[:, 2]) / 65535.0 * 29.5, 3)
            seeds = raw[:, 2:10].copy().view(np.uint64).ravel() + _AUDIO_STRIDE
            half = (emb_dim + 1) // 2
            ctr = np.arange(1, 2 * half + 1, dtype=np.uint64) * _GOLD
            words = _mix64(seeds[:, None] + ctr[None, :])
            u = (words >> np.uint64(11)).astype(np.float64) * 2.0**-53
            u1 = np.clip(u[:, :half], 1e-300, None)
            u2 = u[:, half:]
            r = np.sqrt(-2.0 * np.log(u1))
            emb = np.concatenate(
                [r * np.cos(2 * np.pi * u2), r * np.sin(2 * np.pi * u2)], axis=1
            )[:, :emb_dim]
            norms = np.linalg.norm(emb, axis=1, keepdims=True)
            emb = emb / np.where(norms == 0, 1.0, norms)
            # --- end STUB ---
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].to_numpy(dtype=np.int64),
                    "kind": pdf[kind_col].astype(str),
                    "n_bytes": np.fromiter((len(b) for b in data), dtype=np.int64, count=n),
                    "sample_rate": sample_rate,
                    "duration_s": duration,
                    "embedding": list(emb),
                }
            )

    return df.select(id_col, kind_col, payload_col).mapInPandas(run, AUDIO_FEATURES_SCHEMA)
