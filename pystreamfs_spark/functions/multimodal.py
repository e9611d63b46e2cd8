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


def _fake_decode(payload: bytes, emb_dim: int) -> tuple[int, int, np.ndarray]:
    """STUB decoder: deterministic pseudo-decode from the payload digest.
    Replace with PIL/ffmpeg here — the callers and schema don't change."""
    digest = hashlib.md5(payload).digest()
    w = 64 + digest[0] % 192
    h = 64 + digest[1] % 192
    seed = int.from_bytes(digest[2:10], "little", signed=False)
    rng = np.random.default_rng(seed)
    emb = rng.standard_normal(emb_dim)
    emb /= np.linalg.norm(emb)
    return w, h, emb


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
            rows = []
            for mid, kind, payload in zip(pdf[id_col], pdf[kind_col], pdf[payload_col]):
                data = bytes(payload) if payload is not None else b""
                if _HAVE_PIL and kind == "image":  # pragma: no cover - not in sandbox
                    raise NotImplementedError("real decoder path: wire PIL here")
                w, h, emb = _fake_decode(data, emb_dim)
                rows.append((int(mid), str(kind), len(data), w, h, emb.tolist()))
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields])

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
