"""Context-length chunking: split documents into fixed-token-count pieces.

The sequence-packing preprocessor of an LLM training pipeline: a document
longer than the model context is cut into consecutive ``chunk_size``-token
chunks (last chunk ragged). The whole operator is one projection with
higher-order functions plus one ``posexplode`` — the explode is the only
row-multiplying step and it happens AFTER the per-row chunk arrays are
built, so the fan-out never shuffles (map-side generate). No Python.

Portable by construction: tokenization is the engine-wide single-space
split (``functions.text.tokens``), slicing is positional — DuckDB's list
slicing computes the identical chunks, so the operator has an exact SQL
oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pystreamfs_spark.functions.text import tokens


def chunk_by_tokens(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = 64,
) -> DataFrame:
    """Output: (id, chunk_id, chunk_text, n_tokens), one row per chunk,
    chunk_id counting from 0 in document order. Every document yields at
    least one chunk — NULL text coalesces to '' (one empty chunk) rather
    than silently dropping the document from the output."""
    if chunk_size < 1:
        raise ValueError("chunk_size must be >= 1")
    cs = F.lit(chunk_size)
    t = df.select(
        F.col(id_col), tokens(F.coalesce(F.col(text_col), F.lit(""))).alias("__t")
    )
    # ceil-div via integers: n_chunks = (n + cs - 1) / cs
    n_chunks = (F.size(F.col("__t")) + cs - F.lit(1)).cast("long") / F.lit(chunk_size)
    n_chunks = F.floor(n_chunks).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - F.lit(1)),
        lambda i: F.slice(F.col("__t"), i * cs + F.lit(1), chunk_size),
    )
    exploded = t.select(F.col(id_col), F.posexplode(chunks).alias("chunk_id", "__ck"))
    return exploded.select(
        id_col,
        "chunk_id",
        F.array_join(F.col("__ck"), " ").alias("chunk_text"),
        F.size(F.col("__ck")).alias("n_tokens"),
    )
