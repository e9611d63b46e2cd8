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
    cs = chunk_size
    t = df.select(
        F.col(id_col), tokens(F.coalesce(F.col(text_col), F.lit(""))).alias("__t")
    )
    # ceil-div via integers: n_chunks = (n + cs - 1) / cs
    n_chunks = F.floor(
        (F.size(F.col("__t")) + cs - F.lit(1)).cast("long") / F.lit(cs)
    ).cast("int")
    # r06: explode the CHUNK INDEX and slice AFTER the Generate instead of
    # building a per-row array-of-chunks with a transform lambda — the
    # lambda made the whole projection interpreted (CodegenFallback, the
    # text.gram_rows lesson). Identical rows incl. the empty/NULL-text
    # single empty chunk (n_chunks >= 1 because tokens('') is ['']);
    # measured 0.82 s → 0.53 s over the 1.15M-turn corpus.
    bound = t.select(F.col(id_col), "__t", n_chunks.alias("__nc"))
    pos = bound.select(
        F.col(id_col), "__t",
        F.explode(F.sequence(F.lit(0), F.col("__nc") - 1)).alias("chunk_id"),
    )
    ck = F.slice(F.col("__t"), F.col("chunk_id") * cs + 1, cs)
    out = pos.select(F.col(id_col), "chunk_id", ck.alias("__ck"))
    return out.select(
        id_col,
        "chunk_id",
        F.array_join(F.col("__ck"), " ").alias("chunk_text"),
        F.size(F.col("__ck")).alias("n_tokens"),
    )


def pack_token_stream(
    chunks: DataFrame,
    context_len: int,
    id_col: str = "doc_id",
    seq_col: str = "chunk_id",
    tokens_col: str = "n_tokens",
    n_buckets: int = 256,
) -> DataFrame:
    """GPT-style sequence packing: concatenate the (id, seq)-ordered token
    stream and split it at exact ``context_len`` boundaries — documents
    cross pack boundaries, nothing is padded (the standard pretraining
    packing; contrast :func:`chunk_by_tokens`, which never crosses a
    document). Each row gets its global ``token_offset``, its ``pack_id``
    (the pack its FIRST token lands in), and ``spans_boundary`` (true when
    the row straddles a pack edge and the loader must split it).

    The global running sum is a DISTRIBUTED prefix sum, not a single
    global window (which would serialize the whole stream through one
    task): ``id_col``'s value range is cut into ``n_buckets`` order-aligned
    buckets (one tiny min/max aggregate, broadcast back), the cumulative
    sum runs partition-parallel within each bucket, and only the
    n_buckets-row bucket-total table sees an ordered window before its
    prefix offsets broadcast-join back. At any scale the serial step is
    O(n_buckets) rows; size ``n_buckets`` to a small multiple of the
    cluster's task slots.

    Requires an integer ``id_col``; the packing order is
    (id_col, seq_col) ascending. Output: input columns minus the payload +
    (token_offset, pack_id, spans_boundary)."""
    if context_len < 1:
        raise ValueError("context_len must be >= 1")
    from pyspark.sql import Window

    bounds = chunks.agg(
        F.min(id_col).alias("__lo"), F.max(id_col).alias("__hi")
    )
    # a NULL id has no position in the total order — it would sort into the
    # NULL bucket, inflate every prefix, then vanish at the equi-join; fail
    # fast instead (same ANSI-style contract as sampling.hash_bucket)
    bucket = F.when(
        F.col(id_col).isNull(),
        F.raise_error(
            F.lit(
                "pack_token_stream: NULL id - rows without an id cannot be "
                "placed in the token stream; filter or coalesce the id "
                "column first"
            )
        ).cast("int"),
    ).otherwise(
        F.floor(
            (F.col(id_col) - F.col("__lo"))
            / F.greatest(
                F.ceil((F.col("__hi") - F.col("__lo") + 1) / F.lit(n_buckets)), F.lit(1)
            )
        ).cast("int")
    )
    with_b = (
        chunks.crossJoin(F.broadcast(bounds)).withColumn("__b", bucket).drop("__lo", "__hi")
    )
    w_in = (
        Window.partitionBy("__b")
        .orderBy(F.col(id_col), F.col(seq_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = with_b.withColumn("__cum", F.sum(F.col(tokens_col).cast("long")).over(w_in))
    totals = cum.groupBy("__b").agg(F.sum(F.col(tokens_col).cast("long")).alias("__bt"))
    w_b = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    prefix = totals.select(
        "__b", F.coalesce(F.sum("__bt").over(w_b), F.lit(0)).alias("__pre")
    )
    out = cum.join(F.broadcast(prefix), "__b")
    off = F.col("__pre") + F.col("__cum") - F.col(tokens_col)
    last_tok = off + F.greatest(F.col(tokens_col), F.lit(1)) - F.lit(1)
    cl = F.lit(int(context_len))
    return (
        out.withColumn("token_offset", off.cast("long"))
        .withColumn("pack_id", F.floor(F.col("token_offset") / cl).cast("long"))
        .withColumn(
            "spans_boundary", (F.floor(last_tok / cl) > F.col("pack_id"))
        )
        .drop("__b", "__cum", "__pre")
    )
