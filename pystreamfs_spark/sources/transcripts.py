"""Deterministic synthetic transcripts table (FIXTURES.md §F1).

Shape per BASELINE.json.input_hint:
    (conv_id string, turn_idx int, role string, text string, tool string,
     ts timestamp)

Generated entirely with Spark expressions from ``spark.range`` — no driver
loops, no wall clock, no RNG: every value is a pure function of
(conv_id, turn_idx, seed) via ``xxhash64``, so the table is identical at any
parallelism and any scale factor. Conversation lengths are heavy-tailed
(most 4–40 turns, every 97th ≈ 2–5k turns, conv 0 a configurable "giant") to
exercise the skew paths.

Timestamps are strictly increasing within a conversation by construction:
``ts(j) = base + conv_offset + j·301 + (h(conv,j) mod 300)`` — each turn
advances by at least 2 seconds (301 − 299) without needing a running-sum
window at generation time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_WORDS = [
    "the", "a", "of", "to", "and", "in", "is", "it", "you", "that",
    "model", "data", "spark", "table", "query", "join", "filter", "agg",
    "window", "stream", "turn", "tool", "run", "test", "plan", "scan",
    "merge", "sort", "hash", "key", "row", "batch", "state", "fold",
    "please", "thanks", "error", "retry", "done", "result", "check",
    "write", "read", "exec", "search", "code", "file", "list", "map", "set",
]

_TOOLS = ["search", "exec", "read", "write"]


def synthesize_transcripts(
    spark: SparkSession,
    n_convs: int = 50,
    seed: int = 42,
    giant_conv_turns: int = 0,
    base_ts: str = "2024-01-01 00:00:00",
    num_partitions: int | None = None,
) -> DataFrame:
    """Build the transcripts DataFrame. ``giant_conv_turns`` > 0 makes conv 0
    that long (skew fixture); 0 leaves conv 0 with a normal length."""
    conv = spark.range(0, n_convs, 1, num_partitions or spark.sparkContext.defaultParallelism)
    h = F.abs(F.xxhash64(F.col("id"), F.lit(seed)))
    conv = conv.select(
        F.col("id").alias("conv_k"),
        F.format_string("conv%06d", F.col("id").cast("int")).alias("conv_id"),
        F.when((F.lit(giant_conv_turns) > 0) & (F.col("id") == 0), F.lit(giant_conv_turns))
        .when((F.col("id") % 97 == 0) & (F.col("id") > 0), (h % 3000 + 2000).cast("int"))
        .otherwise((h % 37 + 4).cast("int"))
        .alias("n_turns"),
        (h % 86400).alias("conv_offset_s"),
    )

    turns = conv.select(
        "conv_k",
        "conv_id",
        "conv_offset_s",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    )

    ht = F.abs(F.xxhash64(F.col("conv_k"), F.col("turn_idx"), F.lit(seed)))
    is_tool = (ht % 7) == 0
    words_arr = F.array(*[F.lit(w) for w in _WORDS])
    n_words = (ht % 60 + 1).cast("int")
    text = F.concat(
        F.format_string("t%s-%s ", F.col("conv_id"), F.col("turn_idx").cast("string")),
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), n_words),
                lambda i: F.element_at(
                    words_arr,
                    (F.abs(F.xxhash64(F.col("conv_k"), F.col("turn_idx"), i, F.lit(seed))) % len(_WORDS) + 1).cast(
                        "int"
                    ),
                ),
            ),
            " ",
        ),
    )

    return turns.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        F.when(is_tool, F.lit("tool"))
        .when(F.col("turn_idx") % 2 == 0, F.lit("user"))
        .otherwise(F.lit("assistant"))
        .alias("role"),
        text.alias("text"),
        F.when(is_tool, F.element_at(F.array(*[F.lit(t) for t in _TOOLS]), (ht % 4 + 1).cast("int"))).alias("tool"),
        (
            F.to_timestamp(F.lit(base_ts))
            + F.make_interval(secs=(F.col("conv_offset_s") + F.col("turn_idx") * 301 + ht % 300).cast("double"))
        ).alias("ts"),
    )
