"""Pretraining token-stream assembly end-to-end (engine-native; no reference
analog — the reference is a streaming-ML harness, this is the token side of
the same pipeline): exact-substring dedup (strip duplicated >= k-token spans,
Lee et al. 2022 style) → deterministic train/val/test split → context-length
chunking → GPT-style sequence packing with the distributed prefix sum, each
stage one declarative DataFrame plan.

    python examples/example_packing.py [sf_dir]    # default /root/testdata/sf0.001
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pystreamfs_spark import get_spark
from pystreamfs_spark.operators.chunk import chunk_by_tokens, pack_token_stream
from pystreamfs_spark.operators.sampling import hash_split
from pystreamfs_spark.operators.substr import duplicate_spans, strip_duplicate_spans


def main(sf_dir: str) -> None:
    spark = get_spark(master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    n0 = docs.count()

    # exact-substring dedup: report the duplicated spans, then cut them
    spans = duplicate_spans(docs, k=5, min_count=2)
    n_spans, dup_tokens = (
        spans.agg(F.count("*"), F.sum("span_tokens")).first()
    )
    stripped = strip_duplicate_spans(docs, k=5, min_count=2)

    # split BEFORE packing so no pack crosses a split boundary
    split = hash_split(stripped.withColumnRenamed("text_clean", "text"), key_col="doc_id")
    train = split.where(F.col("split") == "train")

    chunks = chunk_by_tokens(train, chunk_size=64)
    packed = pack_token_stream(chunks, context_len=2048)

    removed = stripped.agg(F.sum("n_tokens_removed")).first()[0]
    per_split = {
        r.split: r.n
        for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    n_packs = packed.agg(F.count_distinct("pack_id")).first()[0]
    n_straddle = packed.where("spans_boundary").count()
    total_tokens = packed.agg(F.sum("n_tokens")).first()[0]
    print(
        f"docs={n0} dup_spans={n_spans} dup_span_tokens={dup_tokens} "
        f"tokens_removed={removed} splits={per_split}"
    )
    print(
        f"train_chunks={chunks.count()} packed_tokens={total_tokens} "
        f"packs={n_packs} boundary_straddlers={n_straddle}"
    )
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
