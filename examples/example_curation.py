"""Training-data curation end-to-end (engine-native; no reference analog —
the reference is a streaming-ML harness, this is the corpus side of the
same pipeline): quality gate (score + Gopher repetition rules) → near-dedup
(MinHash-LSH → connected components → canonical, reporting its own
bucket-cap recall audit) → benchmark decontamination → deterministic
train/val/test split → context-length chunking, each stage one declarative
DataFrame plan.

    python examples/example_curation.py [sf_dir]    # default /root/testdata/sf0.001
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pystreamfs_spark import get_spark
from pystreamfs_spark.functions.text import quality_score
from pystreamfs_spark.operators.chunk import chunk_by_tokens
from pystreamfs_spark.operators.dedup import near_dedup
from pystreamfs_spark.operators.quality import decontaminate, repetition_signals
from pystreamfs_spark.operators.sampling import hash_split


def main(sf_dir: str) -> None:
    spark = get_spark(master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n0 = docs.count()

    # quality gate: score threshold + MassiveText-style repetition cut
    rep = repetition_signals(docs, k=3)
    good = (
        docs.where(quality_score(F.col("text")) >= 0.5)
        .join(rep.where((F.col("top_kgram_frac") <= 0.6) & (F.col("dup_token_frac") <= 0.95)), "doc_id")
        .select(docs["*"])
    )
    # keep each duplicate cluster's HIGHEST-QUALITY member (not the min id)
    good = good.withColumn("q", quality_score(F.col("text")))
    clusters, audit = near_dedup(
        good, n_bands=8, k=3, min_shared_bands=2, max_bucket_size=200,
        with_audit=True, representative_col="q",
    )
    keep = good.join(clusters.where("is_canonical"), "doc_id")
    # decontamination vs a stand-in eval set (every 97th doc)
    decon = decontaminate(keep, docs.where(F.col("doc_id") % 97 == 0), n=5)
    clean = keep.join(decon.where(~F.col("contaminated")).select("doc_id"), "doc_id")
    split = hash_split(clean, key_col="doc_id")
    chunks = chunk_by_tokens(split, chunk_size=64)

    n_good, n_keep, n_clean = good.count(), keep.count(), clean.count()
    a = audit.first()
    per_split = {r.split: r.n for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()}
    n_chunks, n_tokens = chunks.count(), chunks.agg(F.sum("n_tokens")).first()[0]
    print(f"docs={n0} quality_pass={n_good} canonical={n_keep} decontaminated={n_clean} splits={per_split}")
    print(f"dedup_audit: buckets={a.n_buckets} dropped={a.n_buckets_dropped} est_pairs_dropped={a.est_pairs_dropped}")
    print(f"chunks={n_chunks} tokens={n_tokens}")
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
