"""Corpus composition end-to-end (engine-native; no reference analog — the
reference is a streaming-ML harness, this is the data-mixing side of the same
pipeline): lexicon quality gate → mixture-proportion down-sampling (rates
derived from web:books:code-style targets, limiting source kept whole) →
token-budget selection (greedy quality-first fill via the distributed prefix
sum), each stage one declarative DataFrame plan.

    python examples/example_composition.py [sf_dir]   # default /root/testdata/sf0.001
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pystreamfs_spark import get_spark
from pystreamfs_spark.functions.text import lexicon_score, quality_score, token_count
from pystreamfs_spark.operators.budget import select_to_budget
from pystreamfs_spark.operators.sampling import mix_to_proportions


def main(sf_dir: str) -> None:
    spark = get_spark(master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "source", "text"
    )
    n0 = docs.count()

    # 1. lexicon gate: drop documents whose weighted-term score goes negative
    lex = {"slow": -1.0, "dup": -0.5, "fast": 0.5, "merge": 0.25}
    gated = docs.where(lexicon_score(F.col("text"), lex, bias=1.0) >= 0.0)
    n1 = gated.count()

    # 2. mix four sources to 40:30:20:10 — rates derived, not hand-given
    mixed = mix_to_proportions(
        gated,
        {"src0": 0.4, "src1": 0.3, "src2": 0.2, "src3": 0.1},
        source_col="source",
        key_col="doc_id",
    )
    by_src = {r["source"]: r["n"] for r in
              mixed.groupBy("source").agg(F.count("*").alias("n")).collect()}

    # 3. cut to a token budget, best quality first
    scored = mixed.select(
        "doc_id",
        "source",
        quality_score(F.col("text")).alias("q"),
        token_count(F.col("text")).alias("n_tokens"),
    )
    final = select_to_budget(
        scored, budget=2000, score_col="q", tokens_col="n_tokens", id_col="doc_id"
    ).cache()
    n3, toks = final.count(), final.agg(F.max("cum_tokens")).first()[0]

    print(f"docs: {n0} -> lexicon gate {n1} -> mixed {by_src} "
          f"-> budget 2000: {n3} docs / {toks} tokens")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
