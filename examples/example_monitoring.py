"""Pipeline health monitoring end-to-end (engine-native; the measurement
side of the reference's concept-drift domain — pystreamfs reacts to drift
inside MCNN, this surfaces the drift itself): split the event stream into
an early and a late half, then in a handful of declarative plans report

  1. value-distribution drift per event type (two-sample KS, exact),
  2. the PSI score per event type (the industry 0.1 / 0.25 rule),
  3. hot-key skew in the late half (would a groupBy need salting?),
  4. corpus repetition quality by source (is one source degrading?).

    python examples/example_monitoring.py [sf_dir]   # default /root/testdata/sf0.001
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pystreamfs_spark import get_spark
from pystreamfs_spark.operators.drift import ks_2sample, psi
from pystreamfs_spark.operators.quality import repetition_signals
from pystreamfs_spark.operators.skew import skew_audit


def main(sf_dir: str) -> None:
    spark = get_spark(master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    events = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "ts_us", F.unix_micros(F.col("ts").cast("timestamp"))  # parquet ts is NTZ
    )
    mid = events.agg(
        F.expr("percentile_approx(ts_us, 0.5)").alias("m")
    ).collect()[0].m
    halved = events.withColumn(
        "half", F.when(F.col("ts_us") <= mid, "early").otherwise("late")
    )

    print("== value drift early->late per event type (KS, exact) ==")
    ks_2sample(
        halved, "value", "half", "early", "late", group_cols=["event_type"]
    ).orderBy(F.desc("ks")).show(truncate=False)

    print("== PSI per event type (0.1 drifting / 0.25 shifted) ==")
    psi(
        halved, "value", "half", "early", "late", group_cols=["event_type"]
    ).orderBy(F.desc("psi")).show(truncate=False)

    print("== late-half user_id skew (top keys vs uniform share) ==")
    skew_audit(
        halved.where(F.col("half") == "late"), ["user_id"], top_n=5
    ).show(truncate=False)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    print("== repetition quality by source (Gopher fractions, corpus means) ==")
    (
        repetition_signals(docs)
        .join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("docs"),
            F.round(F.avg("dup_token_frac"), 4).alias("avg_dup_token_frac"),
            F.round(F.avg("top_kgram_frac"), 4).alias("avg_top_kgram_frac"),
        )
        .orderBy("source")
        .show(truncate=False)
    )
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
