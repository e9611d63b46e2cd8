"""Skew fixture (FIXTURES.md §F1): one giant conversation dominating the
table must still produce oracle-exact weights with bounded-memory streaming,
and must not perturb other conversations."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pystreamfs_spark.fold import fold_weights_stream
from pystreamfs_spark.functions.features import featurize_turns
from pystreamfs_spark.sources.transcripts import synthesize_transcripts

from oracle_ref import simulate


@pytest.fixture(scope="module")
def skewed(spark):
    # conv 0 is ~20k turns — the large majority of all rows
    t = synthesize_transcripts(spark, n_convs=12, seed=3, giant_conv_turns=20_000)
    return featurize_turns(t).cache()


def test_giant_conv_share(skewed):
    counts = {r.conv_id: r["count"] for r in skewed.groupBy("conv_id").count().collect()}
    total = sum(counts.values())
    assert counts["conv000000"] / total > 0.9  # the skew is real


def test_giant_conv_oracle_exact_with_tiny_arrow_batches(spark, skewed):
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "1000")
    try:
        eng = {
            (r.conv_id, r.window_id): r
            for r in fold_weights_stream(skewed, kernel="ofs", batch_size=50, num_features=5).collect()
        }
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    g = (
        skewed.where(F.col("conv_id") == "conv000000")
        .orderBy("turn_idx")
        .select("features", "label")
        .toPandas()
    )
    X = np.stack(g["features"].to_numpy()).astype(np.float64)
    y = g["label"].to_numpy(dtype=np.float64)
    ora = simulate(X, y, kernel="ofs", batch_size=50, num_features=5)
    n_windows = (len(X) + 49) // 50
    assert len([k for k in eng if k[0] == "conv000000"]) == n_windows
    for wid in (0, 1, n_windows // 2, n_windows - 1):
        np.testing.assert_allclose(
            np.array(eng[("conv000000", wid)].w), ora["w"][wid], rtol=1e-9, atol=1e-12
        )
        assert list(eng[("conv000000", wid)].selected) == ora["selected"][wid]
