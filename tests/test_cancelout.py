"""CancelOut (NumPy re-expression): determinism, signal detection, fold
integration. No allclose target exists (the torch reference is unseeded by
construction) — behavioral checks instead."""

import numpy as np

from pystreamfs_spark.kernels.cancelout import train_cancelout


def test_informative_feature_gets_largest_gate():
    rng = np.random.default_rng(0)
    n, m = 300, 8
    y = (rng.random(n) > 0.5).astype(float)
    X = np.column_stack([y * 3 + rng.normal(0, 0.3, n), *[rng.normal(0, 1, n) for _ in range(m - 1)]])
    w = train_cancelout(X, y, seed=0)
    assert np.argmax(np.abs(w)) == 0


def test_deterministic_given_seed():
    rng = np.random.default_rng(1)
    X = rng.normal(size=(128, 6))
    y = (X[:, 2] > 0).astype(float)
    a = train_cancelout(X, y, seed=7)
    b = train_cancelout(X, y, seed=7)
    np.testing.assert_array_equal(a, b)
    c = train_cancelout(X, y, seed=8)
    assert not np.array_equal(a, c)


def test_cancelout_fold_runs(spark):
    from pystreamfs_spark.fold import fold_weights_stream
    from pystreamfs_spark.functions.features import featurize_turns
    from pystreamfs_spark.sources.transcripts import synthesize_transcripts

    f = featurize_turns(synthesize_transcripts(spark, n_convs=4, seed=31))
    out = fold_weights_stream(f, kernel="cancelout", batch_size=25, num_features=5).collect()
    assert out
    assert all(len(r.w) == 16 and len(r.selected) == 5 for r in out)


def test_windowed_fold_matches_sequential_for_stateless(spark):
    import pytest

    from pystreamfs_spark.fold import fold_weights_stream, fold_weights_windowed
    from pystreamfs_spark.functions.features import featurize_turns
    from pystreamfs_spark.sources.transcripts import synthesize_transcripts

    f = featurize_turns(synthesize_transcripts(spark, n_convs=4, seed=31)).cache()
    seq = {
        (r.conv_id, r.window_id): (r.w, list(r.selected), r.win_rows)
        for r in fold_weights_stream(f, kernel="cancelout", batch_size=25, num_features=5).collect()
    }
    par = {
        (r.conv_id, r.window_id): (r.w, list(r.selected), r.win_rows)
        for r in fold_weights_windowed(f, kernel="cancelout", batch_size=25, num_features=5).collect()
    }
    assert par == seq  # bit-identical: the kernel rebuilds state per window

    with pytest.raises(ValueError, match="cross-window state"):
        fold_weights_windowed(f, kernel="ofs")
