"""MCNN kernel: MI estimator sanity + engine-fold vs independent replay.

The reference MCNN calls sklearn's mutual_info_classif (absent here); our
NumPy estimator is validated behaviorally (informative feature ≫ noise
feature, invariances), and the Spark fold is validated against a direct
sequential replay of the kernel on the same matrices.
"""

import numpy as np
import pytest

from pystreamfs_spark.kernels.mcnn import MCNNState, mcnn_update
from pystreamfs_spark.kernels.mi import digamma, mutual_info_classif_np


def test_digamma_known_values():
    # psi(1) = -gamma, psi(2) = 1 - gamma, psi(0.5) = -gamma - 2 ln 2
    gamma = 0.5772156649015329
    got = digamma(np.array([1.0, 2.0, 0.5, 10.0]))
    assert got[0] == pytest.approx(-gamma, abs=1e-10)
    assert got[1] == pytest.approx(1 - gamma, abs=1e-10)
    assert got[2] == pytest.approx(-gamma - 2 * np.log(2), abs=1e-10)
    assert got[3] == pytest.approx(2.251752589066721, abs=1e-10)


def test_mi_informative_vs_noise():
    rng = np.random.default_rng(0)
    n = 400
    y = (rng.random(n) > 0.5).astype(int)
    informative = y * 2.0 + rng.normal(0, 0.3, n)
    noise = rng.normal(0, 1, n)
    mi = mutual_info_classif_np(np.column_stack([informative, noise]), y)
    assert mi[0] > 0.3
    assert mi[1] < 0.1
    assert mi[0] > 5 * max(mi[1], 1e-6)


def test_mi_deterministic():
    rng = np.random.default_rng(1)
    X = rng.normal(size=(100, 3))
    y = (X[:, 0] > 0).astype(int)
    a = mutual_info_classif_np(X, y, random_state=0)
    b = mutual_info_classif_np(X, y, random_state=0)
    np.testing.assert_array_equal(a, b)


def _replay(X, y, batch_size, m):
    state = MCNNState.init(m)
    out = []
    for s in range(0, len(X), batch_size):
        state, w = mcnn_update(state, X[s : s + batch_size], y[s : s + batch_size])
        out.append(w)
    return out


def test_mcnn_fold_matches_replay(spark):
    from pystreamfs_spark.fold import fold_weights, fold_weights_stream
    from pystreamfs_spark.functions.features import featurize_turns
    from pystreamfs_spark.sources.transcripts import synthesize_transcripts

    f = featurize_turns(synthesize_transcripts(spark, n_convs=4, seed=23)).cache()
    pdf = f.select("conv_id", "turn_idx", "features", "label").toPandas()
    mats = {}
    for conv_id, g in pdf.groupby("conv_id"):
        g = g.sort_values("turn_idx")
        mats[conv_id] = (
            np.stack(g["features"].to_numpy()).astype(np.float64),
            g["label"].to_numpy(dtype=np.float64),
        )
    for strategy in (fold_weights, fold_weights_stream):
        eng = {}
        for r in strategy(f, kernel="mcnn", batch_size=10, num_features=5).collect():
            eng.setdefault(r.conv_id, {})[r.window_id] = r
        for conv_id, (X, y) in mats.items():
            expect = _replay(X, y, 10, X.shape[1])
            assert len(eng[conv_id]) == len(expect)
            for wid, w in enumerate(expect):
                np.testing.assert_allclose(np.array(eng[conv_id][wid].w), w, rtol=1e-9, atol=1e-12)


def test_mcnn_drift_and_relevancy_mechanics():
    # two clearly separated clusters per class; then a drift burst
    rng = np.random.default_rng(3)
    m = 6
    X1 = np.column_stack([rng.normal(0, 0.1, 60), *(rng.normal(0, 0.1, (m - 1, 60)))]).astype(float)
    y1 = np.zeros(60)
    X2 = X1 + 5.0
    y2 = np.ones(60)
    X = np.concatenate([np.concatenate([X1, X2]), rng.normal(10, 3, (40, m))])
    y = np.concatenate([y1, y2, (rng.random(40) > 0.5).astype(float)])
    state = MCNNState.init(m)
    ws = []
    for s in range(0, len(X), 20):
        state, w = mcnn_update(state, X[s : s + 20], y[s : s + 20])
        ws.append(w.copy())
    assert all(len(w) == m for w in ws)
    assert state.window.t == len(ws)
    assert len(state.clusters) >= 1
    # weights reflect IG-through-relevancy: non-negative, some zeros possible
    assert all((w >= 0).all() for w in ws)
