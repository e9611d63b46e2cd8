"""FSDS mergeable fast path: exactness with one chunk, sanity + utility with
many chunks (approximate by design — FD merge error is bounded, not zero)."""

import numpy as np
import pytest

from pystreamfs_spark.fold import fold_weights_stream
from pystreamfs_spark.fsds_merge import fold_fsds_fast
from pystreamfs_spark.functions.features import featurize_turns
from pystreamfs_spark.sources.transcripts import synthesize_transcripts


@pytest.fixture(scope="module")
def featurized(spark):
    return featurize_turns(synthesize_transcripts(spark, n_convs=6, seed=15)).cache()


def _m(df):
    return {(r.conv_id, r.window_id): r for r in df.collect()}


def test_single_chunk_equals_exact(featurized):
    exact = _m(fold_weights_stream(featurized, kernel="fsds", batch_size=10, num_features=5,
                                   kernel_kwargs={"k": 2, "ell": 0}))
    fast = _m(fold_fsds_fast(featurized, batch_size=10, num_features=5, k=2, ell=0,
                             chunk_windows=10_000))
    assert set(fast) == set(exact)
    for key in exact:
        np.testing.assert_allclose(np.array(fast[key].w), np.array(exact[key].w),
                                   rtol=1e-9, atol=1e-12, err_msg=str(key))
        assert list(fast[key].selected) == list(exact[key].selected)


def test_multi_chunk_approximation_is_close(featurized):
    exact = _m(fold_weights_stream(featurized, kernel="fsds", batch_size=10, num_features=5,
                                   kernel_kwargs={"k": 2, "ell": 0}))
    fast = _m(fold_fsds_fast(featurized, batch_size=10, num_features=5, k=2, ell=0,
                             chunk_windows=2))
    assert set(fast) == set(exact)
    # window 0 of every entity has an empty prefix in both modes → identical
    for (conv, wid), r in exact.items():
        if wid == 0:
            np.testing.assert_allclose(np.array(fast[(conv, wid)].w), np.array(r.w),
                                       rtol=1e-9, atol=1e-12)
    # later windows: approximate — top-5 selections should still overlap
    # substantially (the sketch carries the same dominant directions)
    overlaps = [
        len(set(fast[k].selected) & set(exact[k].selected)) / 5.0
        for k in exact
        if k[1] > 0
    ]
    assert overlaps and float(np.mean(overlaps)) >= 0.5, np.mean(overlaps)
