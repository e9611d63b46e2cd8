"""Resume semantics (SURVEY.md §5.6): interrupt after k epochs, resume, and
require byte-identical outputs vs an uninterrupted run, with no duplicate
commits in the ledger."""

import numpy as np
import pytest

from pystreamfs_spark.checkpoint import CheckpointedFold, lineage_rows, metrics_rows
from pystreamfs_spark.fold import fold_weights
from pystreamfs_spark.functions.features import featurize_turns
from pystreamfs_spark.sources.transcripts import synthesize_transcripts


def _collect(df):
    return sorted(
        ((r.conv_id, r.window_id, tuple(r.w), tuple(r.selected), r.win_rows) for r in df.collect()),
    )


def test_interrupt_resume_identical(spark, tmp_path):
    f = featurize_turns(synthesize_transcripts(spark, n_convs=14, seed=9)).cache()

    # uninterrupted single-shot reference
    ref = _collect(fold_weights(f, kernel="ofs", batch_size=11, num_features=5))

    out = str(tmp_path / "ckpt")
    run = CheckpointedFold(spark, out, n_epochs=4)
    first = run.run(f, kernel="ofs", batch_size=11, num_features=5, max_epochs_this_run=2)
    assert len(first) == 2
    assert run.committed_epochs() == set(first)

    # "crash" here — a new object (fresh process analog) resumes the rest
    run2 = CheckpointedFold(spark, out, n_epochs=4)
    second = run2.run(f, kernel="ofs", batch_size=11, num_features=5)
    assert sorted(first + second) == [0, 1, 2, 3]
    assert not (set(first) & set(second)), "no epoch committed twice"

    got = _collect(run2.weights().select("conv_id", "window_id", "w", "selected", "win_rows"))
    assert got == ref

    # idempotent: a third run has nothing to do
    assert run2.run(f, kernel="ofs", batch_size=11) == []


def test_single_scan_per_run(spark, tmp_path, monkeypatch):
    """run() must scan+fold the source ONCE per call, not once per epoch
    (VERDICT r02 #2: per-epoch re-scan = n_epochs× the read cost at 100 TB)."""
    import pystreamfs_spark.checkpoint as cp
    from pystreamfs_spark import fold as fold_mod
    from pystreamfs_spark.plans.inspect import count_scans

    src = str(tmp_path / "featurized")
    featurize_turns(synthesize_transcripts(spark, n_convs=12, seed=7)).write.parquet(src)
    f = spark.read.parquet(src)

    calls = []
    real = fold_mod.fold_weights_stream

    def counting(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(fold_mod, "fold_weights_stream", counting)

    run = CheckpointedFold(spark, str(tmp_path / "ckpt"), n_epochs=4)
    done = run.run(f, kernel="ofs", batch_size=10, num_features=5)
    assert sorted(done) == [0, 1, 2, 3]
    assert len(calls) == 1, "fold must be invoked once for all epochs"
    # and that one fold's physical plan reads the parquet source exactly once
    assert count_scans(run._last_fold_plan, "parquet") == 1

    # ledger records the shared fold cost
    committed = run.committed_epochs()
    assert committed == {0, 1, 2, 3}


def test_lineage_and_metrics(spark, tmp_path):
    f = featurize_turns(synthesize_transcripts(spark, n_convs=10, seed=3)).cache()
    w = fold_weights(f, kernel="ofs", batch_size=10, num_features=5, with_accuracy=True).cache()

    lin = lineage_rows(w).collect()
    assert sum(r.n_rows for r in lin) == w.count()
    assert all(r.min_entity <= r.max_entity for r in lin)

    met = metrics_rows(w).first()
    assert met.n_windows == w.count()
    accs = [r.acc for r in w.collect()]
    assert met.acc_avg == pytest.approx(np.mean(accs), rel=1e-12)
    assert met.acc_q1 <= met.acc_avg <= met.acc_q3 or len(set(accs)) == 1


def test_plot_series_and_run_summary(spark):
    from pystreamfs_spark.metrics import plot_series, run_summary

    f = featurize_turns(synthesize_transcripts(spark, n_convs=6, seed=4)).cache()
    w = fold_weights(f, kernel="ofs", batch_size=10, num_features=5, with_accuracy=True).cache()
    series = plot_series(w, 5).collect()
    assert len(series) == w.count()
    assert all(0 <= r.acc_pct <= 100 for r in series)
    assert all(r.time_ms >= 0 for r in series)
    summ = run_summary(w, 5).first()
    assert summ.n_windows == w.count()
    assert summ.acc_q1_pct <= summ.acc_avg_pct + 1e-9
    assert summ.acc_q3_pct >= summ.acc_avg_pct - 1e-9 or summ.acc_q1_pct == summ.acc_q3_pct
