"""Checkpointed execution: per-epoch commits, lineage + metrics, resume.

North rule: "every partition emits lineage + metrics rows so interrupted runs
resume from the last committed checkpoint."

Work is split into ``n_epochs`` deterministic entity buckets
(``pmod(xxhash64(conv_id, seed), n_epochs)``) — an entity never spans epochs,
so each epoch is an independently-committable unit of the fold. A commit is:

1. write the epoch's weights to ``<out>/weights/epoch=K`` (Spark's commit
   protocol makes the directory appear atomically),
2. write lineage + metrics for the epoch,
3. append a one-line JSON record to the ledger ``<out>/_ledger/K.json``
   via a tmp-file + atomic-rename protocol (the final file's existence IS
   the commit marker; the rename is atomic on HDFS/posix and its boolean
   result is checked — a false return raises instead of silently leaving
   the epoch uncommitted).

Resume = skip every epoch whose ledger record exists (the relational
equivalent of a left-anti join of work units against the committed ledger).
Re-running a committed epoch is idempotent (overwrite, not append).

At 10^12 turns this maps 1:1 onto Iceberg snapshots per epoch via the
TableIO seam; the ledger doubles as the snapshot registry.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def epoch_of(entity_col: str, n_epochs: int, seed: int = 42):
    return F.pmod(F.xxhash64(F.col(entity_col), F.lit(seed)), F.lit(n_epochs)).cast("int")


def lineage_rows(df: DataFrame, entity_col: str = "conv_id", ts_col: str = "ts_end") -> DataFrame:
    """Per-(spark-partition) lineage: row count, entity range, ts range.
    Call on the output of a stage — one row per physical partition."""
    return (
        df.withColumn("__pid", F.spark_partition_id())
        .groupBy("__pid")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(entity_col).alias("min_entity"),
            F.max(entity_col).alias("max_entity"),
            F.countDistinct(entity_col).alias("n_entities"),
            F.min(ts_col).alias("min_ts"),
            F.max(ts_col).alias("max_ts"),
        )
        .withColumnRenamed("__pid", "partition_id")
    )


def metrics_rows(weights: DataFrame) -> DataFrame:
    """Run-level metrics table from the per-window fold output — the engine's
    analog of the reference's stats averages (pystreamfs.py:95-98)."""
    return weights.agg(
        F.count(F.lit(1)).alias("n_windows"),
        F.sum("win_rows").alias("n_rows"),
        F.avg("elapsed_sec").alias("kernel_sec_avg"),
        F.sum("elapsed_sec").alias("kernel_sec_total"),
        F.avg("acc").alias("acc_avg"),
        F.avg(F.when(F.col("mem_bytes") >= 0, F.col("mem_bytes"))).alias("mem_bytes_avg"),
        F.expr("percentile(acc, 0.25)").alias("acc_q1"),
        F.expr("percentile(acc, 0.75)").alias("acc_q3"),
    )


@dataclass
class CheckpointedFold:
    """Run a kernel fold as N resumable epoch commits."""

    spark: SparkSession
    out_dir: str
    n_epochs: int = 8
    entity_col: str = "conv_id"
    seed: int = 42
    # Introspection hook set by run(): the fold DataFrame of the LAST run()
    # call, valid only for PLAN-SHAPE inspection (explain / plan tests) —
    # run()'s finally block unpersists it, so it is no longer cached and
    # must not be re-collected as if it were (ADVICE r03). None before the
    # first run() call.
    _last_fold_plan: DataFrame | None = field(default=None, repr=False, compare=False)

    # --- ledger -----------------------------------------------------------
    # Ledger I/O goes through the Hadoop FileSystem API (same layer Spark
    # writes the epoch data through), so ``out_dir`` may be local, HDFS or
    # s3a:// — a driver-local os.listdir would silently see zero committed
    # epochs on a shared store and re-run everything.
    @property
    def ledger_dir(self) -> str:
        return os.path.join(self.out_dir, "_ledger")

    def _hadoop(self):
        jvm = self.spark._jvm
        path = jvm.org.apache.hadoop.fs.Path(self.ledger_dir)
        fs = path.getFileSystem(self.spark._jsc.hadoopConfiguration())
        return jvm, fs, path

    def committed_epochs(self) -> set[int]:
        jvm, fs, ldir = self._hadoop()
        if not fs.exists(ldir):
            return set()
        out = set()
        for st in fs.listStatus(ldir):
            fn = st.getPath().getName()
            if fn.endswith(".json"):
                try:
                    out.add(int(fn[:-5]))
                except ValueError:
                    continue
        return out

    def _commit(self, epoch: int, record: dict[str, Any]) -> None:
        jvm, fs, ldir = self._hadoop()
        fs.mkdirs(ldir)
        tmp = jvm.org.apache.hadoop.fs.Path(ldir, f".{epoch}.json.tmp")
        final = jvm.org.apache.hadoop.fs.Path(ldir, f"{epoch}.json")
        stream = fs.create(tmp, True)
        try:
            stream.write(bytearray(json.dumps(record).encode("utf-8")))
        finally:
            stream.close()
        fs.delete(final, False)  # idempotent re-commit: clear stale marker
        # Hadoop FileSystem.rename signals failure by returning false, not
        # raising — ignoring it would silently demote a committed epoch.
        if not fs.rename(tmp, final):
            raise IOError(f"ledger rename failed for epoch {epoch}: {tmp} -> {final}")

    # --- run --------------------------------------------------------------
    def run(
        self,
        featurized: DataFrame,
        kernel: str = "ofs",
        batch_size: int = 50,
        num_features: int = 5,
        kernel_kwargs: dict[str, Any] | None = None,
        max_epochs_this_run: int | None = None,
    ) -> list[int]:
        """Execute every uncommitted epoch (optionally capped — used by the
        interrupt/resume test). Returns the epochs committed by THIS call.

        Single-scan: the source is scanned and folded ONCE per ``run()``
        call, covering every todo epoch in one job (epochs partition
        *entities*, so folding them together is exactly the per-epoch fold).
        The fold output — per-window weight rows, orders of magnitude
        smaller than the input — is cached, and the per-epoch loop below
        filters that cache to write + commit each epoch independently. At
        100 TB and n_epochs=8 this is 1 scan + 1 shuffle instead of 8+8;
        resume semantics are unchanged (a crash between per-epoch writes
        leaves later epochs uncommitted, and the next run() re-folds only
        those in one new scan).
        """
        from pystreamfs_spark.fold import fold_weights_stream

        todo = [e for e in range(self.n_epochs) if e not in self.committed_epochs()]
        if max_epochs_this_run is not None:
            todo = todo[:max_epochs_this_run]
        if not todo:
            return []
        ep = epoch_of(self.entity_col, self.n_epochs, self.seed)
        sub = featurized if len(todo) == self.n_epochs else featurized.where(ep.isin([*todo]))
        t0 = time.perf_counter()
        weights_all = (
            fold_weights_stream(
                sub,
                kernel=kernel,
                batch_size=batch_size,
                num_features=num_features,
                kernel_kwargs=kernel_kwargs,
                # this runner manages its own persistence (the .cache()
                # below) and its plan-shape tests introspect the raw fold
                # plan — skip the fold's default localCheckpoint
                materialize=False,
            )
            .withColumn("__epoch", ep)
            .cache()
        )
        weights_all.count()  # materialize: the one scan+fold of the source
        fold_sec = round(time.perf_counter() - t0, 3)
        self._last_fold_plan = weights_all  # introspection hook (plan-shape tests)
        done: list[int] = []
        # try/finally: run() is exactly the interrupt/resume path — a failed
        # per-epoch write or ledger commit must not leak the cached fold
        # output across repeated resume cycles on a long-lived driver.
        try:
            for epoch in todo:
                t1 = time.perf_counter()
                weights = weights_all.where(F.col("__epoch") == epoch).drop("__epoch")
                wpath = os.path.join(self.out_dir, "weights", f"epoch={epoch}")
                weights.write.mode("overwrite").parquet(wpath)
                lineage_rows(weights, self.entity_col).write.mode("overwrite").parquet(
                    os.path.join(self.out_dir, "lineage", f"epoch={epoch}")
                )
                metrics_rows(weights).write.mode("overwrite").parquet(
                    os.path.join(self.out_dir, "metrics", f"epoch={epoch}")
                )
                n = weights.count()
                self._commit(
                    epoch,
                    {
                        "epoch": epoch,
                        "kernel": kernel,
                        "n_windows": n,
                        "elapsed_sec": round(time.perf_counter() - t1, 3),
                        "fold_sec_shared": fold_sec,  # one fold amortized over todo
                        "committed_at_mono": time.monotonic(),
                    },
                )
                done.append(epoch)
        finally:
            weights_all.unpersist()
        return done

    def weights(self) -> DataFrame:
        return self.spark.read.option("basePath", os.path.join(self.out_dir, "weights")).parquet(
            os.path.join(self.out_dir, "weights", "epoch=*")
        )

    def lineage(self) -> DataFrame:
        return self.spark.read.option("basePath", os.path.join(self.out_dir, "lineage")).parquet(
            os.path.join(self.out_dir, "lineage", "epoch=*")
        )

    def metrics(self) -> DataFrame:
        return self.spark.read.option("basePath", os.path.join(self.out_dir, "metrics")).parquet(
            os.path.join(self.out_dir, "metrics", "epoch=*")
        )
