"""SparkSession factory with scale-oriented defaults.

Local testing runs on ``local[N]``; the same config block is what we would
ship in ``spark-submit --py-files`` on a real cluster (AQE on, skew-join
splitting on, Arrow on). Nothing here is sandbox-specific.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession


def _ship_package(spark: SparkSession) -> None:
    """Make this package importable on executor Python workers.

    Equivalent to ``spark-submit --py-files pystreamfs_spark.zip`` — zips the
    installed package once and registers it with addPyFile, so applyInPandas/
    mapInPandas UDFs that reference engine kernels deserialize cleanly no
    matter the caller's working directory."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zpath = os.path.join(tempfile.gettempdir(), "pystreamfs_spark_pyfiles.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(pkg_dir):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    rel = os.path.join("pystreamfs_spark", os.path.relpath(full, pkg_dir))
                    z.write(full, rel)
    spark.sparkContext.addPyFile(zpath)


def get_spark(
    app_name: str = "pystreamfs_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's standard config.

    - AQE + skew-join handling: runtime re-planning; splits skewed shuffle
      partitions for the equi-join paths (SURVEY.md §4).
    - Arrow execution for pandas UDFs / applyInPandas (the kernel folds).
    - UTC session timezone so timestamp semantics match the DuckDB oracle.
    """
    # Pin BLAS/OpenMP to one thread per Python worker: every executor worker
    # otherwise spawns ncpu spin-waiting BLAS threads (OpenBLAS default),
    # and 32 workers × 32 threads thrash the box — measured 2.6× slower
    # folds and *inverse* core scaling. Kernels use tiny vectors; threaded
    # BLAS buys nothing. Set both in this process (local-mode workers fork
    # from it) and in executorEnv (real clusters).
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS", "NUMEXPR_NUM_THREADS"):
        os.environ.setdefault(var, "1")

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # bigger Arrow batches amortize per-batch decode in mapInArrow folds
        # (+15% scan throughput measured at 65536); callers with wide binary
        # rows (multimodal) should lower it via the env knob
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            os.environ.get("SPARK_GRAFT_ARROW_BATCH", "10000"),
        )
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or 32))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "32g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.executorEnv.OMP_NUM_THREADS", "1")
        .config("spark.executorEnv.OPENBLAS_NUM_THREADS", "1")
        .config("spark.executorEnv.MKL_NUM_THREADS", "1")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    _ship_package(spark)
    return spark
