"""Top-k operators.

- :func:`top_k_per_group` — classic grouped top-k via ``row_number`` (one
  shuffle; AQE handles group skew).
- :func:`array_top_m_indices` — the SQL-expressible twin of the kernel-side
  selection rule (reference pystreamfs.py:70): indices of the m largest
  |values| of an array column, ties broken by *descending position* —
  exactly what ``np.argsort(|w|)[::-1]`` yields for equal keys (reversed
  stable order). Used as the DuckDB-checkable oracle of the selection rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    k: int,
    descending: bool = True,
    rank_col: str = "rk",
    tie_breakers: list[str] | None = None,
) -> DataFrame:
    """Keep the top-k rows per group by ``order_col`` (deterministic when
    ``tie_breakers`` make the ordering total)."""
    order = [F.col(order_col).desc() if descending else F.col(order_col).asc()]
    for t in tie_breakers or []:
        order.append(F.col(t).asc())
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return df.withColumn(rank_col, F.row_number().over(w)).where(F.col(rank_col) <= k)


def array_top_m_indices(
    df: DataFrame,
    array_col: str,
    m: int,
    key_cols: list[str],
    out_col: str = "top_idx",
) -> DataFrame:
    """For each row: 0-based indices of the m largest |values| in the array,
    ordered by |value| desc, ties by index desc (reference argsort-reverse
    tie order). Implemented with posexplode + row_number (shuffles on the
    row key); the kernel path computes the same thing in NumPy without a
    shuffle — this operator exists for SQL interop and oracle checks."""
    exploded = df.select(*key_cols, F.posexplode(array_col).alias("__pos", "__val"))
    w = Window.partitionBy(*key_cols).orderBy(F.abs(F.col("__val")).desc(), F.col("__pos").desc())
    ranked = exploded.withColumn("__rk", F.row_number().over(w)).where(F.col("__rk") <= m)
    return (
        ranked.groupBy(*key_cols)
        .agg(F.collect_list(F.struct("__rk", "__pos")).alias("__l"))
        .select(
            *key_cols,
            F.transform(F.array_sort("__l"), lambda s: s["__pos"]).alias(out_col),
        )
    )
