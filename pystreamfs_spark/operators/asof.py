"""Point-in-time (as-of) join.

For every left row (key, ts) attach the value columns of the latest right
row with ``right.ts <= left.ts`` (backward, inclusive) for the same key —
the relational form of the reference's strict-prefix/point-in-time rule
(utils.py:39-45, where evaluation at window t sees only prior state).

Two physical strategies:

- ``strategy="union"`` (default; sort-merge-shaped, scales to any right
  size): union the two sides tagged, then one pass of
  ``last(struct(values), ignorenulls=True) OVER (PARTITION BY key ORDER BY
  ts, side ROWS UNBOUNDED PRECEDING)`` — a single struct per right row so a
  NULL value column still wins as the latest match. Exactly one shuffle on
  the key; no row explosion; skew handled by AQE since the window is per-key.
- ``strategy="broadcast"`` (fast path for small right sides, e.g. weight
  checkpoints): range-θ join ``left ⋈ right ON key AND r.ts <= l.ts``
  broadcast to every executor, then keep the max-r.ts match per left row
  via ``ROW_NUMBER``. No shuffle of the left side at all when right
  broadcasts.

DuckDB's native ``ASOF JOIN`` is the test oracle (same inclusive-backward
semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    strategy: str = "union",
    allow_exact_matches: bool = True,
) -> DataFrame:
    """Backward as-of join; returns left columns + right value columns
    (null when no prior right row exists)."""
    keys = [on] if isinstance(on, str) else list(on)
    value_cols = value_cols or [c for c in right.columns if c not in keys and c != right_ts]

    if strategy == "broadcast":
        return _asof_broadcast(left, right, keys, left_ts, right_ts, value_cols, allow_exact_matches)
    return _asof_union(left, right, keys, left_ts, right_ts, value_cols, allow_exact_matches)


def _asof_union(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    inclusive: bool,
) -> DataFrame:
    from pyspark.sql.types import StructField, StructType

    left_cols = left.columns
    # side ordering at equal ts: right first (0) so an exact-ts right row is
    # visible to the left row when inclusive; left first otherwise
    l_side, r_side = (1, 0) if inclusive else (0, 1)
    # Forward-fill ONE struct per right row (not each value column
    # separately): a right row whose value column is NULL must still win as
    # the latest match — per-column last(ignorenulls) would skip it and leak
    # an older row's value, diverging from ASOF JOIN semantics.
    r_struct_t = StructType([StructField(c, right.schema[c].dataType) for c in value_cols])
    tagged_l = left.select(
        *[F.col(c) for c in left_cols],
        F.col(left_ts).alias("__asof_ts"),
        F.lit(l_side).alias("__side"),
        F.lit(None).cast(r_struct_t).alias("__r_struct"),
    )
    tagged_r = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols if c not in keys],
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__asof_ts"),
        F.lit(r_side).alias("__side"),
        F.struct(*[F.col(c).alias(c) for c in value_cols]).alias("__r_struct"),
    ).select(*[F.col(c) for c in left_cols], "__asof_ts", "__side", "__r_struct")

    u = tagged_l.unionByName(tagged_r)
    w = (
        Window.partitionBy(*keys)
        .orderBy("__asof_ts", "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    u = u.withColumn("__r_struct", F.last("__r_struct", ignorenulls=True).over(w))
    out = u.where(F.col("__side") == l_side).select(
        *[F.col(c) for c in left_cols],
        *[F.col("__r_struct")[c].alias(c) for c in value_cols],
    )
    return out


def _asof_broadcast(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    inclusive: bool,
) -> DataFrame:
    # Collapse the small right side to one sorted struct-array per key,
    # broadcast-join it, and probe with a higher-order filter — zero
    # shuffles of the left side, no window, no row explosion.
    r_agg = right.groupBy(*keys).agg(
        F.sort_array(
            F.collect_list(F.struct(F.col(right_ts).alias("__r_ts"), *[F.col(c).alias(c) for c in value_cols]))
        ).alias("__asof_arr")
    )
    joined = left.join(F.broadcast(r_agg), on=keys, how="left")
    lts = F.col(left_ts)
    # try_element_at: empty match list (no prior right row) → null, ANSI-safe
    match = F.try_element_at(
        F.filter(
            F.col("__asof_arr"),
            (lambda x: x["__r_ts"] <= lts) if inclusive else (lambda x: x["__r_ts"] < lts),
        ),
        F.lit(-1),
    )
    return joined.select(
        *[F.col(c) for c in left.columns],
        *[match[c].alias(c) for c in value_cols],
    )
