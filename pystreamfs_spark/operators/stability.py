"""Feature-selection stability operators over the weights table.

- FSCR (Feature-Selection Change Rate), reference utils.py:4-18 /
  pystreamfs.py:86-90: |prev_selected ∖ cur_selected| / n between
  consecutive windows of the same entity, defined for window t ≥ 1.
  Pure built-ins: ``lag`` + ``array_except`` + ``size``. The selected
  arrays are index sets (argsort outputs are unique), so array semantics
  equal the reference's Python-set difference exactly.

- Nogueira stability (Nogueira, Sechidis, Brown — JMLR 2018, eq. 2) —
  named by the north star; not present in this reference repo (it ships in
  the successor "float" framework), implemented from the paper's closed
  form: over k windows' selection vectors Z ∈ {0,1}^{k×m},

      stability = 1 − mean_f(s_f²) / ( q̄(1 − q̄) )

  with s_f² = k/(k−1)·p̂_f(1−p̂_f), p̂_f = column frequency of feature f,
  q̄ = d̄/m, d̄ = mean #selected per window. Features never selected have
  s_f² = 0 and only affect the mean's denominator m — so one explode +
  groupBy covers all terms. Undefined for k < 2 or constant d̄ ∈ {0, m}.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fscr(
    weights: DataFrame,
    num_features: int,
    entity_col: str = "conv_id",
    window_col: str = "window_id",
    selected_col: str = "selected",
    out_col: str = "fscr",
) -> DataFrame:
    """Append per-window FSCR (null for each entity's first window)."""
    w = Window.partitionBy(entity_col).orderBy(window_col)
    prev = F.lag(selected_col).over(w)
    return weights.withColumn(
        out_col,
        F.when(prev.isNull(), F.lit(None).cast("double")).otherwise(
            F.size(F.array_except(prev, F.col(selected_col))) / F.lit(num_features)
        ),
    )


def nogueira_stability(
    weights: DataFrame,
    n_total_features: int | None = None,
    entity_col: str = "conv_id",
    selected_col: str = "selected",
    weights_col: str = "w",
) -> DataFrame:
    """Per-entity Nogueira stability over that entity's window selections.

    Returns (entity, k_windows, stability). ``n_total_features`` defaults to
    the weight-vector length observed in the data.
    """
    m = F.lit(n_total_features) if n_total_features is not None else F.size(F.col(weights_col))
    base = weights.select(
        F.col(entity_col),
        m.alias("__m"),
        F.size(F.col(selected_col)).cast("double").alias("__d"),
        F.col(selected_col).alias("__sel"),
    )

    per_entity = base.groupBy(entity_col).agg(
        F.count(F.lit(1)).alias("k_windows"),
        F.first("__m").alias("__m"),
        F.avg("__d").alias("__dbar"),
    )

    # per-(entity, feature) selection frequencies → sum of sample variances
    freq = (
        base.select(entity_col, F.explode("__sel").alias("__f"))
        .groupBy(entity_col, "__f")
        .agg(F.count(F.lit(1)).cast("double").alias("__cnt"))
    )
    var_sum = (
        freq.join(per_entity.select(entity_col, "k_windows"), entity_col)
        .select(
            entity_col,
            (
                # try_divide: k = 1 → null (ANSI-safe); gated to null output anyway
                F.try_divide(F.col("k_windows"), F.col("k_windows") - 1)
                * (F.col("__cnt") / F.col("k_windows"))
                * (1 - F.col("__cnt") / F.col("k_windows"))
            ).alias("__s2"),
        )
        .groupBy(entity_col)
        .agg(F.sum("__s2").alias("__s2_sum"))
    )

    qbar = F.col("__dbar") / F.col("__m")
    return (
        per_entity.join(var_sum, entity_col, "left")
        .select(
            entity_col,
            F.col("k_windows"),
            F.when(
                (F.col("k_windows") < 2) | (qbar <= 0) | (qbar >= 1),
                F.lit(None).cast("double"),
            )
            .otherwise(1.0 - (F.coalesce(F.col("__s2_sum"), F.lit(0.0)) / F.col("__m")) / (qbar * (1 - qbar)))
            .alias("stability"),
        )
    )
