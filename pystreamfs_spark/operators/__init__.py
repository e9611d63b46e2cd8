from pystreamfs_spark.operators.sessionize import sessionize
from pystreamfs_spark.operators.windows import (
    assign_count_windows,
    backfill,
    rolling_agg,
    strict_prefix_agg,
    with_lag_lead,
)
from pystreamfs_spark.operators.asof import asof_join
from pystreamfs_spark.operators.stability import fscr, nogueira_stability
from pystreamfs_spark.operators.topk import array_top_m_indices, top_k_per_group

__all__ = [
    "sessionize",
    "assign_count_windows",
    "with_lag_lead",
    "backfill",
    "rolling_agg",
    "strict_prefix_agg",
    "asof_join",
    "fscr",
    "nogueira_stability",
    "array_top_m_indices",
    "top_k_per_group",
]
