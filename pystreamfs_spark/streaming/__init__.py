from pystreamfs_spark.streaming.adapter import (
    stream_exact_dedup,
    stream_fold,
    stream_quality_signals,
    stream_session_stats,
)

__all__ = [
    "stream_exact_dedup",
    "stream_fold",
    "stream_quality_signals",
    "stream_session_stats",
]
