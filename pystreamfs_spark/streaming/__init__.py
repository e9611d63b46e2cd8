from pystreamfs_spark.streaming.adapter import stream_fold, stream_session_stats

__all__ = ["stream_fold", "stream_session_stats"]
