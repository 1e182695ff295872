from batch_jaro_winkler_spark.streaming.incremental import (
    incremental_signatures,
    session_window_stats,
    streaming_session_counts,
)

__all__ = [
    "incremental_signatures",
    "session_window_stats",
    "streaming_session_counts",
]
