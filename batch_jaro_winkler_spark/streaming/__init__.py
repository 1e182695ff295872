from batch_jaro_winkler_spark.streaming.incremental import (
    incremental_signatures,
    streaming_session_counts,
)

__all__ = ["incremental_signatures", "streaming_session_counts"]
