"""Structured-Streaming faces of the engine's operators.

The north_rule pipeline is batch (strictly batch reference; resumable
checkpoints), but the signature stage is a stateless narrow map and the
events table is stream-shaped, so both get streaming counterparts for the
ingest-as-it-lands deployment mode:

* :func:`incremental_signatures` — ``readStream`` over a documents
  directory → the SAME ``compute_signatures`` transformation (stateless
  mapInPandas is streaming-safe) → sink.  New near-dup detection then runs
  as periodic batch over the growing signature table (signatures are
  incremental; LSH banding + CC are recomputed per trigger, the standard
  lambda shape for dedup).
* :func:`streaming_session_counts` — watermarked sliding-window event
  aggregation over the events stream (late data handled by the watermark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from batch_jaro_winkler_spark.operators.config import DedupConfig
from batch_jaro_winkler_spark.operators.signatures import compute_signatures


def incremental_signatures(
    spark: SparkSession,
    input_dir: str,
    schema: str = "doc_id long, text string",
    cfg: DedupConfig | None = None,
) -> DataFrame:
    """Streaming DataFrame of signatures for parquet files landing in
    ``input_dir``.  Start with ``.writeStream.format('parquet')`` (real
    deployment) or ``format('memory')`` + ``processAllAvailable()``
    (tests)."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    return compute_signatures(stream, cfg or DedupConfig(), "doc_id", "text")


def streaming_session_counts(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked session-window aggregation per user over a streaming
    events frame (ts, user_id, value): the streaming twin of the batch
    ``events_sessions`` query."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.session_window(F.col("ts"), f"{gap_minutes} minutes"),
            F.col("user_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )
