"""Structured Streaming ingestion of the crawl event/metrics stream.

The engine itself is a bounded micro-batch driver loop (SURVEY.md §2.9 —
no watermarks needed for the drain). This module covers the genuinely
*streaming* surface around it: continuous ingestion of fetch events into
windowed metrics, expressed as readStream -> watermark -> tumbling-window
agg -> foreachBatch append into the snapshot store. The same topology on
a cluster reads Kafka instead of files; only the source line changes.

Late data: watermark of ``late_threshold`` keeps per-window state bounded
(the reference's analog is its 120 s LLM retry window — T5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["read_event_stream", "windowed_fetch_metrics", "run_stream_to_store"]

EVENT_SCHEMA = "ts timestamp, host string, url string, ok boolean, bytes long"


def read_event_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream of fetch events (JSONL); Kafka in production."""
    return spark.readStream.schema(EVENT_SCHEMA).json(path)


def windowed_fetch_metrics(
    events: DataFrame,
    window: str = "1 minute",
    late_threshold: str = "2 minutes",
) -> DataFrame:
    """Tumbling-window per-host fetch metrics with bounded state."""
    return (
        events.withWatermark("ts", late_threshold)
        .groupBy(F.window("ts", window).alias("w"), "host")
        .agg(
            F.count("*").alias("fetches"),
            F.sum(F.when(F.col("ok"), 1).otherwise(0)).alias("ok_count"),
            F.sum("bytes").alias("bytes"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "host",
            "fetches",
            "ok_count",
            "bytes",
        )
    )


def run_stream_to_store(
    spark: SparkSession,
    in_path: str,
    checkpoint_dir: str,
    out_path: str,
    window: str = "1 minute",
):
    """Drive the stream with foreachBatch appending parquet — the same
    exactly-once batch-id discipline the snapshot store uses (re-delivered
    batch ids are no-ops via the sink's own transaction log)."""
    metrics = windowed_fetch_metrics(read_event_stream(spark, in_path), window=window)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(out_path)

    return (
        metrics.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
