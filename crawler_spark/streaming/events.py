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

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = [
    "read_event_stream",
    "windowed_fetch_metrics",
    "run_stream_to_store",
    "read_windowed_metrics",
]

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
    """Drive the stream with foreachBatch writing one parquet directory
    PER batch id (``batch_id=N/``). A replayed batch (crash between the
    write and the checkpoint commit) overwrites its own directory instead
    of appending a duplicate — idempotent redelivery, the same batch-id
    discipline the snapshot store uses. outputMode('update') re-emits an
    updated window in a LATER batch; read the sink through
    ``read_windowed_metrics`` (keep-latest per window/host), not a raw
    parquet scan."""
    metrics = windowed_fetch_metrics(read_event_stream(spark, in_path), window=window)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        dest = os.path.join(out_path, f"batch_id={batch_id}")
        batch_df.write.mode("overwrite").parquet(dest)

    return (
        metrics.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )


def read_windowed_metrics(spark: SparkSession, out_path: str) -> DataFrame:
    """Read the metrics sink with update-mode semantics restored: each
    (window_start, host) keeps only its LATEST batch's row (update mode
    re-emits a window whenever late data lands in it, so earlier emissions
    are superseded, not additive). ``batch_id`` comes back as a hive
    partition column from the per-batch directory layout."""
    raw = spark.read.option("basePath", out_path).parquet(out_path)
    w = Window.partitionBy("window_start", "host").orderBy(F.desc("batch_id"))
    return (
        raw.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .drop("rn")
    )
