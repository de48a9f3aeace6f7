"""Streaming frontier ingestion: continuously discovered URLs ->
canonicalize -> streaming dedup -> idempotent frontier appends.

The batch engine dedups against its URL-seen state per micro-batch; this
covers the STREAMING half of that story — a firehose of link discoveries
(Kafka in production, a file source here) deduplicated on the
canonical URL with BOUNDED state via ``dropDuplicatesWithinWatermark``:
a URL's dedup key is held only until the watermark passes its event
time + threshold, so state does not grow with the full crawl history.
Duplicates further apart than the threshold are passed through and left
to the batch engine's exact URL-seen anti-join — the streaming stage is
a prefilter with a bounded-state guarantee, the same contract as the
Bloom prefilter on the batch path.

Canonicalization runs BEFORE dedup (the whole point: scheme/host case,
fragments, default ports, and escape variants must collapse to one
frontier entry), via the same Arrow-batched canonicalize_rfc3986 the
batch scheduler uses. Invalid URLs drop.

Sink: foreachBatch into one parquet directory per batch id — a replayed
batch (crash between write and checkpoint commit) overwrites its own
directory instead of appending duplicates, the same idempotent
redelivery discipline as streaming/events.py and the snapshot store.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "read_url_stream",
    "dedup_url_stream",
    "run_frontier_ingest",
    "read_ingested_frontier",
]

URL_EVENT_SCHEMA = "ts timestamp, url string"


def read_url_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream of URL-discovery events (JSONL); Kafka in
    production — only this line changes."""
    return spark.readStream.schema(URL_EVENT_SCHEMA).json(path)


def dedup_url_stream(urls: DataFrame, late_threshold: str = "10 minutes") -> DataFrame:
    """Canonicalize, drop invalid, dedup on the canonical URL with
    watermark-bounded state. Output: (url, host) — the kept event's ts
    is intentionally NOT emitted: which duplicate wins is a processing-
    order artifact, while the distinct URL set is deterministic."""
    from ..functions.udfs import canonicalize_rfc3986_udf

    canon = urls.withColumn("url", canonicalize_rfc3986_udf("url")).filter(
        F.col("url").isNotNull()
    )
    deduped = canon.withWatermark("ts", late_threshold).dropDuplicatesWithinWatermark(
        ["url"]
    )
    return deduped.select(
        "url", F.parse_url("url", F.lit("HOST")).alias("host"), "ts"
    )


def run_frontier_ingest(
    spark: SparkSession,
    in_path: str,
    checkpoint_dir: str,
    out_path: str,
    late_threshold: str = "10 minutes",
):
    """Drive the ingest with the idempotent batch_id-directory sink."""
    deduped = dedup_url_stream(read_url_stream(spark, in_path), late_threshold)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        dest = os.path.join(out_path, f"batch_id={batch_id}")
        batch_df.drop("ts").write.mode("overwrite").parquet(dest)

    return (
        deduped.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def read_ingested_frontier(spark: SparkSession, out_path: str) -> DataFrame:
    """Read the ingested frontier across batch directories. A URL can
    legally appear in two batches (duplicates farther apart than the
    watermark threshold pass through by design), so keep the FIRST
    batch's row per URL — deterministic because batch ids are ordered."""
    raw = spark.read.option("basePath", out_path).parquet(out_path)
    from pyspark.sql import Window

    w = Window.partitionBy("url").orderBy("batch_id")
    return (
        raw.withColumn("rn", F.row_number().over(w)).filter("rn = 1").select("url", "host")
    )
