"""Streaming frontier ingestion: continuously discovered URLs ->
canonicalize -> streaming dedup -> idempotent frontier appends.

The batch engine dedups against its URL-seen state per micro-batch; this
covers the STREAMING half of that story — a firehose of link discoveries
(Kafka in production, a file source here) deduplicated on the
canonical URL with BOUNDED state via ``dropDuplicatesWithinWatermark``.
The watermark runs on ARRIVAL time (the micro-batch timestamp), not the
event's own ts: an event-time watermark would silently DISCARD a
late-arriving never-seen URL (below-watermark rows are dropped before
the dedup operator — a prefilter must only ever remove duplicates,
never new URLs), while arrival time cannot classify any arriving
discovery as late. A URL's dedup key is held for ~threshold of wall
clock, so state does not grow with the full crawl history; duplicates
re-arriving after the threshold pass through and are left to the batch
engine's exact URL-seen anti-join — the streaming stage is a prefilter
with a bounded-state guarantee, the same contract as the Bloom
prefilter on the batch path.

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
    watermark-bounded state keyed on ARRIVAL time (see module docstring:
    an event-time watermark would drop late NEW urls, not just
    duplicates). Output: (url, host) only — neither the input ts nor the
    arrival ts is emitted: which duplicate wins is a processing-order
    artifact, while the distinct URL set is deterministic. ``host`` uses
    the engine's canonical host_of definition (full netloc including
    port/userinfo, same as the batch path) so per-host politeness keys
    agree between the streaming and batch frontiers."""
    from ..functions.udfs import canonicalize_rfc3986_udf, host_udf

    canon = (
        urls.withColumn("url", canonicalize_rfc3986_udf("url"))
        .filter(F.col("url").isNotNull())
        .withColumn("arrival_ts", F.current_timestamp())
    )
    deduped = canon.withWatermark(
        "arrival_ts", late_threshold
    ).dropDuplicatesWithinWatermark(["url"])
    return deduped.select("url", host_udf("url").alias("host"))


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
        batch_df.write.mode("overwrite").parquet(dest)

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
