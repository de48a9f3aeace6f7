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
    "streaming_host_sessions",
    "run_session_stream",
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


# ---------------------------------------------------------------------------
# custom stateful operator: per-host crawl sessions (applyInPandasWithState)
# ---------------------------------------------------------------------------

SESSION_SCHEMA = (
    "host string, session_start timestamp, session_end timestamp, "
    "n_events long, ok_count long, bytes long"
)
_SESSION_STATE_SCHEMA = "start long, last long, n long, okc long, byt long"


def streaming_host_sessions(
    events: DataFrame,
    gap_sec: int = 1800,
    late_threshold: str = "2 minutes",
) -> DataFrame:
    """Per-host crawl sessionization as a CUSTOM STATEFUL streaming
    operator (`applyInPandasWithState`) — the semantics no built-in
    windowed agg expresses: a session is a maximal run of fetch events
    with inter-event gaps <= ``gap_sec``, closed either by a larger gap
    inside the data or by an EVENT-TIME TIMEOUT once the watermark passes
    last_event + gap (so an idle host's open session flushes without
    waiting for its next fetch, and state stays bounded).

    Batch twin: queries.q_sessionize (lag + cumsum windows) — identical
    boundary rule, cross-checked in tests. Late in-watermark events are
    handled exactly against all state this operator still holds: each
    batch's sorted rows are sessionized, then interval-merged with the
    open state session, so a straggler merges into (and extends the start
    of) the open session only when within gap_sec of it and otherwise
    forms its own session — the same boundaries the batch twin's global
    sort yields. Append-mode caveat: a late event whose session was
    already EMITTED in an earlier batch cannot retro-split or bridge it —
    the batch twin, which sorts the full history first, is the authority
    there. State per key is one 5-field
    tuple: at 10^7 live hosts that is ~400 MB across the cluster, hash
    partitioned by host, no shuffle beyond the groupBy."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def _emit(host: str, st: tuple) -> "pd.DataFrame":
        start, last, n, okc, byt = st
        return pd.DataFrame(
            {
                "host": [host],
                "session_start": [pd.to_datetime(start, unit="s")],
                "session_end": [pd.to_datetime(last, unit="s")],
                "n_events": [n],
                "ok_count": [okc],
                "bytes": [byt],
            }
        )

    def _fn(key, pdf_iter, state: "GroupState"):
        host = key[0]
        if state.hasTimedOut:
            st = tuple(state.get)
            state.remove()
            yield _emit(host, st)
            return
        rows = pd.concat(list(pdf_iter), ignore_index=True).sort_values("ts")
        # sessionize the sorted batch rows first, then interval-merge the
        # open state session into that timeline: a late in-watermark event
        # (or run of events) that precedes the open session's start merges
        # only when it is within gap_sec of it — the exact boundary rule
        # the batch twin's global sort produces. The old per-event min()
        # merge silently bridged stragglers arbitrarily far before the
        # open start into it.
        sessions: list[tuple] = []
        for ts_ns, ok, byt in zip(
            rows["ts"].astype("int64"), rows["ok"], rows["bytes"]
        ):
            ts = int(ts_ns) // 1_000_000_000
            okv, bv = int(bool(ok)), int(byt)
            if sessions and ts - sessions[-1][1] <= gap_sec:
                s = sessions[-1]
                sessions[-1] = (s[0], max(s[1], ts), s[2] + 1, s[3] + okv, s[4] + bv)
            else:
                sessions.append((ts, ts, 1, okv, bv))
        if state.exists:
            sessions.append(tuple(state.get))
            sessions.sort(key=lambda s: (s[0], s[1]))
            merged: list[tuple] = []
            for s in sessions:
                if merged and s[0] - merged[-1][1] <= gap_sec:
                    m = merged[-1]
                    merged[-1] = (
                        m[0],
                        max(m[1], s[1]),
                        m[2] + s[2],
                        m[3] + s[3],
                        m[4] + s[4],
                    )
                else:
                    merged.append(s)
            sessions = merged
        # every session but the newest is closed by construction (a later
        # in-batch event or the open session sits > gap_sec after it);
        # append-mode caveat unchanged: once emitted, a session cannot be
        # retro-bridged by data arriving in a LATER batch — the batch
        # twin, which sorts the full history, is the authority there
        for s in sessions[:-1]:
            yield _emit(host, s)
        open_s = sessions[-1]
        state.update(open_s)
        # flush the open session when the watermark passes last + gap;
        # Spark requires the timeout to sit beyond the current watermark
        state.setTimeoutTimestamp(
            max((open_s[1] + gap_sec) * 1000, state.getCurrentWatermarkMs() + 1)
        )

    return (
        events.withWatermark("ts", late_threshold)
        .groupBy("host")
        .applyInPandasWithState(
            _fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def run_session_stream(
    spark: SparkSession,
    in_path: str,
    checkpoint_dir: str,
    out_path: str,
    gap_sec: int = 1800,
    max_files_per_trigger: int | None = None,
):
    """Drive streaming_host_sessions from a file source into the same
    idempotent batch_id-directory sink run_stream_to_store uses.
    ``max_files_per_trigger`` forces multi-batch execution so event-time
    timeouts (which fire on the NEXT batch's watermark) are exercised."""
    reader = spark.readStream.schema(EVENT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    sessions = streaming_host_sessions(reader.json(in_path), gap_sec=gap_sec)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        dest = os.path.join(out_path, f"batch_id={batch_id}")
        batch_df.write.mode("overwrite").parquet(dest)

    return (
        sessions.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
