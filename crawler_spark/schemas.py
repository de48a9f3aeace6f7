"""Canonical schemas for the engine's state and output tables
(FIXTURES.md §1-§6; span struct per BASELINE input_hint)."""

from __future__ import annotations

from pyspark.sql import types as T

SPAN_STRUCT = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("offset", T.IntegerType(), False),
    ]
)

SPANS_TYPE = T.ArrayType(SPAN_STRUCT)

WEB_GRAPH = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("status", T.IntegerType(), False),
    ]
)

FRONTIER = T.StructType(
    [
        T.StructField("source_url", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("priority", T.IntegerType(), False),
        T.StructField("seq", T.LongType(), False),
        T.StructField("attempt", T.IntegerType(), False),
    ]
)

URL_SEEN = T.StructType(
    [
        T.StructField("source_url", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("url_nofrag", T.StringType(), False),
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("first_seq", T.LongType(), False),
    ]
)

CANDIDATES = T.StructType(
    [
        T.StructField("source_url", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("url_nofrag", T.StringType(), False),
        T.StructField("cand_seq", T.LongType(), False),
    ]
)

SOURCE_STATE = T.StructType(
    [
        T.StructField("source_url", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("max_pages", T.IntegerType(), False),
        T.StructField("pages_crawled", T.IntegerType(), False),
        T.StructField("total_pages_found", T.LongType(), False),
        T.StructField("next_enqueue_seq", T.LongType(), False),
    ]
)

DOCS = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("source_url", T.StringType(), False),
        T.StructField("seq", T.LongType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("spans", SPANS_TYPE, False),
    ]
)

CRAWL_LOG = T.StructType(
    [
        T.StructField("source_url", T.StringType(), False),
        T.StructField("seq", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("ok", T.BooleanType(), False),
        T.StructField("next_link", T.StringType(), True),
        T.StructField("batch_id", T.LongType(), False),
    ]
)

# per-page external/internal/file links in document order, for the
# summarize-stage views (A5-A7) — one row per (page pop, position).
PAGE_LINKS = T.StructType(
    [
        T.StructField("source_url", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("seq", T.LongType(), False),
        T.StructField("category", T.StringType(), False),  # internal|external|file
        T.StructField("pos", T.IntegerType(), False),
        T.StructField("link", T.StringType(), False),
    ]
)

ROBOTS = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("disallow_prefixes", T.ArrayType(T.StringType()), False),
        T.StructField("crawl_delay_ms", T.IntegerType(), False),
    ]
)
