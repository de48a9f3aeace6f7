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
        T.StructField("batch_id", T.LongType(), False),
    ]
)

CANDIDATES = T.StructType(
    [
        T.StructField("source_url", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("url_nofrag", T.StringType(), False),
        T.StructField("cand_seq", T.LongType(), False),
        T.StructField("batch_id", T.LongType(), False),
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
        T.StructField("batch_id", T.LongType(), False),
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
        T.StructField("batch_id", T.LongType(), False),
    ]
)

# --- job-result payload (the reference's tagged union of 5 outcome tables,
# /root/reference/backend/domain/values.py:60-121 + database/entities.py:90-116,
# materialized as nullable struct columns on ONE wide jobs table — J10's
# eager-loading joins disappear by design). LLM metadata (input/output
# tokens, prompt, model, review_status — values.py:66-72) rides inside the
# extract/summarize structs, so A8 token accounting is per-job columns.

ERROR_RESULT = T.StructType([T.StructField("message", T.StringType(), False)])

SCRAPE_RESULT = T.StructType(
    [
        T.StructField("markdown", T.StringType(), False),
        T.StructField("internal_links", T.ArrayType(T.StringType()), False),
        T.StructField("external_links", T.ArrayType(T.StringType()), False),
        T.StructField("file_links", T.ArrayType(T.StringType()), False),
    ]
)

EXTRACT_RESULT = T.StructType(
    [
        T.StructField("summary", T.StringType(), False),
        T.StructField("key_facts", T.StringType(), False),
        T.StructField("key_quotes", T.StringType(), False),
        T.StructField("key_figures", T.StringType(), False),
        T.StructField("trustworthiness", T.StringType(), False),
        T.StructField("relevancy", T.StringType(), False),
        T.StructField("next_internal_link", T.StringType(), True),
        T.StructField("input_tokens", T.IntegerType(), False),
        T.StructField("output_tokens", T.IntegerType(), False),
        T.StructField("prompt", T.StringType(), False),
        T.StructField("model", T.StringType(), False),
        T.StructField("review_status", T.StringType(), False),
    ]
)

SUMMARIZE_RESULT = T.StructType(
    [
        T.StructField("summary", T.StringType(), False),
        T.StructField("key_facts", T.StringType(), False),
        T.StructField("key_quotes", T.StringType(), False),
        T.StructField("key_figures", T.StringType(), False),
        T.StructField("data_origin", T.StringType(), False),
        T.StructField("source_format", T.StringType(), False),
        T.StructField("focus_area", T.StringType(), False),
        T.StructField("dataset_presence", T.StringType(), False),
        T.StructField("relevant_external_links", T.ArrayType(T.StringType()), False),
        T.StructField("input_tokens", T.IntegerType(), False),
        T.StructField("output_tokens", T.IntegerType(), False),
        T.StructField("prompt", T.StringType(), False),
        T.StructField("model", T.StringType(), False),
        T.StructField("review_status", T.StringType(), False),
    ]
)

CRAWL_RESULT = T.StructType(
    [
        T.StructField("pages_crawled", T.IntegerType(), False),
        T.StructField("total_pages_found", T.LongType(), False),
        T.StructField("max_pages_limit", T.IntegerType(), False),
    ]
)

# Append-only with row revisions (merge-on-read): a mutation (approve /
# edit-summary / delete) appends a higher-revision copy of the row instead
# of rewriting job history — commits stay O(batch) at any scale; readers
# go through jobs_current() (max revision per job_id, tombstones dropped).
JOBS = T.StructType(
    [
        T.StructField("job_id", T.StringType(), False),
        T.StructField("source_url", T.StringType(), False),
        T.StructField("page_url", T.StringType(), True),  # null => source-level job
        T.StructField("seq", T.LongType(), False),  # pop seq; -1 for source-level
        T.StructField("kind", T.StringType(), False),  # scrape|extract|summarize|crawl
        T.StructField("status", T.StringType(), False),  # ok|error
        T.StructField("batch_id", T.LongType(), False),
        T.StructField("revision", T.IntegerType(), False),
        T.StructField("deleted", T.BooleanType(), False),
        T.StructField("error", ERROR_RESULT, True),
        T.StructField("scrape_result", SCRAPE_RESULT, True),
        T.StructField("extract_result", EXTRACT_RESULT, True),
        T.StructField("summarize_result", SUMMARIZE_RESULT, True),
        T.StructField("crawl_result", CRAWL_RESULT, True),
    ]
)

# merge-on-read delete marks for the delta-mode state tables (url_seen,
# docs, crawl_log, page_links, candidates): a deleted source's rows are
# filtered out at read time; frontier/source_state (full tables) are
# rewritten at delete time. The mark is BATCH-SCOPED: it hides only rows
# with batch_id <= the delete's batch_id, so a source re-added after a
# delete (add_sources) gets a clean slate and its new rows stay visible.
DELETED_SOURCES = T.StructType(
    [
        T.StructField("source_url", T.StringType(), False),
        T.StructField("batch_id", T.LongType(), False),
    ]
)

ROBOTS = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("disallow_prefixes", T.ArrayType(T.StringType()), False),
        T.StructField("crawl_delay_ms", T.IntegerType(), False),
    ]
)
