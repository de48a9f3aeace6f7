"""Query-surface parity views over the crawl state tables (SURVEY.md M6).

The reference exposes its crawl state through EXISTS-shaped repository
queries (J4-J8, /root/reference/backend/database/repositories.py:131-318)
and chat-service aggregations (A6-A7, backend/service/chatbot_service.py).
These re-express each as a DataFrame view over the engine's state tables
(crawl_log, docs, page_links, source_state — see schemas.py). All are
single semi/anti joins or windowed aggregations: Catalyst handles pushdown
and broadcasts the (small) source_state dimension automatically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "get_source",
    "get_page",
    "failed_job_sources",
    "crawled_sources",
    "discovered_sources",
    "discover_new_sources",
    "in_progress_sources",
    "source_page_summaries",
    "external_links_keepfirst",
    "source_listing",
]


def get_source(source_state: DataFrame, url_seen: DataFrame, url: str) -> DataFrame:
    """Single-source lookup (services.py:241-247): the source row with its
    page URLs collected — a key-equality filter Catalyst turns into a
    pruned scan, plus one small aggregation."""
    pages = (
        url_seen.filter(F.col("source_url") == url)
        .groupBy("source_url")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("first_seq", "url"))),
                lambda s: s.getField("url"),
            ).alias("page_urls")
        )
    )
    return source_state.filter(F.col("source_url") == url).join(pages, "source_url", "left")


def get_page(docs: DataFrame, url: str) -> DataFrame:
    """Single-page lookup (services.py:249-253): the page's doc rows
    (spans payload) by key equality."""
    return docs.filter(F.col("doc_id") == url)


def failed_job_sources(source_state: DataFrame, crawl_log: DataFrame) -> DataFrame:
    """J5: sources having >=1 failed fetch (EXISTS on _error,
    repositories.py:184-233) — left-semi on status."""
    failed = crawl_log.filter(~F.col("ok")).select("source_url")
    return source_state.join(failed, "source_url", "left_semi")


def crawled_sources(source_state: DataFrame, crawl_log: DataFrame) -> DataFrame:
    """J6: sources with a completed crawl (EXISTS on _crawl_result,
    repositories.py:235-262) — here: budget exhausted or queue drained.
    The two branches filter on disjoint predicates (>= vs <), so the
    union needs no distinct (a distinct here would be a pure-waste
    shuffle that can never remove a row)."""
    return source_state.filter(F.col("pages_crawled") >= F.col("max_pages")).unionByName(
        source_state.filter(F.col("pages_crawled") < F.col("max_pages")).join(
            crawl_log.select("source_url"), "source_url", "left_semi"
        )
    )


def discovered_sources(source_state: DataFrame, crawl_log: DataFrame) -> DataFrame:
    """J7: sources never crawled (~EXISTS any job, repositories.py:264-285)
    — left-anti."""
    return source_state.join(crawl_log.select("source_url"), "source_url", "left_anti")


def in_progress_sources(source_state: DataFrame) -> DataFrame:
    """J8: budget not exhausted (EXISTS job with no outcome,
    repositories.py:287-318)."""
    return source_state.filter(F.col("pages_crawled") < F.col("max_pages"))


def source_page_summaries(docs: DataFrame, strip_markdown: bool = True) -> DataFrame:
    """A4 + P9: per source, first doc per page in crawl order, first text
    span as the page summary, concatenated '\\n\\n'-joined
    (entities.py:214-229); markdown stripped from the listing payload
    (services.py:194-238) unless strip_markdown=False."""
    first_text = F.expr("filter(spans, s -> s.kind = 'text')[0].text")
    w = Window.partitionBy("source_url", "doc_id").orderBy("seq")
    per_page = (
        docs.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("source_url", "doc_id", "seq", first_text.alias("summary"))
    )
    agg = per_page.groupBy("source_url").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("seq", "summary"))),
                lambda s: s.getField("summary"),
            ),
            "\n\n",
        ).alias("page_summaries"),
        F.count("*").alias("n_pages"),
    )
    if strip_markdown:
        return agg.select("source_url", "n_pages")
    return agg


def external_links_keepfirst(crawl_log: DataFrame, page_links: DataFrame) -> DataFrame:
    """A5: global keep-first dedup of external links per source, in
    first-touch page order (entities.py:248-261)."""
    first_touch = crawl_log.groupBy("source_url", "url").agg(F.min("seq").alias("first_seq"))
    ordered = page_links.filter(F.col("category") == "external").join(
        first_touch, ["source_url", "url"]
    )
    w = Window.partitionBy("source_url", "link").orderBy("first_seq", "seq", "pos")
    return (
        ordered.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("source_url", "link", "first_seq", "seq", "pos")
    )


def discover_new_sources(source_state: DataFrame, crawl_log: DataFrame, page_links: DataFrame) -> DataFrame:
    """J9: frontier discovery across sources — the summarize stage's
    relevant external links are upserted as new, un-crawled sources iff
    not already known (get-then-insert dedup, services.py:28-39,304-311).
    MERGE-style: keep-first external links -> anti-join known sources ->
    rows shaped for a source_state append (crawled counters zeroed)."""
    from .functions.udfs import host_udf

    ext = external_links_keepfirst(crawl_log, page_links).select(
        F.col("link").alias("source_url")
    ).distinct()
    new = ext.join(source_state.select("source_url"), "source_url", "left_anti")
    return new.select(
        "source_url",
        host_udf("source_url").alias("host"),
        F.lit(0).alias("max_pages"),  # discovered, never auto-crawled (reference §3.1 step 5)
        F.lit(0).alias("pages_crawled"),
        F.lit(1).cast("long").alias("total_pages_found"),
        F.lit(1).cast("long").alias("next_enqueue_seq"),
    )


def source_listing(source_state: DataFrame, docs: DataFrame) -> DataFrame:
    """A6: chat-service source listing — each source with its first doc's
    first text span (chatbot_service.py:13-40)."""
    first_text = F.expr("filter(spans, s -> s.kind = 'text')[0].text")
    w = Window.partitionBy("source_url").orderBy("seq")
    first_doc = (
        docs.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("source_url", first_text.alias("first_summary"))
    )
    return source_state.join(first_doc, "source_url", "left").select(
        "source_url", "host", "pages_crawled", "total_pages_found", "first_summary"
    )
