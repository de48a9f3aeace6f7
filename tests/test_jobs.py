"""Job-result payload + review workflow: engine/oracle parity of the
tagged-union jobs table, enum validity, review mutations as snapshot
commits, and cascade delete with merge-on-read marks."""

import json

import pytest
from pyspark.sql import functions as F

from crawler_spark.fixtures import make_web_graph, web_graph_rows
from crawler_spark.jobs import (
    DATA_ORIGIN,
    DATASET_PRESENCE,
    FOCUS_AREA,
    RELEVANCY,
    SOURCE_FORMAT,
    InvalidJobTypeError,
    InvalidSummaryValueError,
    JobNotFoundError,
    SourceNotFoundError,
    approve_job_review_status,
    chat_read_sources,
    chat_source_listing,
    delete_source,
    edit_job_outcome_summary,
    simulate_jobs,
    unreviewed_job_sources,
)
from crawler_spark.operators.frontier import CrawlEngine
from crawler_spark.oracle import crawl_many, make_policy
from crawler_spark.schemas import WEB_GRAPH

FIXTURE = dict(n_hosts=2, pages_per_host=10, seed=21, max_pages=4)


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    g = make_web_graph(**FIXTURE)
    web = spark.createDataFrame(web_graph_rows(g), WEB_GRAPH)
    eng = CrawlEngine(spark, web, str(tmp_path_factory.mktemp("jobs")), policy="lexmin")
    eng.run(seeds=g.seeds)
    return eng


def _norm(row_dict: dict) -> str:
    return json.dumps(row_dict, sort_keys=True, default=list)


def test_engine_jobs_match_oracle_simulation(spark, engine):
    """The wide jobs table (nullable-struct tagged union) is byte-equal to
    the pure-Python simulation over the oracle run — both sides call the
    same deterministic field policies (extract_fields/summarize_fields)."""
    g = make_web_graph(**FIXTURE)
    expected = simulate_jobs(crawl_many(g.seeds, g.web, make_policy("lexmin")))
    got = [r.asDict(recursive=True) for r in engine.jobs().collect()]
    assert sorted(map(_norm, got)) == sorted(map(_norm, expected))


def test_job_enums_and_tokens_valid(engine):
    cur = engine.jobs().collect()
    kinds = {r.kind for r in cur}
    assert kinds == {"scrape", "extract", "summarize", "crawl"}
    for r in cur:
        if r.kind == "extract":
            assert r.extract_result.relevancy in RELEVANCY
            assert r.extract_result.review_status == "Unreviewed"
            assert r.extract_result.input_tokens > 0
            assert r.extract_result.output_tokens > 0
        elif r.kind == "summarize":
            s = r.summarize_result
            assert s.data_origin in DATA_ORIGIN
            assert s.source_format in SOURCE_FORMAT
            assert s.focus_area in FOCUS_AREA
            assert s.dataset_presence in DATASET_PRESENCE
            assert len(s.relevant_external_links) <= 5  # O3 up-to-5 rule
            assert r.page_url is None
        elif r.kind == "crawl":
            c = r.crawl_result
            assert c.pages_crawled <= c.max_pages_limit == FIXTURE["max_pages"]
    # failed fetches: error outcome, no extract job for that seq
    errs = [r for r in cur if r.status == "error"]
    for e in errs:
        assert e.kind == "scrape" and e.error.message.startswith("failed to scrape")
        assert not any(
            r.kind == "extract" and r.source_url == e.source_url and r.seq == e.seq
            for r in cur
        )


def test_approve_and_unreviewed_view(spark, engine):
    """J4 over real state: approving the page's extract job removes it
    from the unreviewed set; the view drops a source only when ALL its
    extract/summarize jobs are approved (repositories.py:131-154)."""
    state = engine.source_state()
    before = {r.source_url for r in unreviewed_job_sources(state, engine.jobs_all()).collect()}
    assert before == {r.source_url for r in state.collect()}

    target = sorted(
        r.source_url for r in engine.jobs().filter("kind = 'extract'").collect()
    )[0]
    todo = engine.jobs().filter(
        (F.col("source_url") == target) & F.col("kind").isin("extract", "summarize")
    ).collect()
    for j in todo:
        approve_job_review_status(engine, j.job_id)

    after = {r.source_url for r in unreviewed_job_sources(state, engine.jobs_all()).collect()}
    assert after == before - {target}
    # the mutation appended revisions (merge-on-read), never rewrote history
    revs = engine.jobs_all().filter(F.col("source_url") == target)
    assert revs.filter("revision = 1").count() == len(todo)
    assert revs.filter("revision = 0").count() >= len(todo)


def test_edit_summary_and_errors(spark, engine):
    job = engine.jobs().filter("kind = 'summarize'").collect()[0]
    edit_job_outcome_summary(engine, job.job_id, "  new summary text  ")
    got = engine.jobs().filter(F.col("job_id") == job.job_id).collect()[0]
    assert got.summarize_result.summary == "new summary text"  # stripped
    assert got.revision == job.revision + 1

    with pytest.raises(InvalidSummaryValueError):
        edit_job_outcome_summary(engine, job.job_id, "   ")
    with pytest.raises(JobNotFoundError):
        approve_job_review_status(engine, "no-such-job")
    crawl_job = engine.jobs().filter("kind = 'crawl'").collect()[0]
    with pytest.raises(InvalidJobTypeError):
        approve_job_review_status(engine, crawl_job.job_id)


def test_chat_views_over_job_rows(spark, engine):
    listing = {r.source_url: r for r in chat_source_listing(engine.jobs_all()).collect()}
    state_urls = {r.source_url for r in engine.source_state().collect()}
    assert set(listing) == state_urls
    for r in listing.values():
        assert r.data_origin in DATA_ORIGIN and r.dataset_presence in DATASET_PRESENCE

    read = {r.source_url: r for r in chat_read_sources(engine.jobs_all()).collect()}
    for src, r in read.items():
        # source-level label first, then per-page labels in crawl order
        assert r.key_facts.startswith("Source Summary:\n")
        assert "Page (" in r.key_facts
        first_page = r.key_facts.split("Page (", 1)[1].split(")", 1)[0]
        assert first_page.startswith("https://")


def test_delete_source_cascades_and_survives_resume(spark, tmp_path):
    g = make_web_graph(n_hosts=2, pages_per_host=8, seed=5, max_pages=3)
    web = spark.createDataFrame(web_graph_rows(g), WEB_GRAPH)
    eng = CrawlEngine(spark, web, str(tmp_path / "del"), policy="lexmin")
    eng.run(seeds=g.seeds)
    victim = g.seeds[0][0]
    survivor = g.seeds[1][0]

    with pytest.raises(SourceNotFoundError):
        delete_source(eng, "https://nope.example.org")
    delete_source(eng, victim)

    for acc in (eng.crawl_log, eng.url_seen, eng.docs, eng.page_links, eng.jobs):
        remaining = {r.source_url for r in acc().collect()}
        assert victim not in remaining, acc.__name__
        assert survivor in remaining, acc.__name__
    assert {r.source_url for r in eng.source_state().collect()} == {survivor}

    # a fresh engine on the same store (resume) sees the same state and
    # does not resurrect the deleted source
    eng2 = CrawlEngine(spark, web, str(tmp_path / "del"), policy="lexmin")
    eng2.run()
    assert {r.source_url for r in eng2.source_state().collect()} == {survivor}
    assert victim not in {r.source_url for r in eng2.jobs().collect()}


def test_delete_then_readd_recrawls_cleanly(spark, tmp_path):
    """Batch-scoped delete marks: a source deleted and then RE-ADDED
    (add_sources) recrawls from a clean slate — its new rows are visible,
    its old life stays hidden, and finalize jobs are emitted again
    despite the tombstoned crawl job sharing the same deterministic
    job_id (jobs_current orders by batch_id before revision)."""
    g = make_web_graph(n_hosts=2, pages_per_host=8, seed=5, max_pages=3)
    web = spark.createDataFrame(web_graph_rows(g), WEB_GRAPH)
    eng = CrawlEngine(spark, web, str(tmp_path / "readd"), policy="lexmin")
    eng.run(seeds=g.seeds)
    victim, victim_mp = g.seeds[0]

    baseline = sorted(
        (r.source_url, r.seq, r.url, r.ok)
        for r in eng.crawl_log().collect()
        if r.source_url == victim
    )
    base_jobs = {
        (r.job_id, r.kind) for r in eng.jobs().collect() if r.source_url == victim
    }
    assert baseline and base_jobs

    delete_source(eng, victim)
    assert victim not in {r.source_url for r in eng.crawl_log().collect()}

    # re-add: MERGE semantics (existing survivor is skipped), then recrawl
    assert eng.add_sources(g.seeds) == 1
    eng.run()

    # the recrawl reproduces the first life exactly (same graph, same
    # policy) and every table shows ONLY the new life's rows — no
    # duplicates from the hidden old life, no rows lost to the mark
    relog = sorted(
        (r.source_url, r.seq, r.url, r.ok)
        for r in eng.crawl_log().collect()
        if r.source_url == victim
    )
    assert relog == baseline
    seen_urls = [r.url for r in eng.url_seen().collect() if r.source_url == victim]
    assert len(seen_urls) == len(set(seen_urls))
    re_jobs = {
        (r.job_id, r.kind) for r in eng.jobs().collect() if r.source_url == victim
    }
    assert re_jobs == base_jobs  # crawl+summarize finalize jobs included
    # the other source kept exactly one life throughout
    survivor = g.seeds[1][0]
    sv = [r for r in eng.jobs().collect() if r.source_url == survivor and r.kind == "crawl"]
    assert len(sv) == 1
