"""Query-surface view parity (SURVEY.md M6, J5-J8 / A4 / A6) against the
oracle on a shared small crawl."""

import pytest

from crawler_spark.fixtures import make_web_graph, web_graph_rows
from crawler_spark.operators.frontier import CrawlEngine
from crawler_spark.oracle import crawl_many, make_policy
from crawler_spark.schemas import WEB_GRAPH
from crawler_spark.views import (
    crawled_sources,
    discovered_sources,
    failed_job_sources,
    in_progress_sources,
    source_listing,
    source_page_summaries,
)


@pytest.fixture(scope="module")
def crawl(spark, tmp_path_factory):
    g = make_web_graph(n_hosts=4, pages_per_host=10, seed=21, max_pages=4)
    oracle_out = crawl_many(g.seeds, g.web, make_policy("lexmin"))
    web_df = spark.createDataFrame(web_graph_rows(g), WEB_GRAPH)
    eng = CrawlEngine(spark, web_df, str(tmp_path_factory.mktemp("views")), policy="lexmin")
    eng.run(seeds=g.seeds)
    return g, oracle_out, eng


def test_failed_job_sources(crawl):
    g, oracle_out, eng = crawl
    expected = {sc.source_url for sc in oracle_out if any(not r.ok for r in sc.records)}
    got = {r.source_url for r in failed_job_sources(eng.source_state(), eng.crawl_log()).collect()}
    assert got == expected


def test_crawled_and_in_progress_partition_sources(crawl):
    g, oracle_out, eng = crawl
    st = eng.source_state()
    done = {r.source_url for r in crawled_sources(st, eng.crawl_log()).collect()}
    pending = {r.source_url for r in in_progress_sources(st).collect()}
    exhausted = {sc.source_url for sc in oracle_out if sc.pages_crawled >= sc.max_pages}
    assert exhausted <= done
    assert pending == {sc.source_url for sc in oracle_out if sc.pages_crawled < sc.max_pages}


def test_discovered_sources_anti_join(crawl, spark):
    g, oracle_out, eng = crawl
    # add an extra never-crawled source row to the state table
    extra = spark.createDataFrame(
        [("https://never.example.org", "never.example.org", 3, 0, 1, 1)],
        eng.source_state().schema,
    )
    st = eng.source_state().unionByName(extra)
    got = {r.source_url for r in discovered_sources(st, eng.crawl_log()).collect()}
    assert got == {"https://never.example.org"}


def test_source_page_summaries_first_per_page(crawl):
    g, oracle_out, eng = crawl
    rows = {
        r.source_url: r
        for r in source_page_summaries(eng.docs(), strip_markdown=False).collect()
    }
    for sc in oracle_out:
        ok_pages = [rec for rec in sc.records if rec.ok]
        if not ok_pages:
            assert sc.source_url not in rows
            continue
        # first text span per page, in crawl order
        expected = "\n\n".join(
            next((s.text for s in rec.spans if s.kind == "text"), None) or ""
            for rec in ok_pages
        )
        assert rows[sc.source_url].page_summaries == expected
        assert rows[sc.source_url].n_pages == len(ok_pages)


def test_discover_new_sources_merge_shape(crawl):
    """J9: every keep-first external link becomes a new source unless
    already known; counters zeroed; no duplicates."""
    from crawler_spark.views import discover_new_sources

    g, oracle_out, eng = crawl
    new = discover_new_sources(eng.source_state(), eng.crawl_log(), eng.page_links()).collect()
    known = {sc.source_url for sc in oracle_out}
    expected = set()
    for sc in oracle_out:
        expected.update(u for u in sc.unique_external_links if u not in known)
    got = [r.source_url for r in new]
    assert sorted(got) == sorted(expected)
    assert len(got) == len(set(got))
    for r in new:
        assert r.pages_crawled == 0 and r.max_pages == 0


def test_source_listing_first_doc(crawl):
    g, oracle_out, eng = crawl
    rows = {r.source_url: r for r in source_listing(eng.source_state(), eng.docs()).collect()}
    for sc in oracle_out:
        row = rows[sc.source_url]
        assert row.pages_crawled == sc.pages_crawled
        assert row.total_pages_found == sc.total_pages_found
        first_ok = next((r for r in sc.records if r.ok), None)
        if first_ok is not None:
            first_text = next((s.text for s in first_ok.spans if s.kind == "text"), None)
            assert row.first_summary == first_text


def test_get_source_and_get_page_lookups(crawl):
    from crawler_spark.views import get_page, get_source

    g, oracle_out, eng = crawl
    sc = oracle_out[0]
    row = get_source(eng.source_state(), eng.url_seen(), sc.source_url).collect()
    assert len(row) == 1
    # page URLs in first-touch order = oracle pop order, deduped
    seen_order = list(dict.fromkeys(sc.crawl_order))
    assert list(row[0].page_urls) == seen_order
    assert get_source(eng.source_state(), eng.url_seen(), "https://absent.org").count() == 0

    first_ok = next(r for r in sc.records if r.ok)
    page = get_page(eng.docs(), first_ok.url).collect()
    assert len(page) == 1 and page[0].source_url == sc.source_url
    assert [s.kind for s in page[0].spans] == [s.kind for s in first_ok.spans]


def test_crawl_saturation_matches_python_replay(spark):
    """The per-depth novelty curve over the shared state fixture equals
    a pure-Python replay of first-occurrence-by-min-seq over the oracle
    crawl's text spans, and cum_unique_spans is the running sum."""
    from crawler_spark.queries_state import _oracle_run, q_crawl_saturation

    _, crawls = _oracle_run()
    per_seq, first = {}, {}
    for sc in crawls:
        for rec in sc.records:
            if not rec.ok:
                continue
            for s in rec.spans:
                if s.kind != "text":
                    continue
                per_seq[rec.seq] = per_seq.get(rec.seq, 0) + 1
                if s.text not in first or rec.seq < first[s.text]:
                    first[s.text] = rec.seq
    news = {}
    for seq in first.values():
        news[seq] = news.get(seq, 0) + 1
    want, cum = {}, 0
    for seq in sorted(set(per_seq) | set(news)):
        n, nw = per_seq.get(seq, 0), news.get(seq, 0)
        cum += nw
        want[seq] = (n, nw, cum, (1_000_000 * nw) // max(n, 1))
    got = {
        r["seq"]: (r["n_spans"], r["new_spans"], r["cum_unique_spans"], r["novelty_ppm"])
        for r in q_crawl_saturation(spark, "").collect()
    }
    assert got == want
    assert sum(v[1] for v in want.values()) == len(first)
