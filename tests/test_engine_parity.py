"""End-to-end equality: Spark engine vs the pure-Python oracle transcription
of the reference loop (SURVEY.md §5.3 item 2).

Checked per the north rule:
- per-host (== per-source) crawl order, exact sequence;
- URL-seen membership, exact set;
- per-row span-sequence equality (kind, text, media_ref, order);
- CrawlJobResult counters (pages_crawled, total_pages_found).
"""

import pytest
from pyspark.sql import functions as F

from crawler_spark.fixtures import make_web_graph, web_graph_rows
from crawler_spark.operators.frontier import CrawlEngine
from crawler_spark.oracle import crawl_many, make_policy
from crawler_spark.schemas import WEB_GRAPH


def _run_both(spark, tmp_path, policy, n_hosts=3, pages_per_host=14, max_pages=5, seed=42):
    g = make_web_graph(n_hosts=n_hosts, pages_per_host=pages_per_host, seed=seed, max_pages=max_pages)
    oracle_out = crawl_many(g.seeds, g.web, make_policy(policy))

    web_df = spark.createDataFrame(web_graph_rows(g), WEB_GRAPH)
    eng = CrawlEngine(spark, web_df, str(tmp_path / f"state_{policy}_{seed}"), policy=policy)
    eng.run(seeds=g.seeds)
    return g, oracle_out, eng


POLICIES = ["lexmin", "fifo", "seeded:7", "none"]


@pytest.mark.parametrize("policy", POLICIES)
def test_engine_matches_oracle(spark, tmp_path, policy):
    g, oracle_out, eng = _run_both(spark, tmp_path, policy)

    log = eng.crawl_log().orderBy("source_url", "seq").collect()
    engine_order: dict[str, list[str]] = {}
    for r in log:
        engine_order.setdefault(r.source_url, []).append(r.url)
    for sc in oracle_out:
        assert engine_order.get(sc.source_url, []) == sc.crawl_order, (
            f"crawl order mismatch for {sc.source_url} under {policy}"
        )

    seen = eng.url_seen().collect()
    engine_seen: dict[str, set] = {}
    for r in seen:
        engine_seen.setdefault(r.source_url, set()).add(r.url)
    for sc in oracle_out:
        assert engine_seen.get(sc.source_url, set()) == sc.processed

    st = {r.source_url: r for r in eng.source_state().collect()}
    for sc in oracle_out:
        row = st[sc.source_url]
        assert row.pages_crawled == sc.pages_crawled
        assert row.total_pages_found == sc.total_pages_found
        assert row.max_pages == sc.max_pages

    docs = eng.docs().orderBy("source_url", "seq").collect()
    engine_spans: dict[tuple, list] = {}
    for r in docs:
        engine_spans[(r.source_url, r.seq)] = [
            (s.kind, s.text, s.media_ref, s.offset) for s in r.spans
        ]
    for sc in oracle_out:
        for rec in sc.records:
            key = (sc.source_url, rec.seq)
            if rec.ok:
                expected = [(s.kind, s.text, s.media_ref, s.offset) for s in rec.spans]
                assert engine_spans.get(key) == expected, f"span mismatch at {key}"
            else:
                assert key not in engine_spans


def test_engine_matches_oracle_many_hosts(spark, tmp_path):
    """Wider graph incl. dead links + pdf mix, seeded policy."""
    g, oracle_out, eng = _run_both(
        spark, tmp_path, "seeded:13", n_hosts=6, pages_per_host=10, max_pages=4, seed=99
    )
    log = eng.crawl_log().orderBy("source_url", "seq").collect()
    engine_order: dict[str, list[str]] = {}
    for r in log:
        engine_order.setdefault(r.source_url, []).append(r.url)
    for sc in oracle_out:
        assert engine_order.get(sc.source_url, []) == sc.crawl_order
    # ok/failure flags match too
    eng_ok = {(r.source_url, r.seq): r.ok for r in log}
    for sc in oracle_out:
        for rec in sc.records:
            assert eng_ok[(sc.source_url, rec.seq)] == rec.ok


def test_external_links_keepfirst_dedup(spark, tmp_path):
    """Summarize-stage global keep-first external-link dedup (A5,
    entities.py:248-261) via the views module."""
    from crawler_spark.views import external_links_keepfirst

    g, oracle_out, eng = _run_both(spark, tmp_path, "lexmin")
    dedup = (
        external_links_keepfirst(eng.crawl_log(), eng.page_links())
        .orderBy("source_url", "first_seq", "seq", "pos")
        .collect()
    )
    engine_ext: dict[str, list[str]] = {}
    for r in dedup:
        engine_ext.setdefault(r.source_url, []).append(r.link)
    for sc in oracle_out:
        assert engine_ext.get(sc.source_url, []) == sc.unique_external_links

def test_two_sources_same_host_parity(spark, tmp_path):
    """Two SOURCES sharing one host (VERDICT r3 task 5). The reference runs
    them as independent sequential tasks (backend/tasks/config.py:29 caps
    concurrency at 1), so each source's crawl order / seen set / counters /
    spans depend on that source alone. The engine keys all state on
    source_url, so parity must hold exactly even though the shared host sees
    both sources' fetches inside one micro-batch (the documented timing-only
    divergence — see operators/frontier.py module docstring; host-level
    politeness under sharing is pinned by
    test_scheduler.test_two_sources_one_host_single_politeness_stream)."""
    g = make_web_graph(n_hosts=3, pages_per_host=14, seed=42, max_pages=5)
    h0 = g.hosts[0]
    root = f"https://{h0}"
    # deterministic second seed: first live html page on host 0 that isn't
    # the root — both sources now crawl the SAME host.
    second = next(
        url
        for url in sorted(g.web)
        if url.startswith(f"https://{h0}/")
        and g.web[url].kind == "html"
        and g.web[url].status == 200
    )
    seeds = list(g.seeds) + [(second, 5)]
    assert root in dict(seeds) and second != root

    oracle_out = crawl_many(seeds, g.web, make_policy("lexmin"))
    web_df = spark.createDataFrame(web_graph_rows(g), WEB_GRAPH)
    eng = CrawlEngine(spark, web_df, str(tmp_path / "state_shared_host"), policy="lexmin")
    eng.run(seeds=seeds)

    log = eng.crawl_log().orderBy("source_url", "seq").collect()
    engine_order: dict[str, list[str]] = {}
    for r in log:
        engine_order.setdefault(r.source_url, []).append(r.url)
    by_src = {sc.source_url: sc for sc in oracle_out}
    assert set(engine_order) <= set(by_src)
    for sc in oracle_out:
        assert engine_order.get(sc.source_url, []) == sc.crawl_order, (
            f"crawl order mismatch for {sc.source_url} with shared host"
        )

    # the two same-host sources overlap in URLs: each fetches the overlap
    # independently, exactly as two independent reference tasks would.
    o_root, o_second = by_src[root], by_src[second]
    overlap = o_root.processed & o_second.processed
    assert overlap, "fixture regression: same-host sources should overlap"

    seen = eng.url_seen().collect()
    engine_seen: dict[str, set] = {}
    for r in seen:
        engine_seen.setdefault(r.source_url, set()).add(r.url)
    for sc in oracle_out:
        assert engine_seen.get(sc.source_url, set()) == sc.processed

    st = {r.source_url: r for r in eng.source_state().collect()}
    for sc in oracle_out:
        row = st[sc.source_url]
        assert row.pages_crawled == sc.pages_crawled
        assert row.total_pages_found == sc.total_pages_found

    docs = eng.docs().orderBy("source_url", "seq").collect()
    engine_spans: dict[tuple, list] = {}
    for r in docs:
        engine_spans[(r.source_url, r.seq)] = [
            (s.kind, s.text, s.media_ref, s.offset) for s in r.spans
        ]
    for sc in oracle_out:
        for rec in sc.records:
            key = (sc.source_url, rec.seq)
            if rec.ok:
                expected = [(s.kind, s.text, s.media_ref, s.offset) for s in rec.spans]
                assert engine_spans.get(key) == expected, f"span mismatch at {key}"
            else:
                assert key not in engine_spans
