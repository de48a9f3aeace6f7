"""Golden-file guard (SURVEY.md §5.4): the oracle's output at seed=42 must
stay byte-stable — protects the equality contract from silent drift in the
shared function core. Regenerate deliberately with tools/make_golden.py."""

import json
import os

from crawler_spark.fixtures import make_web_graph
from crawler_spark.oracle import crawl_many, make_policy

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
FIXTURE = dict(n_hosts=3, pages_per_host=14, seed=42, max_pages=5)


def _oracle():
    g = make_web_graph(**FIXTURE)
    return crawl_many(g.seeds, g.web, make_policy("lexmin"))


def _lines(name):
    with open(os.path.join(GOLDEN, name)) as f:
        return [json.loads(ln) for ln in f]


def test_crawl_order_matches_golden():
    out = _oracle()
    got = [
        {"source_url": sc.source_url, "host": r.host, "seq": r.seq, "url": r.url, "ok": r.ok}
        for sc in out
        for r in sc.records
    ]
    assert got == _lines("crawl_order.jsonl")


def test_url_seen_matches_golden():
    out = _oracle()
    got = [
        {"source_url": sc.source_url, "url": u}
        for sc in out
        for u in sorted(sc.processed)
    ]
    assert got == _lines("url_seen.jsonl")


def test_spans_match_golden():
    out = _oracle()
    got = [
        {
            "source_url": sc.source_url,
            "seq": r.seq,
            "doc_id": r.url,
            "spans": [
                {"kind": s.kind, "text": s.text, "media_ref": s.media_ref, "offset": s.offset}
                for s in r.spans
            ],
        }
        for sc in out
        for r in sc.records
        if r.ok
    ]
    assert got == _lines("spans.jsonl")


def test_counters_match_golden():
    out = _oracle()
    with open(os.path.join(GOLDEN, "crawl_counters.json")) as f:
        golden = json.load(f)
    got = {
        sc.source_url: {
            "pages_crawled": sc.pages_crawled,
            "total_pages_found": sc.total_pages_found,
            "max_pages_limit": sc.max_pages,
        }
        for sc in out
    }
    assert got == golden
