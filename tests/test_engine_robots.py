"""Robots rules inside the parity engine (M2): disallowed URLs never
enter the frontier — at seed time or at enqueue time. The oracle has no
robots (the reference has none, SURVEY.md §0), so the expectation is
derived by re-running the oracle and post-filtering its enqueue choices
through the same rule set."""

from crawler_spark.fixtures import make_web_graph, web_graph_rows
from crawler_spark.operators.frontier import CrawlEngine
from crawler_spark.operators.politeness import RobotsTrie
from crawler_spark.schemas import ROBOTS, WEB_GRAPH


def test_disallowed_urls_never_fetched(spark, tmp_path):
    g = make_web_graph(n_hosts=2, pages_per_host=12, seed=11, max_pages=5)
    # disallow the sections the lexmin policy would otherwise walk into
    rules = [(h, ["/docs", "/blog"], 0) for h in g.hosts]
    robots_df = spark.createDataFrame(rules, ROBOTS)
    web_df = spark.createDataFrame(web_graph_rows(g), WEB_GRAPH)
    eng = CrawlEngine(
        spark, web_df, str(tmp_path / "rb"), policy="lexmin", robots=robots_df
    )
    eng.run(seeds=g.seeds)

    tries = {h: RobotsTrie(["/docs", "/blog"]) for h in g.hosts}
    fetched = [r.url for r in eng.crawl_log().collect()]
    assert fetched, "engine crawled nothing"
    for url in fetched:
        from urllib.parse import urlparse

        p = urlparse(url)
        trie = tries.get(p.netloc)
        assert trie is None or not trie.disallowed(p.path or "/"), (
            f"robots-disallowed URL was fetched: {url}"
        )


def test_policy_falls_back_to_next_allowed_candidate(spark, tmp_path):
    """Robots filtering applies to the candidate list BEFORE the policy,
    so when the policy's preferred link is disallowed it picks the
    next-best allowed candidate instead of silently ending the source.
    Expectation = the oracle run with a robots-aware lexmin policy."""
    from urllib.parse import urlparse

    from crawler_spark.oracle import crawl_many

    g = make_web_graph(n_hosts=2, pages_per_host=12, seed=11, max_pages=5)
    prefixes = ["/docs", "/blog"]
    robots_df = spark.createDataFrame([(h, prefixes, 0) for h in g.hosts], ROBOTS)
    tries = {h: RobotsTrie(prefixes) for h in g.hosts}

    def allowed(u: str) -> bool:
        p = urlparse(u)
        t = tries.get(p.netloc)
        return t is None or not t.disallowed(p.path or "/")

    def robots_lexmin(cur: str, cands: list[str]) -> str | None:
        ok = [c for c in cands if allowed(c)]
        return min(ok) if ok else None

    expect = crawl_many(g.seeds, g.web, robots_lexmin)

    web_df = spark.createDataFrame(web_graph_rows(g), WEB_GRAPH)
    eng = CrawlEngine(spark, web_df, str(tmp_path / "rf"), policy="lexmin", robots=robots_df)
    eng.run(seeds=g.seeds)

    engine_log = sorted((r.source_url, r.seq, r.url) for r in eng.crawl_log().collect())
    oracle_log = sorted(
        (sc.source_url, rec.seq, rec.url) for sc in expect for rec in sc.records
    )
    assert engine_log == oracle_log
    # the fallback actually mattered: some crawled page had its lexmin
    # pick filtered (i.e. a crawl longer than drop-at-enqueue would allow)
    assert any(len(sc.records) > 1 for sc in expect)


def test_disallowed_seed_is_dropped(spark, tmp_path):
    g = make_web_graph(n_hosts=2, pages_per_host=8, seed=12, max_pages=3)
    blocked_host = g.hosts[0]
    robots_df = spark.createDataFrame([(blocked_host, ["/"], 0)], ROBOTS)
    web_df = spark.createDataFrame(web_graph_rows(g), WEB_GRAPH)
    eng = CrawlEngine(
        spark, web_df, str(tmp_path / "rs"), policy="lexmin", robots=robots_df
    )
    eng.run(seeds=g.seeds)
    hosts_fetched = {r.host for r in eng.crawl_log().collect()}
    assert blocked_host not in hosts_fetched
    assert hosts_fetched  # the unblocked source still crawled


# --- raw robots.txt parsing -> rules rows -> tries (loop closed) ---


def test_parse_robots_txt_groups_and_specificity():
    from crawler_spark.operators.politeness import parse_robots_txt

    body = """
# comment-only line
User-agent: *
Disallow: /private
Disallow:           # empty value = allow-all marker, dropped
Crawl-delay: 2

User-agent: crawlzilla
User-agent: otherbot
Disallow: /tmp
Crawl-delay: 0.5

User-agent: crawl
Disallow: /only-substring
"""
    # generic agent -> the * group
    assert parse_robots_txt(body, "someone") == (["/private"], [], 2000)
    # exact match beats substring and *
    assert parse_robots_txt(body, "crawlzilla") == (["/tmp"], [], 500)
    # substring match ('crawl' in 'crawler9000') beats *
    assert parse_robots_txt(body, "crawler9000") == (["/only-substring"], [], 0)
    # second agent of a shared block gets the same rules
    assert parse_robots_txt(body, "otherbot") == (["/tmp"], [], 500)


def test_parse_robots_txt_empty_group_is_allow_all():
    from crawler_spark.operators.politeness import parse_robots_txt

    body = """
User-agent: luckybot

User-agent: *
Disallow: /
"""
    # most specific match has no rules -> allow-all, NOT the * fallback
    assert parse_robots_txt(body, "luckybot") == ([], [], 0)
    assert parse_robots_txt(body, "anyone") == (["/"], [], 0)
    # no groups at all / rules before any User-agent
    assert parse_robots_txt("", "x") == ([], [], 0)
    assert parse_robots_txt("Disallow: /loose\n", "x") == ([], [], 0)


def test_robots_rules_from_bodies_feeds_filter(spark):
    from crawler_spark.operators.politeness import (
        broadcast_robots,
        robots_filter,
        robots_rules_from_bodies,
    )

    bodies = spark.createDataFrame(
        [
            ("a.org", "User-agent: *\nDisallow: /admin\nCrawl-delay: 1\n"),
            ("b.org", None),  # fetch failed -> no rules
        ],
        "host string, robots_txt string",
    )
    rules = robots_rules_from_bodies(bodies)
    got = {
        r.host: (list(r.disallow_prefixes), list(r.allow_prefixes), r.crawl_delay_ms)
        for r in rules.collect()
    }
    assert got == {"a.org": (["/admin"], [], 1000), "b.org": ([], [], 0)}

    bcast = broadcast_robots(spark, rules)
    urls = spark.createDataFrame(
        [
            ("https://a.org/admin/panel",),
            ("https://a.org/public",),
            ("https://b.org/anything",),
        ],
        "url string",
    )
    kept = sorted(r.url for r in robots_filter(urls, bcast).collect())
    assert kept == ["https://a.org/public", "https://b.org/anything"]


def test_robots_filter_port_userinfo_and_params(spark):
    """Lookup key = urlsplit().netloc (keeps port + userinfo), the same
    key host_of() builds robots tables with; path keeps ';params'.
    Regression: keying on parse_url HOST silently fail-opened for URLs
    with an explicit port or userinfo."""
    from crawler_spark.operators.politeness import broadcast_robots, robots_filter

    rules = spark.createDataFrame(
        [
            ("a.org:8080", ["/admin"], [], 0),
            ("user@b.org", ["/priv"], [], 0),
            ("c.org", ["/item;v=2"], [], 0),
        ],
        "host string, disallow_prefixes array<string>, "
        "allow_prefixes array<string>, crawl_delay_ms int",
    )
    bcast = broadcast_robots(spark, rules)
    urls = spark.createDataFrame(
        [
            ("https://a.org:8080/admin/x",),   # port host: blocked
            ("https://a.org/admin/x",),        # portless host: no rules
            ("https://user@b.org/priv/y",),    # userinfo host: blocked
            ("https://b.org/priv/y",),         # bare host: no rules
            ("https://c.org/item;v=2/z",),     # ;params kept in path: blocked
            ("https://c.org/item",),           # without params: allowed
        ],
        "url string",
    )
    kept = sorted(r.url for r in robots_filter(urls, bcast).collect())
    assert kept == [
        "https://a.org/admin/x",
        "https://b.org/priv/y",
        "https://c.org/item",
    ]


def test_robots_wildcard_and_anchor_rules():
    from crawler_spark.operators.politeness import RobotsTrie

    t = RobotsTrie(["/private", "/*.php$", "/tmp*cache", "/exact$"])
    # plain prefix still works
    assert t.disallowed("/private/x") and not t.disallowed("/pub")
    # '*.php$' blocks any path ending in .php, nothing else
    assert t.disallowed("/a/b.php") and t.disallowed("/index.php")
    assert not t.disallowed("/a/b.php5") and not t.disallowed("/a/php")
    # mid-pattern wildcard
    assert t.disallowed("/tmp/deep/cache") and t.disallowed("/tmpcache")
    assert not t.disallowed("/tmp/deep/cach")
    # '$' anchors an exact path
    assert t.disallowed("/exact") and not t.disallowed("/exact/sub")
    # regex metacharacters in rules are literal (escaped)
    t2 = RobotsTrie(["/a.b*([x$"])
    assert t2.disallowed("/a.bZZZ([x") and not t2.disallowed("/aXbZZZ([x")


def test_robots_allow_longest_match_precedence():
    from crawler_spark.operators.politeness import RobotsTrie

    t = RobotsTrie(["/private"], allow=["/private/public"])
    assert t.disallowed("/private/x")
    assert not t.disallowed("/private/public/x")  # longer Allow wins
    assert not t.disallowed("/open")
    # equal length -> Allow wins the tie (RFC 9309 §2.2.2)
    t2 = RobotsTrie(["/a"], allow=["/a"])
    assert not t2.disallowed("/a/x")
    # longer Disallow beats shorter Allow
    t3 = RobotsTrie(["/a/secret"], allow=["/a"])
    assert t3.disallowed("/a/secret/x") and not t3.disallowed("/a/open")
    # wildcard interplay: pattern LENGTH decides, not match length
    t4 = RobotsTrie(["/*.php$"], allow=["/api/*.php$"])
    assert t4.disallowed("/x.php") and not t4.disallowed("/api/v1.php")


def test_robots_allow_parsed_from_body_end_to_end(spark):
    from crawler_spark.operators.politeness import (
        broadcast_robots,
        robots_filter,
        robots_rules_from_bodies,
    )

    bodies = spark.createDataFrame(
        [("a.org", "User-agent: *\nDisallow: /docs\nAllow: /docs/public\n")],
        "host string, robots_txt string",
    )
    bcast = broadcast_robots(spark, robots_rules_from_bodies(bodies))
    urls = spark.createDataFrame(
        [("https://a.org/docs/internal",), ("https://a.org/docs/public/x",),
         ("https://a.org/home",)],
        "url string",
    )
    kept = sorted(r.url for r in robots_filter(urls, bcast).collect())
    assert kept == ["https://a.org/docs/public/x", "https://a.org/home"]


def test_parse_robots_sitemaps_record_independent_and_keepfirst():
    """Sitemap directives are record-independent (extracted wherever
    they appear, before/inside/after user-agent groups), keep-first
    deduped, and relative URLs are refused."""
    from crawler_spark.operators.politeness import (
        parse_robots_sitemaps,
        parse_robots_txt,
    )

    body = "\n".join(
        [
            "Sitemap: https://a.org/before.xml",
            "User-agent: *",
            "Disallow: /x",
            "Sitemap: https://a.org/mid.xml  # comment",
            "",
            "User-agent: specialbot",
            "Disallow: /",
            "Sitemap: https://a.org/after.xml",
            "Sitemap: https://a.org/before.xml",  # dup -> keep first
            "Sitemap: /relative.xml",  # refused
            "sitemap: HTTPS://a.org/CASE.xml",  # key case-insensitive
        ]
    )
    assert parse_robots_sitemaps(body) == [
        "https://a.org/before.xml",
        "https://a.org/mid.xml",
        "https://a.org/after.xml",
    ]
    # ...and the rule parser is unperturbed by the directives
    dis, allow, delay = parse_robots_txt(body)
    assert dis == ["/x"] and allow == [] and delay == 0


def test_robots_sitemaps_distributed_matches_pure(spark):
    from crawler_spark.operators.politeness import (
        parse_robots_sitemaps,
        robots_sitemaps_from_bodies,
    )

    cases = [
        ("h0", "Sitemap: https://h0/s1.xml\nSitemap: https://h0/s2.xml"),
        ("h1", "User-agent: *\nDisallow: /"),
        ("h2", None),
    ]
    bodies = spark.createDataFrame(cases, "host string, robots_txt string")
    got = {
        (r.host, r.rank): r.sitemap_url
        for r in robots_sitemaps_from_bodies(bodies).collect()
    }
    expect = {}
    for host, body in cases:
        for i, sm in enumerate(parse_robots_sitemaps(body or "")):
            expect[(host, i)] = sm
    assert got == expect
    assert got == {("h0", 0): "https://h0/s1.xml", ("h0", 1): "https://h0/s2.xml"}
