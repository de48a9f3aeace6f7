"""Sitemap XML roundtrip tests (sources/sitemap.py, sitemaps.org shape):
entity escaping in <loc>, both document kinds, protocol defaults."""

from crawler_spark.sources.sitemap import (
    parse_sitemap,
    sitemap_index_xml,
    sitemap_xml,
)


def test_urlset_roundtrip_with_entities():
    entries = [
        ("https://h.org/a?x=1&y=2", "2026-01-05", 700),
        ("https://h.org/<odd>'\"path", "2026-02-01", 0),
        ("https://h.org/plain", "2026-03-01", 1000),
    ]
    doc = parse_sitemap(sitemap_xml(entries))
    assert doc["kind"] == "urlset"
    assert doc["urls"] == entries


def test_loc_with_preescaped_text_survives():
    """A URL whose RAW text contains '&amp;lt;' must come back exactly —
    the single-pass unescape order (&amp; last) must not double-decode."""
    loc = "https://h.org/q?frag=&amp;lt;"
    doc = parse_sitemap(sitemap_xml([(loc, "2026-01-01", 500)]))
    assert doc["urls"][0][0] == loc


def test_index_roundtrip():
    locs = ["https://h.org/sitemap-1.xml", "https://h.org/sitemap-2.xml?part=a&b=c"]
    doc = parse_sitemap(sitemap_index_xml(locs))
    assert doc == {"kind": "index", "sitemaps": locs}


def test_missing_optional_fields_default():
    xml = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<url><loc>https://h.org/x</loc></url></urlset>"
    )
    doc = parse_sitemap(xml)
    assert doc["urls"] == [("https://h.org/x", "", 500)]


def test_priority_milli_exact_across_range():
    entries = [(f"https://h.org/{m}", "2026-01-01", m) for m in range(0, 1001)]
    doc = parse_sitemap(sitemap_xml(entries))
    assert [u[2] for u in doc["urls"]] == list(range(0, 1001))


def test_urlset_fuzz_printable_locs():
    """Property: printable-text locs (anything a URL column could carry,
    including XML metacharacters) roundtrip exactly with their milli
    priorities."""
    from hypothesis import given, settings, strategies as st

    loc_text = st.text(
        alphabet=st.characters(codec="ascii", exclude_characters="\r\n"),
        min_size=0,
        max_size=80,
    )

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.tuples(loc_text, st.integers(0, 1000)), max_size=5))
    def run(items):
        entries = [(loc, "2026-01-01", m) for loc, m in items]
        doc = parse_sitemap(sitemap_xml(entries))
        assert doc["kind"] == "urlset"
        assert doc["urls"] == entries

    run()


def test_parse_survives_unknown_elements_and_junk_priority():
    """A flat regex with optional groups backtracked ACROSS entries when
    a block held a standard extra element (changefreq), merging two
    entries into one corrupt loc — the block-first parse must not."""
    from crawler_spark.sources.sitemap import parse_sitemap

    xml = (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
        "<url><loc>https://a.org/1</loc><changefreq>daily</changefreq></url>\n"
        "<url><loc>https://a.org/2</loc><lastmod>2026-01-02</lastmod>"
        "<priority>0,8</priority></url>\n"
        "<url><loc>https://a.org/3</loc><priority>0.250</priority></url>\n"
        "<url><changefreq>weekly</changefreq></url>\n"
        "</urlset>"
    )
    doc = parse_sitemap(xml)
    assert doc["kind"] == "urlset"
    assert doc["urls"] == [
        ("https://a.org/1", "", 500),
        ("https://a.org/2", "2026-01-02", 500),  # junk priority -> default
        ("https://a.org/3", "", 250),
    ]


def test_sitemaps_to_urls_skips_index_documents(spark):
    from crawler_spark.sources.sitemap import sitemap_index_xml, sitemap_xml, sitemaps_to_urls

    rows = [
        ("h1.example.org", 1, sitemap_xml([("https://h1.example.org/p?a=1&b=2", "2026-01-01", 700)])),
        ("h2.example.org", 0, sitemap_index_xml(["https://h2.example.org/sitemap-1.xml"])),
    ]
    df = spark.createDataFrame(rows, "host string, n_urls int, xml string")
    got = sitemaps_to_urls(df).collect()
    assert len(got) == 1
    assert got[0]["host"] == "h1.example.org"
    assert got[0]["loc"] == "https://h1.example.org/p?a=1&b=2"


def test_lastmod_is_escaped_in_generation():
    from crawler_spark.sources.sitemap import parse_sitemap, sitemap_xml

    xml = sitemap_xml([("https://a.org/x", "2026-01-01&rev=2", 500)])
    assert "&amp;rev=2" in xml  # well-formed for a real XML parser
    doc = parse_sitemap(xml)
    assert doc["urls"] == [("https://a.org/x", "2026-01-01&rev=2", 500)]
