"""Sitemap source (sitemaps.org XML protocol): seed/frontier discovery —
the way a production crawler learns a host's URL inventory without
walking links. The reference takes seeds only as user input; this module
is engine-new surface built from the public protocol.

Two document shapes: ``<urlset>`` (leaf: url entries with loc / lastmod /
priority) and ``<sitemapindex>`` (index: loc pointers to child sitemaps).
Generation escapes the five XML entities in ``<loc>`` (URLs legitimately
contain ``&``); parsing unescapes them — a parser that skips unescaping
corrupts every query-string URL, so the roundtrip oracle hash-checks it.

Parsing is regex-based over the two fixed element shapes (no XML lib in
the sandbox; the protocol's schema is flat and the generator is ours —
a production deployment swaps in lxml behind the same two functions).

Scale shape: one sitemap file is one parse unit (the protocol caps a
file at 50k URLs), so a host-partitioned frame of sitemap payloads maps
to URL rows with a narrow Arrow stage, exactly like the WARC source.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "sitemap_xml",
    "sitemap_index_xml",
    "parse_sitemap",
    "docs_to_sitemaps",
    "sitemaps_to_urls",
]

_ESCAPES = [("&", "&amp;"), ("<", "&lt;"), (">", "&gt;"), ("'", "&apos;"), ('"', "&quot;")]


def _escape(s: str) -> str:
    for raw, ent in _ESCAPES:
        s = s.replace(raw, ent)
    return s


def _unescape(s: str) -> str:
    for raw, ent in reversed(_ESCAPES):  # &amp; LAST, or "&amp;lt;" double-decodes
        s = s.replace(ent, raw)
    return s


def sitemap_xml(entries: list[tuple[str, str, int]]) -> str:
    """<urlset> document. entries: (loc, lastmod, priority_milli) —
    priority is carried in milli-units (protocol range 0.0-1.0 maps to
    0-1000) so generation/parsing never round-trips through floats."""
    parts = ['<?xml version="1.0" encoding="UTF-8"?>']
    parts.append('<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">')
    for loc, lastmod, prio_milli in entries:
        parts.append(
            "<url>"
            f"<loc>{_escape(loc)}</loc>"
            f"<lastmod>{_escape(lastmod)}</lastmod>"
            f"<priority>{prio_milli / 1000:.3f}</priority>"
            "</url>"
        )
    parts.append("</urlset>")
    return "\n".join(parts)


def sitemap_index_xml(locs: list[str]) -> str:
    """<sitemapindex> document pointing at child sitemap files."""
    parts = ['<?xml version="1.0" encoding="UTF-8"?>']
    parts.append('<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">')
    for loc in locs:
        parts.append(f"<sitemap><loc>{_escape(loc)}</loc></sitemap>")
    parts.append("</sitemapindex>")
    return "\n".join(parts)


# two-level parse: isolate each <url> BLOCK first, then pull elements out
# of the block. A single flat regex with optional groups backtracks ACROSS
# entries when a block carries any other standard element (changefreq,
# xhtml:link, ...), merging two entries into one corrupt loc — reproduced
# with a plain <changefreq> before the fix.
_URL_BLOCK_RE = re.compile(r"<url>(.*?)</url>", re.S)
_LOC_RE = re.compile(r"<loc>(.*?)</loc>", re.S)
_LASTMOD_RE = re.compile(r"<lastmod>(.*?)</lastmod>", re.S)
_PRIORITY_RE = re.compile(r"<priority>(.*?)</priority>", re.S)
_INDEX_RE = re.compile(r"<sitemap>\s*<loc>(.*?)</loc>\s*</sitemap>", re.S)


def parse_sitemap(xml: str) -> dict:
    """Parse either document shape. Returns
    ``{"kind": "urlset", "urls": [(loc, lastmod, priority_milli), ...]}``
    or ``{"kind": "index", "sitemaps": [loc, ...]}``. priority parses to
    milli-units (int(round(f*1000))); missing lastmod/priority default to
    "" / 500 per the protocol's 0.5 default, and an unparseable priority
    (comma decimals and other junk occur in wild sitemaps) degrades to
    the same 500 default instead of killing the executor task. Unknown
    elements inside a <url> block (changefreq etc.) are ignored; a block
    without <loc> is skipped."""
    if "<sitemapindex" in xml:
        return {"kind": "index", "sitemaps": [_unescape(m) for m in _INDEX_RE.findall(xml)]}
    urls = []
    for block in _URL_BLOCK_RE.findall(xml):
        loc_m = _LOC_RE.search(block)
        if not loc_m:
            continue
        lastmod_m = _LASTMOD_RE.search(block)
        prio_m = _PRIORITY_RE.search(block)
        milli = 500
        if prio_m:
            try:
                milli = int(round(float(prio_m.group(1)) * 1000))
            except ValueError:
                milli = 500
        urls.append(
            (_unescape(loc_m.group(1)), _unescape(lastmod_m.group(1)) if lastmod_m else "", milli)
        )
    return {"kind": "urlset", "urls": urls}


_SITEMAP_SCHEMA = "host string, n_urls int, xml string"
_URLROW_SCHEMA = "host string, loc string, lastmod string, priority_milli int"


def docs_to_sitemaps(docs: DataFrame, n_hosts: int = 50) -> DataFrame:
    """Sitemap sink stage: assign each doc a deterministic host
    (doc_id % n_hosts) and emit one <urlset> per host, entries in doc_id
    order. loc carries a query string with '&' so the escape path is
    always exercised; lastmod/priority derive from doc_id (no clock)."""

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        host = str(pdf["host"].iloc[0])
        entries = [
            (
                f"https://{host}/doc?id={int(d)}&ref=sitemap",
                f"2026-01-{int(d) % 28 + 1:02d}",
                (int(d) * 7) % 1001,
            )
            for d in pdf["doc_id"]
        ]
        return pd.DataFrame(
            {
                "host": [host],
                "n_urls": pd.Series([len(entries)], dtype="int32"),
                "xml": [sitemap_xml(entries)],
            }
        )

    with_host = docs.select(
        "doc_id",
        F.concat(F.lit("h"), (F.col("doc_id") % n_hosts).cast("string"), F.lit(".example.org")).alias(
            "host"
        ),
    )
    return with_host.groupBy("host").applyInPandas(_build, _SITEMAP_SCHEMA)


def sitemaps_to_urls(sitemaps: DataFrame) -> DataFrame:
    """Sitemap source stage: <urlset> payloads -> flat URL rows (narrow,
    no shuffle). <sitemapindex> payloads contribute no direct URL rows —
    their child pointers need a fetch round first — so they are skipped
    here instead of crashing the task (the caller resolves indexes by
    fetching the child sitemaps and feeding them back through)."""

    def _parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"host": [], "loc": [], "lastmod": [], "priority_milli": []}
            for host, xml in zip(pdf["host"], pdf["xml"]):
                doc = parse_sitemap(xml)
                if doc["kind"] != "urlset":
                    continue
                for loc, lastmod, milli in doc["urls"]:
                    out["host"].append(host)
                    out["loc"].append(loc)
                    out["lastmod"].append(lastmod)
                    out["priority_milli"].append(milli)
            yield pd.DataFrame(
                {
                    "host": pd.Series(out["host"], dtype="object"),
                    "loc": pd.Series(out["loc"], dtype="object"),
                    "lastmod": pd.Series(out["lastmod"], dtype="object"),
                    "priority_milli": pd.Series(out["priority_milli"], dtype="int32"),
                }
            )

    return sitemaps.mapInPandas(_parse, _URLROW_SCHEMA)
