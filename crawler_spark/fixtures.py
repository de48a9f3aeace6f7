"""Deterministic synthetic web-graph fixtures (FIXTURES.md §1-§3).

Generates the ``web_graph`` rows the fetch stage reads (the sandbox has no
network; the oracle's ``fetch()`` and the engine's fetch-join both consume
this table), plus seed lists and robots rules. Seeded (default 42) and pure —
same seed => byte-identical payloads everywhere.

Payloads exercise every branch of the reference link pipeline
(manual_link_extractor.py:60-104): relative hrefs, fragment-only hrefs,
excluded patterns, duplicate hrefs, file-extension hrefs, http:// (invalid
for normalization), external links, dead links (4xx/5xx), cycles, and
pdf/html mix.
"""

from __future__ import annotations

import random
from dataclasses import dataclass

from .functions.linkextract import PDF_PAGE_SEP
from .oracle import FetchResult

__all__ = ["WebGraph", "make_web_graph", "zipf_hosts", "web_graph_rows"]

_WORDS = (
    "data web crawl spark frontier queue host link page index archive report "
    "dataset analysis summary figure quote fact study survey model result "
    "method test bench scale shuffle partition batch snapshot state"
).split()


@dataclass
class WebGraph:
    web: dict[str, FetchResult]  # url -> fetch result
    seeds: list[tuple[str, int]]  # (seed_url, max_pages)
    hosts: list[str]
    robots: dict[str, tuple[list[str], int]]  # host -> (disallow_prefixes, crawl_delay_ms)


def zipf_hosts(n_hosts: int, rng: random.Random, s: float = 1.1) -> list[float]:
    """Unnormalized Zipf(s) weights for host sizes."""
    return [1.0 / (i + 1) ** s for i in range(n_hosts)]


def _sentence(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(n))


def _page_urls(host: str, n_pages: int, rng: random.Random) -> list[str]:
    urls = [f"https://{host}"]
    for i in range(1, n_pages):
        section = rng.choice(["docs", "blog", "papers", "data", "about"])
        ext = ".pdf" if rng.random() < 0.12 else ""
        urls.append(f"https://{host}/{section}/page-{i}{ext}")
    return urls


def _html_payload(
    url: str,
    host: str,
    internal_targets: list[str],
    external_targets: list[str],
    rng: random.Random,
) -> bytes:
    parts = [f"<html><head><title>{url}</title></head><body>"]
    parts.append(f"<h1>{_sentence(rng, 4)}</h1>")
    parts.append(f"<p>{_sentence(rng, 18)}</p>")
    # noise links exercising skip paths
    parts.append('<a href="#">top</a>')
    parts.append('<a href="#section-2">jump</a>')
    parts.append(f'<a href="https://{host}/login">login</a>')
    parts.append('<a href="mailto:team@example.com">mail</a>')
    parts.append('<a href="https://twitter.com/acct">tw</a>')
    for tgt in internal_targets:
        style = rng.random()
        if style < 0.3 and tgt.startswith(f"https://{host}/"):
            href = tgt[len(f"https://{host}"):]  # relative
        elif style < 0.4:
            href = tgt + "#frag"  # fragment variant
        else:
            href = tgt
        parts.append(f'<a href="{href}">{_sentence(rng, 2)}</a>')
        if rng.random() < 0.25:
            parts.append(f'<a href="{href}">dup</a>')  # duplicate href
        parts.append(f"<p>{_sentence(rng, 10)}</p>")
    if rng.random() < 0.5:
        parts.append(f'<a href="https://{host}/files/report-{rng.randrange(9)}.pdf">report</a>')
    if rng.random() < 0.3:
        parts.append(f'<a href="https://{host}/files/data-{rng.randrange(9)}.csv">data</a>')
    for ext_t in external_targets:
        parts.append(f'<a href="{ext_t}">ext</a>')
    parts.append('<a href="http://insecure.example.com/x">plain-http (invalid)</a>')
    parts.append(f"<p>{_sentence(rng, 12)}</p></body></html>")
    return "\n".join(parts).encode()


def _pdf_payload(rng: random.Random) -> bytes:
    n_pages = rng.randrange(1, 4)
    pages = [_sentence(rng, 30) for _ in range(n_pages)]
    return PDF_PAGE_SEP.join(pages).encode()


def make_web_graph(
    n_hosts: int = 3,
    pages_per_host: int = 20,
    seed: int = 42,
    max_pages: int = 5,
    dead_rate: float = 0.08,
) -> WebGraph:
    rng = random.Random(seed)
    hosts = [f"h{i:03d}.example.org" for i in range(n_hosts)]
    weights = zipf_hosts(n_hosts, rng)
    wmax = weights[0]
    web: dict[str, FetchResult] = {}
    seeds: list[tuple[str, int]] = []
    robots: dict[str, tuple[list[str], int]] = {}

    for hi, host in enumerate(hosts):
        n_pages = max(4, int(round(pages_per_host * weights[hi] / wmax)))
        urls = _page_urls(host, n_pages, rng)
        other_hosts = [h for h in hosts if h != host]
        for url in urls:
            status = 200 if rng.random() > dead_rate or url == urls[0] else rng.choice([404, 500, 403])
            if url.endswith(".pdf"):
                web[url] = FetchResult("pdf", _pdf_payload(rng), status)
            else:
                k = min(len(urls) - 1, rng.randrange(2, 6))
                internal = rng.sample([u for u in urls if u != url], k) if k > 0 else []
                ext: list[str] = []
                if other_hosts and rng.random() < 0.5:
                    ext.append(f"https://{rng.choice(other_hosts)}")
                if rng.random() < 0.3:
                    ext.append(f"https://external-{rng.randrange(5)}.example.net/ref")
                web[url] = FetchResult("html", _html_payload(url, host, internal, ext, rng), status)
        seeds.append((urls[0], max_pages))
        robots[host] = (
            ["/private", "/login"] + (["/blog"] if rng.random() < 0.3 else []),
            rng.choice([0, 50, 100]),
        )
    return WebGraph(web=web, seeds=seeds, hosts=hosts, robots=robots)


def web_graph_rows(g: WebGraph) -> list[dict]:
    """Rows for a Spark/Arrow `web_graph` DataFrame (FIXTURES.md §1)."""
    from .functions.urlnorm import host_of

    return [
        {"url": url, "host": host_of(url), "kind": fr.kind, "payload": fr.payload, "status": fr.status}
        for url, fr in sorted(g.web.items())
    ]
