"""Pure-Python correctness oracle — a dependency-free transcription of the
reference crawler's sequential loop (the reference itself cannot run here:
it needs Crawlbase + Anthropic + RabbitMQ, /root/reference/backend/README.md:20-41,
and its next-link selection is an LLM call). Both this oracle and the Spark
engine are parameterized by the same deterministic NextLinkPolicy, so
equality is decidable.

Loop semantics transcribed from /root/reference/backend/domain/entities.py:135-237
(see SURVEY.md §3.1 for the exact contract):
- init: url_queue=[seed], candidates=[], processed=set(), pages_crawled=0,
  total_pages_found=1  (:151-155)
- while url_queue and pages_crawled < max_pages  (:157)
- pop(0); add to processed AT POP TIME, before fetching (:158-159); no
  re-check at pop — a URL enqueued twice is scraped twice (§7.5).
- scrape failure => JobError; nothing enqueued; pages_crawled still ++ (:202)
- success: merge internal links into candidates append-if-absent,
  total_pages_found += 1 per NEW link (:176-179)
- filter candidates: drop links whose fragment-stripped form matches any
  fragment-stripped processed page (:181-186)
- policy picks next link from (markdown, filtered candidates); enqueued only
  if non-null AND in filtered candidates (:196-201) — at most one per page.
- after the loop: CrawlJobResult counters (:204-208); external-link global
  keep-first dedup for the summarize stage (:248-261).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field
from typing import Callable, Mapping

from .functions.linkextract import (
    Span,
    build_spans_html,
    build_spans_pdf,
    extract_links,
    html_to_markdown,
    pdf_markdown,
)
from .functions.urlnorm import host_of, normalize_url, strip_fragment, url_type

__all__ = ["FetchResult", "CrawlRecord", "SourceCrawl", "crawl_source", "crawl_many", "POLICIES", "make_policy"]


@dataclass(frozen=True)
class FetchResult:
    """One fetchable page in the synthetic web (FIXTURES.md §1)."""

    kind: str  # 'html' | 'pdf'
    payload: bytes
    status: int = 200


# policy(current_url, filtered_candidates_in_candidate_order) -> url | None
NextLinkPolicy = Callable[[str, list[str]], str | None]


def _policy_lexmin(current_url: str, candidates: list[str]) -> str | None:
    return min(candidates) if candidates else None


def _policy_none(current_url: str, candidates: list[str]) -> str | None:
    return None


def _policy_fifo(current_url: str, candidates: list[str]) -> str | None:
    return candidates[0] if candidates else None


def make_seeded_policy(seed: int) -> NextLinkPolicy:
    """Deterministic pseudo-random choice, computable identically on the
    engine side: index = sha256(f"{seed}:{current_url}") mod len."""

    def policy(current_url: str, candidates: list[str]) -> str | None:
        if not candidates:
            return None
        h = hashlib.sha256(f"{seed}:{current_url}".encode()).hexdigest()
        return candidates[int(h, 16) % len(candidates)]

    return policy


POLICIES: dict[str, NextLinkPolicy] = {
    "lexmin": _policy_lexmin,
    "none": _policy_none,
    "fifo": _policy_fifo,
}


def make_policy(name: str) -> NextLinkPolicy:
    if name.startswith("seeded:"):
        return make_seeded_policy(int(name.split(":", 1)[1]))
    return POLICIES[name]


@dataclass
class CrawlRecord:
    """One pop of the frontier (= one reference loop iteration)."""

    seq: int  # 0-based within-source pop order
    url: str
    host: str
    ok: bool
    spans: list[Span] = field(default_factory=list)
    internal_links: list[str] = field(default_factory=list)
    external_links: list[str] = field(default_factory=list)
    file_links: list[str] = field(default_factory=list)
    markdown: str = ""
    next_link: str | None = None


@dataclass
class SourceCrawl:
    source_url: str
    records: list[CrawlRecord] = field(default_factory=list)
    processed: set[str] = field(default_factory=set)  # full URLs, pop-time
    pages_crawled: int = 0
    total_pages_found: int = 1
    max_pages: int = 0
    unique_external_links: list[str] = field(default_factory=list)  # keep-first

    @property
    def crawl_order(self) -> list[str]:
        return [r.url for r in self.records]


def crawl_source(
    seed_url: str,
    max_pages: int,
    web: Mapping[str, FetchResult],
    policy: NextLinkPolicy,
) -> SourceCrawl:
    seed = normalize_url(seed_url)
    if seed is None:
        raise ValueError(f"invalid seed url: {seed_url!r}")

    out = SourceCrawl(source_url=seed, max_pages=max_pages)
    url_queue: list[str] = [seed]
    candidate_internal_links: list[str] = []
    processed_pages: set[str] = set()
    pages_crawled = 0
    total_pages_found = 1

    while url_queue and pages_crawled < max_pages:
        current_url = url_queue.pop(0)
        processed_pages.add(current_url)
        rec = CrawlRecord(seq=pages_crawled, url=current_url, host=host_of(current_url), ok=False)

        fetched = web.get(current_url)
        if fetched is not None and fetched.status < 400:
            rec.ok = True
            if url_type(current_url) == "pdf" or fetched.kind == "pdf":
                text = fetched.payload.decode("utf-8", "ignore")
                rec.markdown = pdf_markdown(text)
                rec.spans = build_spans_pdf(text)
                # The reference re-fetches the URL as HTML for link extraction
                # (entities.py:67-68) — over a PDF body that yields no anchor
                # matches, so PDF pages contribute no links.
                links = extract_links("", current_url)
            else:
                html = fetched.payload.decode("utf-8", "ignore")
                rec.markdown = html_to_markdown(html)
                rec.spans, links = build_spans_html(html, current_url)
            rec.internal_links = links.internal
            rec.external_links = links.external
            rec.file_links = links.file

            for internal_link in links.internal:
                if internal_link not in candidate_internal_links:
                    candidate_internal_links.append(internal_link)
                    total_pages_found += 1

            processed_nofrag = {strip_fragment(p) for p in processed_pages}
            filtered = [
                link
                for link in candidate_internal_links
                if link not in processed_pages and strip_fragment(link) not in processed_nofrag
            ]

            next_link = policy(current_url, filtered)
            if next_link and next_link in filtered:
                url_queue.append(next_link)
                rec.next_link = next_link

        pages_crawled += 1
        out.records.append(rec)

    out.processed = processed_pages
    out.pages_crawled = pages_crawled
    out.total_pages_found = total_pages_found

    # summarize stage: global keep-first dedup of external links
    # (entities.py:248-261), page order = first-touch order.
    seen: set[str] = set()
    page_order: list[str] = []
    page_ext: dict[str, list[list[str]]] = {}
    for r in out.records:
        if r.url not in page_ext:
            page_ext[r.url] = []
            page_order.append(r.url)
        if r.ok:
            page_ext[r.url].append(r.external_links)
    for url in page_order:
        for ext_list in page_ext[url]:
            for link in ext_list:
                if link not in seen:
                    seen.add(link)
                    out.unique_external_links.append(link)
    return out


def crawl_many(
    seeds: list[tuple[str, int]],
    web: Mapping[str, FetchResult],
    policy: NextLinkPolicy,
) -> list[SourceCrawl]:
    """Reference executes one crawl task at a time (solo Celery pool,
    tasks/config.py:29) — sources crawled sequentially in seed order."""
    return [crawl_source(u, mp, web, policy) for u, mp in seeds]
