"""Link extraction + interleaved-span building — pure-Python core shared by
the oracle, the fixture generator, and the Arrow-vectorized Spark UDFs.

Reference semantics (the WHAT), from /root/reference:
- href harvesting via regex over anchor tags, case-insensitive
  (``backend/scraping/manual_link_extractor.py:62-63``).
- skip empty / '#' / fragment-only hrefs (``:74-76``).
- 15 case-insensitive exclusion patterns (``:24-30, 38-42``).
- relative->absolute via urljoin for non-http(s) hrefs (``:83-84``).
- order-preserving first-occurrence dedup on the resolved URL (``:87-89``).
- normalization gate: invalid URLs silently dropped (``:91-94``).
- 3-way classification: file (22-extension suffix set over the lowercased
  *path*, ``:17-21, 44-47``), else internal (relative or same netloc,
  ``:49-58``), else external (``:96-102``).
- PDF text: one text unit per page, pages joined in page order
  (``backend/scraping/pdf_scraper.py:21-24``).

The interleaved-span payload (BASELINE input_hint / FIXTURES.md §6) is this
engine's normalization of the reference's per-document output: text spans
(markdown) interleaved with media spans (file links) in document order,
``offset`` = char offset of the span start in the source document. The
HTML->markdown converter here is a deterministic pure function pinned by
FIXTURES.md (markdownify is unavailable in this environment; generator,
oracle, and engine all share this one definition, so span equality is
well-defined).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from functools import lru_cache

from .urlnorm import host_of, normalize_url, resolve, resolve_with_provenance

__all__ = [
    "FILE_EXTENSIONS",
    "EXCLUDE_PATTERNS",
    "HREF_PATTERN",
    "extract_links",
    "classify_href",
    "html_to_markdown",
    "build_spans_html",
    "build_spans_pdf",
    "Span",
    "ExtractedLinks",
]

# 22-extension file-link suffix set (manual_link_extractor.py:17-21).
FILE_EXTENSIONS = frozenset(
    {
        ".pdf", ".doc", ".docx", ".xls", ".xlsx", ".ppt", ".pptx",
        ".zip", ".tar", ".gz", ".rar", ".7z", ".png", ".jpg", ".jpeg",
        ".gif", ".svg", ".bmp", ".webp", ".ico", ".csv", ".txt", ".rtf",
    }
)

# Exclusion patterns (manual_link_extractor.py:24-30), applied case-insensitively.
EXCLUDE_PATTERNS = [
    r"/login", r"/signin", r"/register", r"/signup", r"/contact",
    r"/privacy", r"/terms", r"/cookie", r"/legal", r"/disclaimer",
    r"facebook\.com", r"twitter\.com", r"linkedin\.com", r"instagram\.com",
    r"youtube\.com", r"github\.com/(?!.*\.(pdf|doc|docx|zip))",
    r"mailto:", r"tel:", r"javascript:", r"#$",
]
_EXCLUDE_RE = [re.compile(p, re.IGNORECASE) for p in EXCLUDE_PATTERNS]
# Hot-loop form: one alternation scan instead of up to 20 sequential
# searches — boolean-equivalent to any(p.search) since order is irrelevant.
_EXCLUDE_ONE_RE = re.compile(
    "|".join(f"(?:{p})" for p in EXCLUDE_PATTERNS), re.IGNORECASE
)

# Anchor-href harvesting regex (manual_link_extractor.py:62).
HREF_PATTERN = r'<a[^>]+href=["\']([^"\']+)["\'][^>]*>'
_HREF_RE = re.compile(HREF_PATTERN, re.IGNORECASE)


def _is_excluded(url: str) -> bool:
    return _EXCLUDE_ONE_RE.search(url) is not None


# Characters Python's urlsplit strips (\t\r\n) or that trigger its IPv6
# bracket validation — URLs containing these take the exact slow path.
_SLOW_URL_CHARS = ("\t", "\r", "\n", "[", "]")


def _split_netloc_path(url: str) -> tuple[str, str] | None:
    """netloc and path of an http(s) URL exactly as urlparse returns them,
    without the generic parser. Returns None → caller uses urlparse."""
    if url.startswith("https://"):
        i = 8
    elif url.startswith("http://"):
        i = 7
    else:
        return None
    for ch in _SLOW_URL_CHARS:
        if ch in url:
            return None
    n = len(url)
    end = n
    for ch in "/?#":
        j = url.find(ch, i)
        if i <= j < end:
            end = j
    netloc = url[i:end]
    if end == n or url[end] != "/":
        return netloc, ""
    path_end = n
    for ch in "?#":
        j = url.find(ch, end)
        if end <= j < path_end:
            path_end = j
    path = url[end:path_end]
    # urlparse (vs urlsplit) splits ;params off the last path segment
    semi = path.find(";", path.rfind("/"))
    if semi >= 0:
        path = path[:semi]
    return netloc, path


def _is_file_url(url: str) -> bool:
    lowered = url.lower()
    fast = _split_netloc_path(lowered)
    if fast is not None:
        path = fast[1]
    else:
        from urllib.parse import urlparse

        try:
            path = urlparse(lowered).path
        except ValueError:
            return False
    # every FILE_EXTENSIONS entry is single-dot, so suffix-after-last-dot
    # membership ⟺ any(path.endswith(ext)) — one set probe vs a 22-way scan
    dot = path.rfind(".")
    return dot >= 0 and path[dot:] in FILE_EXTENSIONS


def _netloc_of(url: str) -> str | None:
    """netloc via the fast splitter; None → unknown (use urlparse)."""
    fast = _split_netloc_path(url)
    return fast[0] if fast is not None else None


_BASE_NETLOC_FAIL = object()  # base urlparse raised → internal test is False


@lru_cache(maxsize=4096)
def _base_netloc(base_url: str):
    from urllib.parse import urlparse

    netloc = _netloc_of(base_url)
    if netloc is None:
        try:
            netloc = urlparse(base_url).netloc
        except ValueError:
            return _BASE_NETLOC_FAIL
    return netloc


def _is_internal(url: str, base_url: str) -> bool:
    from urllib.parse import urlparse

    netloc = _netloc_of(url)
    if netloc is None:
        try:
            netloc = urlparse(url).netloc
        except ValueError:
            return False
    if not netloc:
        return True
    base_netloc = _base_netloc(base_url)
    if base_netloc is _BASE_NETLOC_FAIL:
        return False
    return netloc == base_netloc


def classify_href(href: str, base_url: str) -> tuple[str | None, str | None]:
    """One href through the reference pipeline (no dedup).

    Returns (category, normalized_url) with category in
    'file' | 'internal' | 'external', or (None, None) when the href is
    skipped (empty / fragment-only / excluded / fails normalization).
    Classification runs on the *resolved pre-normalization* URL; the
    emitted value is the normalized URL — both as in the reference.
    """
    url = href.strip()
    if not url or url == "#" or url.startswith("#"):
        return None, None
    if _is_excluded(url):
        return None, None
    if not url.startswith(("http://", "https://")):
        url = resolve(base_url, url)
    normalized = normalize_url(url)
    if normalized is None:
        return None, None
    if _is_file_url(url):
        return "file", normalized
    if _is_internal(url, base_url):
        return "internal", normalized
    return "external", normalized


@dataclass
class ExtractedLinks:
    internal: list[str] = field(default_factory=list)
    external: list[str] = field(default_factory=list)
    file: list[str] = field(default_factory=list)
    # (offset, normalized_url) of each kept *file* link's anchor match start,
    # in document order — feeds the media spans.
    file_offsets: list[tuple[int, str]] = field(default_factory=list)


def extract_links(html: str, base_url: str) -> ExtractedLinks:
    """Reference-order link extraction with first-occurrence dedup.

    Pipeline order matters for parity (manual_link_extractor.py:60-104):
    strip -> skip empty/fragment -> skip excluded -> resolve relative ->
    dedup on the RESOLVED url (URLs failing the later normalize gate DO
    enter the dedup set) -> normalize (drop invalid) -> classify on the
    resolved url -> append the normalized url.
    """
    out = ExtractedLinks()
    seen: set[str] = set()
    for m in _HREF_RE.finditer(html):
        href = m.group(1).strip()
        if not href or href == "#" or href.startswith("#"):
            continue
        if _is_excluded(href):
            continue
        if href.startswith(("http://", "https://")):
            url, fast_joined = href, False
        else:
            url, fast_joined = resolve_with_provenance(base_url, href)
        if url in seen:
            continue
        seen.add(url)
        normalized = normalize_url(url)
        if normalized is None:
            continue
        # Classification fast paths (each proven equivalent to the
        # _is_file_url/_is_internal pair; fuzz-guarded in
        # tests/test_linkextract_diff.py::test_classify_and_extract_end_to_end):
        #
        # 1. fast_joined ⟹ url = scheme://base-netloc + href, so its netloc
        #    IS the base's netloc (→ internal unless a file extension hits)
        #    and its urlparse path is exactly href up to the first '?'/'#'
        #    (the join guard already excluded ';' there, and lower() never
        #    moves the '/?#' boundaries _split_netloc_path keys on).
        # 2. otherwise one _split_netloc_path serves BOTH the extension test
        #    (on the lowered path — identical to splitting the lowered url,
        #    since lower() maps none of '/?#;') and the netloc comparison,
        #    replacing the two independent parses of the slow pair.
        if fast_joined:
            cut = len(href)
            for ch in "?#":
                j = href.find(ch)
                if 0 <= j < cut:
                    cut = j
            path = href[:cut].lower()
            dot = path.rfind(".")
            if dot >= 0 and path[dot:] in FILE_EXTENSIONS:
                out.file.append(normalized)
                out.file_offsets.append((m.start(), normalized))
            else:
                out.internal.append(normalized)
            continue
        fast = _split_netloc_path(url)
        if fast is not None:
            netloc, path = fast
            lp = path.lower()
            dot = lp.rfind(".")
            if dot >= 0 and lp[dot:] in FILE_EXTENSIONS:
                out.file.append(normalized)
                out.file_offsets.append((m.start(), normalized))
            elif not netloc:
                out.internal.append(normalized)
            else:
                bn = _base_netloc(base_url)
                if bn is not _BASE_NETLOC_FAIL and netloc == bn:
                    out.internal.append(normalized)
                else:
                    out.external.append(normalized)
            continue
        if _is_file_url(url):
            out.file.append(normalized)
            out.file_offsets.append((m.start(), normalized))
        elif _is_internal(url, base_url):
            out.internal.append(normalized)
        else:
            out.external.append(normalized)
    return out


# --- deterministic HTML -> markdown (pinned definition, FIXTURES.md) ---

# Sequential whole-string passes, mostly literal replacements — each sub
# is a C-level scan; measured 3.3x faster than a single alternation pass
# with a Python per-match callback. str.replace returns the original
# object when the needle is absent, so the entity passes are free on
# entity-less pages.
_TAG_SUBS = [
    (re.compile(r"<\s*(script|style)[^>]*>.*?<\s*/\s*\1\s*>", re.IGNORECASE | re.DOTALL), " "),
    (re.compile(r"<\s*h([1-6])[^>]*>", re.IGNORECASE), lambda m: "\n" + "#" * int(m.group(1)) + " "),
    (re.compile(r"<\s*/\s*h[1-6]\s*>", re.IGNORECASE), "\n"),
    (re.compile(r"<\s*(p|div|li|tr|br)[^>]*/?\s*>", re.IGNORECASE), "\n"),
    (re.compile(r"<[^>]+>"), " "),
]
# &amp; decodes LAST: decoding it first double-decodes nested escapes
# ("&amp;lt;" must render "&lt;", not "<") — same rule as sitemap._unescape
_ENTITY_SUBS = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&")]
_WS_RE_REF = re.compile(r"[ \t\r\f\v]+")  # original definition (kept for tests)
# Output-identical fast form: the original matches EVERY single space
# (sub then rebuilds the whole string); only runs of 2+ or a lone
# non-space whitespace char actually change anything. Measured 58% of
# html_to_markdown was this pass on mostly-single-spaced text.
_WS_RE = re.compile(r"[ \t\r\f\v]{2,}|[\t\r\f\v]")
_NL_RE = re.compile(r"\n\s*\n+")
_WS_TRANSLATE = str.maketrans({"\t": " ", "\r": " ", "\f": " ", "\v": " "})


def _collapse_ws(text: str) -> str:
    """Output-identical to ``_WS_RE_REF.sub(" ", text)`` (and to the
    ``_WS_RE`` fast form), via C-level scans only: map each non-space
    horizontal-ws char to ' ' (gated on presence — translate copies),
    then halve space runs with replace("  ", " ") until none of length
    >= 2 remains. A maximal [ \\t\\r\\f\\v] run of length k becomes a
    k-space run and collapses in O(log k) passes; runs can never merge
    across non-ws chars, so the fixpoint equals the single-pass regex
    substitution (fuzz-pinned in tests/test_linkextract_diff.py).
    Measured ~30x faster than the regex pass, which was 80%+ of
    html_to_markdown on 6 KB link-and-text pages."""
    if "\t" in text or "\r" in text or "\f" in text or "\v" in text:
        text = text.translate(_WS_TRANSLATE)
    while "  " in text:
        text = text.replace("  ", " ")
    return text


def html_to_markdown(html: str) -> str:
    """Deterministic, dependency-free HTML->markdown-ish text. Stable across
    generator / oracle / engine; not a markdownify port."""
    text = html
    # Presence prefilter for the script/style pass: its pattern requires
    # six consecutive chars IGNORECASE-matching s-c-r-i-p-t (or
    # s-t-y-l-e), so a case-folded substring probe is a sound skip — the
    # DOTALL alternation scan is the most expensive of the five passes
    # and almost never matches in links-and-text pages. lower() alone is
    # NOT sound: re.IGNORECASE also folds U+017F 'ſ'→s (covered by
    # casefold), U+0131 'ı'→i (covered by neither — hence the replace),
    # and U+0130 'İ'→i, whose casefold 'i'+U+0307 breaks substring
    # adjacency — hence stripping the combining dot. Exhaustively
    # verified per letter position over all of Unicode in
    # tests/test_linkextract_diff.py::test_prefilter_probe_is_sound; the
    # probe may false-positive (casefold expansions), which only costs
    # the scan. The remaining passes keep their original order
    # (merging the two "\n" passes is NOT output-equivalent: pass 3's
    # replacement can enable a pass-4 match, e.g. '<p</h1>>').
    low = html.casefold().replace("\u0131", "i").replace("\u0307", "")
    if "script" in low or "style" in low:
        text = _TAG_SUBS[0][0].sub(_TAG_SUBS[0][1], text)
    for rx, repl in _TAG_SUBS[1:]:
        text = rx.sub(repl, text)
    for ent, ch in _ENTITY_SUBS:
        text = text.replace(ent, ch)
    text = _collapse_ws(text)
    text = _NL_RE.sub("\n\n", text)
    return text.strip()


@dataclass(frozen=True)
class Span:
    kind: str  # 'text' | 'media'
    text: str  # markdown text for 'text', '' for 'media'
    media_ref: str  # '' for 'text', normalized file URL for 'media'
    offset: int  # char offset of span start in the source document


def build_spans_html(html: str, base_url: str) -> tuple[list[Span], ExtractedLinks]:
    """Interleaved spans for an HTML document.

    Media spans: one per kept unique file link, at its anchor's char offset,
    in document order. Text spans: markdown of each inter-anchor segment,
    offset = segment start; empty segments produce no span.
    """
    links = extract_links(html, base_url)
    spans: list[Span] = []
    cursor = 0
    for off, media_url in links.file_offsets:
        seg = html[cursor:off]
        md = html_to_markdown(seg)
        if md:
            spans.append(Span("text", md, "", cursor))
        spans.append(Span("media", "", media_url, off))
        cursor = off
    tail = html_to_markdown(html[cursor:])
    if tail:
        spans.append(Span("text", tail, "", cursor))
    return spans, links


PDF_PAGE_SEP = "\f"  # fixture encoding: page texts joined by form-feed


def build_spans_pdf(payload_text: str) -> list[Span]:
    """One text span per PDF page, in page order (pdf_scraper.py:21-24);
    offset = char offset of the page start in the decoded payload."""
    spans: list[Span] = []
    cursor = 0
    for page in payload_text.split(PDF_PAGE_SEP):
        stripped = page.strip()
        if stripped:
            spans.append(Span("text", stripped, "", cursor))
        cursor += len(page) + 1
    return spans


def pdf_markdown(payload_text: str) -> str:
    """The reference joins page texts with '\\n' and strips
    (pdf_scraper.py:21-24); fixture pages are joined by form-feed."""
    return "\n".join(payload_text.split(PDF_PAGE_SEP)).strip()


def links_host(url: str) -> str:
    return host_of(url)
