"""URL canonicalization — pure-Python core shared by the oracle and the
Arrow-vectorized Spark UDFs.

Reference semantics (parity mode), from /root/reference:
- ``normalize_url`` mirrors ``backend/domain/types.py:11-24`` (NormalizedUrl):
  reject empty, reject non-``https://`` prefix, strip ALL trailing slashes,
  reject unless exactly one ``"://"``.
- ``strip_fragment`` mirrors ``backend/domain/entities.py:28-34``
  (urlparse -> drop fragment -> urlunparse).
- ``resolve`` mirrors the ``urljoin`` usage at
  ``backend/scraping/manual_link_extractor.py:83-84``.

Extended mode (north-rule RFC 3986 canonicalizer, absent in the reference):
``canonicalize_rfc3986`` additionally lowercases scheme+host, drops default
ports, sorts query parameters, and normalizes percent-encoding case.
"""

from __future__ import annotations

import re
from functools import lru_cache
from urllib.parse import (
    parse_qsl,
    quote,
    urlencode,
    urljoin,
    urlparse,
    urlsplit,
    urlunparse,
)

__all__ = [
    "normalize_url",
    "strip_fragment",
    "resolve",
    "canonicalize_rfc3986",
    "url_type",
    "host_of",
]


def normalize_url(url: str | None) -> str | None:
    """Reference-parity normalization; returns None for invalid URLs."""
    if not url:
        return None
    if not url.startswith("https://"):
        return None
    normalized = url.rstrip("/")
    if normalized.count("://") != 1:
        return None
    return normalized


def strip_fragment(url: str) -> str:
    """Drop the fragment exactly the way the reference does (via urlparse).
    Unparseable URLs (bad port / IPv6 bracket garbage) pass through with a
    plain '#'-split — fail-closed, never raise in an executor."""
    try:
        p = urlparse(url)
        return urlunparse((p.scheme, p.netloc, p.path, p.params, p.query, ""))
    except ValueError:
        return url.split("#", 1)[0]


@lru_cache(maxsize=4096)
def _base_prefix(base_url: str) -> str | None:
    """scheme://netloc of an http(s) base, or None when the fast join
    cannot be proven equivalent to urljoin (non-http scheme, parse error)."""
    try:
        s = urlsplit(base_url)
    except ValueError:
        return None
    if s.scheme not in ("http", "https") or not s.netloc:
        return None
    return s.scheme + "://" + s.netloc


def resolve_with_provenance(base_url: str, href: str) -> tuple[str, bool]:
    """``(resolved, fast_joined)`` — the resolution itself is identical to
    ``resolve``; the flag records that the fast root-relative join applied,
    which PROVES the result is ``scheme://netloc-of-base + href`` with the
    href's ';'-free path ending at its first '?' or '#'. Callers
    (extract_links) use that proof to classify without re-parsing."""
    if (
        href.startswith("/")
        and not href.startswith("//")
        and "/../" not in href
        and "/./" not in href
        and "\t" not in href
        and "\r" not in href
        and "\n" not in href
        # urlunsplit drops empty-but-present query/fragment ('/a?' -> '/a',
        # '/a?#f' -> '/a#f') — those forms must take the exact path
        and not href.endswith(("?", "#"))
        and "?#" not in href
    ):
        # dot segments and ;params are handled in the PATH only — trim
        # ?query/#fragment before the trailing-'/.'/'/..' check, and send
        # any path containing ';' down the exact path (urljoin splits
        # params via urlparse, dropping empty ones and unhiding '..;x')
        cut = len(href)
        for ch in "?#":
            j = href.find(ch)
            if 0 <= j < cut:
                cut = j
        if ";" not in href[:cut] and not href.endswith(("/..", "/."), 0, cut):
            prefix = _base_prefix(base_url)
            if prefix is not None:
                return prefix + href, True
    try:
        return urljoin(base_url, href), False
    except ValueError:
        return href, False


def resolve(base_url: str, href: str) -> str:
    """Relative->absolute resolution (urljoin), as the reference applies it
    to hrefs that do not start with http:// or https://.

    Fast path (hot loop: ~40% of parse time was urljoin): a root-relative
    href with no dot segments and none of the \\t\\r\\n bytes urlsplit
    strips resolves to scheme://netloc + href verbatim — one cached base
    parse + a concat instead of two urlsplits and remove_dot_segments per
    href. Anything else falls back to urljoin (guarded by
    tests/test_linkextract_diff.py against the verbatim original)."""
    return resolve_with_provenance(base_url, href)[0]


def url_type(url: str) -> str:
    """'pdf' iff the URL ends with .pdf (case-insensitive), else 'html'."""
    return "pdf" if url.lower().endswith(".pdf") else "html"


def host_of(url: str) -> str:
    try:
        return urlparse(url).netloc
    except ValueError:
        return ""


_DEFAULT_PORTS = {"https": "443", "http": "80"}

# RFC 3986 §2.3 unreserved characters — the ONLY escapes safe to decode.
# Reserved escapes (%2F, %3F, ...) are NOT equivalent to their literals
# (§2.2), so they keep their encoded form with uppercased hex.
_UNRESERVED = frozenset(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)
_PCT_RE = re.compile(r"%([0-9A-Fa-f]{2})")
_PATH_SAFE = "/:@!$&'()*+,;=~-._"


def _canon_pct_path(path: str) -> str:
    """Percent-encoding normalization for a path segment string: decode
    escapes of unreserved characters, uppercase the hex of all remaining
    escapes, and percent-encode any raw character that needs it — without
    double-encoding existing escapes (quote() is applied only to the
    literal stretches between them)."""
    out: list[str] = []
    i = 0
    for m in _PCT_RE.finditer(path):
        out.append(quote(path[i : m.start()], safe=_PATH_SAFE))
        ch = chr(int(m.group(1), 16))
        out.append(ch if ch in _UNRESERVED else "%" + m.group(1).upper())
        i = m.end()
    out.append(quote(path[i:], safe=_PATH_SAFE))
    return "".join(out)


def canonicalize_rfc3986(url: str | None) -> str | None:
    """Extended canonical form for scale mode (engine-only; superset of the
    reference's normalization). Returns None for invalid URLs.

    Steps: reference validity gate, lowercase scheme + host, drop default
    port, collapse empty path to '', sort query params, normalize
    percent-encoding (decode unreserved, uppercase remaining escapes),
    drop fragment, strip trailing slashes.
    """
    base = normalize_url(url)
    if base is None:
        return None
    try:
        p = urlparse(base)
        scheme = p.scheme.lower()
        host = p.hostname.lower() if p.hostname else ""
        port = p.port
    except ValueError:
        return None  # bad port / IPv6 garbage: invalid, never raise
    if not host:
        # No authority to fetch from ("https:////:" parses to an EMPTY
        # netloc with a '//…' path; "https://:" to netloc ":"). Emitting
        # these produces a URL a second canonicalize pass rejects —
        # idempotence (hypothesis-pinned) requires rejecting them here.
        return None
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme):
        netloc = f"{host}:{port}"
    if p.username:
        cred = p.username + (f":{p.password}" if p.password else "")
        netloc = f"{cred}@{netloc}"
    path = _canon_pct_path(p.path)
    query = urlencode(sorted(parse_qsl(p.query, keep_blank_values=True)))
    out = urlunparse((scheme, netloc, path, p.params, query, ""))
    out = out.rstrip("/")
    return out if out.count("://") == 1 else None
