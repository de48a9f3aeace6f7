"""Differential guard for the vectorized-parse fast paths.

The parse hot path (linkextract) is shared by the oracle AND the engine, so
a semantics drift there would pass parity silently. This test pins the
ORIGINAL (pre-optimization) helper implementations verbatim and checks the
optimized module against them over an adversarial corpus + random fuzz.
"""
from __future__ import annotations

import random
import re
from urllib.parse import urljoin, urlparse

from crawler_spark.functions.linkextract import (
    EXCLUDE_PATTERNS,
    FILE_EXTENSIONS,
    _is_excluded,
    _is_file_url,
    _is_internal,
    build_spans_html,
    classify_href,
    extract_links,
)
from crawler_spark.functions.urlnorm import resolve

# ---- reference (original) implementations, copied verbatim ----

_EXCLUDE_RE_REF = [re.compile(p, re.IGNORECASE) for p in EXCLUDE_PATTERNS]


def _is_excluded_ref(url: str) -> bool:
    return any(rx.search(url) for rx in _EXCLUDE_RE_REF)


def _is_file_url_ref(url: str) -> bool:
    try:
        path = urlparse(url.lower()).path
    except ValueError:
        return False
    return any(path.endswith(ext) for ext in FILE_EXTENSIONS)


def _is_internal_ref(url: str, base_url: str) -> bool:
    try:
        netloc = urlparse(url).netloc
        return (not netloc) or netloc == urlparse(base_url).netloc
    except ValueError:
        return False


def _resolve_ref(base_url: str, href: str) -> str:
    try:
        return urljoin(base_url, href)
    except ValueError:
        return href


# ---- corpora ----

HANDCRAFTED = [
    "https://a.example.org/x.pdf",
    "https://a.example.org/x.PDF",
    "https://a.example.org/x.pdf?dl=1",
    "https://a.example.org/x.pdf#frag",
    "https://a.example.org/a.tar.gz",
    "https://a.example.org/noext",
    "https://a.example.org/dir.pdf/page",
    "https://a.example.org/.pdf",
    "https://a.example.org",
    "https://a.example.org/",
    "http://a.example.org/y.docx",
    "ftp://files.example.org/y.zip",
    "//protocol.relative/z.csv",
    "/root/rel.txt",
    "rel/path.rtf",
    "../up/one.svg",
    "./same.webp",
    "?query=only",
    "#frag-only",
    "",
    "https://user:pw@a.example.org:8443/p.png",
    "https://a.example.org:443/p.jpeg",
    "https://[::1]/v6.bmp",
    "https://[::1:80/broken-bracket.gif",
    "https://a.example.org/%2e%2e/traversal.ico",
    "https://a.example.org/a%2Fb.csv",
    "https://a.example.org/a b/c.txt",
    "https://a.example.org/a\tb.txt",
    "https://a.example.org/a\nb.pdf",
    "https://A.EXAMPLE.ORG/UP.PDF",
    "https://facebook.com/x.pdf",
    "https://github.com/u/r/blob/main/d.pdf",
    "https://github.com/u/r",
    "mailto:x@y.z",
    "tel:+123",
    "javascript:void(0)",
    "https://a.example.org/login",
    "https://a.example.org/page#",
    "https://a.example.org/./a/../b.pdf",
    "/a/../b",
    "/a/./b.pdf",
    "/a/b/..",
    "/a/b/.",
    "/..",
    "//",
    "///x.pdf",
    "a.pdf",
    "https://other.example.net/x",
    "https://a.example.org/x",
    "HTTPS://a.example.org/x.pdf",
    "https:///nohost.pdf",
    "https://h/;params.pdf",
    "https://h/p;v=1.pdf?b=2&a=1#f",
]

BASES = [
    "https://a.example.org",
    "https://a.example.org/sub/dir",
    "https://user@b.example.net:8443",
    "https://[::1]",
]


def _rand_urls(n: int, seed: int = 7) -> list[str]:
    rng = random.Random(seed)
    pieces = [
        "https://", "http://", "//", "/", "./", "../", "", "h", "host.tld",
        "a/b", ".pdf", ".ZIP", ".x", "?q=1", "#f", ":", "@", "%2F", "%zz",
        "[", "]", " ", "\t", "..", ".", "login", "twitter.com", "#",
        "?#", "?", "/.", "/..", ";", ";v=1", "%20", "\n",
    ]
    out = []
    for _ in range(n):
        out.append("".join(rng.choice(pieces) for _ in range(rng.randint(1, 8))))
    return out


CORPUS = HANDCRAFTED + _rand_urls(4000) + _rand_urls(4000, seed=23) + _rand_urls(2000, seed=101)


def test_is_file_url_matches_reference():
    for u in CORPUS:
        assert _is_file_url(u) == _is_file_url_ref(u), repr(u)


def test_is_excluded_matches_reference():
    for u in CORPUS:
        assert _is_excluded(u) == _is_excluded_ref(u), repr(u)


def test_is_internal_matches_reference():
    for b in BASES:
        for u in CORPUS:
            assert _is_internal(u, b) == _is_internal_ref(u, b), (repr(u), b)


def test_resolve_matches_reference():
    for b in BASES:
        for u in CORPUS:
            assert resolve(b, u) == _resolve_ref(b, u), (repr(u), b)


def test_classify_and_extract_end_to_end():
    """Whole-pipeline check: documents stitched from corpus hrefs produce
    identical links + spans through the optimized path as through a
    reconstruction using the reference helpers."""
    for base in BASES[:2]:
        html = "".join(
            f'<a href="{u}">x</a><p>text {i}</p>' for i, u in enumerate(CORPUS[:400])
        )
        links = extract_links(html, base)
        # reference reconstruction of the pipeline order
        from crawler_spark.functions.urlnorm import normalize_url

        ref_int, ref_ext, ref_file = [], [], []
        seen = set()
        for m in re.finditer(r'<a[^>]+href=["\']([^"\']+)["\'][^>]*>', html, re.I):
            url = m.group(1).strip()
            if not url or url == "#" or url.startswith("#"):
                continue
            if _is_excluded_ref(url):
                continue
            if not url.startswith(("http://", "https://")):
                url = _resolve_ref(base, url)
            if url in seen:
                continue
            seen.add(url)
            normalized = normalize_url(url)
            if normalized is None:
                continue
            if _is_file_url_ref(url):
                ref_file.append(normalized)
            elif _is_internal_ref(url, base):
                ref_int.append(normalized)
            else:
                ref_ext.append(normalized)
        assert links.internal == ref_int
        assert links.external == ref_ext
        assert links.file == ref_file
        # spans still deterministic + offsets monotonic
        spans, _ = build_spans_html(html, base)
        offs = [s.offset for s in spans]
        assert offs == sorted(offs)


def test_classify_href_agrees_with_extract():
    base = "https://a.example.org"
    for u in CORPUS[:800]:
        cat, norm = classify_href(u, base)
        assert (cat is None) == (norm is None)


def test_html_to_markdown_prefilter_matches_original():
    """The script/style presence prefilter must be output-identical to the
    unconditional 5-pass pipeline on any input (the pass can only match
    strings containing the literal word, so skipping it otherwise is a
    no-op — fuzz-verified here, including mixed case and spaced tags)."""
    from crawler_spark.functions.linkextract import (
        _ENTITY_SUBS,
        _NL_RE,
        _TAG_SUBS,
        _WS_RE,
        html_to_markdown,
    )

    def md_ref(html: str) -> str:  # pinned original: no prefilter
        text = html
        for rx, repl in _TAG_SUBS:
            text = rx.sub(repl, text)
        for ent, ch in _ENTITY_SUBS:
            text = text.replace(ent, ch)
        text = _WS_RE.sub(" ", text)
        text = _NL_RE.sub("\n\n", text)
        return text.strip()

    handcrafted = [
        "",
        "plain text",
        "<script>a<p>b</script>c",
        "<ScRiPt>x</sCrIpT>ok",
        "< script type='t' >s</ script >t",
        "<style>.c{}</style>u",
        "< sTyLe >s</style>",
        "<script>unterminated",
        "scripted prose, no tags",
        "word style here <p>x</p>",
        "<h1>t</h1><p>p</p><div>d</div><li>l</li><br/>",
        "<p</h1>>",
        "&amp;&lt;&nbsp;  x\t\ty\n\n\nz",
        # Unicode case-fold traps: re.IGNORECASE matches 'ſ' (U+017F)
        # and 'ı' (U+0131) and 'İ' (U+0130) as s/i/i, which str.lower()
        # does NOT map onto the probe word — a lower()-based probe
        # skipped the strip pass on these.
        "<ſcript>var x=1</ſcript><p>hello</p>",
        "<SCRıPT>leak()</scrıpt>ok",
        "<scrİpt>leak()</scrİpt>ok",
        "<ſTYLE>.c{}</ſtyle>u",
    ]
    rng = random.Random(41)
    pieces = [
        "<script>", "</script>", "<style>", "</style>", "< script >",
        "<h1>", "</h2>", "<p>", "<div class='x'>", "<br/>", "<", ">",
        "text", "SCRIPT", "Style", " ", "\n", "&amp;", "<a href='/x'>y</a>",
        "<ſcript>", "</scrıpt>", "ſ", "ı",
    ]
    fuzz = [
        "".join(rng.choice(pieces) for _ in range(rng.randint(0, 10)))
        for _ in range(3000)
    ]
    for s in handcrafted + fuzz:
        assert html_to_markdown(s) == md_ref(s), repr(s)


def test_prefilter_probe_is_sound():
    """Exhaustive over Unicode, per letter POSITION (substring adjacency
    matters: İ casefolds to 'i'+combining-dot, which would split the
    probe word): substituting any codepoint that re.IGNORECASE accepts
    for a letter of 'script'/'style' must keep the word a substring of
    the probe transform casefold() + 'ı'→'i' + drop-U+0307 — so the
    probe can never skip a string the strip pass would match."""
    import re as _re

    for word in ("script", "style"):
        for pos, letter in enumerate(word):
            rx = _re.compile(_re.escape(letter), _re.IGNORECASE)
            for cp in range(0x110000):
                ch = chr(cp)
                if rx.fullmatch(ch):
                    probe = (
                        (word[:pos] + ch + word[pos + 1 :])
                        .casefold()
                        .replace("ı", "i")
                        .replace("̇", "")
                    )
                    assert word in probe, f"{word} pos {pos}: {hex(cp)}"


def test_ws_collapse_fast_form_matches_original():
    """The {2,}-run whitespace regex must produce byte-identical output to
    the original [ \\t\\r\\f\\v]+ form on any input."""
    from crawler_spark.functions.linkextract import _WS_RE, _WS_RE_REF

    rng = random.Random(99)
    pieces = [" ", "  ", "\t", "\r", "\f", "\v", "a", "bc", "\n", " \t ", ""]
    for _ in range(5000):
        s = "".join(rng.choice(pieces) for _ in range(rng.randint(0, 12)))
        assert _WS_RE.sub(" ", s) == _WS_RE_REF.sub(" ", s), repr(s)


def test_collapse_ws_matches_original():
    """The translate+halving whitespace collapse must be byte-identical to
    the original [ \\t\\r\\f\\v]+ regex on any input, including long runs
    (the halving loop's O(log k) convergence) and mixed ws species."""
    from crawler_spark.functions.linkextract import _WS_RE_REF, _collapse_ws

    handcrafted = [
        "", " ", "  ", "a b", "a  b", "a\tb", "\t", "\v\f\r\t ", "a" + " " * 5000 + "b",
        "\t" * 100, " \n ", "\n\t\n", "x \t \r y", " lead", "trail ",
    ]
    rng = random.Random(7)
    pieces = [" ", "  ", "   ", "\t", "\r", "\f", "\v", "a", "bc", "\n", " \t ", ""]
    fuzz = [
        "".join(rng.choice(pieces) for _ in range(rng.randint(0, 14)))
        for _ in range(8000)
    ]
    for s in handcrafted + fuzz:
        assert _collapse_ws(s) == _WS_RE_REF.sub(" ", s), repr(s)
