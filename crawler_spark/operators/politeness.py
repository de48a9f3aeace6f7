"""Per-host politeness: robots.txt disallow rules + crawl-delay quotas.

The reference only *claims* robots support (README tenet; no code reads
robots.txt — verified in SURVEY.md §0) and rate-limits implicitly via its
single in-flight Celery task (backend/tasks/config.py:29). The north rule
mandates both explicitly, so this module builds them to spec:

- **robots rules**: per-host disallow path-prefix sets, compiled into a
  prefix trie per host and shipped to executors as a broadcast variable;
  evaluated inside an Arrow pandas UDF (north rule: "robots.txt disallow
  rules evaluated via broadcast rule tries").
- **crawl-delay quota**: a host with crawl_delay_ms=d gets at most
  ``max(1, batch_window_ms // d)`` fetches per micro-batch; hosts without
  a rule get the default per-host top-K. Fed into the scheduler's
  per-host drain window (scheduler.py).
"""

from __future__ import annotations

from urllib.parse import urlsplit

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "RobotsTrie",
    "broadcast_robots",
    "robots_filter",
    "host_quotas",
    "parse_robots_txt",
    "robots_rules_from_bodies",
]


class _TrieNode(dict):
    __slots__ = ("terminal",)

    def __init__(self):
        super().__init__()
        self.terminal = False


def _compile_wild(p: str):
    import re as _re

    anchored = p.endswith("$")
    body = p[:-1] if anchored else p
    pat = ".*".join(_re.escape(seg) for seg in body.split("*"))
    return _re.compile(pat + ("$" if anchored else ""))


class RobotsTrie:
    """Character-level prefix trie over a host's disallow prefixes, plus
    RFC 9309 wildcard rules (``*`` = any run, trailing ``$`` = end
    anchor) and ``Allow`` rules with longest-rule-wins precedence
    (§2.2.2: the matching rule with the longest pattern wins; Allow wins
    length ties).

    Fast path (no allow rules): plain prefixes stay on the O(|path|)
    trie walk with wildcard regexes checked after — any disallow hit
    decides. With allow rules present the walk instead tracks the
    LONGEST matching disallow (trie depth of the deepest terminal /
    pattern length of wildcard hits) and compares it against the longest
    matching allow."""

    def __init__(self, prefixes: list[str], allow: list[str] | None = None):
        self.root = _TrieNode()
        self.wild: list = []  # (regex, pattern_len)
        for p in prefixes:
            if "*" in p or p.endswith("$"):
                self.wild.append((_compile_wild(p), len(p)))
                continue
            node = self.root
            for ch in p:
                node = node.setdefault(ch, _TrieNode())
            node.terminal = True
        self.allow: list = []  # (matcher_kind, value/regex, pattern_len)
        for p in allow or []:
            if "*" in p or p.endswith("$"):
                self.allow.append(("re", _compile_wild(p), len(p)))
            else:
                self.allow.append(("prefix", p, len(p)))

    def _longest_disallow(self, path: str) -> int:
        best = -1
        node = self.root
        if node.terminal:
            best = 0
        for depth, ch in enumerate(path, start=1):
            node = node.get(ch)
            if node is None:
                break
            if node.terminal:
                best = depth
        for rx, plen in self.wild:
            if rx.match(path) and plen > best:
                best = plen
        return best

    def disallowed(self, path: str) -> bool:
        if not self.allow:  # fast path: any disallow hit decides
            node = self.root
            if node.terminal:
                return True
            for ch in path:
                node = node.get(ch)
                if node is None:
                    break
                if node.terminal:
                    return True
            return any(rx.match(path) for rx, _ in self.wild)
        dis = self._longest_disallow(path)
        if dis < 0:
            return False
        best_allow = -1
        for kind, m, plen in self.allow:
            if plen > best_allow and (
                path.startswith(m) if kind == "prefix" else m.match(path)
            ):
                best_allow = plen
        return dis > best_allow  # tie -> Allow wins


def build_tries(robots_rows: list[dict]) -> dict[str, RobotsTrie]:
    """rows: {host, disallow_prefixes: list[str], crawl_delay_ms: int,
    allow_prefixes?: list[str]} (allow optional for older tables)."""
    return {
        r["host"]: RobotsTrie(
            list(r["disallow_prefixes"]), list(r.get("allow_prefixes") or [])
        )
        for r in robots_rows
    }


def broadcast_robots(spark: SparkSession, robots: DataFrame):
    """Collect the (small) rules table and broadcast compiled tries.
    Robots tables are O(hosts with rules), not O(frontier) — driver-safe."""
    rows = [r.asDict() for r in robots.collect()]
    return spark.sparkContext.broadcast(
        {
            "tries": build_tries(rows),
            "delay_ms": {r["host"]: int(r["crawl_delay_ms"]) for r in rows},
        }
    )


def robots_filter(df: DataFrame, robots_bcast, url_col: str = "url", keep_denied: bool = False) -> DataFrame:
    """Drop (or tag, with keep_denied) URLs whose path hits a disallow
    prefix of their host's trie. Host and path are split JVM-side
    (``parse_url`` inside whole-stage codegen) so the Arrow UDF only does
    the dict lookup + trie walk over two short string columns — Python
    never re-parses the URL. Hosts without rules pass; URLs ``parse_url``
    cannot parse fall back to Python ``urlparse`` (fail-closed: still a
    lookup, never an exception)."""

    def _allowed(hosts: pd.Series, paths: pd.Series, urls: pd.Series) -> pd.Series:
        tries = robots_bcast.value["tries"]
        out = []
        for host, path, u in zip(hosts, paths, urls):
            if host is None:
                if u is None:
                    out.append(False)
                    continue
                # urlsplit, not urlparse: .path keeps ';params', matching
                # JVM parse_url PATH on the fast branch
                parsed = urlsplit(u)
                host, path = parsed.netloc, parsed.path
            trie = tries.get(host)
            out.append(True if trie is None else not trie.disallowed(path or "/"))
        return pd.Series(out, dtype=bool)

    # AUTHORITY (= userinfo@host:port) matches urlparse().netloc — the key
    # every robots table in this engine is built with (host_of()).  HOST
    # would strip port/userinfo and silently fail-open for URLs carrying
    # either.
    allowed = F.pandas_udf(_allowed, "boolean")(
        F.parse_url(F.col(url_col), F.lit("AUTHORITY")),
        F.parse_url(F.col(url_col), F.lit("PATH")),
        F.col(url_col),
    )
    if keep_denied:
        return df.withColumn("robots_allowed", allowed)
    return df.filter(allowed)


def host_quotas(
    spark: SparkSession,
    robots_bcast,
    default_k: int,
    batch_window_ms: int = 60_000,
) -> DataFrame:
    """Per-host fetch quota for one micro-batch window: hosts with a
    crawl-delay get floor(window/delay) capped at default_k, min 1.
    Returned as a tiny DataFrame to broadcast-join onto the frontier."""
    delay = robots_bcast.value["delay_ms"]
    rows = [
        (h, max(1, min(default_k, batch_window_ms // d)) if d > 0 else default_k)
        for h, d in delay.items()
    ]
    return spark.createDataFrame(rows or [("__none__", default_k)], "host string, quota int")


# ---------------------------------------------------------------------------
# raw robots.txt -> rules rows (closes the loop: fetched robots bodies ->
# rules table -> broadcast tries)
# ---------------------------------------------------------------------------

ROBOTS_RULES_SCHEMA = (
    "host string, disallow_prefixes array<string>, allow_prefixes array<string>, crawl_delay_ms int"
)


def parse_robots_txt(
    text: str, user_agent: str = "*"
) -> tuple[list[str], list[str], int]:
    """Parse one robots.txt body into (disallow_prefixes,
    allow_prefixes, crawl_delay_ms) for ``user_agent``.

    Deterministic simplified REP (RFC 9309 flavor): lines are grouped into
    records by consecutive User-agent lines; the record with the MOST
    SPECIFIC matching agent wins (exact match beats substring match beats
    '*'; ties broken by longer agent token). Comments (#) and blank lines
    stripped; empty Disallow/Allow values are dropped;
    Crawl-delay is seconds (int or decimal) -> ms, 0 when absent."""
    # one record per User-agent block: (agents, disallows, allows,
    # delays) — a
    # block with no rules is still a record (most-specific match with no
    # rules = allow-all, RFC 9309 §2.2.1)
    groups: list[tuple[list[str], list[str], list[str], list[float]]] = []
    cur: tuple[list[str], list[str], list[str], list[float]] | None = None
    expecting_agents = False
    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            # blank line ends a record (classic REP): a following
            # User-agent starts a NEW group, so an agents-only block
            # stands alone as allow-all instead of absorbing the next
            expecting_agents = False
            continue
        if ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not expecting_agents:
                cur = ([], [], [], [])
                groups.append(cur)
            cur[0].append(val.lower())
            expecting_agents = True
            continue
        expecting_agents = False
        if cur is None:
            continue  # rule lines before any User-agent: ignored
        if key == "disallow" and val:
            cur[1].append(val)
        elif key == "allow" and val:
            cur[2].append(val)
        elif key == "crawl-delay":
            try:
                cur[3].append(float(val))
            except ValueError:
                pass

    ua = user_agent.lower()
    best: tuple[int, int] | None = None  # (specificity, agent_len)
    best_group = None
    for g_agents, dis, allow, delays in groups:
        for a in g_agents:
            if a == ua:
                spec = 2
            elif a != "*" and a in ua:
                spec = 1
            elif a == "*":
                spec = 0
            else:
                continue
            key2 = (spec, len(a))
            if best is None or key2 > best:
                best = key2
                best_group = (dis, allow, delays)
    if best_group is None:
        return [], [], 0
    dis, allow, delays = best_group
    delay_ms = int(delays[0] * 1000) if delays else 0
    return list(dis), list(allow), delay_ms


def parse_robots_sitemaps(text: str) -> list[str]:
    """Extract ``Sitemap:`` directives from a robots.txt body — the
    discovery hook that links politeness to the sitemap source (a
    crawler that fetches robots.txt gets the host's sitemap URLs for
    free; sitemaps.org specifies the directive lives in robots.txt).
    Per the spec, Sitemap lines are record-INDEPENDENT: they apply
    regardless of user-agent grouping, so this scans every line, not
    the winning group. Absolute http(s) URLs only; duplicates keep
    first; order of appearance preserved."""
    out: list[str] = []
    seen: set[str] = set()
    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if ":" not in line:
            continue
        key, _, val = line.partition(":")
        if key.strip().lower() != "sitemap":
            continue
        val = val.strip()
        if not (val.startswith("http://") or val.startswith("https://")):
            continue
        if val not in seen:
            seen.add(val)
            out.append(val)
    return out


ROBOTS_SITEMAPS_SCHEMA = "host string, rank int, sitemap_url string"


def robots_sitemaps_from_bodies(bodies: DataFrame) -> DataFrame:
    """Distributed Sitemap-directive extraction: (host, robots_txt) ->
    one (host, rank, sitemap_url) row per directive, rank = order of
    appearance. Narrow mapInPandas, embarrassingly parallel; the output
    feeds sources/sitemap.py::sitemaps_to_urls for frontier seeding."""

    def _parse(it):
        for pdf in it:
            out = {"host": [], "rank": [], "sitemap_url": []}
            for host, body in zip(pdf["host"], pdf["robots_txt"]):
                for i, sm in enumerate(parse_robots_sitemaps(body or "")):
                    out["host"].append(host)
                    out["rank"].append(i)
                    out["sitemap_url"].append(sm)
            yield pd.DataFrame(
                {
                    "host": pd.Series(out["host"], dtype="object"),
                    "rank": pd.Series(out["rank"], dtype="int32"),
                    "sitemap_url": pd.Series(out["sitemap_url"], dtype="object"),
                }
            )

    return bodies.mapInPandas(_parse, ROBOTS_SITEMAPS_SCHEMA)


def robots_rules_from_bodies(
    bodies: DataFrame, user_agent: str = "*"
) -> DataFrame:
    """Distributed parse of fetched robots.txt bodies: (host, robots_txt)
    -> ROBOTS_RULES_SCHEMA rows ready for broadcast_robots. Narrow
    mapInPandas — at 10^7 hosts the parse is embarrassingly parallel and
    only the resulting O(hosts-with-rules) table is collected."""

    def _parse(it):
        for pdf in it:
            out = {"host": [], "disallow_prefixes": [], "allow_prefixes": [],
                   "crawl_delay_ms": []}
            for host, body in zip(pdf["host"], pdf["robots_txt"]):
                dis, allow, delay = parse_robots_txt(body or "", user_agent)
                out["host"].append(host)
                out["disallow_prefixes"].append(dis)
                out["allow_prefixes"].append(allow)
                out["crawl_delay_ms"].append(delay)
            yield pd.DataFrame(out)

    return bodies.mapInPandas(_parse, ROBOTS_RULES_SCHEMA)
