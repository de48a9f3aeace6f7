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

from urllib.parse import urlparse

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["RobotsTrie", "broadcast_robots", "robots_filter", "host_quotas"]


class _TrieNode(dict):
    __slots__ = ("terminal",)

    def __init__(self):
        super().__init__()
        self.terminal = False


class RobotsTrie:
    """Character-level prefix trie over a host's disallow prefixes.
    A path is disallowed iff some disallow prefix is a prefix of it."""

    def __init__(self, prefixes: list[str]):
        self.root = _TrieNode()
        for p in prefixes:
            node = self.root
            for ch in p:
                node = node.setdefault(ch, _TrieNode())
            node.terminal = True

    def disallowed(self, path: str) -> bool:
        node = self.root
        if node.terminal:
            return True
        for ch in path:
            node = node.get(ch)
            if node is None:
                return False
            if node.terminal:
                return True
        return False


def build_tries(robots_rows: list[dict]) -> dict[str, RobotsTrie]:
    """rows: {host, disallow_prefixes: list[str], crawl_delay_ms: int}."""
    return {r["host"]: RobotsTrie(list(r["disallow_prefixes"])) for r in robots_rows}


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
                parsed = urlparse(u)
                host, path = parsed.netloc, parsed.path
            trie = tries.get(host)
            out.append(True if trie is None else not trie.disallowed(path or "/"))
        return pd.Series(out, dtype=bool)

    allowed = F.pandas_udf(_allowed, "boolean")(
        F.parse_url(F.col(url_col), F.lit("HOST")),
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
