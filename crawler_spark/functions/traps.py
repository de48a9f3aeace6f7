"""Crawl-trap URL-shape heuristics as pure JVM column expressions.

Calendar pages, session-id loops, and faceted-search grids generate
unbounded URL spaces; a frontier that cannot refuse them is eventually
100% trap traffic (the reference fetches whatever it is given —
engine-new surface). Three first-failing rules, all computable from the
URL string alone with built-in array functions (no UDF, no shuffle):

- too_deep: >= 10 path segments;
- repeated_segment: one segment appears >= 4 times (the /a/b/a/b loop
  signature);
- param_explosion: >= 8 query parameters.

Shared by the driver query `queries_scale.q_trap_detect` (which
oracle-checks the cascade against DuckDB) and the scheduler's opt-in
``refuse_traps`` frontier filter (operators/scheduler.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "TRAP_MAX_DEPTH",
    "TRAP_MAX_REPEAT",
    "TRAP_MAX_PARAMS",
    "path_segments",
    "max_segment_repeat",
    "n_query_params",
    "trap_reason",
]

TRAP_MAX_DEPTH = 10  # segments before we call it a trap
TRAP_MAX_REPEAT = 4  # same segment this many times = loop trap
TRAP_MAX_PARAMS = 8  # query params before we call it param explosion

# split('https://host/a/b?q', '/') -> ['https:', '', host, 'a', 'b?q'];
# segments start at element 4 (1-indexed slice). 1000 is an effectively
# unbounded cap that keeps slice() total-length-safe.
_SEG_START = 4
_SEG_CAP = 1000


def _no_fragment(url: Column | str) -> Column:
    """URL with the '#fragment' (if any) removed — fragment text must
    never count as path segments or query parameters."""
    return F.split(url, "#").getItem(0)


def _no_query(url: Column | str) -> Column:
    return F.split(_no_fragment(url), "[?]").getItem(0)


def path_segments(url: Column | str) -> Column:
    """Path segments of the URL (fragment and query string stripped)."""
    return F.slice(F.split(_no_query(url), "/"), _SEG_START, _SEG_CAP)


def max_segment_repeat(url: Column | str) -> Column:
    """Highest multiplicity of any single path segment (0 for no path)."""
    segs = path_segments(url)
    return F.coalesce(
        F.array_max(
            F.transform(
                F.array_distinct(segs),
                lambda d: F.size(F.filter(segs, lambda s: s == d)),
            )
        ),
        F.lit(0),
    )


def n_query_params(url: Column | str) -> Column:
    """Number of non-empty &-separated query parameters (0 when there is
    no query string; 'a?' and a trailing '&' contribute nothing — a
    naive size(split(...)) would count those empty segments as phantom
    parameters and wrongly refuse URLs one param under the limit)."""
    col = F.col(url) if isinstance(url, str) else url
    nofrag = _no_fragment(col)
    return F.when(
        nofrag.contains("?"),
        F.size(
            F.filter(
                F.split(F.split(nofrag, "[?]").getItem(1), "&"), lambda p: p != ""
            )
        ),
    ).otherwise(F.lit(0)).cast("int")


def trap_reason(url: Column | str, n_params: Column | None = None) -> Column:
    """First-failing trap rule for the URL, NULL when the URL is fine.

    ``n_params`` overrides the URL-derived parameter count (the driver
    query's fixture synthesizes it as a separate column)."""
    if n_params is None:
        n_params = n_query_params(url)
    segs = path_segments(url)
    return (
        F.when(F.size(segs) >= TRAP_MAX_DEPTH, F.lit("too_deep"))
        .when(max_segment_repeat(url) >= TRAP_MAX_REPEAT, F.lit("repeated_segment"))
        .when(n_params >= TRAP_MAX_PARAMS, F.lit("param_explosion"))
        .otherwise(F.lit(None).cast("string"))
    )
