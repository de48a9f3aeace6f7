"""Web-scale crawl-operations queries (engine-new surface, round 3).

Five operators a production crawler/training-pipeline runs at 100 TB that
the reference (a sequential fetch loop, backend/tasks/config.py:29 caps one
URL in flight) has no analog for:

- crawl-trap detection: URL-shape heuristics (depth, repeated path
  segments, query-param explosion) that keep calendar/loop traps from
  eating the frontier;
- adaptive recrawl priority: Cho & Garcia-Molina-style change-rate
  estimation from fetch history -> staleness-weighted priority;
- rendezvous (HRW) host sharding: coordination-free assignment of hosts
  to fetcher shards with provably minimal movement when a shard is added;
- deterministic HyperLogLog: approximate distinct-URL counting whose
  register math is reproduced bit-for-bit by the DuckDB oracle;
- anchor-text aggregation: per-target in-degree + dominant anchor text,
  the classic indexing signal extracted from the link graph.

Same determinism rules as queries.py: integer fixed-point only (no raw
doubles), md5 as the only cross-engine hash, every column aliased
identically on both sides.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries import _barrier, load

__all__ = ["SCALE_QUERIES", "SCALE_ORACLES"]


# ---------------------------------------------------------------------------
# crawl-trap detection
# ---------------------------------------------------------------------------

_TRAP_MAX_DEPTH = 10  # segments before we call it a trap
_TRAP_MAX_REPEAT = 4  # same segment this many times = loop trap
_TRAP_MAX_PARAMS = 8  # query params before we call it param explosion


def q_trap_detect(spark: SparkSession, sf: str) -> DataFrame:
    """Crawl-trap detection over URL shape (engine-new: the reference
    fetches whatever it is given; at web scale, calendar pages and
    session-id loops generate unbounded URL spaces and the frontier must
    refuse them). Deterministic URLs synthesized from documents: depth
    1..14 path segments drawn from a 5-symbol alphabet (so deep paths
    repeat segments, the /a/b/a/b loop-trap signature) and 0..10 query
    params. First-failing-rule cascade like quality_filter:
    too_deep (>= 10 segments) -> repeated_segment (one segment >= 4
    times) -> param_explosion (>= 8 params) -> ok.

    Scale shape: map-only — pure per-row array functions on the split
    path, no shuffle, no UDF; runs inside the same scan that feeds URL
    canonicalization."""
    docs = load(spark, sf, "documents")
    built = docs.select(
        "doc_id",
        F.concat(
            F.lit("https://h"),
            (F.col("doc_id") % 50).cast("string"),
            F.lit(".example.org/"),
            F.array_join(
                F.expr(
                    "transform(sequence(0, CAST(doc_id % 14 AS INT)),"
                    " k -> concat('s', CAST((doc_id * (k + 3)) % 5 AS STRING)))"
                ),
                "/",
            ),
        ).alias("url"),
        (F.col("doc_id") % 11).cast("int").alias("n_params"),
    )
    # re-derive segments from the URL string itself (what a frontier
    # sees), not from the construction: ['https:', '', host, seg...]
    segs = F.slice(F.split(F.col("url"), "/"), 4, 20)
    max_rep = F.array_max(
        F.expr(
            "transform(array_distinct(slice(split(url, '/'), 4, 20)),"
            " d -> size(filter(slice(split(url, '/'), 4, 20), s -> s = d)))"
        )
    )
    return built.select(
        "doc_id",
        "url",
        F.size(segs).cast("int").alias("depth"),
        max_rep.cast("int").alias("max_repeat"),
        "n_params",
        F.when(F.size(segs) >= _TRAP_MAX_DEPTH, F.lit("too_deep"))
        .when(max_rep >= _TRAP_MAX_REPEAT, F.lit("repeated_segment"))
        .when(F.col("n_params") >= _TRAP_MAX_PARAMS, F.lit("param_explosion"))
        .otherwise(F.lit("ok"))
        .alias("reason"),
    ).withColumn("is_trap", F.col("reason") != "ok")


_TRAP_SQL = f"""
WITH built AS (
  SELECT doc_id,
         'https://h' || CAST(doc_id % 50 AS VARCHAR) || '.example.org/' ||
         array_to_string(list_transform(range(0, CAST(doc_id % 14 AS INT) + 1),
                         k -> 's' || CAST((doc_id * (k + 3)) % 5 AS VARCHAR)),
                         '/') AS url,
         CAST(doc_id % 11 AS INT) AS n_params
  FROM documents
), shaped AS (
  SELECT doc_id, url, n_params,
         string_split(url, '/')[4:] AS segs
  FROM built
), scored AS (
  SELECT doc_id, url,
         CAST(len(segs) AS INT) AS depth,
         CAST(list_max(list_transform(list_distinct(segs),
                       d -> len(list_filter(segs, s -> s = d)))) AS INT) AS max_repeat,
         n_params
  FROM shaped
)
SELECT doc_id, url, depth, max_repeat, n_params,
       CASE WHEN depth >= {_TRAP_MAX_DEPTH} THEN 'too_deep'
            WHEN max_repeat >= {_TRAP_MAX_REPEAT} THEN 'repeated_segment'
            WHEN n_params >= {_TRAP_MAX_PARAMS} THEN 'param_explosion'
            ELSE 'ok' END AS reason,
       CASE WHEN depth >= {_TRAP_MAX_DEPTH} THEN TRUE
            WHEN max_repeat >= {_TRAP_MAX_REPEAT} THEN TRUE
            WHEN n_params >= {_TRAP_MAX_PARAMS} THEN TRUE
            ELSE FALSE END AS is_trap
FROM scored"""


# ---------------------------------------------------------------------------
# adaptive recrawl priority
# ---------------------------------------------------------------------------


def q_recrawl_priority(spark: SparkSession, sf: str) -> DataFrame:
    """Adaptive recrawl scheduling (Cho & Garcia-Molina, "Effective page
    refresh policies": refresh frequency proportional to observed change
    rate x staleness). The events table stands in for fetch history:
    page_id = user_id % 997, one row per past fetch, changed iff
    event_id % 3 = 0 (deterministic stand-in for a content-hash diff).
    change_rate_milli = 1000 * n_changed / n_fetches (integer),
    staleness_sec = now - last fetch (now = max ts over the table),
    priority = staleness_sec * change_rate_milli / 1000 — all integer
    fixed-point so the oracle hash-matches exactly.

    Scale shape: ONE groupBy(page_id) with map-side partial aggregation
    (count/sum/max all combine) + a broadcast single-row join for `now`;
    at 10^10 fetch records this is the canonical partial-agg shuffle,
    no skew key (page_id is near-uniform)."""
    ev = load(spark, sf, "events")
    hist = ev.select(
        (F.col("user_id") % 997).alias("page_id"),
        F.col("ts").cast("timestamp").cast("long").alias("ts_sec"),
        F.when(F.col("event_id") % 3 == 0, F.lit(1)).otherwise(F.lit(0)).alias("chg"),
    )
    agg = hist.groupBy("page_id").agg(
        F.count("*").alias("n_fetches"),
        F.sum("chg").cast("long").alias("n_changed"),
        F.max("ts_sec").alias("last_sec"),
    )
    now = hist.agg(F.max("ts_sec").alias("now_sec"))
    return (
        agg.crossJoin(F.broadcast(now))
        .withColumn("change_rate_milli", F.expr("(1000 * n_changed) DIV n_fetches"))
        .withColumn("staleness_sec", F.expr("now_sec - last_sec"))
        .select(
            "page_id",
            "n_fetches",
            "n_changed",
            "change_rate_milli",
            "staleness_sec",
            F.expr("(staleness_sec * change_rate_milli) DIV 1000").alias("priority"),
        )
    )


_RECRAWL_SQL = """
WITH hist AS (
  SELECT user_id % 997 AS page_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec,
         CASE WHEN event_id % 3 = 0 THEN 1 ELSE 0 END AS chg
  FROM events
), agg AS (
  SELECT page_id, count(*) AS n_fetches, CAST(sum(chg) AS BIGINT) AS n_changed,
         max(ts_sec) AS last_sec
  FROM hist GROUP BY page_id
), now_row AS (SELECT max(ts_sec) AS now_sec FROM hist)
SELECT page_id, n_fetches, n_changed,
       (1000 * n_changed) // n_fetches AS change_rate_milli,
       now_sec - last_sec AS staleness_sec,
       ((now_sec - last_sec) * ((1000 * n_changed) // n_fetches)) // 1000 AS priority
FROM agg, now_row"""


# ---------------------------------------------------------------------------
# rendezvous (highest-random-weight) host sharding
# ---------------------------------------------------------------------------

_HRW_SHARDS = 8  # base shard count; the query also assigns at 9 to show movement


def q_host_shards(spark: SparkSession, sf: str) -> DataFrame:
    """Rendezvous/HRW sharding of hosts to fetcher shards (engine-new:
    the scale path for running MANY politeness schedulers — each host is
    owned by exactly one shard, chosen coordination-free as
    argmax_w md5(host || '#' || w)). The query assigns every host at
    W=8 and W=9 shards; HRW's minimal-movement property means a host
    may move ONLY to the newly added shard 8, which the pytest asserts
    and the `moved` column exposes (expected fraction ~1/9).

    Scale shape: hosts x W is a map-side explode (W is a constant), one
    groupBy(host) max — no join, no skew; at 10^8 hosts this is a single
    partial-agg shuffle."""
    docs = load(spark, sf, "documents")
    hosts = docs.select(
        F.concat(F.lit("h"), (F.col("doc_id") % 50).cast("string"), F.lit(".example.org")).alias(
            "host"
        )
    ).distinct()
    w = _HRW_SHARDS
    weighted = hosts.select(
        "host",
        F.explode(F.expr(f"sequence(0, {w})")).alias("shard"),
    ).withColumn("weight", F.md5(F.concat_ws("#", "host", "shard")))
    agg = weighted.groupBy("host").agg(
        F.max(
            F.struct(
                F.when(F.col("shard") < w, F.col("weight")).otherwise(F.lit("")).alias("wt"),
                F.col("shard").cast("int").alias("s"),
            )
        )["s"].alias("shard8"),
        F.max(F.struct(F.col("weight").alias("wt"), F.col("shard").cast("int").alias("s")))[
            "s"
        ].alias("shard9"),
    )
    return agg.select("host", "shard8", "shard9", (F.col("shard8") != F.col("shard9")).alias("moved"))


_HRW_SQL = f"""
WITH hosts AS (
  SELECT DISTINCT 'h' || CAST(doc_id % 50 AS VARCHAR) || '.example.org' AS host
  FROM documents
), weighted AS (
  SELECT host, shard, md5(host || '#' || CAST(shard AS VARCHAR)) AS weight
  FROM hosts, (SELECT unnest(generate_series(0, {_HRW_SHARDS})) AS shard) ws
), agg AS (
  SELECT host,
         CAST(arg_max(shard, CASE WHEN shard < {_HRW_SHARDS} THEN weight ELSE '' END) AS INT) AS shard8,
         CAST(arg_max(shard, weight) AS INT) AS shard9
  FROM weighted GROUP BY host
)
SELECT host, shard8, shard9, shard8 <> shard9 AS moved FROM agg"""


# ---------------------------------------------------------------------------
# deterministic HyperLogLog distinct-URL counting
# ---------------------------------------------------------------------------

_HLL_P = 8  # 2^8 = 256 registers
_HLL_M = 1 << _HLL_P
# raw-estimator constant alpha ~= 0.709 in integer fixed-point:
# E = alpha * m^2 * 2^53 / S  ->  numer // ((S >> 20) * 1000)
# with numer = 709 * m^2 * 2^33 (exactly representable in int64).
_HLL_NUMER = 709 * _HLL_M * _HLL_M * (1 << 33)


def q_hll_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """Approximate distinct-URL counting via a DETERMINISTIC HyperLogLog
    (Flajolet et al. 2007) — the sketch a 100 TB crawl uses to answer
    "how many distinct URLs per shard/host class" without a
    count(distinct) shuffle of the raw keys. Every step is reproduced
    bit-for-bit by the DuckDB oracle: the 60-bit hash is the first 15
    hex chars of md5(key), bucket = low 8 bits, rho = leading-zero rank
    of the remaining 52 bits via length(bin(w)), and the raw estimator
    runs in integer fixed-point (alpha=0.709), so even the APPROXIMATE
    answer hash-matches exactly. Exact distinct + abs error in milli are
    emitted alongside (accuracy at this size: see test_queries_scale).

    Keys: 20 per document, (doc_id * 7919 + j * 104729) % 2477 — ~2k
    true distinct per group, well past m=256 so the raw estimator is in
    its accurate regime.

    Scale shape: the sketch IS the scale story — groupBy(grp, bucket)
    max(rho) shrinks any input to m rows per group map-side; the exact
    count(distinct) alongside is the small-scale cross-check only."""
    docs = load(spark, sf, "documents")
    rows = docs.select(
        (F.col("doc_id") % 4).alias("grp"),
        F.explode(F.expr("sequence(1, 20)")).alias("j"),
        "doc_id",
    ).select(
        "grp",
        F.concat(
            F.lit("k"), ((F.col("doc_id") * 7919 + F.col("j") * 104729) % 2477).cast("string")
        ).alias("key"),
    )
    hashed = rows.select(
        "grp",
        "key",
        F.conv(F.substring(F.md5("key"), 1, 15), 16, 10).cast("long").alias("v"),
    ).select(
        "grp",
        "key",
        (F.col("v") % _HLL_M).alias("bucket"),
        F.expr(f"v DIV {_HLL_M}").alias("w"),
    )
    regs = (
        hashed.withColumn(
            "rho",
            F.when(F.col("w") > 0, F.lit(53) - F.length(F.bin("w"))).otherwise(F.lit(53)),
        )
        .groupBy("grp", "bucket")
        .agg(F.max("rho").alias("reg"))
    )
    sketch = regs.groupBy("grp").agg(
        (
            F.sum(F.expr("CAST(pow(2, 53 - reg) AS BIGINT)"))
            + (F.lit(_HLL_M) - F.count("*")) * F.lit(1 << 53)
        ).alias("s"),
    )
    exact = hashed.groupBy("grp").agg(F.countDistinct("key").alias("exact_distinct"))
    return (
        sketch.join(exact, "grp")
        .withColumn("hll_estimate", F.expr(f"{_HLL_NUMER} DIV (greatest(s DIV 1048576, 1) * 1000)"))
        .select(
            "grp",
            "exact_distinct",
            "hll_estimate",
            F.expr("(1000 * abs(hll_estimate - exact_distinct)) DIV exact_distinct").alias(
                "abs_err_milli"
            ),
        )
    )


_HLL_SQL = f"""
WITH rows_in AS (
  SELECT doc_id % 4 AS grp,
         'k' || CAST((doc_id * 7919 + j * 104729) % 2477 AS VARCHAR) AS key
  FROM documents, (SELECT unnest(generate_series(1, 20)) AS j) js
), hashed AS (
  SELECT grp, key,
         CAST(concat('0x', substring(md5(key), 1, 15)) AS BIGINT) AS v
  FROM rows_in
), bucketed AS (
  SELECT grp, key, v % {_HLL_M} AS bucket, v // {_HLL_M} AS w FROM hashed
), regs AS (
  SELECT grp, bucket,
         max(CASE WHEN w > 0 THEN 53 - length(bin(w)) ELSE 53 END) AS reg
  FROM bucketed GROUP BY grp, bucket
), sketch AS (
  SELECT grp,
         CAST(sum(CAST(pow(2, 53 - reg) AS BIGINT))
              + ({_HLL_M} - count(*)) * {1 << 53} AS BIGINT) AS s
  FROM regs GROUP BY grp
), exact AS (
  SELECT grp, count(DISTINCT key) AS exact_distinct FROM bucketed GROUP BY grp
)
SELECT sketch.grp, exact_distinct,
       {_HLL_NUMER} // (greatest(s // 1048576, 1) * 1000) AS hll_estimate,
       (1000 * abs({_HLL_NUMER} // (greatest(s // 1048576, 1) * 1000) - exact_distinct))
         // exact_distinct AS abs_err_milli
FROM sketch JOIN exact ON sketch.grp = exact.grp"""


# ---------------------------------------------------------------------------
# anchor-text aggregation
# ---------------------------------------------------------------------------

_ANCHOR_OUT_DEG = 3


def q_anchor_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Anchor-text aggregation over the link graph (the classic indexing
    signal: what do OTHER pages call this page?). Deterministic edge set
    shared with q_link_rank (dst = (src*31+k) % n, k=1..3) carrying an
    anchor label 'a'||((src+k)%20). Per target: in-degree, distinct
    anchor count, and the DOMINANT anchor (highest count, ties broken by
    anchor string — deterministic).

    Scale shape: one groupBy(dst, anchor) with map-side combine collapses
    the edge list to at most 20 rows per target BEFORE the per-target
    window; the window then partitions by dst (no global sort). The
    (dst, anchor) aggregate is persisted once and feeds both the window
    and the per-target rollup."""
    docs = load(spark, sf, "documents")
    n = docs.count()
    edges = docs.select(
        F.col("doc_id").alias("src"),
        F.explode(
            F.expr(
                f"transform(sequence(1, {_ANCHOR_OUT_DEG}),"
                f" k -> named_struct('dst', CAST((doc_id * 31 + k) % {n} AS BIGINT),"
                f" 'anchor', concat('a', CAST((doc_id + k) % 20 AS STRING))))"
            )
        ).alias("e"),
    ).select(F.col("e.dst").alias("dst"), F.col("e.anchor").alias("anchor"))
    per_anchor = _barrier(edges.groupBy("dst", "anchor").agg(F.count("*").alias("cnt")))
    win = Window.partitionBy("dst").orderBy(F.desc("cnt"), F.asc("anchor"))
    top = (
        per_anchor.withColumn("rk", F.row_number().over(win))
        .filter(F.col("rk") == 1)
        .select("dst", F.col("anchor").alias("top_anchor"), F.col("cnt").alias("top_anchor_cnt"))
    )
    roll = per_anchor.groupBy("dst").agg(
        F.sum("cnt").alias("in_degree"), F.count("*").alias("n_anchors")
    )
    return roll.join(top, "dst").select(
        F.col("dst").alias("doc_id"), "in_degree", "n_anchors", "top_anchor", "top_anchor_cnt"
    )


_ANCHOR_SQL = f"""
WITH n_docs AS (SELECT count(*) AS n FROM documents),
edges AS (
  SELECT (doc_id * 31 + k) % (SELECT n FROM n_docs) AS dst,
         'a' || CAST((doc_id + k) % 20 AS VARCHAR) AS anchor
  FROM documents, (SELECT unnest([1, 2, 3]) AS k) ks
), per_anchor AS (
  SELECT dst, anchor, count(*) AS cnt FROM edges GROUP BY dst, anchor
), top AS (
  SELECT dst, anchor AS top_anchor, cnt AS top_anchor_cnt,
         row_number() OVER (PARTITION BY dst ORDER BY cnt DESC, anchor ASC) AS rk
  FROM per_anchor QUALIFY rk = 1
), roll AS (
  SELECT dst, CAST(sum(cnt) AS BIGINT) AS in_degree, count(*) AS n_anchors
  FROM per_anchor GROUP BY dst
)
SELECT roll.dst AS doc_id, in_degree, n_anchors, top_anchor, top_anchor_cnt
FROM roll JOIN top ON roll.dst = top.dst"""


SCALE_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "trap_detect": q_trap_detect,
    "recrawl_priority": q_recrawl_priority,
    "host_shards": q_host_shards,
    "hll_distinct": q_hll_distinct,
    "anchor_agg": q_anchor_agg,
}

SCALE_ORACLES: dict[str, str] = {
    "trap_detect": _TRAP_SQL,
    "recrawl_priority": _RECRAWL_SQL,
    "host_shards": _HRW_SQL,
    "hll_distinct": _HLL_SQL,
    "anchor_agg": _ANCHOR_SQL,
}
