"""Property tests for the web-scale crawl-ops queries (queries_scale.py).

The driver gate (tools/selfcheck.py) already hash-checks every query
against its DuckDB oracle; these tests pin the SEMANTIC invariants the
hash can't express — rule precedence, the rendezvous minimal-movement
property, HLL accuracy, dominant-anchor tie-breaking — plus the plan
shapes the 100 TB design requires.
"""

import re

import pytest

from crawler_spark.plans.inspect import formatted_plan
from crawler_spark.queries_scale import (
    _HRW_SHARDS,
    q_anchor_agg,
    q_hll_distinct,
    q_host_shards,
    q_recrawl_priority,
    q_trap_detect,
)

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# trap detection
# ---------------------------------------------------------------------------


def test_trap_detect_covers_every_branch_and_precedence(spark):
    rows = {r["doc_id"]: r for r in q_trap_detect(spark, SF).collect()}
    reasons = {r["reason"] for r in rows.values()}
    assert reasons == {"ok", "too_deep", "repeated_segment", "param_explosion"}
    for r in rows.values():
        segs = r["url"].split("/")[3:]
        assert r["depth"] == len(segs)
        mult = max(segs.count(s) for s in set(segs))
        assert r["max_repeat"] == mult
        # first-failing-rule precedence
        if len(segs) >= 10:
            expect = "too_deep"
        elif mult >= 4:
            expect = "repeated_segment"
        elif r["n_params"] >= 8:
            expect = "param_explosion"
        else:
            expect = "ok"
        assert r["reason"] == expect
        assert r["is_trap"] == (expect != "ok")


def test_trap_detect_plan_is_map_only(spark):
    """Per-URL decision — must not shuffle the frontier."""
    plan = formatted_plan(q_trap_detect(spark, SF))
    assert "Exchange" not in plan, plan


# ---------------------------------------------------------------------------
# adaptive recrawl priority
# ---------------------------------------------------------------------------


def test_recrawl_priority_semantics(spark):
    rows = q_recrawl_priority(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_changed"] <= r["n_fetches"]
        assert r["change_rate_milli"] == (1000 * r["n_changed"]) // r["n_fetches"]
        assert r["staleness_sec"] >= 0
        assert r["priority"] == (r["staleness_sec"] * r["change_rate_milli"]) // 1000
    # the most recently fetched page has zero staleness -> zero priority
    freshest = min(rows, key=lambda r: r["staleness_sec"])
    assert freshest["staleness_sec"] == 0 and freshest["priority"] == 0


def test_recrawl_priority_broadcasts_now(spark):
    """The single-row `now` side must broadcast, not shuffle the agg.
    A broadcast-hinted crossJoin plans as BroadcastNestedLoopJoin over a
    BroadcastExchange — assert the exchange and that no SortMergeJoin
    sneaks in."""
    plan = formatted_plan(q_recrawl_priority(spark, SF))
    assert "BroadcastExchange" in plan, plan
    assert "SortMergeJoin" not in plan, plan


# ---------------------------------------------------------------------------
# rendezvous sharding
# ---------------------------------------------------------------------------


def test_host_shards_minimal_movement(spark):
    """HRW's defining property: when shard W is added, a host either
    keeps its shard or moves TO the new shard — never between old
    shards. Movement fraction concentrates around 1/(W+1)."""
    rows = q_host_shards(spark, SF).collect()
    assert len(rows) == 50
    moved = [r for r in rows if r["moved"]]
    for r in rows:
        assert 0 <= r["shard8"] < _HRW_SHARDS
        assert 0 <= r["shard9"] <= _HRW_SHARDS
        if r["moved"]:
            assert r["shard9"] == _HRW_SHARDS  # only ever to the new shard
        else:
            assert r["shard9"] == r["shard8"]
    # E[moved] = 50/9 ~ 5.6; deterministic md5 weights, generous bound
    assert 0 < len(moved) <= 20


def test_host_shards_matches_pure_python_rendezvous(spark):
    import hashlib

    rows = {r["host"]: r for r in q_host_shards(spark, SF).collect()}
    for host, r in rows.items():
        weights = {
            w: hashlib.md5(f"{host}#{w}".encode()).hexdigest() for w in range(_HRW_SHARDS + 1)
        }
        assert r["shard9"] == max(weights, key=weights.get)
        assert r["shard8"] == max((w for w in weights if w < _HRW_SHARDS), key=weights.get)


# ---------------------------------------------------------------------------
# deterministic HyperLogLog
# ---------------------------------------------------------------------------


def test_hll_distinct_accuracy(spark):
    """Raw-estimator regime (n >> m=256): relative error must sit well
    inside the ~1.04/sqrt(m) = 6.5% envelope. Deterministic, so this is
    a behavior pin, not a flaky statistical assertion."""
    rows = q_hll_distinct(spark, SF).collect()
    assert len(rows) == 4
    for r in rows:
        assert r["exact_distinct"] > 256  # past the register count
        assert r["abs_err_milli"] <= 150, r


def test_hll_sketch_shrinks_before_shuffle(spark):
    """The register aggregation must partial-aggregate map-side: the
    plan carries a partial HashAggregate before each exchange, so at
    most m rows per group cross the wire, whatever the input size."""
    plan = formatted_plan(q_hll_distinct(spark, SF))
    assert "HashAggregate" in plan
    # the register max must run as a partial (map-side) aggregate so at
    # most m register rows per group cross the wire, whatever the input
    assert "partial_max(rho" in plan, plan


# ---------------------------------------------------------------------------
# anchor-text aggregation
# ---------------------------------------------------------------------------


def test_anchor_agg_totals_and_tiebreak(spark):
    rows = q_anchor_agg(spark, SF).collect()
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert sum(r["in_degree"] for r in rows) == 3 * n_docs
    for r in rows:
        assert 1 <= r["top_anchor_cnt"] <= r["in_degree"]
        assert r["n_anchors"] <= r["in_degree"]
    # recompute dominant anchor per target in pure python
    edges = {}
    for d in range(n_docs):
        for k in (1, 2, 3):
            dst = (d * 31 + k) % n_docs
            edges.setdefault(dst, []).append(f"a{(d + k) % 20}")
    for r in rows:
        anchors = edges[r["doc_id"]]
        counts = {a: anchors.count(a) for a in set(anchors)}
        best = min(
            (a for a in counts if counts[a] == max(counts.values()))
        )  # max count, min anchor string
        assert r["top_anchor"] == best, (r, counts)
        assert r["top_anchor_cnt"] == counts[best]


def test_anchor_agg_window_partitions_by_target(spark):
    """The dominant-anchor window must partition by dst — a global
    window here would funnel the whole link graph through one task."""
    plan = formatted_plan(q_anchor_agg(spark, SF))
    assert "Window" in plan
    assert re.search(r"Window.*\[dst", plan) or "partitionBy" not in plan, plan
