"""Cuckoo-filter URL-seen prefilter: no false negatives, low fpp, and —
the reason it exists next to Bloom — true deletion."""

import numpy as np
import pytest

from crawler_spark.operators.cuckoo import (
    BUCKET_SLOTS,
    _build_table,
    _delete_from_table,
    _probe_table,
    build_cuckoo,
    cuckoo_prefilter,
    delete_from_cuckoo,
)

N_PARTS = 8


def _urls(lo, hi):
    return [(f"https://h{i % 50}.example.org/p/{i}",) for i in range(lo, hi)]


# --- numpy core ---


def _keys(n, seed):
    rng = np.random.default_rng(seed)
    h = rng.integers(-(2**63), 2**63 - 1, size=n, dtype=np.int64)
    fp = rng.integers(1, 65536, size=n, dtype=np.int64)
    return h, fp


def test_core_no_false_negatives_and_low_fpp():
    h, fp = _keys(3000, 1)
    table = _build_table(h, fp, 1024)  # load ~0.73
    assert _probe_table(table, h, fp).all()
    h2, fp2 = _keys(20000, 2)
    fpp = _probe_table(table, h2, fp2).mean()
    assert fpp < 0.01, fpp


def test_core_overflow_raises():
    h, fp = _keys(3000, 3)
    with pytest.raises(ValueError, match="over capacity"):
        _build_table(h, fp, 256)  # load ~2.9: must refuse, not corrupt


def test_core_delete_removes_without_harming_others():
    h, fp = _keys(2000, 4)
    table = _build_table(h, fp, 1024)
    removed = _delete_from_table(table, h[:500], fp[:500])
    assert removed == 500
    # remaining keys: still zero false negatives (a colliding twin's copy
    # survives any shared-fingerprint delete)
    assert _probe_table(table, h[500:], fp[500:]).all()
    # deleted keys mostly gone (only fp+bucket collisions may linger)
    assert _probe_table(table, h[:500], fp[:500]).mean() < 0.05


# --- DataFrame surface (partitioned blobs, cogrouped probe/delete) ---


def test_prefilter_tags_seen_and_unseen(spark):
    seen = spark.createDataFrame(_urls(0, 2000), "url string")
    cands = spark.createDataFrame(_urls(1000, 4000), "url string")
    blobs = build_cuckoo(seen, n_parts=N_PARTS)
    assert blobs.count() == N_PARTS
    tagged = {r.url: r.maybe_seen for r in cuckoo_prefilter(cands, blobs, n_parts=N_PARTS).collect()}
    seen_urls = {u for (u,) in _urls(1000, 2000)}
    for u, maybe in tagged.items():
        if u in seen_urls:
            assert maybe, f"false negative: {u}"
    fpp = np.mean([tagged[u] for (u,) in _urls(2000, 4000)])
    assert fpp < 0.01, fpp


def test_delete_from_cuckoo_evicts_a_sources_urls(spark):
    seen = spark.createDataFrame(_urls(0, 2000), "url string")
    blobs = build_cuckoo(seen, n_parts=N_PARTS)
    victims = spark.createDataFrame(_urls(0, 300), "url string")
    updated = delete_from_cuckoo(blobs, victims, n_parts=N_PARTS)
    assert updated.count() == N_PARTS  # untouched partitions pass through

    probe = spark.createDataFrame(_urls(0, 2000), "url string")
    tagged = {r.url: r.maybe_seen for r in cuckoo_prefilter(probe, updated, n_parts=N_PARTS).collect()}
    survivors = [tagged[u] for (u,) in _urls(300, 2000)]
    assert all(survivors), "deletion created a false negative"
    evicted = np.mean([tagged[u] for (u,) in _urls(0, 300)])
    assert evicted < 0.05, evicted


def test_deleted_source_urls_become_schedulable_again(spark):
    """The operational story behind cuckoo deletion: delete_source evicts
    a source's URLs from the seen prefilter AND the exact seen table, and
    the next schedule_batch offers them again — no prefilter rebuild."""
    from pyspark.sql import functions as F

    from crawler_spark.operators.scheduler import schedule_batch

    all_urls = _urls(0, 400)
    seen = spark.createDataFrame(all_urls, "url string")
    blobs = build_cuckoo(seen, n_parts=N_PARTS)
    frontier = (
        spark.createDataFrame(
            [(u, u.split("/")[2], 0, i) for i, (u,) in enumerate(all_urls)],
            "url string, host string, priority int, seq long",
        ).withColumn("url_hash", F.xxhash64("url"))
    )
    # everything seen: nothing scheduled
    none, _ = schedule_batch(
        frontier, seen=seen, bloom=blobs, default_k=100,
        n_bloom_parts=N_PARTS, seen_filter="cuckoo",
    )
    assert none.count() == 0

    # delete_source semantics: drop source's URLs from seen + evict blobs
    victims = spark.createDataFrame(_urls(0, 100), "url string")
    seen_after = seen.join(victims, "url", "left_anti")
    blobs_after = delete_from_cuckoo(blobs, victims, n_parts=N_PARTS)
    again, _ = schedule_batch(
        frontier, seen=seen_after, bloom=blobs_after, default_k=100,
        n_bloom_parts=N_PARTS, seen_filter="cuckoo",
    )
    rescheduled = {r.url for r in again.collect()}
    assert rescheduled == {u for (u,) in _urls(0, 100)}
