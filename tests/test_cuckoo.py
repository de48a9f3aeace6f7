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


# --- incremental insert ---


def test_core_compact_then_place_handles_deletion_holes():
    """Placement indexes slots by occupancy count, which is only sound on
    left-packed rows; a delete can zero a MIDDLE slot. Compaction must
    restore the invariant so inserts never overwrite live fingerprints."""
    from crawler_spark.operators.cuckoo import _compact_rows, _place_keys

    h, fp = _keys(600, 11)
    table = _build_table(h, fp, 256)
    # delete a third of the keys -> holes at arbitrary slot positions
    _delete_from_table(table, h[::3], fp[::3])
    _compact_rows(table)
    for row in table:
        nz = np.flatnonzero(row == 0)
        assert len(nz) == 0 or nz[0] + len(nz) == BUCKET_SLOTS  # zeros only at the tail
    occ = (table != 0).astype(np.int64).sum(axis=1)
    h2, fp2 = _keys(400, 12)
    _place_keys(table, occ, h2, fp2, table.shape[0])
    # every surviving old key and every new key still probes positive
    keep = np.ones(len(h), dtype=bool)
    keep[::3] = False
    assert _probe_table(table, h[keep], fp[keep]).all()
    assert _probe_table(table, h2, fp2).all()


def test_insert_into_cuckoo_matches_full_build_membership(spark):
    """insert(build(A), B) has no false negatives over A|B and keeps the
    same fpp class as build(A|B) — the incremental path loses nothing a
    membership probe can observe."""
    from crawler_spark.operators.cuckoo import insert_into_cuckoo

    a = spark.createDataFrame(_urls(0, 1500), "url string")
    b = spark.createDataFrame(_urls(1500, 3000), "url string")
    base = build_cuckoo(a, n_parts=N_PARTS, n_buckets=1024)
    incr = insert_into_cuckoo(base, b, n_parts=N_PARTS)
    both = a.unionByName(b)
    tagged = cuckoo_prefilter(both, incr, n_parts=N_PARTS)
    assert all(r.maybe_seen for r in tagged.collect())
    fresh = spark.createDataFrame(_urls(50_000, 53_000), "url string")
    fp = sum(1 for r in cuckoo_prefilter(fresh, incr, n_parts=N_PARTS).collect() if r.maybe_seen)
    assert fp / 3000 < 0.01


def test_insert_after_delete_reuses_slots(spark):
    """delete_source then keep crawling: evicted slots are reusable, the
    re-inserted URLs probe positive, untouched keys unharmed."""
    from crawler_spark.operators.cuckoo import cuckoo_load, insert_into_cuckoo

    keep = spark.createDataFrame(_urls(0, 1000), "url string")
    gone = spark.createDataFrame(_urls(1000, 2000), "url string")
    filt = build_cuckoo(keep.unionByName(gone), n_parts=N_PARTS, n_buckets=1024)
    used0 = {r.cuckoo_part: r.slots_used for r in cuckoo_load(filt).collect()}
    filt = delete_from_cuckoo(filt, gone, n_parts=N_PARTS)
    used1 = {r.cuckoo_part: r.slots_used for r in cuckoo_load(filt).collect()}
    assert sum(used1.values()) < sum(used0.values())
    newer = spark.createDataFrame(_urls(3000, 4000), "url string")
    filt = insert_into_cuckoo(filt, newer, n_parts=N_PARTS)
    tagged = cuckoo_prefilter(keep.unionByName(newer), filt, n_parts=N_PARTS)
    assert all(r.maybe_seen for r in tagged.collect())


def test_insert_into_empty_cuckoo_requires_geometry(spark):
    from crawler_spark.operators.cuckoo import insert_into_cuckoo

    empty = build_cuckoo(
        spark.createDataFrame([], "url string"), n_parts=N_PARTS, n_buckets=256
    )
    b = spark.createDataFrame(_urls(0, 100), "url string")
    with pytest.raises(ValueError, match="empty cuckoo"):
        insert_into_cuckoo(empty, b, n_parts=N_PARTS)
    # explicit geometry works on a rows-less table
    filt = insert_into_cuckoo(empty, b, n_parts=N_PARTS, n_buckets=256)
    tagged = cuckoo_prefilter(b, filt, n_parts=N_PARTS)
    assert all(r.maybe_seen for r in tagged.collect())
