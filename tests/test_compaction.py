"""Snapshot compaction: delta-table file growth is bounded, reads are
byte-identical across a compaction, lineage survives, and later appends
build on the compacted file set."""

from crawler_spark import schemas
from crawler_spark.state import SnapshotParquetStore


def _delta(spark, store, batch_id, rows):
    df = spark.createDataFrame(rows, "source_url string, batch_id long")
    store.commit(batch_id=batch_id, full_tables={}, delta_tables={"deleted_sources": df})


def _rows(store):
    df = store.read("deleted_sources")
    return sorted((r.source_url, r.batch_id) for r in df.collect())


def test_compact_rewrites_files_and_preserves_rows(spark, tmp_path):
    store = SnapshotParquetStore(spark, str(tmp_path / "c1"))
    store.commit(
        batch_id=0,
        full_tables={},
        delta_tables={
            "deleted_sources": spark.createDataFrame([], schemas.DELETED_SOURCES)
        },
    )
    for b in range(1, 13):
        _delta(spark, store, b, [(f"https://s{b}.org", b)])
    before = _rows(store)
    head = store.head()
    assert len(head.tables["deleted_sources"]["files"]) == 12

    man = store.compact("deleted_sources")
    assert len(man.tables["deleted_sources"]["files"]) == 1
    assert man.tables["deleted_sources"]["rows"] == 12
    assert _rows(store) == before  # byte-identical read-back

    # lineage: compaction is a normal child snapshot; time travel to the
    # pre-compaction snapshot still reads the original files
    assert man.parent_id == head.snapshot_id
    old = store.read("deleted_sources", snapshot_id=head.snapshot_id)
    assert sorted((r.source_url, r.batch_id) for r in old.collect()) == before

    # later appends build on the compacted set
    _delta(spark, store, man.batch_id + 1, [("https://extra.org", 99)])
    entry = store.head().tables["deleted_sources"]
    assert len(entry["files"]) == 2
    assert entry["rows"] == 13
    assert len(_rows(store)) == 13


def test_long_drain_with_periodic_compaction_bounds_file_count(spark, tmp_path):
    """Smoke for the 10^4-batch concern: compacting every K batches keeps
    the per-table file count <= K+1 at all times (one compacted file plus
    at most K fresh deltas)."""
    store = SnapshotParquetStore(spark, str(tmp_path / "c2"))
    store.commit(
        batch_id=0,
        full_tables={},
        delta_tables={
            "deleted_sources": spark.createDataFrame([], schemas.DELETED_SOURCES)
        },
    )
    K = 15
    batch = 0
    max_files = 0
    for i in range(1, 61):
        batch = store.head().batch_id + 1
        _delta(spark, store, batch, [(f"https://s{i}.org", i)])
        n = len(store.head().tables["deleted_sources"]["files"])
        max_files = max(max_files, n)
        if i % K == 0:
            store.compact("deleted_sources")
            assert len(store.head().tables["deleted_sources"]["files"]) == 1
    assert max_files <= K + 1
    assert len(_rows(store)) == 60
