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


# --- zone-map pruning (manifest min/max stats -> file skipping) ---


def _seq_delta(spark, store, batch_id, lo, hi):
    rows = [(f"https://h{i}.org/p", i, batch_id) for i in range(lo, hi)]
    df = spark.createDataFrame(rows, "url string, seq long, batch_id long")
    store.commit(batch_id=batch_id, full_tables={}, delta_tables={"crawl_log": df})


def test_zone_map_prunes_to_single_file_group(spark, tmp_path):
    store = SnapshotParquetStore(spark, str(tmp_path / "z1"))
    for b in range(8):
        _seq_delta(spark, store, b, b * 100, b * 100 + 100)
    head = store.head()
    entry = head.tables["crawl_log"]
    assert len(entry["files"]) == 8
    # every file group carries harvested footer stats for the scalar cols
    for rel in entry["files"]:
        st = entry["stats"][rel]
        assert "seq" in st and "url" in st and "batch_id" in st

    # point range inside batch 3's [300, 400) touches exactly one group
    kept = store.pruned_files("crawl_log", "seq", 350, 360)
    assert len(kept) == 1 and "v000004" in kept[0]

    got = sorted(r.seq for r in store.read_pruned("crawl_log", "seq", 350, 360).collect())
    want = sorted(
        r.seq for r in store.read("crawl_log").filter("seq between 350 and 360").collect()
    )
    assert got == want == list(range(350, 361))

    # boundary-spanning range keeps both adjacent groups, no more
    assert len(store.pruned_files("crawl_log", "seq", 195, 205)) == 2
    # out-of-range probe proves the no-match contract
    assert store.pruned_files("crawl_log", "seq", 10_000, 10_001) == []
    assert store.read_pruned("crawl_log", "seq", 10_000, 10_001) is None


def test_zone_map_string_and_missing_stats_are_conservative(spark, tmp_path):
    store = SnapshotParquetStore(spark, str(tmp_path / "z2"))
    _seq_delta(spark, store, 0, 0, 10)
    # string zone maps work too (url min/max recorded)
    kept = store.pruned_files("crawl_log", "url", "https://h0.org/p", "https://h1.org/p")
    assert kept == store.head().tables["crawl_log"]["files"]
    # a column with no recorded stats keeps every group (conservative)
    assert (
        store.pruned_files("crawl_log", "no_such_col", 0, 1)
        == store.head().tables["crawl_log"]["files"]
    )


def test_zone_map_survives_compaction(spark, tmp_path):
    store = SnapshotParquetStore(spark, str(tmp_path / "z3"))
    for b in range(6):
        _seq_delta(spark, store, b, b * 10, b * 10 + 10)
    store.compact("crawl_log")
    entry = store.head().tables["crawl_log"]
    assert len(entry["files"]) == 1
    # the compacted group's stats span the whole range, so pruning still
    # answers correctly (one group kept, rows filtered by the residual)
    assert store.pruned_files("crawl_log", "seq", 25, 26) == entry["files"]
    got = sorted(r.seq for r in store.read_pruned("crawl_log", "seq", 25, 26).collect())
    assert got == [25, 26]
    # appends after compaction get their own stats and prune again
    _seq_delta(spark, store, 100, 1000, 1010)
    assert len(store.pruned_files("crawl_log", "seq", 1005, 1006)) == 1


# --- snapshot expiration (retention) ---


def test_expire_snapshots_keeps_referenced_delta_dirs(spark, tmp_path):
    """Old snapshot dirs referenced by kept delta manifests must survive
    expiration; unreferenced ones are reclaimed; reads are unchanged."""
    store = SnapshotParquetStore(spark, str(tmp_path / "e1"))
    for b in range(10):
        _delta(spark, store, b, [(f"https://s{b}.org", b)])
    before = _rows(store)

    out = store.expire_snapshots(keep_last=3)
    assert out["kept"] == 3
    # every delta dir is referenced by HEAD's file list -> NOTHING deletable
    assert out["deleted_dirs"] == []
    assert _rows(store) == before
    # history is truncated to the kept window
    hist = store.history()
    assert len(hist) == 3 and hist[0].parent_id is None


def test_expire_after_compaction_reclaims_old_dirs(spark, tmp_path):
    store = SnapshotParquetStore(spark, str(tmp_path / "e2"))
    for b in range(10):
        _delta(spark, store, b, [(f"https://s{b}.org", b)])
    before = _rows(store)
    store.compact("deleted_sources")  # one coalesced file set at HEAD

    out = store.expire_snapshots(keep_last=1)
    # the compaction snapshot holds ALL rows itself, so none of the 10
    # pre-compaction delta dirs is referenced: all reclaimed
    assert len(out["deleted_dirs"]) == 10
    assert _rows(store) == before
    assert len(store.history()) == 1
    # further commits work on the expired store
    _delta(spark, store, 99, [("https://s99.org", 99)])
    assert ("https://s99.org", 99) in _rows(store)


def test_zone_map_poisons_columns_with_statless_row_groups(tmp_path):
    """If ANY row group lacks min/max for a column, the whole directory's
    zone map must drop that column (absent stats = never prune), else
    read_pruned can discard files that contain matching rows."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from crawler_spark.state import _dir_meta

    d = tmp_path / "zm"
    d.mkdir()
    t1 = pa.table({"k": pa.array([100, 200], pa.int64()), "v": ["a", "b"]})
    t2 = pa.table({"k": pa.array([900, 950], pa.int64()), "v": ["c", "d"]})
    pq.write_table(t1, str(d / "p1.parquet"))
    pq.write_table(t2, str(d / "p2.parquet"), write_statistics=False)
    rows, stats = _dir_meta(str(d))
    assert rows == 4
    # k appears WITH stats in p1 but statless in p2 -> poisoned, so a
    # [850, 950] probe keeps the dir instead of pruning away rows 900/950
    assert "k" not in stats and "v" not in stats

    # fully-statted dirs still produce the merged range
    pq.write_table(t2, str(d / "p2.parquet"))  # rewrite WITH stats
    rows2, stats2 = _dir_meta(str(d))
    assert rows2 == 4 and stats2["k"] == [100, 950]


def test_expire_sweeps_orphan_manifest_tmp_in_kept_dirs(spark, tmp_path):
    """A crash between _atomic_write's tmp write and os.replace leaves
    manifest.json.tmp* inside a KEPT vNNNNNN dir; expire_snapshots must
    reclaim it (not just _tmp_* staging dirs and root HEAD.tmp*)."""
    import os

    store = SnapshotParquetStore(spark, str(tmp_path / "e3"))
    for b in range(3):
        _delta(spark, store, b, [(f"https://s{b}.org", b)])
    head_dir = os.path.join(
        str(tmp_path / "e3"), "snapshots", f"v{store.head().snapshot_id:06d}"
    )
    orphan = os.path.join(head_dir, "manifest.json.tmpdeadbe")
    with open(orphan, "w") as f:
        f.write("{}")
    before = _rows(store)

    out = store.expire_snapshots(keep_last=3)
    assert not os.path.exists(orphan)
    assert any("manifest.json.tmp" in d for d in out["deleted_dirs"])
    # the real manifest and all reads are untouched
    assert _rows(store) == before
    assert len(store.history()) == 3


def test_partitioned_table_commit_read_compact_roundtrip(spark, tmp_path):
    """partition_cols tables write hive bucket dirs, delta commits
    inherit the parent's layout, multi-dir reads union per directory
    (Spark refuses one multi-root partitioned read), and compaction
    preserves the layout with ~one file per bucket."""
    import glob
    import os

    from pyspark.sql import functions as F

    store = SnapshotParquetStore(spark, str(tmp_path / "pc"))

    def _bucketed_rows(lo, hi):
        return spark.range(lo, hi).select(
            F.concat(F.lit("u"), F.col("id")).alias("url"),
            F.pmod("id", F.lit(4)).cast("int").alias("b"),
        )

    store.commit(
        batch_id=1,
        full_tables={},
        delta_tables={"t": _bucketed_rows(0, 100)},
        partition_cols={"t": ["b"]},
    )
    # second delta inherits the layout WITHOUT repeating partition_cols
    store.commit(batch_id=2, full_tables={}, delta_tables={"t": _bucketed_rows(100, 150)})
    entry = store.head().tables["t"]
    assert entry["partition_cols"] == ["b"] and entry["rows"] == 150
    for rel in entry["files"]:
        base = os.path.join(store.root, "snapshots", rel)
        assert glob.glob(os.path.join(base, "b=*")), rel
    df = store.read("t")
    assert df.count() == 150 and "b" in df.columns
    assert df.filter("b = 2").count() == 150 // 4  # partition values survive

    man = store.compact("t", n_files=2)
    entry = man.tables["t"]
    assert len(entry["files"]) == 1 and entry["partition_cols"] == ["b"]
    assert store.read("t").count() == 150
    base = os.path.join(store.root, "snapshots", entry["files"][0])
    # one file per bucket, not n_files * buckets
    assert len(glob.glob(os.path.join(base, "b=*", "*.parquet"))) == 4


def test_read_pruned_partitioned_multi_dir(spark, tmp_path):
    """read_pruned must union per-directory for partitioned tables, like
    read() — one multi-root partitioned read raises
    CONFLICTING_DIRECTORY_STRUCTURES."""
    from pyspark.sql import functions as F

    store = SnapshotParquetStore(spark, str(tmp_path / "rp"))

    def _rows(lo, hi):
        return spark.range(lo, hi).select(
            F.col("id"), F.pmod("id", F.lit(4)).cast("int").alias("b")
        )

    store.commit(1, full_tables={}, delta_tables={"t": _rows(0, 100)},
                 partition_cols={"t": ["b"]})
    store.commit(2, full_tables={}, delta_tables={"t": _rows(100, 200)})
    df = store.read_pruned("t", "id", 50, 149)
    assert df is not None and df.count() == 100
