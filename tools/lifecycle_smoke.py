"""Long-drain lifecycle smoke: 10^3 micro-batch commits against the
SnapshotParquetStore with the engine's compact+expire cadence.

What 10^3 batches surfaces that the 60-batch test cannot: manifest-size
growth (each delta commit appends a file-group entry until compaction),
HEAD-chain walk cost (history() is O(snapshots) until expiration rewires
the root), and on-disk dir/file growth (one snapshot dir per batch until
expire_snapshots reclaims them). The smoke asserts all three stay
BOUNDED and that a mid-lifecycle kill/resume (fresh store object over
the same root) picks up exactly where the old one stopped.

Cadence (mirrors a production drain loop):
- every batch: 1 full-table rewrite (source_state) + 2 delta appends
  (url_seen, crawl_log) — the engine's real commit shape;
- every COMPACT_EVERY batches: compact both delta tables;
- every EXPIRE_EVERY batches: expire_snapshots(keep_last=KEEP_LAST).

Run:  python tools/lifecycle_smoke.py [n_batches]
Writes BENCH/lifecycle_1e3.json; asserts print FAIL and exit non-zero.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

COMPACT_EVERY = 50
EXPIRE_EVERY = 100
KEEP_LAST = 20
ROWS_PER_BATCH = 100


def count_fs(root: str) -> tuple[int, int]:
    dirs = files = 0
    for _, dnames, fnames in os.walk(root):
        dirs += len(dnames)
        files += len(fnames)
    return dirs, files


def _window_stats(batches: int, lat: list, root: str, store) -> dict:
    """Latency percentiles over the trailing window plus on-disk/manifest
    footprint; index-safe for windows smaller than 100 commits."""
    w = sorted(lat[-100:])
    dirs, files = count_fs(root)
    man = store.head()
    return {
        "batches": batches,
        "commit_p50_ms": round(w[len(w) // 2] * 1000, 1),
        "commit_p99_ms": round(w[max(0, math.ceil(len(w) * 0.99) - 1)] * 1000, 1),
        "dirs": dirs,
        "files": files,
        "manifest_bytes": len(man.to_json()),
        "url_seen_file_groups": len(man.tables["url_seen"]["files"]),
    }


def run(n_batches: int) -> dict:
    from crawler_spark.session import get_spark
    from crawler_spark.state import SnapshotParquetStore

    spark = get_spark("lifecycle_smoke", cores=8, shuffle_partitions=8)
    root = tempfile.mkdtemp(prefix="lifecycle_")
    store = SnapshotParquetStore(spark, root)

    def batch_tables(b: int):
        base = spark.range(ROWS_PER_BATCH).select(
            (F.col("id") + b * ROWS_PER_BATCH).alias("id")
        )
        full = {
            "source_state": base.select(
                F.concat(F.lit("https://s"), (F.col("id") % 50).cast("string")).alias("source_url"),
                (F.col("id") % 7).cast("int").alias("pages_crawled"),
            ).coalesce(1)
        }
        delta = {
            "url_seen": base.select(
                F.concat(F.lit("https://h/p/"), F.col("id").cast("string")).alias("url"),
                F.xxhash64(F.col("id").cast("string")).alias("url_hash"),
                F.lit(b).alias("batch_id"),
            ).coalesce(1),
            "crawl_log": base.select(
                F.concat(F.lit("https://h/p/"), F.col("id").cast("string")).alias("url"),
                F.lit(b).alias("batch_id"),
                (F.col("id") % 3 != 0).alias("ok"),
            ).coalesce(1),
        }
        return full, delta

    lat: list[float] = []
    windows: list[dict] = []
    resumed_at = None
    expected_rows = 0
    t_all = time.monotonic()
    b = 0
    for i in range(n_batches):
        head = store.head()
        b = (head.batch_id + 1) if head else 1
        full, delta = batch_tables(b)
        t0 = time.monotonic()
        store.commit(b, full, delta, metrics={"i": i})
        lat.append(time.monotonic() - t0)
        expected_rows += ROWS_PER_BATCH

        if (i + 1) % COMPACT_EVERY == 0:
            store.compact("url_seen", n_files=1)
            store.compact("crawl_log", n_files=1)
        if (i + 1) % EXPIRE_EVERY == 0:
            store.expire_snapshots(keep_last=KEEP_LAST)

        if (i + 1) == n_batches // 2:
            # mid-lifecycle kill/resume: a FRESH store over the same root
            # must see the identical HEAD (the old object is dropped cold)
            old_head = store.head()
            store = SnapshotParquetStore(spark, root)
            assert store.head().snapshot_id == old_head.snapshot_id
            assert store.head().batch_id == old_head.batch_id
            resumed_at = i + 1

        if (i + 1) % 100 == 0:
            windows.append(_window_stats(i + 1, lat, root, store))
            print(json.dumps(windows[-1]), flush=True)

    total_sec = time.monotonic() - t_all

    if not windows:
        # n_batches < 100: record a single whole-run window so the
        # invariants below have data instead of IndexError-ing
        windows.append(_window_stats(n_batches, lat, root, store))
        print(json.dumps(windows[-1]), flush=True)

    # ---- invariants ----
    errors: list[str] = []
    head = store.head()
    rows = store.read("url_seen").count()
    if rows != expected_rows:
        errors.append(f"url_seen rows {rows} != expected {expected_rows}")
    log_rows = store.read("crawl_log").count()
    if log_rows != expected_rows:
        errors.append(f"crawl_log rows {log_rows} != expected {expected_rows}")
    if len(store.history()) > KEEP_LAST + EXPIRE_EVERY // COMPACT_EVERY + EXPIRE_EVERY + 2:
        errors.append(f"history length unbounded: {len(store.history())}")
    dirs, files = count_fs(root)
    # bound: kept window's snapshot dirs + delta dirs since last compact.
    # Each batch makes 1 snapshot dir with <=3 table subdirs; expire keeps
    # <= EXPIRE_EVERY+KEEP_LAST snapshots worth of dirs between runs.
    max_dirs = (EXPIRE_EVERY + KEEP_LAST + 4) * 4
    if dirs > max_dirs:
        errors.append(f"dir count {dirs} > bound {max_dirs}")
    first_w, last_w = windows[0], windows[-1]
    if last_w["manifest_bytes"] > 4 * first_w["manifest_bytes"]:
        errors.append(
            f"manifest growth {first_w['manifest_bytes']}B -> {last_w['manifest_bytes']}B"
        )
    if last_w["commit_p50_ms"] > 3 * first_w["commit_p50_ms"] + 200:
        errors.append(
            f"commit latency drift p50 {first_w['commit_p50_ms']} -> {last_w['commit_p50_ms']} ms"
        )
    # file-group count right after an expire (n_batches % EXPIRE_EVERY == 0
    # path) is <= batches-since-last-compaction + 1
    if last_w["url_seen_file_groups"] > COMPACT_EVERY + 2:
        errors.append(f"url_seen file groups {last_w['url_seen_file_groups']}")

    report = {
        "n_batches": n_batches,
        "rows_per_batch": ROWS_PER_BATCH,
        "compact_every": COMPACT_EVERY,
        "expire_every": EXPIRE_EVERY,
        "keep_last": KEEP_LAST,
        "resumed_mid_lifecycle_at": resumed_at,
        "total_sec": round(total_sec, 1),
        "commits_per_sec": round(n_batches / total_sec, 2),
        "final_head_batch": head.batch_id,
        "final_history_len": len(store.history()),
        "final_dirs": dirs,
        "final_files": files,
        "windows": windows,
        "errors": errors,
        "ok": not errors,
    }
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()
    return report


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    if n < 1:
        sys.exit("n_batches must be >= 1")
    report = run(n)
    # the canonical 10^3 evidence file only for the canonical run size —
    # a quick small-n smoke must not clobber the recorded 1000-batch report
    name = "lifecycle_1e3.json" if n == 1000 else f"lifecycle_{n}.json"
    out = os.path.join(REPO, "BENCH", name)
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: v for k, v in report.items() if k != "windows"}, indent=1))
    if not report["ok"]:
        print("FAIL", report["errors"])
        sys.exit(1)
    print("LIFECYCLE SMOKE OK")


if __name__ == "__main__":
    main()
