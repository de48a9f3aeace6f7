"""Micro-batched large-frontier drain with ACCUMULATING URL-seen state —
the shape a 10^10-URL crawl actually runs in, and the bounded-memory
counterpart of the single-shot scale points (BENCH/scale_1e8*.json).

Each batch drains a [i*B, (i+1)*B) window of the deterministic Zipf
frontier (bench.make_frontier with dup_back=B: every 5th row
re-discovers a batch-0-family URL, so the accumulated seen state faces
persistent nav-link-like re-discovery pressure). After a batch, its
scheduled URLs are appended to a parquet seen table and OR-ed into the
partitioned Bloom filter via update_bloom — per-batch state-maintenance
cost tracks the BATCH, not the total seen count, which is exactly what
a 10^10 frontier needs (a per-batch full rebuild would be quadratic).

Peak memory is one batch's caches + the (fixed-width) Bloom blobs; the
frontier is never materialized whole. Per-batch throughput flat across
batches = the scale evidence.

Usage:
    python tools/scale_frontier_loop.py [batch_rows] [n_batches] \
        [--out BENCH/scale_1e9_loop.json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    batch_rows = int(float(args[0])) if args else 100_000_000
    n_batches = int(args[1]) if len(args) > 1 else 10
    out_path = None
    for i, a in enumerate(sys.argv):
        if a == "--out" and i + 1 < len(sys.argv):
            out_path = sys.argv[i + 1]

    from pyspark import StorageLevel
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    import bench
    from crawler_spark.operators.bloom import bloom_fill, build_bloom, update_bloom
    from crawler_spark.operators.politeness import broadcast_robots, host_quotas
    from crawler_spark.operators.scheduler import (
        drain_ordered,
        release_barrier,
        schedule_batch,
    )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    shuffle_parts = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTS", "256"))
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "100g")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("scale_frontier_loop")
        .config("spark.driver.memory", driver_mem)
        .config("spark.sql.shuffle.partitions", str(shuffle_parts))
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    sc = spark.sparkContext

    seen_dir = os.environ.get("SPARK_GRAFT_SEEN_DIR", "/tmp/scale_loop_seen")
    shutil.rmtree(seen_dir, ignore_errors=True)

    # Bloom sized ONCE for the whole run's expected seen count (~10% of
    # the frontier gets scheduled -> seen): capacity_keys * BITS_PER_KEY
    # bits, power-of-two per part. 2^26 bits/part * 64 parts = 537 MB —
    # past the broadcast ceiling, so the prefilter runs the cogroup path,
    # the only one that exists at 10^10 (total filter ~15 GiB there).
    capacity = int(batch_rows * n_batches * 0.15)
    from crawler_spark.operators.bloom import BITS_PER_KEY

    n_parts = 64
    need = max(1 << 13, capacity * BITS_PER_KEY // n_parts)
    m_bits = 1 << (need - 1).bit_length()

    robots_rows = [
        (f"h{i}.example.org", ["/private", "/login"], 100 if i % 2 else 0)
        for i in range(50)
    ]
    robots_df = spark.createDataFrame(
        robots_rows, "host string, disallow_prefixes array<string>, crawl_delay_ms int"
    )
    robots_b = broadcast_robots(spark, robots_df)
    quotas = host_quotas(spark, robots_b, default_k=1000)

    # The Bloom filter is a STATE TABLE, not a cached plan: each batch's
    # update is written to parquet and read back, cutting lineage at the
    # batch boundary exactly like the engine's snapshot store does. A
    # persist()-chained bloom keeps every prior batch's cogroup in its
    # plan — one dropped cache block and "incremental" silently recomputes
    # the whole history (observed as 32-task frontier-regeneration stages
    # inside the state step, state_sec 28 -> 136 -> 430 s).
    bloom_root = seen_dir + "_bloom"
    shutil.rmtree(bloom_root, ignore_errors=True)
    empty_seen = spark.createDataFrame([], "url string")
    # batch 0's bloom is a 0-row local relation (a 0-row parquet write has
    # no schema to read back); the round-trip starts with batch 0's update
    bloom = build_bloom(empty_seen, n_parts=n_parts, m_bits_per_part=m_bits)

    # untimed warm-up (JIT + python worker pool), tiny and state-free
    warm = bench.make_frontier(spark, 100_000).persist()
    warm.count()
    ws, wb = schedule_batch(
        warm, seen=empty_seen, bloom=bloom, robots_bcast=robots_b, quotas=quotas,
        default_k=1000, salt_span=250, max_quota=1000, n_bloom_parts=n_parts,
    )
    drain_ordered(ws, n_buckets=sc.defaultParallelism * 4).count()
    release_barrier(wb)
    warm.unpersist()

    batches = []
    seen_total = 0
    t_run0 = time.monotonic()
    for i in range(n_batches):
        tg = time.monotonic()
        frontier = bench.make_frontier(
            spark, batch_rows, start=i * batch_rows, dup_back=batch_rows
        ).persist()
        frontier.count()  # harness scaffolding: the real engine reads its
        # frontier from state; synthesis+cache is reported but not part of
        # drain_sec, same discipline as the single-shot bench
        t_gen = time.monotonic() - tg
        seen = (
            spark.read.parquet(seen_dir) if seen_total else empty_seen
        )

        t0 = time.monotonic()
        scheduled, barrier = schedule_batch(
            frontier,
            seen=seen,
            bloom=bloom,
            robots_bcast=robots_b,
            quotas=quotas,
            default_k=1000,
            salt_span=250,
            max_quota=1000,
            n_bloom_parts=n_parts,
        )
        # DISK_ONLY: the scheduled set is small (~10% of the batch) and
        # must survive the next stages' execution-memory pressure — a
        # memory-cached block that gets LRU-evicted silently recomputes
        # the whole schedule pipeline inside the state-maintenance step
        # (observed: 95 s -> 800 s state_sec from exactly that)
        drained = drain_ordered(
            scheduled, n_buckets=sc.defaultParallelism * 4
        ).persist(StorageLevel.DISK_ONLY)
        n_sched = drained.count()
        release_barrier(barrier)
        t_drain = time.monotonic() - t0

        # frontier cache is dead weight once the batch is materialized;
        # free it BEFORE state maintenance so the bloom cogroup never
        # competes with 10+ GB of spent cache
        frontier.unpersist()

        # state maintenance — the incremental path whose cost must track
        # the batch, not the accumulated total
        t1 = time.monotonic()
        drained.select("url").coalesce(32).write.mode("append").parquet(seen_dir)
        update_bloom(
            bloom, drained.select("url"), n_parts=n_parts, m_bits_per_part=m_bits
        ).write.parquet(f"{bloom_root}/b{i + 1}")
        bloom = spark.read.parquet(f"{bloom_root}/b{i + 1}")
        shutil.rmtree(f"{bloom_root}/b{i}", ignore_errors=True)
        t_state = time.monotonic() - t1

        drained.unpersist()
        seen_total += n_sched
        row = {
            "batch": i,
            "gen_sec": round(t_gen, 2),
            "n_scheduled": n_sched,
            "seen_total_after": seen_total,
            "drain_sec": round(t_drain, 2),
            "state_sec": round(t_state, 2),
            "urls_per_sec": round(batch_rows / t_drain, 1),
        }
        batches.append(row)
        print(json.dumps(row), flush=True)

    wall = time.monotonic() - t_run0
    fill = bloom_fill(bloom).agg(
        F.avg("fill").alias("avg"), F.max("fill").alias("max")
    ).first()
    total_rows = batch_rows * n_batches
    drain_total = sum(b["drain_sec"] for b in batches)
    out = {
        "frontier_rows_total": total_rows,
        "batch_rows": batch_rows,
        "n_batches": n_batches,
        "seen_rows_final": seen_total,
        "bloom_m_bits_per_part": m_bits,
        "bloom_parts": n_parts,
        "bloom_total_mb": round(m_bits * n_parts / 8 / 2**20, 1),
        "bloom_fill_avg": round(fill["avg"], 4),
        "bloom_fill_max": round(fill["max"], 4),
        "drain_sec_total": round(drain_total, 1),
        "urls_per_sec_overall": round(total_rows / drain_total, 1),
        "loop_wall_sec": round(wall, 1),
        "loop_urls_per_sec_incl_state": round(total_rows / wall, 1),
        "first_batch_urls_per_sec": batches[0]["urls_per_sec"],
        "last_batch_urls_per_sec": batches[-1]["urls_per_sec"],
        "batches": batches,
        "cores": int(cpus) if str(cpus).isdigit() else cpus,
        "shuffle_partitions": shuffle_parts,
        "driver_mem": driver_mem,
        "date": time.strftime("%Y-%m-%d"),
        "note": (
            "micro-batched drain with accumulating seen state: per-batch "
            "schedule+dedup over a fresh frontier window, scheduled URLs "
            "appended to parquet seen + OR-ed into the Bloom via "
            "update_bloom (incremental, fixed width); throughput flat "
            "across batches = the 10^10 bounded-memory shape"
        ),
    }
    spark.stop()
    line = json.dumps(out, indent=1)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
