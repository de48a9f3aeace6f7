"""Micro-batched large-frontier drain with ACCUMULATING URL-seen state —
the shape a 10^10-URL crawl actually runs in, and the bounded-memory
counterpart of the single-shot scale points (BENCH/scale_1e8*.json).

Each batch drains a [i*B, (i+1)*B) window of the deterministic Zipf
frontier (bench.make_frontier with dup_back=B: every 5th row
re-discovers a batch-0-family URL, so the accumulated seen state faces
persistent nav-link-like re-discovery pressure). After a batch, its
scheduled URLs are committed through SeenState (operators/seen_state.py):
an append to the snapshot store's url_seen delta table plus an
incremental update_bloom OR-in of the seen_bloom full table — per-batch
state-maintenance cost tracks the BATCH, not the total seen count, which
is exactly what a 10^10 frontier needs (a per-batch full rebuild would
be quadratic).

Peak memory is one batch's caches + the (fixed-width) Bloom blobs; the
frontier is never materialized whole. Per-batch throughput flat across
batches = the scale evidence.

Two hard-won rules this tool encodes (both measured, see
BENCH/BASELINE.md "10^9-URL micro-batched frontier drain"):
- in-loop state must COMMIT per batch (SeenState/snapshot store), never
  chain persist() handles — a cached chain keeps every prior batch's
  cogroup in its lineage and one evicted block recomputes the history;
- the batch's scheduled set rides DISK_ONLY, because an LRU-evicted
  memory block recomputes the whole schedule pipeline inside whatever
  step touches it next.

Usage:
    python tools/scale_frontier_loop.py [batch_rows] [n_batches] \
        [--out BENCH/scale_1e9_loop.json] [--resume] [--bucketed[=B]] \
        [--stagger[=K]] [--cuckoo]

--bucketed stores url_seen in the hash-bucketed hive layout (B bucket
dirs, default 256) and resolves the exact maybe-seen check bucket-wise
(SeenState.anti_join): the accumulated seen table is never shuffled —
the one per-batch cost that otherwise grows with TOTAL crawl state
(flat anti-join reshuffles ~4 GB of seen rows per batch at 10^8 seen).

--stagger K rebuilds at most K worst-fill Bloom partitions per batch
on saturation (per-part width doubling) instead of the whole filter in
one commit window — no single batch pays the doubling pause.

--cuckoo swaps the Bloom prefilter for the deletable cuckoo filter
(same partition contract; delete_urls evicts fingerprints in place).

--resume picks the loop up from the state's HEAD batch: a killed run
continues from its last committed batch with the identical frontier
windows (deterministic from row ids) and identical accumulated seen
state — the store's idempotent-redelivery guarantee means a batch that
died between its drain and its commit is simply re-drained and commits
once.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import urllib.request


def _shuffle_metrics(spark) -> dict:
    """Cumulative completed-stage shuffle bytes from the UI REST API
    (same instrument as tools/pipeline_bench.py). Per-batch DELTAS of
    this are the structural evidence the bucketed layout claims: the
    flat anti-join's shuffle grows with the ACCUMULATED seen table,
    the bucket-wise probe's only with the batch's maybe slice."""
    try:
        app_id = spark.sparkContext.applicationId
        ui = spark.sparkContext.uiWebUrl
        url = f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
        with urllib.request.urlopen(url, timeout=30) as r:
            stages = json.load(r)
        return {
            "shuffle_read_b": sum(s.get("shuffleReadBytes", 0) for s in stages),
            "shuffle_write_b": sum(s.get("shuffleWriteBytes", 0) for s in stages),
        }
    except Exception:
        return {"shuffle_read_b": 0, "shuffle_write_b": 0}

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_path = None
    bucketed = None
    stagger = None
    args: list[str] = []
    consumed = -1
    for i, a in enumerate(sys.argv[1:], start=1):
        if i == consumed:
            continue
        if a == "--out" and i + 1 < len(sys.argv):
            out_path = sys.argv[i + 1]
            consumed = i + 1
        elif a in ("--bucketed", "--stagger") or a.startswith(
            ("--bucketed=", "--stagger=")
        ):
            # explicit value only as --flag=N: a space-separated digit is
            # ambiguous with the positional batch_rows and was silently
            # consumed (e.g. `--bucketed 6400 10` ate 6400 as the bucket
            # count and drained 10 rows). A trailing digit that LOOKS like
            # an attempted space-form value aborts loudly instead of
            # silently becoming batch_rows.
            nxt = sys.argv[i + 1] if i + 1 < len(sys.argv) else ""
            if "=" not in a and nxt.isdigit() and int(nxt) <= 1 << 16:
                sys.exit(f"ambiguous `{a} {nxt}`: write {a}={nxt} (or put "
                         "positional batch_rows/n_batches before flags)")
            val = int(a.split("=", 1)[1]) if "=" in a else None
            if a.startswith("--bucketed"):
                bucketed = val if val is not None else 256
            else:
                stagger = val if val is not None else 8
        elif not a.startswith("--"):
            args.append(a)
    batch_rows = int(float(args[0])) if args else 100_000_000
    n_batches = int(args[1]) if len(args) > 1 else 10

    from pyspark import StorageLevel
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    import bench
    from crawler_spark.operators.politeness import broadcast_robots, host_quotas
    from crawler_spark.operators.scheduler import (
        drain_ordered,
        release_barrier,
        schedule_batch,
    )
    from crawler_spark.operators.seen_state import SeenState

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

    resume = "--resume" in sys.argv
    state_root = os.environ.get("SPARK_GRAFT_SEEN_DIR", "/tmp/scale_loop_state")
    if not resume:
        shutil.rmtree(state_root, ignore_errors=True)

    # Bloom sized ONCE for the whole run's expected seen count (~10% of
    # the frontier gets scheduled -> seen): capacity_keys * BITS_PER_KEY
    # bits, power-of-two per part. 2^26 bits/part * 64 parts = 537 MB —
    # past the broadcast ceiling, so the prefilter runs the cogroup path,
    # the only one that exists at 10^10 (total filter ~15 GiB there).
    # Undersizing is safe: SeenState.commit_batch rebuilds wider past
    # fill 0.5 (amortized doubling).
    capacity = int(
        os.environ.get("SPARK_GRAFT_SEEN_CAPACITY", batch_rows * n_batches * 0.15)
    )
    n_parts = 64
    cuckoo = "--cuckoo" in sys.argv
    st = SeenState(
        spark, state_root, n_parts=n_parts, expected_keys=capacity,
        bucketed_parts=bucketed, write_tasks=min(64, shuffle_parts),
        filter_kind="cuckoo" if cuckoo else "bloom",
        stagger_parts=stagger,
        rebuild_fill=0.7 if cuckoo else 0.5,
    )
    m_bits = st._initial_m_bits

    robots_rows = [
        (f"h{i}.example.org", ["/private", "/login"], 100 if i % 2 else 0)
        for i in range(50)
    ]
    robots_df = spark.createDataFrame(
        robots_rows, "host string, disallow_prefixes array<string>, crawl_delay_ms int"
    )
    robots_b = broadcast_robots(spark, robots_df)
    quotas = host_quotas(spark, robots_b, default_k=1000)

    # untimed warm-up (JIT + python worker pool), tiny and state-free
    warm = bench.make_frontier(spark, 100_000).persist()
    warm.count()
    ws, wb = schedule_batch(
        warm,
        # same seen-resolution path as the measured loop: a flat join here
        # would reshuffle the whole accumulated seen table on --resume —
        # the exact cost bucketed mode exists to avoid
        seen=None if bucketed else st.seen(),
        exact_anti_join=st.anti_join if bucketed else None,
        bloom=st.blobs(), robots_bcast=robots_b, quotas=quotas,
        default_k=1000, salt_span=250, max_quota=1000, n_bloom_parts=n_parts,
        seen_filter=st.filter_kind,
    )
    drain_ordered(ws, n_buckets=sc.defaultParallelism * 4).count()
    release_barrier(wb)
    warm.unpersist()

    batches = []

    def _loop_cursor() -> int:
        # The store's batch_id counts COMMITS (compactions included), so
        # it is NOT the loop window index. The loop commits window i as
        # LOGICAL batch i+1, and SeenState propagates the logical id into
        # every commit it writes — including internal bloom-rebuild and
        # compaction commits — so the newest kept manifest always records
        # it: an iteration that triggers both a rebuild and the every-4th
        # compaction leaves (rebuild, compact) after expire(keep_last=2),
        # and BOTH carry the cursor (previously only the evicted loop
        # commit did, and --resume restarted from batch 0). Stores
        # written by the pre-logical-id script carry only loop_batch —
        # fall back to it there (last_logical's own fallback is the
        # store batch_id, which over-counts internal commits).
        hist = st.store.history()
        if any(SeenState.METRIC_LOGICAL in (m.metrics or {}) for m in hist):
            return st.last_logical()
        for man in reversed(hist):
            lb = (man.metrics or {}).get("loop_batch")
            if lb is not None:
                return int(lb) + 1
        return 0

    start_batch = _loop_cursor() if resume else 0  # committed windows stay done
    seen_total = st.seen().count() if start_batch else 0
    if resume:
        print(json.dumps({"resumed_at_batch": start_batch, "seen_rows": seen_total}), flush=True)
    t_run0 = time.monotonic()
    for i in range(start_batch, n_batches):
        tg = time.monotonic()
        frontier = bench.make_frontier(
            spark, batch_rows, start=i * batch_rows, dup_back=batch_rows
        ).persist()
        frontier.count()  # harness scaffolding: the real engine reads its
        # frontier from state; synthesis+cache is reported but not part of
        # drain_sec, same discipline as the single-shot bench
        t_gen = time.monotonic() - tg

        sm0 = _shuffle_metrics(spark)
        t0 = time.monotonic()
        scheduled, barrier = schedule_batch(
            frontier,
            # bucketed: the seen table is never shuffled — the bucket-wise
            # resolver reads each bucket's committed files directly
            seen=None if bucketed else st.seen(),
            exact_anti_join=st.anti_join if bucketed else None,
            bloom=st.blobs(),
            robots_bcast=robots_b,
            quotas=quotas,
            default_k=1000,
            salt_span=250,
            max_quota=1000,
            n_bloom_parts=n_parts,
            seen_filter=st.filter_kind,
        )
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
        new_urls = drained.select("url")
        if not bucketed:
            new_urls = new_urls.coalesce(32)  # bucketed mode re-clusters itself
        man, info = st.commit_batch(
            new_urls,
            batch_id=i + 1,  # logical id: redelivery-guarded per window
            metrics={"n_scheduled": n_sched, "loop_batch": i},
        )
        if (i + 1) % 4 == 0:
            # compact the delta chain THEN expire: retention is
            # dir-granular, so superseded blob tables reclaim only once
            # the url_seen deltas stop referencing their dirs
            st.compact(n_files=32)
        st.expire(keep_last=2)
        t_state = time.monotonic() - t1

        drained.unpersist()
        sm1 = _shuffle_metrics(spark)
        seen_total += n_sched
        row = {
            "batch": i,
            "gen_sec": round(t_gen, 2),
            "n_scheduled": n_sched,
            "seen_total_after": seen_total,
            "drain_sec": round(t_drain, 2),
            "state_sec": round(t_state, 2),
            "urls_per_sec": round(batch_rows / t_drain, 1),
            "bloom_rebuilt": bool(info.get("rebuilt")),
            "shuffle_write_gb": round(
                (sm1["shuffle_write_b"] - sm0["shuffle_write_b"]) / 2**30, 2
            ),
        }
        batches.append(row)
        print(json.dumps(row), flush=True)

    wall = time.monotonic() - t_run0
    if not batches:
        print(json.dumps({"note": "nothing to do: state already at target batch"}))
        spark.stop()
        return
    fill = st.fill().agg(F.avg("fill").alias("avg"), F.max("fill").alias("max")).first()
    total_rows = batch_rows * len(batches)  # rows drained by THIS run
    drain_total = sum(b["drain_sec"] for b in batches)
    out = {
        "frontier_rows_total": total_rows,
        "resumed_at_batch": start_batch or None,
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
        "bucketed_parts": bucketed,
        "filter_kind": st.filter_kind,
        "stagger_parts": stagger,
        "cores": int(cpus) if str(cpus).isdigit() else cpus,
        "shuffle_partitions": shuffle_parts,
        "driver_mem": driver_mem,
        "date": time.strftime("%Y-%m-%d"),
        "note": (
            "micro-batched drain with accumulating seen state, committed "
            "per batch through SeenState (snapshot-store url_seen delta + "
            "incremental seen_bloom full table); throughput flat across "
            "batches = the 10^10 bounded-memory shape"
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
