"""Large-frontier scale point for the north-rule headline metric:
frontier drain throughput (URLs scheduled+deduped/sec) at a chosen
frontier size, using the EXACT code path bench.py's headline measures
(bench.run_frontier_drain — schedule_batch + drain_ordered, optional
fetch+parse).

Usage:
    python tools/scale_frontier.py N_ROWS [--e2e] [--out BENCH/scale_XX.json]

Defaults to drain-only (the metric's own definition); --e2e adds the
fetch+parse stage over every scheduled URL (93x more rows parsed per
decade of frontier, so reserve it for sizes where that is affordable).
Config mirrors the recorded 1e8 runs: shuffle partitions sized so one
scheduled-subset partition stays well under executor memory, driver
memory raised because local-mode executors share the driver JVM.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_rows = int(float(args[0])) if args else 1_000_000_000
    e2e = "--e2e" in sys.argv
    out_path = None
    for i, a in enumerate(sys.argv):
        if a == "--out" and i + 1 < len(sys.argv):
            out_path = sys.argv[i + 1]

    from pyspark.sql import SparkSession

    import bench

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    shuffle_parts = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTS", "256"))
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "100g")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("scale_frontier")
        .config("spark.driver.memory", driver_mem)
        .config("spark.sql.shuffle.partitions", str(shuffle_parts))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.local.dir", os.environ.get("SPARK_LOCAL_DIRS", "/tmp"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    # untimed warm-up: JIT + python worker pool, same discipline as bench.py
    bench.run_frontier_drain(spark, 100_000, do_parse=e2e)

    t0 = time.monotonic()
    res = bench.run_frontier_drain(spark, n_rows, do_parse=e2e)
    wall = round(time.monotonic() - t0, 1)
    res.update(
        date=time.strftime("%Y-%m-%d"),
        wall_sec_incl_materialize=wall,
        shuffle_partitions=shuffle_parts,
        driver_mem=driver_mem,
        cores=int(cpus) if str(cpus).isdigit() else cpus,
        note=("full e2e: schedule+dedup+parse" if e2e else
              "drain-only: schedule+dedup (the metric's definition)"),
    )
    spark.stop()
    line = json.dumps(res, indent=1)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
