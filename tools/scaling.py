"""Scaling-efficiency evidence for the north rule (N vs 4N executors).

No real cluster exists in this sandbox, so the same frontier-drain job runs
at two parallelism levels — local[8] (N) and local[32] (4N) — over the
IDENTICAL input (bench.make_frontier derives every row from its id, so the
frontier is partitioning-independent). Reports throughput at both and
efficiency = (T_4N / T_N) / 4, appended to BENCH/BASELINE.md.

    python tools/scaling.py [n_rows]
"""

from __future__ import annotations

import datetime
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = """
import sys, json, time
sys.path.insert(0, {repo!r})
from crawler_spark.session import get_spark
from bench import run_frontier_drain
spark = get_spark("scaling", cores={cores}, shuffle_partitions={parts})
# warm-up: JIT + Python worker pool spin-up, excluded from measurement
run_frontier_drain(spark, 200_000)
res = run_frontier_drain(spark, {n_rows})
res["cores"] = {cores}
print("RESULT " + json.dumps(res))
spark.stop()
"""


def run_at(cores: int, n_rows: int) -> dict:
    code = RUNNER.format(repo=REPO, cores=cores, parts=max(cores, 8), n_rows=n_rows)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=1800
    )
    for ln in out.stdout.splitlines():
        if ln.startswith("RESULT "):
            return json.loads(ln[len("RESULT "):])
    raise RuntimeError(f"no RESULT line (rc={out.returncode}):\n{out.stderr[-3000:]}")


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    r8 = run_at(8, n_rows)
    r32 = run_at(32, n_rows)
    eff = (r32["urls_per_sec"] / r8["urls_per_sec"]) / 4
    report = {
        "n_rows": n_rows,
        "local8": r8,
        "local32": r32,
        "scaling_efficiency": round(eff, 3),
        "date": datetime.date.today().isoformat(),
    }
    print(json.dumps(report, indent=1))
    md = f"""
## Scaling evidence (measured, {report['date']})

Same frontier-drain job (schedule+dedup of a {n_rows:,}-row Zipf frontier,
seen-rate 1/3, bloom prefilter + exact anti-join + per-host top-K + salted
ordered drain), identical partitioning-independent input, two parallelism
levels (no real cluster in this sandbox — `local[8]` stands in for N
executors, `local[32]` for 4N):

| parallelism | drain sec | URLs/sec | scheduled |
|---|---|---|---|
| local[8] (N) | {r8['drain_sec']} | {r8['urls_per_sec']:,} | {r8['n_scheduled']:,} |
| local[32] (4N) | {r32['drain_sec']} | {r32['urls_per_sec']:,} | {r32['n_scheduled']:,} |

**Scaling efficiency (T_4N/T_N)/4 = {eff:.3f}** (target >= 0.8 — note a
single shared-memory JVM under-states true multi-executor scaling: the two
runs contend for the same memory bus and GC; partition counts are sized so
the same plan shape would hold on separate executors).
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(md)
    with open(os.path.join(REPO, "BENCH", f"scaling_{report['date']}.json"), "w") as f:
        json.dump(report, f, indent=1)


if __name__ == "__main__":
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    main()
