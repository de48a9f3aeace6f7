"""Shared scaffolding for the robustness sweeps (idrange_sweep /
degen_sweep): run EVERY driver query against a prepared corpus dir,
record per-query row counts, capture failures without stopping, and
write a dated JSON report to BENCH/.

Execution-only by design: a sweep's job is crash-robustness on inputs
the oracle corpus never shows (ANSI mode turns latent arithmetic
corruption into loud errors); value correctness stays with
tools/selfcheck.py.
"""

from __future__ import annotations

import datetime
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_sweep(app_name: str, dst: str, out_prefix: str, extra: dict) -> int:
    """Run all queries() entries against ``dst``; write
    BENCH/{out_prefix}_{date}.json with ``extra`` merged into the
    report. Returns 1 if any query raised."""
    from crawler_spark.queries import release_query_barriers
    from crawler_spark.session import get_spark

    import __spark_entry__ as entry

    spark = get_spark(app_name, cores=16, shuffle_partitions=16)
    qs = entry.queries()
    fails: dict[str, str] = {}
    counts: dict[str, int] = {}
    for name, fn in sorted(qs.items()):
        try:
            counts[name] = fn(spark, dst).count()
        except Exception as e:  # noqa: BLE001 — record and keep sweeping
            fails[name] = str(e).split("\n")[0][:200]
            print(f"FAIL {name}: {fails[name]}", flush=True)
        release_query_barriers()
    spark.stop()
    stamp = datetime.date.today().isoformat()
    result = {
        "date": stamp,
        **extra,
        "n_queries": len(qs),
        "n_failures": len(fails),
        "failures": fails,
    }
    path = os.path.join(REPO, "BENCH", f"{out_prefix}_{stamp}.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    print(f"wrote {path}")
    return 1 if fails else 0
