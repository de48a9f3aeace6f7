"""Id-range robustness sweep: run EVERY driver query against a corpus
whose ids live in a high block (doc_id/vec_id/user_id + 5e9).

Why: the engine targets a 10^10-URL frontier, where id spaces are wide
and never zero-based. Arithmetic that silently assumes dense [0, n) ids
or packs ids into spare BIGINT bits works at test scale and detonates at
target scale — under ANSI mode it at least detonates loudly
(ARITHMETIC_OVERFLOW / DIVIDE_BY_ZERO), which is exactly what this
sweep listens for. It has already caught two real 10^10-scale bugs:
the dup_spans doc_id*2^32+pos pack (overflow at doc_id >= 2^31) and the
hits_scores unanchored modular graph (zero edges + divide-by-zero the
moment ids start at an offset).

The sweep is execution-only (each query is run and counted, not
hash-compared): its job is crash-robustness across the id range; value
correctness is the oracle harness's job (tools/selfcheck.py). Queries
that build their own fixture state ignore the shifted tables and run as
smoke here.

    python tools/idrange_sweep.py          # sf0.001 base, shift 5e9
"""

from __future__ import annotations

import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC_SF = os.environ.get("IDSWEEP_SRC_SF", "/root/testdata/sf0.001")
DST = "/tmp/sf_bigid"
SHIFT = 5_000_000_000


def build_input() -> None:
    import duckdb

    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    con.execute(
        f"COPY (SELECT doc_id + {SHIFT} AS doc_id, text, lang, source, n_chars"
        f" FROM read_parquet('{SRC_SF}/documents.parquet'))"
        f" TO '{DST}/documents.parquet' (FORMAT PARQUET)"
    )
    con.execute(
        f"COPY (SELECT vec_id + {SHIFT} AS vec_id, embedding, label"
        f" FROM read_parquet('{SRC_SF}/embeddings.parquet'))"
        f" TO '{DST}/embeddings.parquet' (FORMAT PARQUET)"
    )
    con.execute(
        f"COPY (SELECT event_id + {SHIFT} AS event_id, ts,"
        f" user_id + {SHIFT} AS user_id, event_type, value, props"
        f" FROM read_parquet('{SRC_SF}/events.parquet'))"
        f" TO '{DST}/events.parquet' (FORMAT PARQUET)"
    )
    for t in ("region", "nation", "customer", "supplier", "part", "orders", "lineitem"):
        p = os.path.join(SRC_SF, f"{t}.parquet")
        if os.path.exists(p):
            shutil.copy(p, os.path.join(DST, f"{t}.parquet"))


def main() -> int:
    from sweeplib import run_sweep

    build_input()
    return run_sweep(
        "idsweep", DST, "idrange_sweep", {"src_sf": SRC_SF, "shift": SHIFT}
    )


if __name__ == "__main__":
    sys.exit(main())
