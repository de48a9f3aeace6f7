"""Degenerate-values robustness sweep: run EVERY driver query against a
corpus seeded with the pathological rows any 100 TB crawl contains —
empty / whitespace-only / single-token / 10k-char-single-token /
tab-newline / emoji+CJK+RTL documents, and zero-norm + denormal-tiny
embedding vectors (failed encoder outputs, padding rows).

Sibling of tools/idrange_sweep.py (same contract: execution-only, no
crash allowed; value correctness is tools/selfcheck.py's job). Under
Spark 4's ANSI-mode default, latent division-by-zero and overflow
surface as loud errors instead of silent NULLs — this sweep already
caught the whole fixed-point-cosine family (cosine_topk,
dedup_embedding_cosine, ann_lsh_search, dedup_embedding_lsh + semdedup
+ IVF/IVF-PQ via _ivf_assign) raising DIVIDE_BY_ZERO on a zero-norm
vector; all now yield NULL cosine, identically in Spark and DuckDB.

    python tools/degen_sweep.py
"""

from __future__ import annotations

import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC_SF = os.environ.get("DEGEN_SRC_SF", "/root/testdata/sf0.001")
DST = "/tmp/sf_degen"


def build_input() -> None:
    import duckdb

    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    con.execute(
        f"""
COPY (
  SELECT * FROM (SELECT doc_id, text, lang, source, n_chars
                 FROM read_parquet('{SRC_SF}/documents.parquet') LIMIT 50)
  UNION ALL SELECT 9000001, '', 'en', 'degen', 0
  UNION ALL SELECT 9000002, '   ', 'en', 'degen', 3
  UNION ALL SELECT 9000003, 'x', 'en', 'degen', 1
  UNION ALL SELECT 9000004, repeat('a', 10000), 'en', 'degen', 10000
  UNION ALL SELECT 9000005, '\U0001f980 \U0001f980 \U0001f980 日本語 العربية ♥ ♥', 'zz', 'degen', 24
  UNION ALL SELECT 9000006, repeat('tok ', 5000), 'en', 'degen', 20000
  UNION ALL SELECT 9000007, chr(9) || chr(10) || 'tab', 'en', 'degen', 5
) TO '{DST}/documents.parquet' (FORMAT PARQUET)"""
    )
    dim = con.execute(
        f"SELECT len(embedding) FROM read_parquet('{SRC_SF}/embeddings.parquet') LIMIT 1"
    ).fetchone()[0]
    con.execute(
        f"""
COPY (
  SELECT * FROM (SELECT vec_id, embedding, label
                 FROM read_parquet('{SRC_SF}/embeddings.parquet') LIMIT 50)
  UNION ALL SELECT 9000001,
    CAST(list_transform(range(1, {dim + 1}), x -> CAST(0.0 AS FLOAT)) AS FLOAT[]), 0
  UNION ALL SELECT 9000002,
    CAST(list_transform(range(1, {dim + 1}), x -> CAST(1e-9 AS FLOAT)) AS FLOAT[]), 0
) TO '{DST}/embeddings.parquet' (FORMAT PARQUET)"""
    )
    con.execute(
        f"COPY (SELECT * FROM read_parquet('{SRC_SF}/events.parquet') LIMIT 100)"
        f" TO '{DST}/events.parquet' (FORMAT PARQUET)"
    )
    for t in ("region", "nation", "customer", "supplier", "part", "orders", "lineitem"):
        p = os.path.join(SRC_SF, f"{t}.parquet")
        if os.path.exists(p):
            shutil.copy(p, os.path.join(DST, f"{t}.parquet"))


def main() -> int:
    from sweeplib import run_sweep

    build_input()
    return run_sweep("degensweep", DST, "degen_sweep", {"src_sf": SRC_SF})


if __name__ == "__main__":
    sys.exit(main())
