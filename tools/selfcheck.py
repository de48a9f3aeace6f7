"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same parquet,
compare row count + sorted value hash. Usage:

    python tools/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _norm_cell(v) -> str:
    if v is None:
        return "\\N"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return repr(v)
    return str(v)


def value_hash(rows, colnames) -> str:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted("\x1f".join(_norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from crawler_spark.session import get_spark

    spark = get_spark("selfcheck", cores="8")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql(sf_dir)
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        finally:
            from crawler_spark.queries import release_query_barriers

            release_query_barriers()
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({len(rows)} rows, {time.monotonic()-t0:.1f}s)")
            continue
        try:
            res = con.sql(oracles[name])
            orows = res.fetchall()
            ocols = [d[0] for d in res.description]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue
        ok_n = len(rows) == len(orows)
        ok_c = sorted(cols) == sorted(ocols)
        ok_h = ok_c and value_hash(rows, cols) == value_hash(orows, ocols)
        status = "PASS" if (ok_n and ok_c and ok_h) else "FAIL"
        print(
            f"{status} {name}: spark={len(rows)} duck={len(orows)} "
            f"cols={'ok' if ok_c else f'{sorted(cols)} vs {sorted(ocols)}'} "
            f"hash={'ok' if ok_h else 'MISMATCH'} ({time.monotonic()-t0:.1f}s)"
        )
        if status == "FAIL":
            failures.append(name)
            if ok_c and rows and orows:
                order = sorted(range(len(cols)), key=lambda i: cols[i])
                s_set = {tuple(_norm_cell(r[i]) for i in order) for r in rows}
                oorder = sorted(range(len(ocols)), key=lambda i: ocols[i])
                o_set = {tuple(_norm_cell(r[i]) for i in oorder) for r in orows}
                for d in list(s_set - o_set)[:3]:
                    print(f"   spark-only: {d}")
                for d in list(o_set - s_set)[:3]:
                    print(f"   duck-only:  {d}")
    print(f"\n{'ALL PASS' if not failures else 'FAILURES: ' + ', '.join(failures)}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
