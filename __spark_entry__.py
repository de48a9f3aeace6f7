"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: the interleaved-span Arrow parse pipeline
(BASELINE.json input_hint) at sf0.001. ``queries()``/``oracle_sql()`` —
the operator inventory from SURVEY.md §2 plus the training-data pipeline
operators (dedup / similarity / text analysis), each checked against a
DuckDB oracle by the driver. ``crawl_e2e`` is the full micro-batched
frontier engine on a synthetic web graph; its oracle is the pure-Python
reference-loop transcription (crawler_spark/oracle.py) executed over the
same fixture and emitted as an inline VALUES table, so the driver checks
rows + schema + value hash like every other query (full parity also in
tests/test_engine_parity.py).
"""

from __future__ import annotations

import os
import sys
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: interleaved text+media span extraction (Arrow-vectorized)
    over documents synthesized into HTML at sf0.001."""
    from crawler_spark.queries import q_spans_parse

    return q_spans_parse(spark, "/root/testdata/sf0.001")


# one fixture, shared by the Spark run and the pure-Python oracle run
_E2E_FIXTURE = dict(n_hosts=2, pages_per_host=8, seed=7, max_pages=3)
_E2E_POLICY = "lexmin"


def _crawl_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full frontier engine on a deterministic synthetic web graph:
    micro-batch drain, snapshot state, policy enqueue. Returns the crawl
    log (source_url, seq, url, ok, next_link). Oracle = the reference-loop
    transcription run over the same fixture (_crawl_e2e_oracle_sql)."""
    from pyspark.sql import functions as F

    from crawler_spark.fixtures import make_web_graph, web_graph_rows
    from crawler_spark.operators.frontier import CrawlEngine
    from crawler_spark.schemas import WEB_GRAPH

    g = make_web_graph(**_E2E_FIXTURE)
    web_df = spark.createDataFrame(web_graph_rows(g), WEB_GRAPH)
    state_dir = tempfile.mkdtemp(prefix="crawl_e2e_")
    eng = CrawlEngine(spark, web_df, state_dir, policy=_E2E_POLICY)
    eng.run(seeds=g.seeds)
    return eng.crawl_log().select(
        "source_url", "seq", "url", "host", "ok", F.coalesce("next_link", F.lit("")).alias("next_link")
    )


def _sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _crawl_e2e_oracle_sql() -> str:
    """Run the dependency-free reference-loop oracle (pure Python, ~ms)
    over the crawl_e2e fixture and emit its crawl log as an inline VALUES
    table — DuckDB needs no external file, and the driver's rows/schema/
    hash compare applies to the flagship engine row like any other."""
    from crawler_spark.fixtures import make_web_graph
    from crawler_spark.oracle import crawl_many, make_policy

    g = make_web_graph(**_E2E_FIXTURE)
    rows = []
    for sc in crawl_many(g.seeds, g.web, make_policy(_E2E_POLICY)):
        for rec in sc.records:
            rows.append(
                "(%s, %d, %s, %s, %s, %s)"
                % (
                    _sql_str(sc.source_url),
                    rec.seq,
                    _sql_str(rec.url),
                    _sql_str(rec.host),
                    "TRUE" if rec.ok else "FALSE",
                    _sql_str(rec.next_link or ""),
                )
            )
    return (
        "SELECT source_url, CAST(seq AS BIGINT) AS seq, url, host, ok, next_link\n"
        "FROM (VALUES\n  " + ",\n  ".join(rows) + "\n) AS t(source_url, seq, url, host, ok, next_link)"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from crawler_spark.queries import SPARK_QUERIES

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = dict(SPARK_QUERIES)
    out["crawl_e2e"] = _crawl_e2e
    return out


def oracle_sql() -> dict[str, str]:
    from crawler_spark.queries import ORACLE_SQL

    out = dict(ORACLE_SQL)
    out["crawl_e2e"] = _crawl_e2e_oracle_sql()
    return out
