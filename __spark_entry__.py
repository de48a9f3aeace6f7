"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: the interleaved-span Arrow parse pipeline
(BASELINE.json input_hint) at sf0.001. ``queries()``/``oracle_sql()`` —
the operator inventory from SURVEY.md §2 plus the training-data pipeline
operators (dedup / similarity / text analysis), each checked against a
DuckDB oracle by the driver. ``crawl_e2e`` is the full micro-batched
frontier engine on a synthetic web graph (non-SQL-expressible: stateful
iterative drain — rows-only check; full equality vs the reference-loop
oracle lives in tests/test_engine_parity.py).
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


def _crawl_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full frontier engine on a deterministic synthetic web graph:
    micro-batch drain, snapshot state, policy enqueue. Returns the crawl
    log (source_url, seq, url, ok, next_link). Stateful/iterative — no
    SQL oracle; parity vs the reference-loop transcription is asserted in
    tests/test_engine_parity.py."""
    from pyspark.sql import functions as F

    from crawler_spark.fixtures import make_web_graph, web_graph_rows
    from crawler_spark.operators.frontier import CrawlEngine
    from crawler_spark.schemas import WEB_GRAPH

    g = make_web_graph(n_hosts=2, pages_per_host=8, seed=7, max_pages=3)
    web_df = spark.createDataFrame(web_graph_rows(g), WEB_GRAPH)
    state_dir = tempfile.mkdtemp(prefix="crawl_e2e_")
    eng = CrawlEngine(spark, web_df, state_dir, policy="lexmin")
    eng.run(seeds=g.seeds)
    return eng.crawl_log().select(
        "source_url", "seq", "url", "host", "ok", F.coalesce("next_link", F.lit("")).alias("next_link")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from crawler_spark.queries import SPARK_QUERIES

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = dict(SPARK_QUERIES)
    out["crawl_e2e"] = _crawl_e2e
    return out


def oracle_sql() -> dict[str, str]:
    from crawler_spark.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
