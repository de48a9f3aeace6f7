"""spark-submit entrypoint (north rule: "ships via spark-submit
--py-files"). Runs a crawl over a synthetic web graph and prints the
crawl log + per-batch metrics.

    /opt/spark/bin/spark-submit --master 'local[8]' \
        --py-files /tmp/crawler_spark_pyfiles.zip tools/run_crawl.py \
        --state-dir /tmp/crawl_state --hosts 3 --max-pages 4

Build the zip with ``python -c "from crawler_spark.session import
build_pyfiles_zip; print(build_pyfiles_zip())"`` (get_spark also ships it
automatically via addPyFile for in-process runs).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--state-dir", required=True)
    ap.add_argument("--hosts", type=int, default=3)
    ap.add_argument("--pages-per-host", type=int, default=12)
    ap.add_argument("--max-pages", type=int, default=4)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--policy", default="lexmin")
    ap.add_argument("--robots", action="store_true", help="apply the fixture robots rules")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from crawler_spark.fixtures import make_web_graph, web_graph_rows
    from crawler_spark.operators.frontier import CrawlEngine
    from crawler_spark.schemas import ROBOTS, WEB_GRAPH
    from crawler_spark.session import ship_package

    spark = SparkSession.builder.appName("crawler_spark_run").getOrCreate()
    if not spark.conf.get("spark.submit.pyFiles", ""):
        ship_package(spark)  # in-process fallback; spark-submit ships the zip itself

    g = make_web_graph(
        n_hosts=args.hosts, pages_per_host=args.pages_per_host,
        seed=args.seed, max_pages=args.max_pages,
    )
    web_df = spark.createDataFrame(web_graph_rows(g), WEB_GRAPH)
    robots_df = None
    if args.robots:
        robots_df = spark.createDataFrame(
            [(h, list(p), d) for h, (p, d) in g.robots.items()], ROBOTS
        )
    eng = CrawlEngine(spark, web_df, args.state_dir, policy=args.policy, robots=robots_df)
    batches = eng.run(seeds=g.seeds)
    print(f"batches executed: {batches}")
    eng.crawl_log().orderBy("source_url", "seq").show(50, truncate=60)
    eng.metrics().orderBy("batch_id").show(50)
    spark.stop()


if __name__ == "__main__":
    main()
