"""Composed corpus-curation benchmark at 10^7 docs (VERDICT r3 task 6).

Runs crawler_spark.pipeline.curate_corpus — strip -> quality -> MinHash-LSH
dedup -> dup-span filter -> domain mix -> token pack -> shard shuffle — as
ONE chained job over a 10^7-document corpus, recording per stage: wall
seconds, output rows, and the Spark-metrics deltas (shuffle read/write
bytes, input bytes, executor run time) attributed to materializing that
stage. The individually-proven operators are not the question here; the
COMPOSITION is — where the barriers sit, which stages dominate, and how
many bytes actually cross the shuffle at each boundary.

Corpus (deterministic, synthesized from sf0.1 documents — no external
data): 2000 copies x 5000 base docs. Copy k carries group g = k//8 and
member m = k%8: every 3rd token is prefixed with the group id — every
3-token shingle and every 8-token window then contains a group marker,
so DIFFERENT groups share no shingles at all (marking only every 5th
token left 2/5 of shingles shared, which made all 2000 copies of a base
doc an LSH band-colliding clique at Jaccard ~0.25 — a replication
artifact, not a dup structure any real corpus has, and it blew the
candidate-pair stage superlinear). Members 0..5 of a group are EXACT
duplicates (the rep-collapse path), members 6..7 append a member tail
(the near-dup LSH path), and every doc gets the host's 5-token nav
chrome for the strip to find. That plants the realistic crawl-dup mix:
~75% exact dups, ~12% near dups, 1.25e6 unique survivors.

    python tools/pipeline_bench.py [n_copies]   # default 2000 (= 10^7 docs)

Writes BENCH/pipeline_1e7.json (or pipeline_<ndocs>.json for other sizes).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CORPUS_DIR = "/tmp/pipeline_bench_corpus"
GROUP_SIZE = 8
EXACT_MEMBERS = 6  # members 0..5 identical; 6..7 near-dups
MIX_FRACTION_PPM = 250_000  # stage-5 budget = 25% of surviving tokens


def build_corpus(spark, n_copies: int) -> str:
    out = os.path.join(CORPUS_DIR, "documents.parquet")
    marker = os.path.join(CORPUS_DIR, "input.json")
    want = {"n_copies": n_copies, "src_sf": SRC_SF, "v": 3}
    if os.path.exists(marker):
        with open(marker) as f:
            if json.load(f) == want:
                return out
    import shutil

    shutil.rmtree(CORPUS_DIR, ignore_errors=True)
    base = spark.read.parquet(os.path.join(SRC_SF, "documents.parquet"))
    copies = spark.range(n_copies).withColumnRenamed("id", "k")
    from pyspark.sql import functions as F

    g = (F.col("k") / GROUP_SIZE).cast("long")
    m = F.col("k") % GROUP_SIZE
    grouped = F.concat_ws(
        " ",
        F.expr(
            "transform(split(text, ' '), (t, i) -> "
            "CASE WHEN i % 3 = 2 THEN concat('g', CAST(k DIV 8 AS STRING), '_', t) "
            "ELSE t END)"
        ),
    )
    text = F.when(
        m >= EXACT_MEMBERS, F.concat(grouped, F.lit(" m"), m.cast("string"), F.lit("tail"))
    ).otherwise(grouped)
    chrome = F.concat(F.lit("nav home about contact "), F.col("source"), F.lit(" "))
    (
        base.crossJoin(copies)
        .select(
            (F.col("doc_id") + F.col("k") * 10_000_000).alias("doc_id"),
            F.col("source").alias("host"),
            "lang",
            F.concat(chrome, text).alias("text"),
        )
        .repartition(64)
        .write.mode("overwrite")
        .parquet(out)
    )
    with open(marker, "w") as f:
        json.dump(want, f)
    return out


def _metrics(spark) -> dict:
    """Cumulative completed-stage metrics from the UI REST API."""
    app_id = spark.sparkContext.applicationId
    ui = spark.sparkContext.uiWebUrl
    url = f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=30) as r:
        stages = json.load(r)
    out = {"shuffle_read_b": 0, "shuffle_write_b": 0, "input_b": 0, "exec_run_ms": 0}
    for s in stages:
        out["shuffle_read_b"] += s.get("shuffleReadBytes", 0)
        out["shuffle_write_b"] += s.get("shuffleWriteBytes", 0)
        out["input_b"] += s.get("inputBytes", 0)
        out["exec_run_ms"] += s.get("executorRunTime", 0)
    return out


def main() -> None:
    n_copies = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    from crawler_spark.session import get_spark

    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        "pipeline_bench",
        cores=cores,
        shuffle_partitions=4 * cores,
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "5000",
            "spark.driver.memory": os.environ.get("PIPE_BENCH_MEM", "64g"),
        },
    )
    from pyspark.sql import functions as F

    from crawler_spark.pipeline import curate_corpus
    from crawler_spark.queries import release_query_barriers

    corpus_path = build_corpus(spark, n_copies)
    docs = spark.read.parquet(corpus_path)
    n_docs = docs.count()

    stage_rows: list[dict] = []
    last = {"t": time.time(), "m": _metrics(spark)}

    def _cb(name, df):
        # Stage boundary = parquet round-trip, exactly what a production
        # pipeline does between curation stages (and what keeps each
        # stage's plan small + fully adaptive — localCheckpoint measured
        # 4-5x slower here because the checkpoint path executes the
        # non-adaptive compiled plan).
        stage_dir = os.path.join(CORPUS_DIR, f"stage_{name}.parquet")
        df.write.mode("overwrite").parquet(stage_dir)
        df = spark.read.parquet(stage_dir)
        rows = df.count()
        release_query_barriers()  # free the stage's internal persists
        now, m = time.time(), _metrics(spark)
        stage_rows.append(
            {
                "stage": name,
                "wall_sec": round(now - last["t"], 2),
                "rows": rows,
                "shuffle_read_mb": round((m["shuffle_read_b"] - last["m"]["shuffle_read_b"]) / 2**20, 1),
                "shuffle_write_mb": round((m["shuffle_write_b"] - last["m"]["shuffle_write_b"]) / 2**20, 1),
                "input_mb": round((m["input_b"] - last["m"]["input_b"]) / 2**20, 1),
                "exec_cpu_sec": round((m["exec_run_ms"] - last["m"]["exec_run_ms"]) / 1000, 1),
            }
        )
        last["t"], last["m"] = now, m
        print("STAGE", json.dumps(stage_rows[-1]), flush=True)
        return df

    # the stage-5 token budget: 25% of tokens surviving stage 4, resolved
    # lazily (curate_corpus calls it after stage 4's callback ran, on the
    # stage-4 checkpoint); its (tiny) agg cost lands in the domain_mix
    # stage row, where it belongs.
    budget_holder = {}

    def _cb_with_budget(name, df):
        df = _cb(name, df)
        if name == "dup_span_filter":
            budget_holder["survivor_df"] = df
        return df

    def _budget() -> int:
        tot = budget_holder["survivor_df"].agg(F.sum("n_tokens")).first()[0]
        budget_holder["budget"] = int(tot * MIX_FRACTION_PPM / 1_000_000)
        return budget_holder["budget"]

    t0 = time.time()
    out = curate_corpus(docs, mix_budget=_budget, stage_cb=_cb_with_budget)
    final = out["shard_shuffle"]
    total_wall = round(time.time() - t0, 2)

    result = {
        "metric": "composed curation pipeline at 10^7 docs",
        "n_docs": n_docs,
        "n_copies": n_copies,
        "cores": cores,
        "mix_budget": budget_holder.get("budget"),
        "stages": stage_rows,
        "total_wall_sec": total_wall,
        "final_rows": final.count(),
        "sf_src": SRC_SF,
    }
    tag = "1e7" if n_docs == 10_000_000 else str(n_docs)
    path = os.path.join(REPO, "BENCH", f"pipeline_{tag}.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))
    print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
