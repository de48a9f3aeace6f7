"""SparkSession factory with the engine's standard config.

Local mode here; the same knobs are what we'd ship to a real cluster
(AQE on, Arrow on, shuffle partitions sized to cores).
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

__all__ = ["get_spark", "stop_spark", "build_pyfiles_zip", "ship_package"]


def build_pyfiles_zip(out_path: str | None = None) -> str:
    """Zip the crawler_spark package for spark-submit --py-files /
    addPyFile shipping. Deterministic layout: crawler_spark/**.py."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    if out_path is None:
        out_path = os.path.join(tempfile.gettempdir(), "crawler_spark_pyfiles.zip")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            if "__pycache__" in root:
                continue
            for fn in sorted(files):
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    rel = os.path.join("crawler_spark", os.path.relpath(full, pkg_dir))
                    zf.write(full, rel)
    return out_path


def ship_package(spark: SparkSession) -> None:
    """Make crawler_spark importable on executors (the local-mode analog of
    ``spark-submit --py-files crawler_spark.zip``)."""
    spark.sparkContext.addPyFile(build_pyfiles_zip())


def get_spark(
    app_name: str = "crawler_spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    master: str | None = None,
) -> SparkSession:
    """``master`` overrides the default ``local[cores]`` — pass e.g.
    ``local-cluster[12,1,4096]`` to run REAL separate executor JVMs
    (own heaps, own GC, shuffle through the block manager), the
    faithful single-host emulation of a multi-executor cluster; with an
    override, ``cores`` still sizes the default shuffle parallelism
    (pass total executor cores)."""
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if master is None:
        master = f"local[{cores}]"
    ncores = os.cpu_count() if cores in ("*", None) else int(cores)
    if shuffle_partitions is None:
        shuffle_partitions = max(8, int(ncores))
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ship_package(spark)
    return spark


def stop_spark(spark: SparkSession) -> None:
    spark.stop()
