"""North-rule shipping smoke: the job runs via REAL `spark-submit
--py-files crawler_spark.zip` (not just in-process addPyFile) — the
package must import on executors from the shipped zip alone.

The child process gets a cwd OUTSIDE the repo so `import crawler_spark`
can only resolve via --py-files; tools/run_crawl.py's in-repo sys.path
insert covers the DRIVER side import, executors see only the zip.
"""
from __future__ import annotations

import os
import subprocess
import tempfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT), reason="no spark-submit")
def test_spark_submit_py_files_end_to_end():
    import sys

    sys.path.insert(0, REPO)
    from crawler_spark.session import build_pyfiles_zip

    with tempfile.TemporaryDirectory(prefix="submit_") as work:
        zip_path = build_pyfiles_zip(os.path.join(work, "crawler_spark.zip"))
        state = os.path.join(work, "state")
        out = subprocess.run(
            [
                SPARK_SUBMIT,
                "--master", "local[4]",
                "--driver-memory", "4g",
                "--conf", "spark.ui.enabled=false",
                "--conf", "spark.sql.shuffle.partitions=8",
                "--py-files", zip_path,
                os.path.join(REPO, "tools", "run_crawl.py"),
                "--state-dir", state,
                "--hosts", "2",
                "--pages-per-host", "8",
                "--max-pages", "3",
            ],
            capture_output=True,
            text=True,
            cwd=work,  # NOT the repo: executor imports must come from the zip
            timeout=600,
        )
        assert out.returncode == 0, out.stderr[-4000:]
        assert "batches executed: " in out.stdout
        # crawl actually produced per-source ordered rows + batch metrics
        assert "source_url" in out.stdout and "batch_id" in out.stdout
        # snapshot state landed on disk (HEAD + at least one snapshot dir)
        assert os.path.exists(os.path.join(state, "HEAD"))
        snaps = os.listdir(os.path.join(state, "snapshots"))
        assert any(d.startswith("v") for d in snaps)


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT), reason="no spark-submit")
def test_spark_submit_on_real_multi_executor_cluster():
    """The north rule's letter: the job runs on a MULTI-EXECUTOR
    cluster, not just local threads. local-cluster[2,2,2048] launches
    two REAL separate executor JVMs (own heaps, own python workers,
    shuffle through the block manager) — the closest thing to a
    2-executor cluster a single sandbox host can stand up. Executor
    imports must come from the shipped --py-files zip alone (cwd is
    outside the repo), which is exactly what breaks if the package
    leaks a driver-only assumption."""
    import sys

    sys.path.insert(0, REPO)
    from crawler_spark.session import build_pyfiles_zip

    with tempfile.TemporaryDirectory(prefix="submitlc_") as work:
        zip_path = build_pyfiles_zip(os.path.join(work, "crawler_spark.zip"))
        state = os.path.join(work, "state")
        out = subprocess.run(
            [
                SPARK_SUBMIT,
                "--master", "local-cluster[2,2,2048]",
                "--driver-memory", "2g",
                "--conf", "spark.executor.memory=2g",
                "--conf", "spark.ui.enabled=false",
                "--conf", "spark.sql.shuffle.partitions=8",
                "--py-files", zip_path,
                os.path.join(REPO, "tools", "run_crawl.py"),
                "--state-dir", state,
                "--hosts", "2",
                "--pages-per-host", "8",
                "--max-pages", "3",
            ],
            capture_output=True,
            text=True,
            cwd=work,  # NOT the repo: executor imports must come from the zip
            timeout=600,
        )
        assert out.returncode == 0, out.stderr[-4000:]
        assert "batches executed: " in out.stdout
        assert "source_url" in out.stdout and "batch_id" in out.stdout
        assert os.path.exists(os.path.join(state, "HEAD"))
