"""spark-submit --py-files packaging smoke (north_rule: "run via
spark-submit --py-files on a multi-executor cluster").

Builds dist/engine.zip with bin/make_pyfiles.py, writes a tiny
deterministic transcripts parquet, then drives bin/run_pagerank.py
through a REAL ``spark-submit --py-files dist/engine.zip`` subprocess on
local[2] — the executor-side imports then resolve from the zip exactly
as they would on a cluster (the repo dir is NOT on the subprocess
PYTHONPATH; only the zip ships the library).
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import tempfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit")


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_pyfiles_roundtrip(spark):
    from montecarlopagerank_spark.datagen import transcripts_df

    tmp = tempfile.mkdtemp(prefix="submit_smoke_")
    try:
        inp = os.path.join(tmp, "transcripts")
        outp = os.path.join(tmp, "ranks")
        transcripts_df(spark, n_convs=12, seed=7).write.parquet(inp)

        zip_out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bin", "make_pyfiles.py")],
            capture_output=True, text=True, check=True,
        ).stdout.strip()
        assert zip_out.endswith("engine.zip") and os.path.exists(zip_out)

        env = {
            k: v for k, v in os.environ.items() if k != "PYTHONPATH"
        }  # the zip, not the repo checkout, must supply the library
        env["PYSPARK_PYTHON"] = sys.executable
        res = subprocess.run(
            [
                SPARK_SUBMIT, "--master", "local[2]",
                "--conf", "spark.sql.shuffle.partitions=4",
                "--conf", "spark.driver.memory=2g",
                "--py-files", zip_out,
                os.path.join(REPO, "bin", "run_pagerank.py"),
                "--input", inp, "--output", outp,
                "--algo", "power", "--tol", "1e-4", "--max-iters", "40",
            ],
            capture_output=True, text=True, timeout=600, cwd=tmp, env=env,
        )
        assert res.returncode == 0, res.stderr[-3000:]

        out = spark.read.parquet(outp)
        assert out.columns == ["vertex", "rank"]
        rows = out.count()
        assert rows > 0
        # ranks are a probability vector over the vertex set
        total = out.groupBy().sum("rank").collect()[0][0]
        assert abs(total - 1.0) < 1e-6
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
