"""spark-submit --py-files packaging smoke test (the north rule's shipping
contract): build dist/kaminpar_spark.zip, run a real spark-submit subprocess
that imports the library ONLY from the zip, and check PageRank mass."""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

JOB = textwrap.dedent(
    """
    from pyspark.sql import SparkSession, functions as F
    spark = SparkSession.builder.getOrCreate()
    from kaminpar_spark.graph import GraphFrame
    from kaminpar_spark.operators.pagerank import pagerank
    e = spark.createDataFrame(
        [(0, 1, 1), (1, 2, 1), (2, 0, 1), (2, 3, 1)],
        "src long, dst long, weight long",
    )
    g = GraphFrame.from_edge_pairs(e, symmetrize=True)
    s = pagerank(g, tol=1e-9, max_iters=30).agg(F.sum("rank")).first()[0]
    print(f"SUBMIT_OK pr_sum={s:.6f}")
    spark.stop()
    """
)


@pytest.mark.slow
@pytest.mark.skipif(shutil.which("spark-submit") is None, reason="no spark-submit")
def test_spark_submit_pyfiles(tmp_path):
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "make_pyfiles.py")],
        check=True,
        cwd=REPO,
        capture_output=True,
    )
    zip_path = os.path.join(REPO, "dist", "kaminpar_spark.zip")
    assert os.path.exists(zip_path)
    job = tmp_path / "job.py"
    job.write_text(JOB)
    out = subprocess.run(
        [
            shutil.which("spark-submit"),
            "--master",
            "local[2]",
            "--py-files",
            zip_path,
            str(job),
        ],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=str(tmp_path),  # NOT the repo root: the zip must be the only source
    )
    assert "SUBMIT_OK pr_sum=1.000000" in out.stdout, out.stderr[-2000:]
