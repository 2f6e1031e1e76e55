"""spark-submit --py-files deployment test (north rule: "runs via
spark-submit --py-files on multi-executor clusters").

Builds dist/hoover_spark.zip with tools/package.py, then launches a
REAL spark-submit (fresh JVM, the package available ONLY through
--py-files — cwd is a temp dir so the repo checkout is not importable)
that generates a repos table, extracts the link graph, runs WCC, and
verifies the sha256 content invariant.  Asserting on its JSON output
proves the zip is self-contained: nothing in hoover_spark assumes a
source checkout, local filesystem layout, or driver-side state.
"""

from __future__ import annotations

import json
import shutil
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

JOB = """
import json
from hoover_spark.session import get_spark
from hoover_spark.sources.repos import repos_table, ref_edges, verify_content_sha256
from hoover_spark.operators.graph import Graph
from hoover_spark.operators.wcc import wcc

spark = get_spark("submit_smoke", cores=2, shuffle_partitions=4)
repos = repos_table(spark, 600)
bad = verify_content_sha256(repos, 600).count()
g = Graph(ref_edges(repos), num_partitions=4)
labels = wcc(g)
n_comp = labels.select("label").distinct().count()
print("SUBMIT_RESULT " + json.dumps({
    "sha_mismatches": bad,
    "n_vertices": labels.count(),
    "n_components": n_comp,
}), flush=True)
spark.stop()
"""


@pytest.mark.slow
def test_spark_submit_pyfiles(tmp_path):
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")

    sys.path.insert(0, str(REPO / "tools"))
    try:
        import package as packager
    finally:
        sys.path.pop(0)
    zip_path = packager.build(tmp_path)
    assert zip_path.exists() and zip_path.stat().st_size > 10_000

    job = tmp_path / "job.py"
    job.write_text(JOB)
    env = {
        "PATH": "/usr/bin:/bin",
        "HOME": str(tmp_path),
        "JAVA_HOME": __import__("os").environ.get("JAVA_HOME", ""),
        "PYSPARK_PYTHON": sys.executable,
        "PYSPARK_DRIVER_PYTHON": sys.executable,
        "SPARK_GRAFT_CPUS": "2",
        "HOOVER_SPARK_DRIVER_MEM": "2g",
    }
    p = subprocess.run(
        [
            spark_submit,
            "--master", "local[2]",
            "--py-files", str(zip_path),
            str(job),
        ],
        capture_output=True,
        text=True,
        cwd=tmp_path,  # repo checkout NOT importable from here
        env=env,
        timeout=600,
    )
    result = None
    for line in p.stdout.splitlines():
        if line.startswith("SUBMIT_RESULT "):
            result = json.loads(line[len("SUBMIT_RESULT "):])
    assert result is not None, f"no result line\n{p.stdout[-2000:]}\n{p.stderr[-2000:]}"
    assert result["sha_mismatches"] == 0
    assert result["n_vertices"] > 0
    assert result["n_components"] >= 1
