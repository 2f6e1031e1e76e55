"""Per-vertex results are invariant across cluster sizes (north rule:
"validated by pytest against the reference's per-vertex fixtures at N
and 4N executors").

Two FRESH JVMs — local[2] and local[8], different shuffle-partition
counts — run WCC and PageRank over the same parquet edge table; labels
must match exactly and PageRank scores to allclose 1e-6.  This is the
determinism property that makes the N-vs-4N scaling comparison
meaningful: the 4N cluster computes the same answer, just faster.
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

JOB = """
import json, sys
cores = int(sys.argv[1]); inp = sys.argv[2]
from hoover_spark.session import get_spark
from hoover_spark.operators.graph import Graph
from hoover_spark.operators.wcc import wcc
from hoover_spark.operators.pagerank import pagerank

spark = get_spark("invariance", cores=cores, shuffle_partitions=2 * cores)
g = Graph(spark.read.parquet(inp), num_partitions=2 * cores)
labels = {int(r["vid"]): int(r["label"]) for r in wcc(g).collect()}
ranks = {int(r["vid"]): float(r["rank"]) for r in pagerank(g, tol=1e-9).collect()}
print("INV_RESULT " + json.dumps({"labels": labels, "ranks": ranks}), flush=True)
spark.stop()
"""


def _run(cores: int, inp: str) -> dict:
    p = subprocess.run(
        [sys.executable, "-c", JOB, str(cores), inp],
        capture_output=True, text=True, cwd=REPO, timeout=600,
        env={"PATH": "/usr/bin:/bin", "HOME": "/root",
             "JAVA_HOME": __import__("os").environ.get("JAVA_HOME", ""),
             "HOOVER_SPARK_DRIVER_MEM": "4g"},
    )
    for line in p.stdout.splitlines():
        if line.startswith("INV_RESULT "):
            return json.loads(line[len("INV_RESULT "):])
    raise AssertionError(f"no result\n{p.stdout[-1500:]}\n{p.stderr[-1500:]}")


@pytest.mark.slow
def test_wcc_pagerank_invariant_across_parallelism(spark, tmp_path):
    from hoover_spark.sources.synthetic import rmat_graph

    inp = str(tmp_path / "edges")
    rmat_graph(spark, scale=11, edge_factor=6).edges.write.parquet(inp)

    small = _run(2, inp)
    large = _run(8, inp)

    assert small["labels"] == large["labels"]  # exact component match
    assert set(small["ranks"]) == set(large["ranks"])
    worst = max(
        abs(small["ranks"][v] - large["ranks"][v]) for v in small["ranks"]
    )
    assert worst < 1e-6, f"pagerank diverges across parallelism: {worst}"
