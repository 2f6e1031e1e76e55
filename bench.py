"""Benchmark harness (driver contract).

Runs the engine's headline operators at ``$SPARK_GRAFT_SF_DIR``
(default /root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and
prints ONE JSON line:

    {"metric": "total_wall", "value": N, "unit": "sec",
     "queries": {...}, "sf": ..., "pagerank_edges_per_sec": ...}

North-rule headline: PageRank edges/sec to 1e-6 convergence + WCC
wall-time on the repo-reference edge table (synthesized at a row count
scaled to the sf dir), plus the corpus-pipeline operators (MinHash LSH
dedup, cosine top-k) on the driver's documents/embeddings tables.

Scaling-efficiency evidence (north rule: ≥0.8 from N to 4N executors)
comes from running this same script at SPARK_GRAFT_CPUS=8 and =32 —
see BENCH.md.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from hoover_spark.operators.dedup import minhash_lsh_pairs
    from hoover_spark.operators.graph import Graph
    from hoover_spark.operators.pagerank import pagerank
    from hoover_spark.operators.similarity import cosine_topk
    from hoover_spark.operators.triangles import triangle_count
    from hoover_spark.operators.wcc import wcc
    from hoover_spark.sources.repos import ref_edges, repos_table
    from hoover_spark.session import get_spark

    spark = get_spark("hoover_spark_bench", cores=cpus)

    # size the synthetic repos corpus off the sf dir (≈20 files/customer)
    n_customers = spark.read.parquet(f"{sf_dir}/customer.parquet").count()
    n_repo_rows = max(n_customers * 20, 2000)
    sf = {150: 0.001, 1500: 0.01, 15000: 0.1}.get(n_customers, n_customers / 150_000)

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    def timed(name):
        class _T:
            def __enter__(self):
                self.t0 = time.perf_counter()
                return self

            def __exit__(self, *a):
                timings[name] = round(time.perf_counter() - self.t0, 3)

        return _T()

    # -- stage E: edge extraction + edge-view materialization --------------
    graph = None
    with timed("edge_extract"):
        repos = repos_table(spark, n_repo_rows).persist()
        edges = ref_edges(repos)
        graph = Graph(edges, num_partitions=max(2 * cpus, 16))
        n_edges = graph.clean_edges().count()
        graph.sym_edges().count()
    extras["n_repo_rows"] = n_repo_rows
    extras["n_edges"] = n_edges

    # -- PageRank to 1e-6 (headline: edges/sec) ----------------------------
    with timed("pagerank"):
        from hoover_spark.plans.iteration import IterationLoop

        loop = IterationLoop(spark, kernel="pagerank", max_iterations=200)
        pr = pagerank(graph, spark=spark, tol=1e-6, loop=loop)
        pr.count()
    n_iters = len(loop.metrics)
    extras["pagerank_iters"] = n_iters
    extras["pagerank_edges_per_sec"] = round(n_iters * n_edges / timings["pagerank"], 1)

    # -- WCC wall-time ------------------------------------------------------
    with timed("wcc"):
        wcc(graph, spark=spark).count()

    # -- triangle counting --------------------------------------------------
    with timed("triangles"):
        extras["n_triangles"] = triangle_count(graph)

    # -- MinHash LSH near-dup on documents ----------------------------------
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    with timed("minhash_lsh"):
        extras["lsh_pairs"] = minhash_lsh_pairs(docs, "doc_id", "text").count()

    # -- cosine top-k on embeddings -----------------------------------------
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    with timed("cosine_topk"):
        cosine_topk(emb, queries, k=10).count()

    repos.unpersist()
    graph.unpersist()

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cpus": cpus,
                **extras,
            }
        )
    )


if __name__ == "__main__":
    main()
