"""Streaming micro-batch ingestion: batch-vs-incremental equivalence.

Reference analogue: the same edge stream fed through start_time_step
micro-batches must converge to the same state as a one-shot run
(trace-diff methodology, tools/compare_traces.py)."""

import math
import os

from hoover_spark.operators.graph import Graph
from hoover_spark.operators.pagerank import pagerank
from hoover_spark.operators.wcc import wcc
from hoover_spark.sources.synthetic import rmat_graph
from hoover_spark.streaming.ingest import run_stream


def _write_drops(spark, g: Graph, drops_dir: str, k: int):
    """Split a graph's edges deterministically into k ordered drops."""
    from pyspark.sql import functions as F

    e = g.cleaned().withColumn("b", F.pmod(F.xxhash64("src", "dst"), F.lit(k)))
    for b in range(k):
        e.where(F.col("b") == b).select("src", "dst").coalesce(1).write.parquet(
            os.path.join(drops_dir, f"drop_{b:03d}")
        )
    # parquet readStream wants a flat dir of files: move files up
    import glob
    import shutil

    for b in range(k):
        d = os.path.join(drops_dir, f"drop_{b:03d}")
        for i, f in enumerate(sorted(glob.glob(os.path.join(d, "*.parquet")))):
            shutil.move(f, os.path.join(drops_dir, f"batch_{b:03d}_{i}.parquet"))
        shutil.rmtree(d)


def test_wcc_stream_equals_batch(spark, tmp_path):
    g = rmat_graph(spark, scale=7, edge_factor=4)
    drops = str(tmp_path / "drops")
    os.makedirs(drops)
    _write_drops(spark, g, drops, k=4)

    state = run_stream(
        spark, drops, str(tmp_path / "work"), kernel="wcc", num_partitions=8
    )
    got = {r["vid"]: r["label"] for r in state.state().collect()}
    want = {r["vid"]: r["label"] for r in wcc(g).collect()}
    assert got == want
    assert state.batches_applied == 4


def test_duplicate_batches_idempotent(spark, tmp_path):
    """Re-delivering the same edges must not change state (at-least-once
    safety)."""
    import shutil

    g = rmat_graph(spark, scale=6, edge_factor=4)
    drops = str(tmp_path / "drops")
    os.makedirs(drops)
    _write_drops(spark, g, drops, k=2)
    # duplicate every file
    for f in list(os.listdir(drops)):
        shutil.copy(os.path.join(drops, f), os.path.join(drops, "dup_" + f))

    state = run_stream(
        spark, drops, str(tmp_path / "work"), kernel="wcc", num_partitions=8
    )
    got = {r["vid"]: r["label"] for r in state.state().collect()}
    want = {r["vid"]: r["label"] for r in wcc(g).collect()}
    assert got == want
    # durable edge store holds each edge exactly once
    n_store = spark.read.parquet(os.path.join(str(tmp_path / "work"), "edges")).count()
    assert n_store == g.cleaned().count()


def test_pagerank_stream_equals_batch(spark, tmp_path):
    g = rmat_graph(spark, scale=6, edge_factor=4)
    drops = str(tmp_path / "drops")
    os.makedirs(drops)
    _write_drops(spark, g, drops, k=3)

    state = run_stream(
        spark,
        drops,
        str(tmp_path / "work"),
        kernel="pagerank",
        num_partitions=8,
        kernel_kwargs={"tol": 1e-9},
    )
    got = {r["vid"]: r["rank"] for r in state.state().collect()}
    want = {r["vid"]: r["rank"] for r in pagerank(g, tol=1e-9).collect()}
    assert got.keys() == want.keys()
    for v in got:
        assert math.isclose(got[v], want[v], abs_tol=1e-6)


def test_stream_resume_after_restart(spark, tmp_path):
    """Stop after the first drop, then deliver the rest with a fresh
    run_stream over the same work dir — must reach the batch answer."""
    g = rmat_graph(spark, scale=6, edge_factor=4)
    drops1 = str(tmp_path / "d1")
    drops2 = str(tmp_path / "d2")
    os.makedirs(drops1)
    os.makedirs(drops2)
    from pyspark.sql import functions as F

    e = g.cleaned().withColumn("b", F.pmod(F.xxhash64("src", "dst"), F.lit(2)))
    e.where("b = 0").select("src", "dst").write.parquet(drops1 + "/p")
    e.where("b = 1").select("src", "dst").write.parquet(drops2 + "/p")
    import glob
    import shutil

    for d in (drops1, drops2):
        for i, f in enumerate(glob.glob(d + "/p/*.parquet")):
            shutil.move(f, os.path.join(d, f"b{i}.parquet"))
        shutil.rmtree(d + "/p")

    work = str(tmp_path / "work")
    run_stream(spark, drops1, work, kernel="wcc", num_partitions=8)
    # second delivery into the same store (fresh stream checkpoint dir)
    shutil.rmtree(os.path.join(work, "stream_ck"))
    state = run_stream(spark, drops2, work, kernel="wcc", num_partitions=8)

    got = {r["vid"]: r["label"] for r in state.state().collect()}
    want = {r["vid"]: r["label"] for r in wcc(g).collect()}
    assert got == want


def test_dedup_antijoin_is_bucket_pruned(spark, tmp_path):
    """The per-batch dedup anti-join must scan only the bucket
    directories the micro-batch's own edges hash into — NOT the whole
    accumulated store (reference analogue test/update_rates.cpp:30-55:
    16-edge micro-batches against an ever-growing edge store)."""
    from pyspark.sql import functions as F

    from hoover_spark.streaming.ingest import IncrementalGraphState

    state = IncrementalGraphState(
        spark, str(tmp_path / "work"), kernel="wcc", num_partitions=8,
        n_buckets=32,
    )
    # seed batch: spread the store across (almost) all buckets
    big = rmat_graph(spark, scale=8, edge_factor=4).cleaned()
    state.apply_batch(big, 0)
    assert state.last_scan["bucket_dirs_total"] == 0  # store was empty

    # tiny micro-batch: 4 edges -> at most 4 bucket dirs scanned
    small = spark.createDataFrame(
        [(1, 2), (3, 4), (5, 6), (900001, 900002)], schema="src long, dst long"
    )
    state.apply_batch(small, 1)
    scan = state.last_scan
    assert scan["bucket_dirs_total"] >= 16          # store is spread out
    assert scan["bucket_dirs_scanned"] <= 4         # pruned to the batch
    assert scan["bucket_dirs_scanned"] < scan["bucket_dirs_total"]

    # ...and pruned dedup is still exact: re-delivering an already-
    # stored edge adds nothing
    n_before = spark.read.parquet(str(tmp_path / "work" / "edges")).count()
    dup = big.limit(3).select("src", "dst")
    state.apply_batch(dup, 2)
    n_after = spark.read.parquet(str(tmp_path / "work" / "edges")).count()
    assert n_after == n_before
