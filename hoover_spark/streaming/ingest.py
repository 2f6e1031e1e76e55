"""Streaming edge ingestion with incremental re-convergence.

Reference semantics: HOOVER's graph mutates *while* analytics converge —
``start_time_step`` inserts a bounded batch of edges each iteration
(``test/connected_components.c:62-86``: 10,000 edges/iter/PE;
``test/update_rates.cpp:30-55``: micro-batches of 16 from real graph
files), and the delta machinery re-converges only what changed.

Spark mapping (SURVEY.md §3.2): ``readStream`` over an edge-drop
directory → ``foreachBatch``:

1. append the micro-batch to the durable edge store (parquet; the
   Iceberg-ready seam is :mod:`hoover_spark.sources.io`),
2. warm-start the kernel from the previous converged state,
3. restrict the initial frontier to endpoints of *new* edges (the
   reference's ``mark_for_processing`` on edge insert),
4. persist the re-converged state + per-batch metrics.

Idempotency: edges are deduped against the store per batch, so replayed
/ duplicate micro-batches are no-ops (reference analogue:
``update_edge_info`` no-ops on unchanged edges, ``src/hoover.cpp:485``)
— required because foreachBatch is at-least-once on failure recovery.

Scale: the durable store is hive-partitioned by
``bucket = pmod(xxhash64(src, dst), n_buckets)`` and the per-batch
dedup anti-join reads ONLY the bucket directories the micro-batch's own
edges hash into — per-batch cost is O(|batch| / n_buckets · |E|), not
O(|E|). A 16-edge reference-style micro-batch against a 100 TB store
touches ≤16 of the buckets instead of rescanning everything (the
round-2 version anti-joined the full store every batch — the per-batch
wall grew linearly with accumulated history). With Iceberg packaged the
same seam becomes a ``MERGE INTO`` on the bucket-partitioned table.

The GRAPH VIEW is long-lived too (r3 scale-killer: the dedup half was
bucket-pruned but each batch still re-scanned + re-shuffled the FULL
store to rebuild the symmetric edge view). The first batch of a state's
lifetime materializes a persisted hash-partitioned base Graph ONCE;
every later batch composes it with an O(|batch|) checkpointed delta
(:class:`hoover_spark.operators.graph.DeltaGraph`) — kernels join each
view separately, so the base keeps its partitioning and the per-batch
graph work is proportional to the batch, not the store. When the
accumulated delta crosses ``compact_delta_frac`` of the base, one
amortized rebuild folds it in (reference analogue: ``update_edge_info``
touches only mutated adjacency rows, ``src/hoover.cpp:450-600``).

Layout safety (r3 ADVICE): ``store_meta.json`` pins ``n_buckets`` for
the lifetime of a work_dir (a different value would silently remap
bucket ids and break dedup), and a legacy flat (non-bucketed) edge
store is rejected loudly instead of being silently ignored.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from hoover_spark.operators.graph import EDGE_SCHEMA, DeltaGraph, Graph
from hoover_spark.operators.pagerank import pagerank
from hoover_spark.operators.wcc import wcc
from hoover_spark.plans.iteration import IterationLoop


class IncrementalGraphState:
    """Durable accumulated edge store + converged kernel state."""

    def __init__(
        self,
        spark: SparkSession,
        work_dir: str,
        kernel: str = "wcc",
        num_partitions: int = 32,
        kernel_kwargs: dict | None = None,
        n_buckets: int = 64,
        compact_delta_frac: float = 0.125,
    ) -> None:
        assert kernel in ("wcc", "pagerank")
        self.spark = spark
        self.work_dir = work_dir
        self.kernel = kernel
        self.num_partitions = num_partitions
        self.kernel_kwargs = kernel_kwargs or {}
        self.n_buckets = n_buckets
        self.compact_delta_frac = compact_delta_frac
        self.edges_dir = os.path.join(work_dir, "edges")
        self.state_dir = os.path.join(work_dir, "state")
        self.metrics_path = os.path.join(work_dir, "batch_metrics.jsonl")
        os.makedirs(work_dir, exist_ok=True)
        self._validate_layout()
        self._state: DataFrame | None = self._load_state()
        self.batches_applied = 0
        #: pruning evidence for the last batch's dedup anti-join
        self.last_scan: dict | None = None
        # long-lived graph view: persisted base + checkpointed deltas
        self._base: Graph | None = None
        self._base_rows = 0
        self._delta: DataFrame | None = None       # directed fresh edges
        self._delta_sym: DataFrame | None = None   # sym-closure complement
        self._delta_rows = 0
        #: evidence counters — a scale test asserts these stay O(1)
        self.base_builds = 0
        self.compactions = 0

    def _validate_layout(self) -> None:
        meta_path = os.path.join(self.work_dir, "store_meta.json")
        if os.path.isdir(self.edges_dir):
            flat = [
                n
                for n in os.listdir(self.edges_dir)
                if not (n.startswith("bucket=") or n.startswith("_") or n.startswith("."))
            ]
            if flat:
                raise ValueError(
                    f"edge store {self.edges_dir} contains non-bucketed entries "
                    f"{flat[:3]} — this layout predates bucket partitioning and "
                    "would be silently ignored by partition discovery; migrate "
                    "it (read the flat files, re-write with "
                    "partitionBy('bucket')) or start a fresh work_dir"
                )
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                stored = int(json.load(f)["n_buckets"])
            if stored != self.n_buckets:
                raise ValueError(
                    f"work_dir {self.work_dir} was written with n_buckets="
                    f"{stored}, got {self.n_buckets}: changing it remaps bucket "
                    "ids and breaks store dedup — reuse the stored value"
                )
        else:
            dirs = self._bucket_dirs()
            if dirs:
                max_b = max(int(n.split("=", 1)[1]) for n in dirs)
                if max_b >= self.n_buckets:
                    raise ValueError(
                        f"edge store {self.edges_dir} holds bucket={max_b} ≥ "
                        f"n_buckets={self.n_buckets}: the store was written "
                        "with a larger bucket count (no store_meta.json to "
                        "confirm) — pass the original n_buckets"
                    )
                import warnings

                warnings.warn(
                    f"adopting n_buckets={self.n_buckets} for a pre-metadata "
                    f"store at {self.edges_dir} (max observed bucket {max_b}); "
                    "if the store was written with a different value, dedup "
                    "idempotency is broken — verify before trusting",
                    RuntimeWarning,
                    stacklevel=2,
                )
            with open(meta_path, "w") as f:
                json.dump({"n_buckets": self.n_buckets}, f)

    # -- durable pieces ----------------------------------------------------
    def _bucket_expr(self) -> F.Column:
        return F.pmod(F.xxhash64("src", "dst"), F.lit(self.n_buckets))

    def _bucket_dirs(self) -> list[str]:
        if not os.path.isdir(self.edges_dir):
            return []
        return sorted(
            n for n in os.listdir(self.edges_dir) if n.startswith("bucket=")
        )

    def _edges(self) -> DataFrame | None:
        """Full durable edge store (all buckets) as (src, dst)."""
        if not self._bucket_dirs():
            return None
        return self.spark.read.parquet(self.edges_dir).select("src", "dst")

    def _store_slice(self, buckets: list[int]) -> DataFrame | None:
        """The store restricted to the given buckets — reads only those
        bucket directories (explicit path-level partition pruning, no
        reliance on planner behavior; testable via ``last_scan``)."""
        paths = [
            p
            for b in buckets
            if os.path.isdir(p := os.path.join(self.edges_dir, f"bucket={b}"))
        ]
        self.last_scan = {
            "buckets_in_batch": len(buckets),
            "bucket_dirs_scanned": len(paths),
            "bucket_dirs_total": len(self._bucket_dirs()),
        }
        if not paths:
            return None
        return self.spark.read.parquet(*paths).select("src", "dst")

    def _load_state(self) -> DataFrame | None:
        if os.path.isdir(self.state_dir) and os.path.exists(
            os.path.join(self.state_dir, "_SUCCESS")
        ):
            return self.spark.read.parquet(self.state_dir)
        return None

    # -- long-lived graph view ------------------------------------------
    def _ensure_base(self) -> Graph:
        """Materialize the persisted hash-partitioned base Graph ONCE
        per state lifetime (and after each compaction) — the one
        amortized O(|E|) pass; every micro-batch between rebuilds
        composes it with an O(|batch|) delta."""
        if self._base is None:
            store = self._edges()
            if store is None:
                store = self.spark.createDataFrame([], EDGE_SCHEMA)
            # SEVER the snapshot from the store path: later appends fire
            # recacheByPath, which would silently refresh a path-backed
            # persisted view to include the appended edges — and those
            # already live in the delta (double-counted edges: wrong
            # PageRank sums; WCC only survived via min-idempotency).
            snap = store.repartition(self.num_partitions, "src").localCheckpoint(
                eager=True
            )
            base = Graph(snap, num_partitions=self.num_partitions)
            # the durable store is unique-by-construction (per-batch
            # dedup): the snapshot IS the cleaned partitioned view
            base._cache["clean_part"] = snap
            self._base_rows = base.sym_edges().count()
            base.vertices().persist().count()
            self._base = base
            self.base_builds += 1
        return self._base

    def _sym_complement(
        self, fresh: DataFrame, existing: DataFrame | None
    ) -> DataFrame:
        """Symmetric closure of the fresh edges MINUS pairs already in
        the store's symmetric view — a fresh directed edge (a,b) whose
        reverse (b,a) is already stored adds nothing to the symmetric
        view. Membership is tested against the same bucket slice the
        dedup used (both orientations' buckets were collected), so this
        stays O(|batch|)-pruned. MUST be materialized (eager
        localCheckpoint) BEFORE the store append — ``existing`` reads
        the bucket directories lazily and would otherwise see the
        just-appended fresh edges and empty the delta."""
        cand = fresh.unionByName(
            fresh.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).dropDuplicates(["src", "dst"])
        if existing is not None:
            ex_sym = existing.unionByName(
                existing.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            )
            cand = cand.join(ex_sym, on=["src", "dst"], how="left_anti")
        return cand.localCheckpoint(eager=True)

    def _merge_delta(self, fresh: DataFrame, delta_sym_batch: DataFrame) -> None:
        """Fold a batch's fresh edges + pre-computed sym complement
        into the running (checkpointed) deltas."""
        if self._delta is None:
            self._delta = fresh
            self._delta_sym = delta_sym_batch
        else:
            self._delta = self._delta.unionByName(fresh).localCheckpoint(eager=True)
            self._delta_sym = self._delta_sym.unionByName(
                delta_sym_batch
            ).localCheckpoint(eager=True)
        self._delta_rows = self._delta_sym.count()

    def _maybe_compact(self) -> None:
        """When the delta outgrows ``compact_delta_frac`` of the base,
        release the old base and let the next ``_ensure_base`` fold the
        (already durably appended) delta in — one amortized rebuild."""
        if self._base is None or self._delta_rows == 0:
            return
        threshold = max(int(self._base_rows * self.compact_delta_frac), 4096)
        if self._delta_rows >= threshold:
            old = self._base
            self._base = None
            self._delta = None
            self._delta_sym = None
            self._delta_rows = 0
            old.unpersist()
            self.compactions += 1

    def _graph_for_batch(self) -> Graph:
        base = self._ensure_base()
        if self._delta is None:
            return base
        return DeltaGraph(base, self._delta, self._delta_sym)

    def _save_state(self, df: DataFrame) -> DataFrame:
        tmp = self.state_dir + ".tmp"
        df.write.mode("overwrite").parquet(tmp)
        final_exists = os.path.isdir(self.state_dir)
        swap = self.state_dir + ".old"
        if final_exists:
            os.rename(self.state_dir, swap)
        os.rename(tmp, self.state_dir)
        if final_exists:
            import shutil

            shutil.rmtree(swap, ignore_errors=True)
        return self.spark.read.parquet(self.state_dir)

    # -- the foreachBatch body ----------------------------------------------
    def apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        t0 = time.perf_counter()
        batch = (
            batch_df.select(
                F.col("src").cast("long").alias("src"),
                F.col("dst").cast("long").alias("dst"),
            )
            .where(F.col("src") != F.col("dst"))
            .dropDuplicates(["src", "dst"])
        )

        # dedup against ONLY the bucket slices this batch hashes into —
        # a micro-batch of b edges scans ≤ 2b of the n_buckets
        # directories (both orientations: the reverse edge's presence
        # matters for the symmetric-view delta) however large the
        # accumulated store has grown
        batch = batch.withColumn("bucket", self._bucket_expr())
        batch_buckets = [
            r["b"]
            for r in batch.select(
                F.explode(
                    F.array(
                        F.col("bucket"),
                        F.pmod(F.xxhash64("dst", "src"), F.lit(self.n_buckets)),
                    )
                ).alias("b")
            )
            .distinct()
            .collect()
        ]
        existing = self._store_slice(batch_buckets)
        if existing is not None:
            fresh = batch.join(existing, on=["src", "dst"], how="left_anti")
        else:
            fresh = batch
        # Sever lineage BEFORE appending: the append below would otherwise
        # trigger recacheByPath and re-evaluate this anti-join against the
        # post-append store (yielding zero "fresh" rows and an empty
        # frontier). localCheckpoint pins the snapshot.
        fresh = fresh.localCheckpoint(eager=True)
        n_fresh = fresh.count()
        # the sym-view complement must also be materialized pre-append
        # (same recacheByPath trap: `existing` reads the bucket dirs)
        delta_sym_batch = None
        if self._base is not None and n_fresh > 0:
            delta_sym_batch = self._sym_complement(
                fresh.select("src", "dst"), existing
            )
        if n_fresh > 0:
            fresh.write.partitionBy("bucket").mode("append").parquet(self.edges_dir)
        fresh = fresh.select("src", "dst")

        if n_fresh == 0 and self._state is not None:
            self._log(batch_id, 0, 0, time.perf_counter() - t0)
            return

        # graph view: the first batch of this state's lifetime builds
        # the persisted base (from the just-appended store); later
        # batches fold their fresh edges into the O(|batch|) delta and
        # compose — NO per-batch store rescan / re-shuffle.
        if delta_sym_batch is not None:
            self._merge_delta(fresh, delta_sym_batch)
            self._maybe_compact()
        graph = self._graph_for_batch()

        loop = IterationLoop(self.spark, kernel=self.kernel, max_iterations=200)
        if self.kernel == "wcc":
            prev = self._state
            if prev is not None:
                fresh_verts = (
                    fresh.select(F.col("src").alias("vid"))
                    .unionByName(fresh.select(F.col("dst").alias("vid")))
                    .distinct()
                )
                # labels for new vertices default to own vid — derived
                # from the batch's own endpoints, not a full-store
                # vertex scan
                new_verts = fresh_verts.join(
                    prev.select("vid"), on="vid", how="left_anti"
                ).select("vid", F.col("vid").alias("label"))
                warm = prev.select("vid", "label").unionByName(new_verts)
                state = wcc(
                    graph,
                    loop=loop,
                    initial_labels=warm,
                    initial_frontier=fresh_verts,
                    **self.kernel_kwargs,
                )
            else:
                state = wcc(graph, loop=loop, **self.kernel_kwargs)
        else:
            prev = self._state
            warm = None
            n_vertices = None
            if prev is not None:
                # O(|batch|) warm prep: new vertices come from the
                # batch's own endpoints and the vertex count is tracked
                # incrementally — no full-store vertex distinct per
                # micro-batch (prev covers every previously-seen vertex)
                fresh_verts = (
                    fresh.select(F.col("src").alias("vid"))
                    .unionByName(fresh.select(F.col("dst").alias("vid")))
                    .distinct()
                )
                new_verts = fresh_verts.join(
                    prev.select("vid"), on="vid", how="left_anti"
                )
                n_vertices = prev.count() + new_verts.count()
                warm_raw = prev.select("vid", "rank").unionByName(
                    new_verts.select(
                        "vid", F.lit(1.0 / n_vertices).alias("rank")
                    )
                )
                total = warm_raw.agg(F.sum("rank")).collect()[0][0]
                warm = warm_raw.select(
                    "vid", (F.col("rank") / F.lit(total)).alias("rank")
                )
            state = pagerank(
                graph,
                loop=loop,
                initial_ranks=warm,
                n_vertices=n_vertices,
                **self.kernel_kwargs,
            )

        self._state = self._save_state(state)
        if graph is not self._base:
            graph.unpersist()  # composite's own cache only; base persists
        self.batches_applied += 1
        self._log(batch_id, n_fresh, len(loop.metrics), time.perf_counter() - t0)

    def _log(self, batch_id: int, n_new: int, iters: int, secs: float) -> None:
        with open(self.metrics_path, "a") as f:
            f.write(
                json.dumps(
                    {
                        "batch_id": int(batch_id),
                        "new_edges": int(n_new),
                        "reconverge_iters": int(iters),
                        "wall_s": round(secs, 4),
                        "dedup_scan": self.last_scan,
                        "graph_view": {
                            "base_builds": self.base_builds,
                            "base_sym_rows": self._base_rows,
                            "delta_sym_rows": self._delta_rows,
                            "compactions": self.compactions,
                        },
                    }
                )
                + "\n"
            )

    def state(self) -> DataFrame | None:
        return self._state


def run_stream(
    spark: SparkSession,
    drops_dir: str,
    work_dir: str,
    kernel: str = "wcc",
    num_partitions: int = 32,
    max_files_per_trigger: int = 1,
    kernel_kwargs: dict | None = None,
    n_buckets: int = 64,
) -> IncrementalGraphState:
    """Consume all pending edge-drop parquet files as micro-batches
    (``Trigger.AvailableNow`` semantics) and return the converged state.

    On a long-lived cluster the same code runs with a processing-time
    trigger instead; nothing else changes.
    """
    state = IncrementalGraphState(
        spark, work_dir, kernel=kernel, num_partitions=num_partitions,
        kernel_kwargs=kernel_kwargs, n_buckets=n_buckets,
    )
    stream = (
        spark.readStream.schema(EDGE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(drops_dir)
    )
    q = (
        stream.writeStream.foreachBatch(state.apply_batch)
        .option("checkpointLocation", os.path.join(work_dir, "stream_ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return state
