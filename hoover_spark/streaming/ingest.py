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
store is rejected loudly instead of being silently ignored. A value
*adopted* for a pre-metadata store is recorded with
``provenance: adopted`` and re-warned on every construction until
confirmed (``confirm_buckets=True``) — a guessed value is never
silently promoted to pinned truth (r4 ADVICE).

STATE writes are O(changed), not O(|V|) (r4 scale item — the smaller
sibling of the r3 full-store graph rebuild): each micro-batch persists
only the state rows the kernel actually changed (wcc's
``track_changes`` carried-initial-label view — the reference ships
only ``needs_send`` vertices, ``inc/hvr_vertex.h:79-86``) as a
sequenced delta under ``state_deltas/seq=N``, plus a periodic full
snapshot once accumulated deltas cross ``snapshot_frac`` of the state
(bounded resume cost). ``_load_state`` composes snapshot + replay
(latest-wins per vid). PageRank is the documented exception: damped
power iteration is GLOBAL — a changed dangling mass or vertex count
moves every rank, so its per-batch changed set IS the full state and
it keeps full snapshots (writing "deltas" would rewrite |V| rows per
batch under a different name). Its warm prep is O(|batch|) regardless:
the vertex count is tracked incrementally (no ``prev.count()``), and
renormalization rides the kernel's initial state projection
(``initial_rank_sum``) instead of materializing a scaled O(|V|) copy.

Incremental triangle counting (``kernel="triangles"``): the reference
streams its triangle benchmark (``test/count_triangles.c:64-88``,
1,000 edges/iter/PE inserted while counting). Per batch the Δcount is
computed by :func:`hoover_spark.operators.triangles.triangle_delta` —
batch-side candidates broadcast against the persisted old adjacency
(O(|batch|·d̄), the base is never shuffled) — maintaining per-vertex
counts as the durable state plus a running total in
``state_meta.json``.

Incremental SSSP (``kernel="sssp"``, seed set via
``kernel_kwargs["seed_vids"]``): edge insertions only ever LOWER
shortest distances, so each batch warm-starts
:func:`hoover_spark.operators.paths.sssp` from the converged distance
table with the frontier = the distance-bearing src endpoints of the
batch's fresh edges — every newly-shorter path uses ≥1 fresh edge, so
re-relaxation from exactly those sources is exact. The durable write
is the batch's improved rows only (``changed_rows``), O(changed); a
batch whose fresh edges improve nothing skips the write entirely.
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
        snapshot_frac: float = 0.25,
        snapshot_floor: int = 4096,
        confirm_buckets: bool = False,
    ) -> None:
        assert kernel in ("wcc", "pagerank", "triangles", "sssp")
        self.spark = spark
        self.work_dir = work_dir
        self.kernel = kernel
        self.num_partitions = num_partitions
        self.kernel_kwargs = kernel_kwargs or {}
        self.n_buckets = n_buckets
        self.compact_delta_frac = compact_delta_frac
        self.snapshot_frac = snapshot_frac
        self.snapshot_floor = snapshot_floor
        self.confirm_buckets = confirm_buckets
        self.edges_dir = os.path.join(work_dir, "edges")
        self.state_dir = os.path.join(work_dir, "state")
        self.state_deltas_dir = os.path.join(work_dir, "state_deltas")
        self.state_meta_path = os.path.join(work_dir, "state_meta.json")
        self.metrics_path = os.path.join(work_dir, "batch_metrics.jsonl")
        os.makedirs(work_dir, exist_ok=True)
        self._validate_layout()
        self._meta = self._load_state_meta()
        self._state: DataFrame | None = self._load_state()
        #: incremental bookkeeping (no per-batch O(|V|) jobs): vertex
        #: count, converged rank sum, triangle total, delta sequencing
        self._n_vertices: int | None = self._meta.get("n_vertices")
        self._rank_sum: float = float(self._meta.get("rank_sum", 1.0))
        self.triangle_total: int = int(self._meta.get("triangle_total", 0))
        self._seq: int = int(self._meta.get("seq", 0))
        self._state_delta_rows: int = int(self._meta.get("state_delta_rows", 0))
        self._snapshot_rows: int = int(self._meta.get("snapshot_rows", 0))
        if self._state is not None and self._n_vertices is None:
            # legacy layout (pre state_meta): one bounded resume-time
            # count, never repeated per batch
            self._n_vertices = self._state.count()
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
        #: state-write evidence — a scale test asserts delta writes
        #: track the batch's changed-vertex count, not |V|
        self.state_snapshot_writes = 0
        self.state_delta_writes = 0
        self.last_state_write: dict | None = None
        #: wall of the last inline base (re)build, logged separately so
        #: a latency SLO can see the amortized compaction spike
        self.last_base_build_s: float = 0.0

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
                meta = json.load(f)
            stored = int(meta["n_buckets"])
            if stored != self.n_buckets:
                raise ValueError(
                    f"work_dir {self.work_dir} was written with n_buckets="
                    f"{stored}, got {self.n_buckets}: changing it remaps bucket "
                    "ids and breaks store dedup — reuse the stored value"
                )
            if meta.get("provenance") == "adopted":
                # an adopted (guessed) value is never silently promoted
                # to pinned truth (r4 ADVICE): keep warning on every
                # construction until the caller confirms it
                if getattr(self, "confirm_buckets", False):
                    meta["provenance"] = "confirmed"
                    with open(meta_path, "w") as f:
                        json.dump(meta, f)
                else:
                    import warnings

                    warnings.warn(
                        f"n_buckets={stored} for {self.edges_dir} was ADOPTED "
                        "for a pre-metadata store, not recorded at write time "
                        "— if the store was written with a different value, "
                        "dedup idempotency is broken; pass "
                        "confirm_buckets=True once verified to silence this",
                        RuntimeWarning,
                        stacklevel=2,
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
                    json.dump(
                        {"n_buckets": self.n_buckets, "provenance": "adopted"},
                        f,
                    )
                return
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

    def _load_state_meta(self) -> dict:
        if os.path.exists(self.state_meta_path):
            with open(self.state_meta_path) as f:
                return json.load(f)
        return {}

    def _write_state_meta(self) -> None:
        tmp = self.state_meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "n_vertices": self._n_vertices,
                    "rank_sum": self._rank_sum,
                    "triangle_total": self.triangle_total,
                    "seq": self._seq,
                    "state_delta_rows": self._state_delta_rows,
                    "snapshot_rows": self._snapshot_rows,
                },
                f,
            )
        os.replace(tmp, self.state_meta_path)

    def _state_delta_dirs(self) -> list[tuple[int, str]]:
        if not os.path.isdir(self.state_deltas_dir):
            return []
        out = []
        for n in os.listdir(self.state_deltas_dir):
            p = os.path.join(self.state_deltas_dir, n)
            if n.startswith("seq=") and os.path.exists(
                os.path.join(p, "_SUCCESS")
            ):
                out.append((int(n.split("=", 1)[1]), p))
        return sorted(out)

    def _load_state(self) -> DataFrame | None:
        """Resume: full snapshot + replay of sequenced deltas,
        latest-wins per vid. Replay cost is bounded: a snapshot is
        rewritten whenever accumulated deltas cross ``snapshot_frac``
        of the state, so at most that fraction is replayed."""
        snap = None
        if os.path.isdir(self.state_dir) and os.path.exists(
            os.path.join(self.state_dir, "_SUCCESS")
        ):
            snap = self.spark.read.parquet(self.state_dir)
        deltas = self._state_delta_dirs()
        if snap is None and not deltas:
            return None
        parts = []
        if snap is not None:
            parts.append(snap.withColumn("_seq", F.lit(-1)))
        for seq, path in deltas:
            parts.append(
                self.spark.read.parquet(path).withColumn("_seq", F.lit(seq))
            )
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        if len(parts) == 1:
            return df.drop("_seq")
        val_cols = [c for c in df.columns if c not in ("vid", "_seq")]
        return df.groupBy("vid").agg(
            *[F.max_by(c, "_seq").alias(c) for c in val_cols]
        )

    def _write_snapshot(self, df: DataFrame) -> None:
        """Full-state snapshot (atomic swap) + clear replayed deltas."""
        import shutil

        tmp = self.state_dir + ".tmp"
        df.write.mode("overwrite").parquet(tmp)
        final_exists = os.path.isdir(self.state_dir)
        swap = self.state_dir + ".old"
        if final_exists:
            os.rename(self.state_dir, swap)
        os.rename(tmp, self.state_dir)
        if final_exists:
            shutil.rmtree(swap, ignore_errors=True)
        shutil.rmtree(self.state_deltas_dir, ignore_errors=True)
        self._state_delta_rows = 0
        self._snapshot_rows = int(self._n_vertices or 0)
        self.state_snapshot_writes += 1
        self.last_state_write = {"mode": "snapshot", "rows": self._snapshot_rows}

    def _write_state_delta(self, delta_df: DataFrame) -> int:
        """Persist ONLY the batch's changed state rows (one row per vid)
        under ``state_deltas/seq=N``; returns the row count (measured by
        an Observation riding the write — no extra job)."""
        from pyspark.sql.observation import Observation

        obs = Observation()
        path = os.path.join(self.state_deltas_dir, f"seq={self._seq}")
        delta_df.observe(obs, F.count(F.lit(1)).alias("n")).write.mode(
            "overwrite"
        ).parquet(path)
        n = int(obs.get["n"] or 0)
        self._state_delta_rows += n
        self.state_delta_writes += 1
        self.last_state_write = {"mode": "delta", "rows": n}
        return n

    def _persist_state(self, state_df: DataFrame, changed_df: DataFrame | None) -> None:
        """One durable write per batch: the changed rows as a sequenced
        delta, escalating to a full snapshot when there is no previous
        snapshot or accumulated deltas cross the snapshot threshold."""
        self._seq += 1
        have_snapshot = os.path.isdir(self.state_dir) and os.path.exists(
            os.path.join(self.state_dir, "_SUCCESS")
        )
        if changed_df is None or not have_snapshot:
            self._write_snapshot(state_df)
        else:
            self._write_state_delta(changed_df)
            threshold = max(
                int(self._snapshot_rows * self.snapshot_frac), self.snapshot_floor
            )
            if self._state_delta_rows >= threshold:
                self._write_snapshot(state_df)
        self._write_state_meta()

    # -- long-lived graph view ------------------------------------------
    def _ensure_base(self) -> Graph:
        """Materialize the persisted hash-partitioned base Graph ONCE
        per state lifetime (and after each compaction) — the one
        amortized O(|E|) pass; every micro-batch between rebuilds
        composes it with an O(|batch|) delta."""
        if self._base is None:
            t0 = time.perf_counter()
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
            # logged separately per batch so a latency SLO can tell the
            # amortized rebuild spike from kernel wall (r4 advisory)
            self.last_base_build_s = round(time.perf_counter() - t0, 4)
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

    # -- the foreachBatch body ----------------------------------------------
    def apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        t0 = time.perf_counter()
        self.last_base_build_s = 0.0
        self.last_state_write = {"mode": "none", "rows": 0}
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
        # incremental triangles need the OLD adjacency (pre-batch): make
        # sure the base exists BEFORE the store append below, else the
        # first _ensure_base would read a store that already contains
        # this batch and the Δ would double-count
        if self.kernel == "triangles":
            self._ensure_base()
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

        if self.kernel == "triangles":
            self._apply_triangles_batch(batch_id, fresh, delta_sym_batch, n_fresh, t0)
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
        prev = self._state
        fresh_verts = new_verts = None
        if prev is not None:
            fresh_verts = (
                fresh.select(F.col("src").alias("vid"))
                .unionByName(fresh.select(F.col("dst").alias("vid")))
                .distinct()
            )
            # new vertices come from the batch's own endpoints, never a
            # full-store vertex scan (prev covers every seen vertex;
            # prev is vid-partitioned so only the tiny side shuffles)
            new_verts = fresh_verts.join(
                prev.select("vid"), on="vid", how="left_anti"
            )
        if self.kernel == "wcc":
            if prev is not None:
                new_labeled = new_verts.select("vid", F.col("vid").alias("label"))
                warm = prev.select("vid", "label").unionByName(new_labeled)
                state = wcc(
                    graph,
                    loop=loop,
                    initial_labels=warm,
                    initial_frontier=fresh_verts,
                    track_changes=True,
                    **self.kernel_kwargs,
                )
                # durable write = ONLY the rows the kernel changed plus
                # the brand-new vertices (labels are monotone: min
                # resolves a vid present in both)
                changed = (
                    loop.kernel_state["changed_rows"]
                    .unionByName(new_labeled)
                    .groupBy("vid")
                    .agg(F.min("label").alias("label"))
                )
            else:
                state = wcc(graph, loop=loop, **self.kernel_kwargs)
                changed = None  # cold start: the delta IS the state
            self._n_vertices = int(
                loop.kernel_state.get("n_vertices") or self._n_vertices or 0
            )
        elif self.kernel == "sssp":
            from hoover_spark.operators.paths import sssp

            kw = dict(self.kernel_kwargs)
            seed_vids = kw.pop("seed_vids")
            seeds = self.spark.createDataFrame(
                [(int(v),) for v in seed_vids], "vid long"
            )
            if prev is not None:
                # frontier = fresh-edge sources that already carry a
                # distance (an unreached source relaxes nothing yet; it
                # re-enters the frontier the round it is reached)
                frontier = fresh.select(F.col("src").alias("vid")).distinct()
                state = sssp(
                    graph,
                    seeds,
                    loop=loop,
                    initial_dists=prev.select("vid", "dist"),
                    initial_frontier=frontier,
                    track_changes=True,
                    **kw,
                )
                changed = loop.kernel_state["changed_rows"]
            else:
                state = sssp(graph, seeds, loop=loop, track_changes=True, **kw)
                changed = None
            # bookkeeping count = state rows (reached vids), the
            # quantity the snapshot threshold scales with
            self._n_vertices = int(
                loop.kernel_state.get("n_state_rows")
                or self._n_vertices
                or 0
            )
        else:
            warm = None
            n_vertices = None
            init_sum = None
            if prev is not None:
                # O(|batch|) warm prep: vertex count tracked
                # incrementally (no prev.count()), renormalization
                # folded into the kernel's initial projection via
                # initial_rank_sum (no O(|V|) sum + scaled copy)
                n_new = new_verts.count()
                n_vertices = int(self._n_vertices) + n_new
                warm = prev.select("vid", "rank").unionByName(
                    new_verts.select(
                        "vid", F.lit(1.0 / n_vertices).alias("rank")
                    )
                )
                init_sum = self._rank_sum + (n_new / n_vertices if n_new else 0.0)
            state = pagerank(
                graph,
                loop=loop,
                initial_ranks=warm,
                n_vertices=n_vertices,
                initial_rank_sum=init_sum,
                **self.kernel_kwargs,
            )
            self._rank_sum = float(loop.kernel_state.get("rank_sum") or 1.0)
            self._n_vertices = int(
                loop.kernel_state.get("n_vertices") or n_vertices or 0
            )
            # power iteration is GLOBAL: dangling mass + teleport base
            # move every rank whenever anything changes, so the changed
            # set IS the state — keep honest full snapshots (see module
            # docstring) instead of |V|-row "deltas"
            changed = None

        # in-memory state stays the kernel's localCheckpoint-backed,
        # vid-partitioned output (no per-batch parquet re-read)
        self._state = state
        if (
            self.kernel == "sssp"
            and changed is not None
            and int(loop.kernel_state.get("total_improvements") or 0) == 0
        ):
            # fresh edges opened no shorter path: skip the durable
            # write entirely (triangles-style "mode: none")
            self._seq += 1
            self.last_state_write = {"mode": "none", "rows": 0}
            self._write_state_meta()
        else:
            self._persist_state(state, changed)
        if graph is not self._base:
            graph.unpersist()  # composite's own cache only; base persists
        self.batches_applied += 1
        self._log(batch_id, n_fresh, len(loop.metrics), time.perf_counter() - t0)

    def _apply_triangles_batch(
        self,
        batch_id: int,
        fresh: DataFrame,
        delta_sym_batch: DataFrame | None,
        n_fresh: int,
        t0: float,
    ) -> None:
        """Incremental triangle maintenance: Δcount per batch from
        joining the batch's new undirected edges against the persisted
        OLD adjacency (base built before this batch's append) —
        O(|batch|·d̄), the base is never shuffled. State = per-vertex
        triangle counts (only vids on ≥1 triangle); running total in
        state_meta.json."""
        from pyspark.sql.observation import Observation

        from hoover_spark.operators.triangles import triangle_delta

        old_graph = self._graph_for_batch()  # base ∪ prior deltas, pre-batch
        # the genuinely-new undirected pairs; canonical orientation
        newU = (
            delta_sym_batch.where(F.col("src") < F.col("dst"))
            if delta_sym_batch is not None
            else self.spark.createDataFrame([], EDGE_SCHEMA)
        )
        inc = triangle_delta(old_graph.sym_edge_views(), newU)
        obs = Observation()
        inc = inc.observe(
            obs,
            F.sum("d").alias("s"),
            F.count(F.lit(1)).alias("n"),
        ).localCheckpoint(eager=True)
        tri_delta = int(obs.get["s"] or 0) // 3
        n_inc = int(obs.get["n"] or 0)
        self.triangle_total += tri_delta

        prev = self._state
        if prev is None:
            merged = inc.select("vid", F.col("d").alias("tri"))
        else:
            # prev is vid-partitioned; inc is O(Δ) — only inc shuffles
            merged = (
                prev.join(inc, on="vid", how="full")
                .select(
                    "vid",
                    (
                        F.coalesce("tri", F.lit(0)) + F.coalesce("d", F.lit(0))
                    ).alias("tri"),
                    F.col("d").isNotNull().alias("_chg"),
                )
            )
        obs2 = Observation()
        held = (
            merged.observe(obs2, F.count(F.lit(1)).alias("rows"))
            .repartition(self.num_partitions, "vid")
            .localCheckpoint(eager=True)
        )
        # for this kernel the bookkeeping count is STATE rows (vids on
        # ≥1 triangle), the quantity the snapshot threshold scales with
        self._n_vertices = int(obs2.get["rows"] or 0)
        if prev is None:
            self._state = held
            changed = None
        else:
            self._state = held.select("vid", "tri")
            changed = held.where(F.col("_chg")).select("vid", "tri")

        # fold the batch into the long-lived graph view for next time
        if delta_sym_batch is not None:
            self._merge_delta(fresh, delta_sym_batch)
            self._maybe_compact()

        if changed is not None and n_inc == 0:
            # nothing changed: skip the durable write entirely
            self._seq += 1
            self.last_state_write = {"mode": "none", "rows": 0}
            self._write_state_meta()
        else:
            self._persist_state(self._state, changed)
        self.batches_applied += 1
        self._log(
            batch_id,
            n_fresh,
            0,
            time.perf_counter() - t0,
            extra={"triangle_delta": tri_delta, "triangle_total": self.triangle_total},
        )

    def _log(
        self,
        batch_id: int,
        n_new: int,
        iters: int,
        secs: float,
        extra: dict | None = None,
    ) -> None:
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
                            # the amortized inline rebuild's wall,
                            # separated from kernel wall (0.0 when this
                            # batch paid no rebuild) — the latency-SLO
                            # evidence for the compaction spike
                            "base_build_s": self.last_base_build_s,
                        },
                        "state_write": self.last_state_write,
                        **(extra or {}),
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
    snapshot_frac: float = 0.25,
    snapshot_floor: int = 4096,
) -> IncrementalGraphState:
    """Consume all pending edge-drop parquet files as micro-batches
    (``Trigger.AvailableNow`` semantics) and return the converged state.

    On a long-lived cluster the same code runs with a processing-time
    trigger instead; nothing else changes.
    """
    state = IncrementalGraphState(
        spark, work_dir, kernel=kernel, num_partitions=num_partitions,
        kernel_kwargs=kernel_kwargs, n_buckets=n_buckets,
        snapshot_frac=snapshot_frac, snapshot_floor=snapshot_floor,
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
