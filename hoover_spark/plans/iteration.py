"""Checkpointed, resumable, metric-emitting iteration driver.

Ports the semantics of HOOVER's main loop (``hvr_body``,
``src/hoover.cpp:3804-3947``) to a driver-side loop over DataFrame
programs:

- *frontier / delta processing* (reference ``needs_processing`` dirty
  flags, ``inc/hvr_vertex.h:79-86``, ``src/hoover.cpp:603-622``) is the
  kernel's responsibility; this driver supplies the loop, convergence
  test (reference ``should_terminate``, ``inc/hoover.h:73-82``),
  checkpoint cadence and per-iteration metrics.
- *profiling sink* (reference ``save_profiling_info``,
  ``src/hoover.cpp:3195-3423``) becomes a ``metrics`` parquet table with
  one row per iteration: rows shuffled, delta norm, frontier size,
  wall ms, partition count.
- *resume*: state is durably written every ``checkpoint_every``
  iterations under ``<dir>/<kernel>/iter=N``; ``load_latest`` restarts
  from the newest complete checkpoint (reference analogue: dead-PE
  final-state persistence, ``src/hoover.cpp:3985-4011``).

Long iterative lineages are truncated with ``localCheckpoint`` between
durable checkpoints — without this, Catalyst plans grow without bound
(SURVEY.md §7.4).
"""

from __future__ import annotations

import json
import os
import re
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

_ITER_DIR_RE = re.compile(r"^iter=(\d+)$")


@dataclass
class IterationLoop:
    """State/metrics manager for one kernel run."""

    spark: SparkSession
    kernel: str
    checkpoint_dir: str | None = None
    checkpoint_every: int = 5
    max_iterations: int = 200
    metrics: list[dict] = field(default_factory=list)
    #: kernel-published extras riding the run (no extra jobs): e.g.
    #: wcc's ``changed_rows`` lazy view + ``n_vertices`` (track_changes),
    #: pagerank's final ``rank_sum`` (from the per-iteration Observation)
    #: — the streaming path uses these to keep its durable state writes
    #: O(changed) and its bookkeeping O(1).
    kernel_state: dict = field(default_factory=dict)
    _persisted: list[DataFrame] = field(default_factory=list, repr=False)
    _last_saved_iter: int = -1

    # -- state management ------------------------------------------------
    def hold(self, df: DataFrame) -> DataFrame:
        """Persist + eagerly localCheckpoint a state DataFrame: truncates
        lineage so iteration N's plan does not contain iterations 0..N-1."""
        out = df.localCheckpoint(eager=True)
        self._persisted.append(out)
        # Keep the three most recent states in memory (an iteration may
        # hold an intermediate plus its result while the previous
        # iteration's state is still referenced by the running plan).
        while len(self._persisted) > 3:
            old = self._persisted.pop(0)
            try:
                old.unpersist()
            except Exception:
                pass
        return out

    def hold_observed(self, df: DataFrame, *exprs) -> tuple[DataFrame, dict]:
        """:meth:`hold` + per-iteration stats in the SAME action.

        Attaches a Spark ``Observation`` to ``df`` so the eager
        localCheckpoint that materializes the state also computes the
        convergence/metrics aggregates map-side — the separate tiny
        stats job (one full scheduling round-trip per iteration, the
        dominant fixed cost at small scale and one barrier per
        iteration at any scale) disappears. Returns
        ``(held_df, metrics_dict)``; the dict is available immediately
        because the checkpoint action has already run.
        """
        from pyspark.sql.observation import Observation

        obs = Observation()
        out = self.hold(df.observe(obs, *exprs))
        return out, obs.get

    def _kernel_dir(self) -> str | None:
        if not self.checkpoint_dir:
            return None
        d = os.path.join(self.checkpoint_dir, self.kernel)
        os.makedirs(d, exist_ok=True)
        return d

    def save_state(self, df: DataFrame, iteration: int, force: bool = False) -> DataFrame:
        """Durably checkpoint state at the configured cadence; returns a
        re-read DataFrame (fully truncated lineage) when written."""
        d = self._kernel_dir()
        if d is None or (iteration % self.checkpoint_every != 0 and not force):
            return df
        if iteration == self._last_saved_iter:
            # Already durable at this iteration (and df may be backed by
            # that very path — rewriting would overwrite our own input).
            return df
        self._last_saved_iter = iteration
        path = os.path.join(d, f"iter={iteration}")
        df.write.mode("overwrite").parquet(path)
        self._write_metrics()
        return self.spark.read.parquet(path)

    def load_latest(self) -> tuple[DataFrame, int] | None:
        """Resume point: newest complete ``iter=N`` checkpoint, if any."""
        d = self._kernel_dir()
        if d is None or not os.path.isdir(d):
            return None
        iters = []
        for name in os.listdir(d):
            m = _ITER_DIR_RE.match(name)
            if m and os.path.exists(os.path.join(d, name, "_SUCCESS")):
                iters.append(int(m.group(1)))
        if not iters:
            return None
        it = max(iters)
        self._last_saved_iter = it
        return self.spark.read.parquet(os.path.join(d, f"iter={it}")), it

    # -- metrics / lineage -------------------------------------------------
    def log(
        self,
        iteration: int,
        rows_shuffled: int,
        delta_norm: float,
        frontier_size: int,
        wall_ms: float,
    ) -> None:
        self.metrics.append(
            {
                "kernel": self.kernel,
                "iter": int(iteration),
                "rows_shuffled": int(rows_shuffled),
                "delta_norm": float(delta_norm),
                "frontier_size": int(frontier_size),
                "wall_ms": float(wall_ms),
                "npartitions": int(self.spark.conf.get("spark.sql.shuffle.partitions")),
            }
        )

    def _write_metrics(self) -> None:
        d = self._kernel_dir()
        if d is None or not self.metrics:
            return
        with open(os.path.join(d, "metrics.jsonl"), "w") as f:
            for row in self.metrics:
                f.write(json.dumps(row) + "\n")

    def finish(self, state: DataFrame, iteration: int) -> DataFrame:
        """Final durable write + metrics flush (when checkpointing)."""
        out = self.save_state(state, iteration, force=True)
        self._write_metrics()
        for df in self._persisted:
            try:
                df.unpersist()
            except Exception:
                pass
        self._persisted.clear()
        return out


class StopWatch:
    def __init__(self) -> None:
        self.t0 = time.perf_counter()

    def lap_ms(self) -> float:
        t = time.perf_counter()
        ms = (t - self.t0) * 1000.0
        self.t0 = t
        return ms
