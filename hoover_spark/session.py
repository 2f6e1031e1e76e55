"""SparkSession factory with scale-oriented defaults.

In the sandbox we run ``local[N]`` (single JVM); on a real cluster the
same code runs unchanged via ``spark-submit --py-files`` — nothing here
assumes local mode except the memory default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS = {
    # AQE: runtime coalescing, skew-join splitting, join-strategy re-plan.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for pandas UDFs / toPandas — the only sanctioned Python path.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    # Iterative graph jobs build long lineages; keep plans printable.
    "spark.sql.ui.explainMode": "formatted",
    "spark.ui.enabled": "false",
    # Broadcast threshold: genuinely small dimension tables broadcast;
    # anything bigger shuffles. 64 MB proved harmful — building a
    # million-entry hashed relation is single-threaded on the driver,
    # a serial phase that swamps scaling (measured 2x on iterative
    # kernels). AQE still upgrades joins to broadcast from runtime
    # stats when a side is truly small.
    "spark.sql.autoBroadcastJoinThreshold": str(8 * 1024 * 1024),
    # Iterative kernels join the same cached edge table every round on
    # the same key — a shuffled hash join skips SMJ's per-iteration
    # re-sort of the big side (AQE still overrides per-stage when
    # stats favor it).
    "spark.sql.join.preferSortMergeJoin": "false",
}


def get_spark(
    app_name: str = "hoover_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``cores`` defaults to ``$SPARK_GRAFT_CPUS`` (driver contract) or all.
    ``shuffle_partitions`` defaults to ``2 * cores`` — sized so that at
    bench scale each shuffle partition stays well under executor memory;
    on a real cluster this is set to ~2-3x total executor cores instead.
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    if shuffle_partitions is None:
        shuffle_partitions = max(2 * cores, 8)

    # Shuffle/spill files on tmpfs when available: the sandbox's virtual
    # disk has multi-x latency variance; a real cluster pairs executors
    # with local NVMe. Harmless to skip when /dev/shm is absent.
    local_dir = None
    if os.path.isdir("/dev/shm"):
        local_dir = "/dev/shm/spark-local"
        try:
            os.makedirs(local_dir, exist_ok=True)
        except OSError:
            local_dir = None

    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cores))
        .config("spark.driver.memory", os.environ.get("HOOVER_SPARK_DRIVER_MEM", "48g"))
    )
    for k, v in _DEFAULTS.items():
        builder = builder.config(k, v)
    if local_dir is not None:
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
