"""sources/io.py: Iceberg-or-parquet seam behavior in a no-Iceberg JVM."""

from __future__ import annotations

import pytest

from hoover_spark.sources import io as tio
from hoover_spark.sources.repos import repos_table


def test_iceberg_probe_false_in_sandbox(spark):
    # sandbox packages no iceberg-spark-runtime jar; the probe must say
    # so (cheaply, twice — second hit is cached) rather than error
    assert tio.iceberg_available(spark) is False
    assert tio.iceberg_available(spark) is False


def test_iceberg_fmt_raises_with_fix(spark):
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        tio.read_table(spark, "lake.db.repos", fmt="iceberg")
    with pytest.raises(RuntimeError, match="--packages"):
        tio.write_table(repos_table(spark, 5), "lake.db.repos", fmt="iceberg")


def test_auto_roundtrip_parquet(spark, tmp_path):
    path = str(tmp_path / "repos_tbl")
    df = repos_table(spark, 50)
    tio.write_table(df, path, fmt="auto")
    back = tio.read_table(spark, path, fmt="auto")
    assert back.count() == 50
    assert set(back.columns) == {"repo", "path", "commit", "lang", "content"}
    # append mode
    tio.write_table(df, path, fmt="parquet", mode="append")
    assert tio.read_table(spark, path, fmt="parquet").count() == 100


def test_unknown_fmt(spark):
    with pytest.raises(ValueError, match="unknown fmt"):
        tio.read_table(spark, "/nowhere", fmt="orc")


def test_write_table_rejects_unsupported_catalog_modes(spark):
    # writeTo only has create-or-replace / append verbs; 'error' and
    # 'ignore' must raise instead of silently appending (ADVICE r2)
    with pytest.raises(ValueError, match="unsupported for catalog"):
        tio.write_table(repos_table(spark, 5), "lake.db.repos", fmt="auto", mode="error")


def test_iceberg_live_roundtrip_when_available(tmp_path):
    """Executed only when an iceberg-spark-runtime jar is packaged
    (e.g. `spark-submit --packages org.apache.iceberg:...`): write a
    partitioned catalog table, read it back through the same seam, and
    assert the partition filter reaches the Iceberg scan. Skips cleanly
    in jars-less environments (this sandbox)."""
    from pyspark.sql import SparkSession, functions as F

    probe = SparkSession.getActiveSession() or SparkSession.builder.getOrCreate()
    if not tio.iceberg_available(probe):
        pytest.skip("no iceberg-spark-runtime on the classpath")

    s = (
        SparkSession.builder.appName("iceberg_live")
        .config("spark.sql.catalog.lake", "org.apache.iceberg.spark.SparkCatalog")
        .config("spark.sql.catalog.lake.type", "hadoop")
        .config("spark.sql.catalog.lake.warehouse", str(tmp_path / "warehouse"))
        .getOrCreate()
    )
    s.sql("CREATE NAMESPACE IF NOT EXISTS lake.db")
    df = s.range(1000).select(
        F.col("id"), F.pmod("id", F.lit(10)).alias("bucket")
    )
    df.writeTo("lake.db.t").partitionedBy(F.col("bucket")).using("iceberg").createOrReplace()
    back = tio.read_table(s, "lake.db.t", fmt="iceberg").where(F.col("bucket") == 3)
    assert back.count() == 100
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "bucket" in plan  # filter reached the Iceberg scan node
