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
