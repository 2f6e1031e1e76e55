"""CSV point-cloud loader — the reference's vertex input format.

``test/community_detection.cpp:706-759`` loads ``x,y,z,id`` CSV rows
(fixtures in ``community_test_cases/*.csv``) and round-robins them
across PEs; here one ``spark.read.csv`` with an explicit schema does
the load and the shuffle partitioner does the distribution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

POINT_SCHEMA = T.StructType(
    [
        T.StructField("x", T.StringType(), False),
        T.StructField("y", T.StringType(), False),
        T.StructField("z", T.StringType(), False),
        T.StructField("id", T.StringType(), False),  # reference stores ids as floats
    ]
)


def _atof(col) -> F.Column:
    """C ``atof`` semantics: parse the longest leading float prefix,
    0.0 when none. The reference's own fixture
    ``community_test_cases/8_vert_2_cliq_overlapping.csv`` contains the
    malformed value ``0.0.11`` which atof reads as 0.0 — a strict
    DoubleType cast would null the row instead."""
    lead = F.regexp_extract(col, r"^\s*([+-]?\d*\.?\d+([eE][+-]?\d+)?)", 1)
    return F.coalesce(lead.cast("double"), F.lit(0.0))


def load_points_csv(spark: SparkSession, path: str) -> DataFrame:
    """(id: long, x, y, z) from the reference's ``x,y,z,id`` CSV
    (``community_detection.cpp:706-759``), atof-permissive."""
    raw = spark.read.csv(path, schema=POINT_SCHEMA)
    return raw.select(
        _atof(F.col("id")).cast("long").alias("id"),
        _atof(F.col("x")).alias("x"),
        _atof(F.col("y")).alias("y"),
        _atof(F.col("z")).alias("z"),
    )


def points_from_rows(spark: SparkSession, rows) -> DataFrame:
    """Fixture helper: (id, x, y, z) tuples → DataFrame."""
    return spark.createDataFrame(
        [(int(i), float(x), float(y), float(z)) for (x, y, z, i) in rows],
        schema="id long, x double, y double, z double",
    )
