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
        T.StructField("x", T.DoubleType(), False),
        T.StructField("y", T.DoubleType(), False),
        T.StructField("z", T.DoubleType(), False),
        T.StructField("id", T.DoubleType(), False),  # reference stores ids as floats
    ]
)


def load_points_csv(spark: SparkSession, path: str) -> DataFrame:
    """(id: long, x, y, z) from the reference's ``x,y,z,id`` CSV."""
    raw = spark.read.csv(path, schema=POINT_SCHEMA)
    return raw.select(
        F.col("id").cast("long").alias("id"), "x", "y", "z"
    )


def points_from_rows(spark: SparkSession, rows) -> DataFrame:
    """Fixture helper: (id, x, y, z) tuples → DataFrame."""
    return spark.createDataFrame(
        [(int(i), float(x), float(y), float(z)) for (x, y, z, i) in rows],
        schema="id long, x double, y double, z double",
    )
