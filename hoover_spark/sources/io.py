"""Table I/O seam: Iceberg when a runtime is on the classpath, Parquet
otherwise.

The north-rule input is "an Iceberg table of source-code repositories
(repo, path, commit, lang, content)".  Everything downstream of this
module is format-agnostic — kernels see a DataFrame — so the only
Iceberg-specific surface in the whole engine is here.  The sandbox
ships no ``iceberg-spark-runtime`` jar, so:

- :func:`iceberg_available` probes the JVM classpath (cheap, cached);
- :func:`read_table` / :func:`write_table` use Iceberg when asked for
  it and available, and plain Parquet for ``fmt="auto"`` fallback;
- asking for ``fmt="iceberg"`` without the runtime raises immediately
  with the exact spark-submit flags that fix it, instead of a deep
  Py4J stack trace.

On a real cluster the engine is launched as::

    spark-submit --py-files dist/hoover_spark.zip \
      --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0 \
      --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog \
      --conf spark.sql.catalog.lake.type=hadoop \
      --conf spark.sql.catalog.lake.warehouse=<warehouse-uri> \
      job.py

after which ``read_table(spark, "lake.db.repos")`` reads the Iceberg
table with full hidden-partitioning / snapshot semantics, and filters
and column pruning push down through the Iceberg scan exactly as they
do for the Parquet fallback (both are DataSource V2 scans).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_ICEBERG_HELP = (
    "no Iceberg runtime on the classpath; launch with "
    "--packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0 "
    "and a spark.sql.catalog.<name>=org.apache.iceberg.spark.SparkCatalog "
    "configuration, or use fmt='parquet'/'auto'"
)

_probe_cache: dict[str, bool] = {}


def iceberg_available(spark: SparkSession) -> bool:
    """True iff ``org.apache.iceberg.spark.SparkCatalog`` is loadable in
    this session's JVM (i.e. an iceberg-spark-runtime jar is packaged).

    Cached per Spark application id — stable for the JVM's lifetime,
    unlike ``id(spark)``, which a later session can reuse after the
    first is stopped (ADVICE r2)."""
    key = spark.sparkContext.applicationId
    if key not in _probe_cache:
        try:
            jvm = spark.sparkContext._jvm  # noqa: SLF001 - classpath probe
            jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
            _probe_cache[key] = True
        except Exception:
            _probe_cache[key] = False
    return _probe_cache[key]


def _looks_like_table_name(location: str) -> bool:
    """catalog.db.table vs a filesystem/object-store path."""
    return "/" not in location and not location.startswith(("s3:", "file:", "hdfs:"))


def read_table(spark: SparkSession, location: str, fmt: str = "auto") -> DataFrame:
    """Read a table by catalog name (``lake.db.repos``) or path.

    fmt='iceberg'  — require the Iceberg runtime (raise with fix if absent)
    fmt='parquet'  — plain parquet path
    fmt='auto'     — catalog names via ``spark.table`` (works for any
                     registered catalog, Iceberg included); paths as
                     Iceberg when the runtime is packaged and the path
                     has Iceberg metadata, else parquet.
    """
    if fmt == "iceberg":
        if not iceberg_available(spark):
            raise RuntimeError(_ICEBERG_HELP)
        if _looks_like_table_name(location):
            return spark.table(location)
        return spark.read.format("iceberg").load(location)
    if fmt == "parquet":
        return spark.read.parquet(location)
    if fmt != "auto":
        raise ValueError(f"unknown fmt {fmt!r} (iceberg|parquet|auto)")
    if _looks_like_table_name(location):
        return spark.table(location)
    if iceberg_available(spark):
        try:
            return spark.read.format("iceberg").load(location)
        except Exception as iceberg_err:
            # path without Iceberg metadata -> parquet; but if the
            # parquet fallback ALSO fails, surface the suppressed
            # Iceberg failure (corrupt metadata / permissions) instead
            # of an unrelated parquet error (ADVICE r2)
            try:
                return spark.read.parquet(location)
            except Exception as parquet_err:
                raise parquet_err from iceberg_err
    return spark.read.parquet(location)


def write_table(
    df: DataFrame, location: str, fmt: str = "auto", mode: str = "overwrite"
) -> None:
    """Write by catalog name or path, mirroring :func:`read_table`."""
    spark = df.sparkSession
    if fmt == "iceberg" and not iceberg_available(spark):
        raise RuntimeError(_ICEBERG_HELP)
    use_iceberg = fmt == "iceberg" or (fmt == "auto" and iceberg_available(spark))
    if _looks_like_table_name(location):
        # the writeTo (DataFrameWriterV2) branch only has create-or-
        # replace and append verbs; 'error'/'ignore' must not silently
        # become appends (ADVICE r2)
        if mode not in ("overwrite", "append"):
            raise ValueError(
                f"mode {mode!r} unsupported for catalog table writes "
                "(use 'overwrite' or 'append')"
            )
        writer = df.writeTo(location)
        if use_iceberg:
            writer = writer.using("iceberg")
        writer.createOrReplace() if mode == "overwrite" else writer.append()
        return
    if use_iceberg:
        df.write.format("iceberg").mode(mode).save(location)
    else:
        df.write.mode(mode).parquet(location)
