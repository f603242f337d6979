"""Format readers.

The reference reads one way: full-table REST fetch into pandas
(``src/agol_pandas.py:218-251``) plus server-side CSV schema inference on
write (``:441-443``). Here each format is a lazy scan; CSV inference
happens **once** at ingest (vs the reference re-inferring per uploaded
chunk) and the resulting schema is fixed thereafter (SURVEY §1.3).

Scale: all three readers accept files, directories, or globs; Spark
parallelizes by file/rowgroup. ``spark.sql.files.maxPartitionBytes``
governs split size — at 100 TB leave it at 128 MB and let AQE coalesce.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_parquet(spark: SparkSession, path: str, columns: list[str] | None = None) -> DataFrame:
    """Parquet scan; pass ``columns`` to prune eagerly (Catalyst also
    prunes from downstream selects — this is for API explicitness)."""
    df = spark.read.parquet(path)
    return df.select(*columns) if columns else df


def read_csv_inferred(
    spark: SparkSession,
    path: str,
    header: bool = True,
    schema: T.StructType | None = None,
    timestamp_format: str | None = None,
) -> DataFrame:
    """CSV with one-shot schema inference (reference behavior
    ``src/agol_pandas.py:441-443``, done client-side and exactly once).

    Inference costs an extra pass over the data — at scale, capture the
    inferred schema from a sample once and pass ``schema`` explicitly.
    """
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    if timestamp_format:
        reader = reader.option("timestampFormat", timestamp_format)
    return reader.csv(path)


def read_json(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """JSON-lines scan; explicit schema skips the inference pass."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_csv_quarantine(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = False,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """PERMISSIVE CSV scan that routes malformed rows to a quarantine
    column instead of aborting the job (FAILFAST) or silently dropping
    them (DROPMALFORMED) — at 100 TB a single bad row must neither kill a
    multi-hour ingest nor vanish unaccounted.

    Returns the data columns plus ``corrupt_col``: NULL for clean rows,
    the raw line for malformed ones (unparsable field → the typed column
    is NULL and the raw line is preserved for a dead-letter table).

    Spark quirk handled here: queries touching ONLY the corrupt column
    are disallowed on raw CSV scans, so downstream quarantine splits must
    keep at least one data column in the projection (the canonical
    pattern: aggregate good rows and count bad ones in one pass).

    The reference's staging pipeline (src/agol_pandas.py:429-443)
    re-inferred schemas server-side and failed the whole upload on any
    bad row; this is the lakehouse-grade replacement.
    """
    full = T.StructType(
        list(schema.fields) + [T.StructField(corrupt_col, T.StringType(), True)]
    )
    return (
        spark.read.schema(full)
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .csv(path)
    )


def read_fixed_width(
    spark: SparkSession,
    path: str,
    layout: list[tuple[str, int, int, str]],
) -> DataFrame:
    """Fixed-width text source: ``layout`` is ``(name, start_1based,
    width, spark_type)`` per field. The mainframe/EDI interchange format
    the reference's CSV staging path never handled. One narrow text scan
    (a single ``value`` column — column pruning is trivially exact),
    then pure JVM ``substring``/``trim``/``cast`` projections: no Python
    in the row path, fully parallel over line splits, and Catalyst folds
    the slicing into whole-stage codegen. Rows shorter than the layout
    yield NULLs in the affected fields (``try_cast`` — under Spark 4's
    ANSI mode a plain cast of the empty slice would fail the whole job;
    a malformed interchange row must quarantine, not abort the ingest).
    """
    from pyspark.sql import functions as F

    raw = spark.read.text(path)
    cols = [
        F.trim(F.substring(F.col("value"), start, width))
        .try_cast(typ)
        .alias(name)
        for name, start, width, typ in layout
    ]
    return raw.select(*cols)
