"""Ordered chunking / partitioning — the reference's batcher, distributed.

The reference's ``df_to_pandas_chunks`` (``src/agol_pandas.py:159-216``)
sorts the whole frame and slices consecutive ``chunk_size`` row ranges —
collecting the *entire* DataFrame to the driver once per chunk in the Spark
branch (``:204``, O(rows × chunks)) and NameError-ing in the pandas branch
(``:212-213``). Here "chunk" becomes "partition":

- :func:`repartition_by_sorted_range` — the scale path. One range shuffle,
  approximately-equal partitions, each internally sorted; no global
  bottleneck. Use when exact chunk sizes don't matter (they almost never
  do — the reference's 100k default was an HTTP-payload limit, ``:315``).
- :func:`with_chunk_id` — the exact-semantics path: global ``row_number``
  over the sort key, bucketed by ``floor(rn/chunk_size)``. A global window
  funnels through one partition for the numbering, so this is for
  moderate data or tests, and documented as such.
- :func:`partition_lineage` — per-chunk row counts and key min/max, the
  distributed replacement for the reference's driver-side lineage dicts
  (``:621-634``); one hash aggregation instead of a sequential loop.
- :func:`iter_pandas_chunks` — Arrow-batched driver iteration
  (``toLocalIterator`` over range-partitioned data) for callers that truly
  need pandas chunks on the driver; ships each partition once, fixing the
  reference's re-collect-per-chunk bug (``:204``).
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_CHUNK_SIZE = 100_000  # reference default, src/agol_pandas.py:159,:315


def with_chunk_id(
    df: DataFrame,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    keys: Sequence[str] = (),
    col_name: str = "chunk_id",
) -> DataFrame:
    """Exact sorted chunking: chunk i = sorted rows [i*size, (i+1)*size).

    Matches the reference's slice semantics (``:199-214``) including the
    keyless case (sort order = input order surrogate via monotonic id),
    which the reference breaks (``:416-419``).
    """
    if chunk_size <= 0:
        raise ValueError("chunk_size must be positive")
    if keys:
        w = Window.orderBy(*[F.col(k) for k in keys])
    else:
        df = df.withColumn("__row_ord", F.monotonically_increasing_id())
        w = Window.orderBy("__row_ord")
    out = df.withColumn(
        col_name,
        F.floor((F.row_number().over(w) - F.lit(1)) / F.lit(chunk_size)).cast("int"),
    )
    return out.drop("__row_ord") if not keys else out


def repartition_by_sorted_range(
    df: DataFrame, num_chunks: int, keys: Sequence[str]
) -> DataFrame:
    """Scale path: range-partition on the sort keys, sort within partitions.

    Equivalent *purpose* to the reference's sort+slice (ordered batches a
    sink can consume independently) with one shuffle and no driver
    involvement; partition boundaries come from range sampling, so sizes
    are approximate but the key ranges are disjoint and ordered.
    """
    if not keys:
        raise ValueError("range partitioning requires at least one key")
    cols = [F.col(k) for k in keys]
    return df.repartitionByRange(num_chunks, *cols).sortWithinPartitions(*cols)


def partition_lineage(
    df: DataFrame,
    key: str | None = None,
    chunk_col: str = "chunk_id",
) -> DataFrame:
    """Per-chunk status: rows + key min/max (reference ``:621-634``).

    Returns columns ``(chunk_id, n_rows, key_min, key_max)``; with no key,
    min/max are omitted — fixing the reference's ``KeyError(None)`` when no
    key column was given (``:619``).
    """
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    if key is not None:
        aggs += [F.min(key).alias("key_min"), F.max(key).alias("key_max")]
    return df.groupBy(chunk_col).agg(*aggs).orderBy(chunk_col)


def iter_pandas_chunks(
    df: DataFrame,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    keys: Sequence[str] = (),
) -> Iterator[pd.DataFrame]:
    """Driver-side ordered pandas chunks, each partition shipped once.

    The API the reference exposes (``df_to_pandas_chunks``) for callers
    that feed a non-distributed sink. Rows arrive in key order because
    range partitions are ordered and internally sorted; Arrow-encoded via
    ``toLocalIterator``. Chunks are re-cut to exactly ``chunk_size`` rows.
    """
    ordered = df.orderBy(*[F.col(k) for k in keys]) if keys else df
    # One Arrow collect (vs the reference's one full collect PER chunk,
    # :204); zero-copy slicing after that. Driver memory is O(result) —
    # acceptable by construction: the caller asked for driver-side pandas.
    table = ordered.toArrow()
    if table.num_rows == 0:
        return
    for start in range(0, table.num_rows, chunk_size):
        yield table.slice(start, chunk_size).to_pandas()


def spread_small_scan(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition a narrow scan when it has fewer partitions
    than the cluster has cores.

    A small parquet dataset (one file, one row group) plans as one task, so
    an expensive downstream map stage (hashing, scoring) runs on one core.
    The shuffle moves only the scan's projected columns and is a no-op
    decision at real scale, where inputs already split into >= parallelism
    partitions. Keep heavy per-row pipelines behind this; leave cheap scans
    alone.
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
