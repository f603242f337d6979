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
- :func:`with_chunk_id` — the exact-semantics path: chunk i = sorted rows
  ``[i*size, (i+1)*size)``. Implemented WITHOUT a global window: range
  shuffle, per-partition counts (one small agg), driver-side cumulative
  offsets (P integers), then a zero-shuffle Arrow pass that numbers rows
  per partition. The sorted layout is persisted between the count job and
  the numbering job so partition assignment can't drift between the two.
- :func:`partition_lineage` — per-chunk row counts and key min/max, the
  distributed replacement for the reference's driver-side lineage dicts
  (``:621-634``); one hash aggregation instead of a sequential loop.
- :func:`iter_pandas_chunks` — driver iteration with O(partition) driver
  memory: ``toLocalIterator`` over the range-sorted result ships one
  partition at a time, fixing both the reference's re-collect-per-chunk
  bug (``:204``) and round-1's full ``toArrow()`` collect.
"""

from __future__ import annotations

import os
from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
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
    keyless case (sort order = input order surrogate), which the reference
    breaks (``:416-419``).

    Scale shape: no global ``Window.orderBy`` (round 1's version funneled
    every row through ONE task for the numbering — a stall at 100×).
    Instead: (1) range-partition + sort within partitions (one shuffle,
    all partitions work); (2) count rows per partition — a tiny agg whose
    result is P integers on the driver; (3) add a per-partition row index
    in a single Arrow pass-through batch stage and offset it by the
    partition's cumulative start. The sorted layout is persisted
    (MEMORY_AND_DISK) so steps 2 and 3 see identical partition
    assignments — range boundaries are sampled per job and MUST NOT be
    recomputed between the counting and numbering passes. The cache entry
    lives until the caller materializes and clears it (bench.py
    clearCaches between runs).
    """
    if chunk_size <= 0:
        raise ValueError("chunk_size must be positive")
    import numpy as np
    import pyarrow as pa
    from pyspark import TaskContext
    from pyspark.sql import types as T
    from pyspark.storagelevel import StorageLevel

    spark = df.sparkSession
    if keys:
        p = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
        parts = repartition_by_sorted_range(df, p, keys)
    else:
        parts = df  # input order surrogate: existing partition layout
    parts = parts.persist(StorageLevel.MEMORY_AND_DISK)

    counts = {
        r["__pid"]: r["n"]
        for r in parts.groupBy(F.spark_partition_id().alias("__pid"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):  # range partitions are ordered by id
        offsets[pid] = acc
        acc += counts[pid]

    out_schema = T.StructType(
        list(parts.schema.fields) + [T.StructField("__global_rn", T.LongType())]
    )

    def number_rows(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        pid = TaskContext.get().partitionId()
        seen = 0
        for b in batches:
            start = offsets[pid] + seen
            idx = pa.array(np.arange(start, start + b.num_rows, dtype=np.int64))
            seen += b.num_rows
            yield b.append_column("__global_rn", idx)

    numbered = parts.mapInArrow(number_rows, out_schema)
    return numbered.withColumn(
        col_name, F.floor(F.col("__global_rn") / F.lit(chunk_size)).cast("int")
    ).drop("__global_rn")


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
    """Driver-side ordered pandas chunks, O(one partition) driver memory.

    The API the reference exposes (``df_to_pandas_chunks``) for callers
    that feed a non-distributed sink. ``orderBy`` range-partitions and
    sorts the result, and ``toLocalIterator(prefetchPartitions=False)``
    then ships ONE partition at a time in partition (= global key) order —
    the driver never holds the whole result (round 1 collected it all in
    one ``toArrow()``; the reference re-collected it per chunk, ``:204``).
    Rows are re-batched into exact ``chunk_size`` pandas frames through
    the DataFrame's Arrow schema, so dtypes match the old Arrow-collect
    path. Partition size (the driver's memory high-water mark) is governed
    by ``spark.sql.shuffle.partitions``, which the session sizes for the
    target scale.
    """
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_schema

    ordered = df.orderBy(*[F.col(k) for k in keys]) if keys else df
    schema = to_arrow_schema(ordered.schema)

    def flush(buf: list[dict]) -> pd.DataFrame:
        return pa.Table.from_pylist(buf, schema=schema).to_pandas()

    buf: list[dict] = []
    for row in ordered.toLocalIterator(prefetchPartitions=False):
        buf.append(row.asDict(recursive=True))
        if len(buf) == chunk_size:
            yield flush(buf)
            buf = []
    if buf:
        yield flush(buf)


def spread_small_scan(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition a narrow scan when it has fewer partitions
    than the cluster has cores.

    A small parquet dataset (one file, one row group) plans as one task, so
    an expensive downstream map stage (hashing, scoring) runs on one core.
    The shuffle moves only the scan's projected columns and is a no-op
    decision at real scale, where inputs already split into >= parallelism
    partitions. Keep heavy per-row pipelines behind this; leave cheap scans
    alone.

    The partition count is *estimated* from input-file sizes vs
    ``spark.sql.files.maxPartitionBytes`` (a driver-side stat over the
    scan's already-listed files) rather than ``df.rdd.getNumPartitions()``
    — converting the plan to an RDD costs ~200 ms of driver time per call
    and is pure overhead for a yes/no decision. Non-file-backed plans fall
    back to the RDD probe.
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    current = _estimated_scan_partitions(df)
    if current is None:
        current = df.rdd.getNumPartitions()
    if current >= target:
        return df
    return df.repartition(target)


def _estimated_scan_partitions(df: DataFrame) -> int | None:
    """Estimate a file-backed scan's partition count as
    ceil(total_bytes / maxPartitionBytes); None when the plan exposes no
    input files (e.g. in-memory or post-shuffle DataFrames)."""
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    total = 0
    for f in files:
        local = f.removeprefix("file:")
        try:
            total += os.path.getsize(local)
        except OSError:
            return None
    raw = df.sparkSession.conf.get("spark.sql.files.maxPartitionBytes", "134217728b")
    digits = "".join(ch for ch in raw if ch.isdigit()) or "134217728"
    max_pb = max(1, int(digits))
    return max(1, -(-total // max_pb))


def with_running_total(
    df: DataFrame,
    val_col: str,
    keys: Sequence[str],
    col_name: str = "running_start",
) -> DataFrame:
    """Exclusive global running total of ``val_col`` in ``keys`` order
    (row's value excluded — i.e. the row's starting offset), without a
    global window.

    Same two-phase shape as :func:`with_chunk_id`: range-partition + sort
    (one shuffle, every partition works), per-partition partial sums (a
    P-integer collect), then one Arrow pass-through stage adds each
    partition's cumulative offset to its local running sum. The sorted
    layout is persisted so the counting and numbering passes see identical
    partition assignments.
    """
    import numpy as np
    import pyarrow as pa
    from pyspark import TaskContext
    from pyspark.sql import types as T
    from pyspark.storagelevel import StorageLevel

    spark = df.sparkSession
    p = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    parts = repartition_by_sorted_range(df, p, keys).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    partials = {
        r["__pid"]: r["s"]
        for r in parts.groupBy(F.spark_partition_id().alias("__pid"))
        .agg(F.sum(F.col(val_col)).alias("s"))
        .collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(partials):
        offsets[pid] = acc
        acc += int(partials[pid] or 0)

    out_schema = T.StructType(
        list(parts.schema.fields) + [T.StructField(col_name, T.LongType())]
    )
    vidx = [f.name for f in parts.schema.fields].index(val_col)

    def add_running(batches):
        pid = TaskContext.get().partitionId()
        seen = offsets.get(pid, 0)
        for b in batches:
            vals = b.column(vidx).to_numpy(zero_copy_only=False).astype(np.int64)
            starts = seen + np.concatenate(([0], np.cumsum(vals)[:-1]))
            seen += int(vals.sum())
            yield b.append_column(col_name, pa.array(starts))

    return parts.mapInArrow(add_running, out_schema)


def rendezvous_shard(df, key_col: str, n_shards: int, salt: str = "shard"):
    """Rendezvous (highest-random-weight) shard assignment: every key
    scores each shard with the portable hash of (key, shard) and joins
    the argmax — the consistent-hashing scheme whose defining property
    is MINIMAL MOVEMENT: growing from K to K+1 shards reassigns only
    ~1/(K+1) of keys, where a mod-K scheme reshuffles (K-1)/K of the
    table. That is the difference between a shard-count change costing
    O(table/K) and O(table) at 100 TB.

    Pure map + per-key argmax over K scores (the K-way explode carries
    integers, never payloads; one partitioned window sized K per key).
    Deterministic: ties (a 60-bit hash collision across K values)
    break toward the higher shard id. Returns ``df`` plus
    ``shard_{n_shards}``.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from agol_pandas_spark.functions.text import portable_hash60

    scored = df.select(
        F.col(key_col),
        F.explode(F.array(*[F.lit(i) for i in range(int(n_shards))])).alias(
            "__s"
        ),
    ).select(
        key_col,
        "__s",
        portable_hash60(
            F.concat(
                F.lit(salt), F.col(key_col).cast("string"),
                F.lit("#"), F.col("__s").cast("string"),
            )
        ).alias("__h"),
    )
    w = Window.partitionBy(key_col).orderBy(
        F.col("__h").desc(), F.col("__s").desc()
    )
    best = (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(key_col, F.col("__s").alias(f"shard_{int(n_shards)}"))
    )
    return df.join(best, key_col)
