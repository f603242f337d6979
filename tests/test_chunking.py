"""Chunking edge cases (FIXTURES.md §B edge list) and the reference-bug
regressions for the chunker (``src/agol_pandas.py:159-216, 416-419``)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from agol_pandas_spark.operators.chunking import (
    iter_pandas_chunks,
    partition_lineage,
    repartition_by_sorted_range,
    with_chunk_id,
)


@pytest.fixture(scope="module")
def nums(spark):
    return spark.range(0, 100).withColumn("k", F.col("id"))


@pytest.mark.parametrize("n,size,expected_sizes", [
    (100, 40, [40, 40, 20]),
    (100, 100, [100]),       # exactly chunk_size
    (100, 101, [100]),       # chunk_size + 1
    (100, 99, [99, 1]),      # chunk_size - 1
    (100, 50, [50, 50]),     # 2 × chunk_size
])
def test_with_chunk_id_exact_sizes(spark, n, size, expected_sizes):
    df = spark.range(0, n).withColumn("k", F.col("id"))
    chunked = with_chunk_id(df, chunk_size=size, keys=("k",))
    sizes = [
        r["n_rows"]
        for r in partition_lineage(chunked, key="k").orderBy("chunk_id").collect()
    ]
    assert sizes == expected_sizes


def test_with_chunk_id_keyless_works(nums):
    # reference bug :416-419 — keyless chunked append raised NameError
    chunked = with_chunk_id(nums, chunk_size=30)
    sizes = sorted(
        r["n_rows"] for r in partition_lineage(chunked).collect()
    )
    assert sizes == [10, 30, 30, 30]


def test_chunk_ranges_are_disjoint_and_ordered(nums):
    chunked = with_chunk_id(nums, chunk_size=25, keys=("k",))
    lin = partition_lineage(chunked, key="k").orderBy("chunk_id").collect()
    for prev, cur in zip(lin, lin[1:]):
        assert prev["key_max"] < cur["key_min"]


def test_partition_lineage_without_key_has_no_minmax(nums):
    cols = partition_lineage(with_chunk_id(nums, chunk_size=50)).columns
    assert cols == ["chunk_id", "n_rows"]


def test_repartition_by_sorted_range(nums):
    parts = repartition_by_sorted_range(nums, 4, ("k",))
    assert parts.rdd.getNumPartitions() == 4
    # each partition internally sorted and ranges disjoint
    rows = parts.withColumn("pid", F.spark_partition_id()).collect()
    by_pid: dict[int, list[int]] = {}
    for r in rows:
        by_pid.setdefault(r["pid"], []).append(r["k"])
    bounds = sorted((min(v), max(v)) for v in by_pid.values())
    for v in by_pid.values():
        assert v == sorted(v)
    for (lo1, hi1), (lo2, hi2) in zip(bounds, bounds[1:]):
        assert hi1 < lo2


def test_iter_pandas_chunks_order_and_sizes(nums):
    chunks = list(iter_pandas_chunks(nums, chunk_size=33, keys=("k",)))
    assert [len(c) for c in chunks] == [33, 33, 33, 1]
    flat = [k for c in chunks for k in c["k"].tolist()]
    assert flat == sorted(flat)


def test_iter_pandas_chunks_empty(spark):
    df = spark.range(0, 0).withColumn("k", F.col("id"))
    assert list(iter_pandas_chunks(df, chunk_size=10, keys=("k",))) == []


def test_iter_pandas_chunks_streams_partitionwise(spark):
    """Driver memory contract: pulling the first chunk must not compute
    every input partition (round 1 collected the whole result via
    toArrow). Instrumented with an accumulator bumped once per computed
    partition; prefetchPartitions=False ships partitions one job at a
    time in the keyless (no-shuffle) path."""
    acc = spark.sparkContext.accumulator(0)

    def track(batches):
        acc.add(1)
        for b in batches:
            yield b

    base = spark.range(0, 1000, 1, 8)
    inst = base.mapInArrow(track, base.schema)
    it = iter_pandas_chunks(inst, chunk_size=50)
    first = next(it)
    assert len(first) == 50
    assert acc.value < 8, f"all partitions computed for first chunk ({acc.value})"
    rest = list(it)
    assert sum(len(c) for c in [first, *rest]) == 1000
    flat = [v for c in [first, *rest] for v in c["id"].tolist()]
    assert flat == sorted(flat)


def test_rendezvous_shard_minimal_movement(spark):
    """K -> K+1 moves ~1/(K+1) of keys (mod-K moves ~K/(K+1)); moved
    keys land ONLY on the new shard; assignments match a Python HRW
    recompute."""
    import hashlib

    from pyspark.sql import functions as F

    from agol_pandas_spark.operators.chunking import rendezvous_shard

    keys = spark.range(0, 3000).select(F.col("id").alias("k"))
    s4 = rendezvous_shard(keys, "k", 4)
    s5 = rendezvous_shard(keys, "k", 5)
    rows = {r["k"]: (r["shard_4"], r["shard_5"])
            for r in s4.join(s5, "k").collect()}

    def hrw(k, n):
        return max(
            range(n),
            key=lambda s: (
                int(hashlib.md5(f"shard{k}#{s}".encode()).hexdigest()[:15], 16),
                s,
            ),
        )

    for k, (a, b) in list(rows.items())[:200]:
        assert (a, b) == (hrw(k, 4), hrw(k, 5)), k

    moved = [k for k, (a, b) in rows.items() if a != b]
    assert all(rows[k][1] == 4 for k in moved)  # movers go to the NEW shard
    frac = len(moved) / len(rows)
    assert 0.1 < frac < 0.3  # ~1/5 expected
    mod_moved = sum(1 for k in rows if k % 4 != k % 5) / len(rows)
    assert mod_moved > 0.7  # mod-K reshuffles most keys
