"""Paged-connector skeleton (sources/paged.py): pagination, parallel page
partitions, retry-policy absorption of transient failures, schema
fidelity, and the sequential unknown-total fallback — against in-memory
and parquet-backed mock services (no network)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from agol_pandas_spark.sources.paged import (
    ParquetPagedClient,
    RetryPolicy,
    read_paged,
)
from agol_pandas_spark.sources.paged_mock import MemoryClient as _Mem


def MemoryClient(rows, known_total=True, flaky_failures=0):
    return _Mem(rows, SCHEMA, known_total=known_total, flaky_failures=flaky_failures)

SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("name", StringType()),
        StructField("score", DoubleType()),
        StructField("rank", IntegerType()),
        StructField("ts", TimestampType()),
    ]
)


def _rows(n):
    return [
        (
            i,
            None if i % 7 == 0 else f"row-{i}",
            i * 0.5,
            i % 3,
            dt.datetime(2026, 1, 1) + dt.timedelta(minutes=i),
        )
        for i in range(n)
    ]


FAST_RETRY = RetryPolicy(max_attempts=4, max_backoff=0.01)


def test_pagination_exactly_once(spark):
    rows = _rows(95)
    df = read_paged(spark, MemoryClient(rows), page_size=10, policy=FAST_RETRY)
    assert df.rdd.getNumPartitions() == 10  # one task per page
    got = sorted(r["id"] for r in df.collect())
    assert got == list(range(95))  # no dup, no drop across page boundaries


def test_schema_fidelity(spark):
    rows = _rows(20)
    df = read_paged(spark, MemoryClient(rows), page_size=7, policy=FAST_RETRY)
    assert df.schema == SCHEMA
    back = {r["id"]: r for r in df.collect()}
    assert back[8]["name"] == "row-8" and back[14]["name"] is None
    assert back[3]["score"] == 1.5 and back[4]["rank"] == 1
    assert back[2]["ts"] == dt.datetime(2026, 1, 1, 0, 2)


def test_retry_policy_absorbs_transient_failures(spark):
    rows = _rows(30)
    client = MemoryClient(rows, flaky_failures=2)  # every page fails twice
    df = read_paged(spark, client, page_size=10, policy=FAST_RETRY)
    assert sorted(r["id"] for r in df.collect()) == list(range(30))


def test_retry_policy_exhausts(spark):
    client = MemoryClient(_rows(10), flaky_failures=10)
    df = read_paged(
        spark, client, page_size=5, policy=RetryPolicy(max_attempts=2, max_backoff=0.01)
    )
    with pytest.raises(Exception, match="injected transient"):
        df.collect()


def test_unknown_total_sequential_fallback(spark):
    rows = _rows(23)
    df = read_paged(
        spark, MemoryClient(rows, known_total=False), page_size=10, policy=FAST_RETRY
    )
    assert df.rdd.getNumPartitions() == 1  # degraded mode: one pager
    assert sorted(r["id"] for r in df.collect()) == list(range(23))


def test_empty_source(spark):
    df = read_paged(spark, MemoryClient([]), page_size=10, policy=FAST_RETRY)
    assert df.count() == 0
    assert df.schema == SCHEMA


def test_parquet_backed_client_roundtrip(spark, sf_dir):
    client = ParquetPagedClient(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    )
    df = read_paged(spark, client, page_size=100, policy=FAST_RETRY)
    direct = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "n_chars"
    )
    assert df.schema == direct.schema
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, direct.collect()))
    # retry knobs ride through the option plumbing
    agg = df.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    direct_agg = {
        r["lang"]: r["n"]
        for r in direct.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert {r["lang"]: r["n"] for r in agg.collect()} == direct_agg


def test_parquet_client_row_group_boundaries(spark, tmp_path):
    """Pages spanning row-group boundaries must reassemble exactly (the
    client decodes only overlapping row groups)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = str(tmp_path / "rg.parquet")
    tbl = pa.table({"k": list(range(137)), "v": [i * 2 for i in range(137)]})
    pq.write_table(tbl, path, row_group_size=10)  # 14 row groups

    client = ParquetPagedClient(path)
    assert pq.ParquetFile(path).metadata.num_row_groups > 1
    # page entirely inside one group, spanning several, overhanging the end
    assert [r[0] for r in client.fetch_page(3, 4)] == [3, 4, 5, 6]
    assert [r[0] for r in client.fetch_page(8, 25)] == list(range(8, 33))
    assert [r[0] for r in client.fetch_page(130, 50)] == list(range(130, 137))
    assert client.fetch_page(137, 10) == []

    df = read_paged(spark, client, page_size=25, policy=FAST_RETRY)
    assert sorted(r["k"] for r in df.collect()) == list(range(137))


def _read_sink(root):
    import json
    import os

    batches = []
    for fn in os.listdir(root):
        with open(os.path.join(root, fn)) as f:
            batches.append([tuple(json.loads(line)) for line in f])
    return batches


def test_write_paged_batches_and_parallelism(spark, tmp_path):
    from agol_pandas_spark.sources.paged_mock import DirectoryJsonSink
    from agol_pandas_spark.sources.paged import write_paged

    df = spark.range(0, 50, 1, 3).withColumn("v", F.col("id") * 10)
    write_paged(df, DirectoryJsonSink(str(tmp_path)), page_size=8, policy=FAST_RETRY)
    batches = _read_sink(tmp_path)
    rows = sorted(r for b in batches for r in b)
    assert rows == [(i, i * 10) for i in range(50)]  # exactly-once content
    assert all(len(b) <= 8 for b in batches)
    # 3 partitions of 16/17 rows -> ceil(17/8)=3 or ceil(16/8)=2 batches each
    assert len(batches) == 8


def test_write_paged_retry_absorbs_upload_failures(spark, tmp_path):
    from agol_pandas_spark.sources.paged_mock import DirectoryJsonSink
    from agol_pandas_spark.sources.paged import write_paged

    df = spark.range(0, 20, 1, 2)
    sink = DirectoryJsonSink(str(tmp_path), flaky_failures=1)
    write_paged(df, sink, page_size=6, policy=FAST_RETRY)
    rows = sorted(r[0] for b in _read_sink(tmp_path) for r in b)
    assert rows == list(range(20))


def test_paged_stream_tail_exactly_once_across_restarts(spark, sf_dir, tmp_path):
    """Checkpointed availableNow drains resume from the committed service
    offset: every row lands exactly once across query restarts, and a
    fresh tail sees new rows appended after the first drain."""
    import pyarrow.parquet as pq

    from agol_pandas_spark.sources.paged import (
        ParquetPagedClient,
        RetryPolicy,
        read_paged_stream,
    )

    src = str(tmp_path / "svc.parquet")
    table = pq.read_table(f"{sf_dir}/events.parquet", columns=["event_id", "event_type"])
    pq.write_table(table.slice(0, 700), src)

    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")
    policy = RetryPolicy(max_attempts=2, max_backoff=0.01)

    def drain():
        runs = 0
        while True:
            stream = read_paged_stream(
                spark, ParquetPagedClient(src), page_size=300, policy=policy
            )
            q = (
                stream.writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            runs += 1
            if not q.lastProgress or q.lastProgress["numInputRows"] == 0:
                return runs

    assert drain() >= 3  # 700 rows / 300-page => multiple restarts
    got = spark.read.parquet(out)
    assert got.count() == 700
    assert got.select("event_id").distinct().count() == 700  # exactly-once

    # service grows (append-only contract); the next drain picks up ONLY
    # the new rows, from the committed offset
    pq.write_table(table, src)  # now 1000 rows, first 700 unchanged
    drain()
    got = spark.read.parquet(out)
    assert got.count() == table.num_rows
    assert got.select("event_id").distinct().count() == table.num_rows
