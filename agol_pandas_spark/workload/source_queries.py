"""Oracle-checked queries for the source layer (``sources/readers.py``)
and skew tooling (``operators/skew.py``).

The CSV path mirrors the reference's staging pipeline — every write went
through a temp CSV with server-side schema re-inference
(``src/agol_pandas.py:429-443``). Here the engine stages a Spark-written
CSV/JSON dataset and reads it back with inference; the oracle runs on the
original parquet, so the roundtrip itself is under test (column choice is
inference-lossless: longs, 2-decimal doubles, strings).
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from agol_pandas_spark.catalog import Catalog
from agol_pandas_spark.operators.skew import salted_join
from agol_pandas_spark.sources.readers import read_csv_inferred, read_json
from agol_pandas_spark.workload import register


def _stage(kind: str) -> str:
    return os.path.join(tempfile.gettempdir(), f"stage_{kind}_{uuid.uuid4().hex[:8]}")


@register(
    "source_csv_inferred_agg",
    tags=("source", "csv", "schema-inference"),
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n,
           SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS balance_scaled
    FROM customer GROUP BY c_mktsegment
    """,
)
def source_csv_inferred_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV staging roundtrip: write → infer-read → aggregate. Matches the
    original table iff inference reproduced the types exactly."""
    cust = Catalog(spark, sf_dir).table("customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    path = _stage("csv")
    cust.write.option("header", True).csv(path)
    back = read_csv_inferred(spark, path)
    return back.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("c_acctbal") * 100).cast("long")).alias("balance_scaled"),
    )


@register(
    "source_json_agg",
    tags=("source", "json"),
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n,
           SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS total_scaled
    FROM orders GROUP BY o_orderstatus
    """,
)
def source_json_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines staging roundtrip with schema inference."""
    orders = Catalog(spark, sf_dir).table("orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    path = _stage("json")
    orders.write.json(path)
    back = read_json(spark, path)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("total_scaled"),
    )


@register(
    "join_salted_orders_customer",
    tags=("join", "skew", "salted"),
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_orders,
           SUM(o_orderkey) AS orderkey_checksum
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def join_salted_orders_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted equi-join (16 buckets): row-identical to the plain join —
    the oracle proves it — while a heavy-hitter custkey would spread over
    16 partitions instead of stalling one."""
    cat = Catalog(spark, sf_dir)
    orders = cat.table("orders").select("o_orderkey", "o_custkey")
    cust = cat.table("customer").select("c_custkey", "c_mktsegment")
    joined = salted_join(
        orders,
        cust.withColumnRenamed("c_custkey", "o_custkey"),
        on=["o_custkey"],
        salt_buckets=16,
        scatter_col="o_orderkey",
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("o_orderkey").alias("orderkey_checksum"),
    )


@register(
    "source_partitioned_pruning",
    tags=("source", "partitioning", "pruning"),
    oracle="""
    SELECT user_id, COUNT(*) AS n,
           SUM(CAST(round(value * 10000) AS BIGINT)) AS value_scaled
    FROM events WHERE event_type = 'purchase'
    GROUP BY user_id
    """,
)
def source_partitioned_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned write + partition-pruned read: events land
    partitioned by event_type; the filter prunes to one partition
    directory, so the scan never opens the other 4/5 of the data — the
    100 TB pattern for any high-selectivity categorical predicate
    (PartitionFilters asserted in tests/test_plans.py)."""
    ev = Catalog(spark, sf_dir).table("events").select(
        "user_id", "event_type", "value"
    )
    path = _stage("part")
    ev.write.partitionBy("event_type").parquet(path)
    back = spark.read.parquet(path)
    return (
        back.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 10000).cast("long")).alias("value_scaled"),
        )
    )
