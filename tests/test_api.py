"""Reference-compatible facade: every public entry point of the reference
has a working equivalent (parity checked per SURVEY §2a R1-R4/F1-F2/K1/S1)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from agol_pandas_spark import api
from agol_pandas_spark.catalog import Catalog


@pytest.fixture()
def cat(spark, tmp_path):
    return Catalog(spark, str(tmp_path / "cat"))


@pytest.fixture()
def cust(spark, sf_dir):
    return Catalog(spark, sf_dir).table("customer")


def test_read_write_roundtrip(cat, cust):
    path, ok = api.create_table(cat, "customers", cust, key_field_name="c_custkey")
    assert ok
    df, ok = api.hosted_table_to_df(cat, "customers")
    assert ok and df.count() == cust.count()


def test_read_missing_table_reference_convention(cat):
    payload, ok = api.hosted_table_to_df(cat, "ghost")
    assert not ok and "ghost" in payload


def test_multi_mode_write(cat, cust, spark):
    api.create_table(cat, "c", cust, key_field_name="c_custkey")
    delta = cust.limit(5).withColumn("c_acctbal", F.lit(-1.0))
    results, ok = api.df_to_hosted_table(
        cat, delta, "c", mode="upsert", upsert_column="c_custkey"
    )
    assert ok and sum(r["n_rows"] for r in results) == cust.count()
    got, _ = api.hosted_table_to_df(cat, "c")
    assert got.filter("c_acctbal = -1.0").count() == 5


def test_create_or_merge_by_name(cat, cust):
    results, ok = api.create_hosted_table_from_dataframe(
        cat, cust, service_name="My Customers!", key_field_name="c_custkey"
    )
    assert ok
    assert cat.exists("My Customers!")  # normalized internally
    # second call merges instead of failing
    results, ok = api.create_hosted_table_from_dataframe(
        cat, cust.limit(3), service_name="My Customers!", key_field_name="c_custkey"
    )
    assert ok


def test_create_or_merge_requires_name(cat, cust):
    payload, ok = api.create_hosted_table_from_dataframe(cat, cust)
    assert not ok and "required" in payload


def test_normalize_service_name_reference_rules():
    out, ok = api.normalize_service_name("  9My Service--Name!! ")
    assert ok and out == "_9my_service_name_"


def test_convert_dts_utc_passthrough(cust):
    out, ok = api.convert_dts_utc(cust)
    assert ok and out.count() == cust.count()


def test_df_to_pandas_chunks(cust):
    chunks = list(api.df_to_pandas_chunks(cust, chunk_size=60, keys=["c_custkey"]))
    assert [len(c) for c in chunks][:1] == [60]
    assert sum(len(c) for c in chunks) == cust.count()


def test_set_unique_key_constraint(cat, cust):
    api.create_table(cat, "c", cust)
    ok, ok2 = api.set_unique_key_constraint(cat, "c", "c_custkey")
    assert ok is True and ok2 is True
    # duplicate keys → reference-style (error_string, False)
    dup = cust.unionByName(cust.limit(1))
    api.create_table(cat, "dup", dup)
    payload, ok = api.set_unique_key_constraint(cat, "dup", "c_custkey")
    assert ok is False and "duplicate" in str(payload)


def test_reference_exact_names_available(catalog):
    from agol_pandas_spark import api

    df, ok = api.agol_hosted_item_to_sdf(catalog, "nation")
    assert ok and df.count() == 25
    assert api.df_to_agol_hosted_table is api.df_to_hosted_table
    path, ok = api.get_temp_file(".csv")
    assert ok and path.endswith(".csv")
    import os

    os.unlink(path)


def test_logging_object_backoff_ratchets():
    from agol_pandas_spark.api import LoggingObject

    log = LoggingObject(max_backoff=5.0, backoff_interval=1.0)
    log.record_logging({"chunk": 0, "ok": True})
    assert log.failures == 0 and log.backoff == 0.0
    for i in range(3):
        log.record_failure({"chunk": i, "ok": False})
    assert log.failures == 3
    assert 0 < log.min_backoff <= 5.0
    assert log.min_backoff <= log.backoff <= 5.0
    assert len(log.fail_log) == 3 and len(log.logging_info) == 1


def test_release_session_blocks_drops_cached_rdds(spark):
    """After heavy queries leave localCheckpoint/persist blocks behind,
    release_session_blocks drops them all; released plans still
    recompute correctly."""
    from pyspark.sql import functions as F

    from agol_pandas_spark.operators.ranks import add_global_ranks
    from agol_pandas_spark.session import release_session_blocks

    df = spark.range(0, 1000).select(F.col("id").alias("k"))
    ck = df.localCheckpoint(eager=True)
    ranked = add_global_ranks(
        df.groupBy("k").agg(F.count("*").alias("c")),
        keys=["k"], weight_col="c", rank_col="r", total_col="n",
    )
    assert ranked.count() == 1000
    assert not spark.sparkContext._jsc.getPersistentRDDs().isEmpty()

    release_session_blocks(spark)
    assert spark.sparkContext._jsc.getPersistentRDDs().isEmpty()
    # released plans recompute — fresh queries still run
    assert df.count() == 1000
