"""Persistent per-table metadata (VERDICT r6 item 1).

The reference records its unique-key constraint once as a server-side
index (src/agol_pandas.py:253-312) and stores item_properties at create
(:477,519); every later write relies on the stored declaration. The
engine's analogue is the catalog properties sidecar: declared once,
keyed writes default their ``key=`` from it, and the metadata survives
every data rewrite (overwrite, compaction, restore) but not ``drop``.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from agol_pandas_spark.catalog import Catalog
from agol_pandas_spark.errors import DuplicateKeyError, TableNotFoundError
from agol_pandas_spark.operators.merge import merge_pruned, write_table


def _cat(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path))
    t = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, s string, v double",
    )
    cat.write(t, "t", mode="error")
    return cat


class TestPropertiesSidecar:
    def test_set_get_merge_delete(self, spark, tmp_path):
        cat = _cat(spark, tmp_path)
        assert cat.properties("t") == {}
        cat.set_properties("t", {"title": "T", "owner": "eng"})
        cat.set_properties("t", {"owner": "data", "tags": ["gold"]})
        assert cat.properties("t") == {
            "title": "T", "owner": "data", "tags": ["gold"],
        }
        cat.set_properties("t", {"tags": None})  # None deletes
        assert cat.properties("t") == {"title": "T", "owner": "data"}
        cat.set_properties("t", {"x": 1}, replace=True)
        assert cat.properties("t") == {"x": 1}

    def test_missing_table_raises(self, spark, tmp_path):
        cat = Catalog(spark, str(tmp_path))
        with pytest.raises(TableNotFoundError):
            cat.set_properties("nope", {"a": 1})
        assert cat.properties("nope") == {}

    def test_declared_key_validates_columns(self, spark, tmp_path):
        cat = _cat(spark, tmp_path)
        with pytest.raises(ValueError, match="not in table"):
            cat.set_declared_key("t", "missing_col")
        with pytest.raises(ValueError, match="at least one"):
            cat.set_declared_key("t", [])
        assert cat.set_declared_key("t", "k") == ["k"]
        assert cat.declared_key("t") == ["k"]

    def test_survives_rewrites_dies_with_drop(self, spark, tmp_path):
        cat = _cat(spark, tmp_path)
        cat.set_properties("t", {"title": "T"})
        cat.set_declared_key("t", "k")
        # overwrite
        cat.write(cat.table("t").filter("k < 3"), "t", mode="overwrite",
                  keep_versions=2)
        assert cat.declared_key("t") == ["k"]
        # restore
        cat.restore("t", cat.versions("t")[-1])
        assert cat.properties("t")["title"] == "T"
        # compaction-style rewrite via apply_tombstones no-op
        cat.apply_tombstones("t")
        assert cat.declared_key("t") == ["k"]
        cat.drop("t")
        assert cat.properties("t") == {}
        assert cat.declared_key("t") is None


class TestDeclaredKeyDefaulting:
    def test_write_table_defaults_key_from_declaration(self, spark, tmp_path):
        cat = _cat(spark, tmp_path)
        cat.set_declared_key("t", "k")
        delta = spark.createDataFrame(
            [(2, "B", 99.0), (9, "z", 1.0)], "k long, s string, v double"
        )
        write_table(cat, delta, "t", mode="upsert")  # no key=
        got = {r.k: r.s for r in cat.table("t").collect()}
        assert got == {1: "a", 2: "B", 3: "c", 9: "z"}

    def test_declaration_enforces_uniqueness(self, spark, tmp_path):
        cat = _cat(spark, tmp_path)
        cat.set_declared_key("t", "k")
        dup = spark.createDataFrame(
            [(5, "x", 1.0), (5, "y", 2.0)], "k long, s string, v double"
        )
        with pytest.raises(DuplicateKeyError):
            write_table(cat, dup, "t", mode="upsert")

    def test_explicit_key_wins_over_declaration(self, spark, tmp_path):
        cat = _cat(spark, tmp_path)
        cat.set_declared_key("t", "s")  # declare the WRONG key
        delta = spark.createDataFrame([(2, "B", 99.0)], "k long, s string, v double")
        write_table(cat, delta, "t", mode="upsert", key="k")
        got = {r.k: r.s for r in cat.table("t").collect()}
        assert got == {1: "a", 2: "B", 3: "c"}

    def test_no_declaration_keeps_old_behavior(self, spark, tmp_path):
        cat = _cat(spark, tmp_path)
        delta = spark.createDataFrame([(2, "B", 99.0)], "k long, s string, v double")
        # keyless upsert without declaration: merge treats it as before
        # (no key -> whatever merge() does today; must not raise via
        # the defaulting path itself)
        write_table(cat, cat.table("t"), "t", mode="append")
        assert cat.table("t").count() == 6

    def test_merge_pruned_defaults_key(self, spark, tmp_path):
        cat = _cat(spark, tmp_path)
        cat.set_declared_key("t", "k")
        delta = spark.createDataFrame([(1, "A", 0.5)], "k long, s string, v double")
        stats = merge_pruned(cat, delta, "t", "upsert")  # no key=
        got = {r.k: r.s for r in cat.table("t").collect()}
        assert got == {1: "A", 2: "b", 3: "c"}
        assert "path" in stats


class TestApiRecordsDeclarations:
    def test_create_table_records_key_and_item_properties(self, spark, tmp_path):
        from agol_pandas_spark.api import create_table

        cat = Catalog(spark, str(tmp_path))
        df = spark.createDataFrame([(1, "a")], "k long, s string")
        path, ok = create_table(
            cat, "t", df, key_field_name="k",
            item_properties={"title": "My Table", "snippet": "demo"},
        )
        assert ok, path
        assert cat.declared_key("t") == ["k"]
        assert cat.properties("t")["title"] == "My Table"
        assert cat.properties("t")["snippet"] == "demo"
        # declaration now drives keyless upserts
        write_table(cat, spark.createDataFrame([(1, "z")], "k long, s string"),
                    "t", mode="upsert")
        assert {r.s for r in cat.table("t").collect()} == {"z"}

    def test_create_table_default_title(self, spark, tmp_path):
        from agol_pandas_spark.api import create_table

        cat = Catalog(spark, str(tmp_path))
        df = spark.createDataFrame([(1,)], "k long")
        _, ok = create_table(cat, "plain", df)
        assert ok
        assert cat.properties("plain") == {"title": "plain"}
        assert cat.declared_key("plain") is None

    def test_set_unique_key_constraint_records(self, spark, tmp_path):
        from agol_pandas_spark.api import set_unique_key_constraint

        cat = _cat(spark, tmp_path)
        res, ok = set_unique_key_constraint(cat, "t", "k")
        assert ok and res is True
        assert cat.declared_key("t") == ["k"]
        # non-unique column is rejected AND not recorded
        write_table(
            cat,
            spark.createDataFrame([(9, "a", 1.0)], "k long, s string, v double"),
            "t", mode="append",
        )
        res, ok = set_unique_key_constraint(cat, "t", "s")
        assert not ok
        assert cat.declared_key("t") == ["k"]

    def test_create_hosted_records_on_create_only(self, spark, tmp_path):
        from agol_pandas_spark.api import create_hosted_table_from_dataframe

        cat = Catalog(spark, str(tmp_path))
        df = spark.createDataFrame([(1, "a")], "k long, s string")
        _, ok = create_hosted_table_from_dataframe(
            cat, df, service_name="h", key_field_name="k",
            item_properties={"title": "Hosted"},
        )
        assert ok
        assert cat.declared_key("h") == ["k"]
        assert cat.properties("h")["title"] == "Hosted"
        # merge path must not clobber stored metadata
        _, ok = create_hosted_table_from_dataframe(
            cat, spark.createDataFrame([(1, "b")], "k long, s string"),
            service_name="h", key_field_name="k",
            item_properties={"title": "CLOBBER"},
        )
        assert ok
        assert cat.properties("h")["title"] == "Hosted"


class TestMetadataCrashSafety:
    """Code-review r7 regressions: metadata failures must not strand
    half-created tables or resurrect stale sidecars."""

    def test_unserializable_item_properties_fail_before_create(
        self, spark, tmp_path
    ):
        import datetime

        from agol_pandas_spark.api import create_table

        cat = Catalog(spark, str(tmp_path))
        df = spark.createDataFrame([(1,)], "k long")
        err, ok = create_table(
            cat, "t", df,
            item_properties={"updated": datetime.datetime(2026, 1, 1)},
        )
        assert not ok
        assert not cat.exists("t")  # table NOT stranded
        # retry with clean properties succeeds (no TableExistsError)
        _, ok = create_table(cat, "t", df, item_properties={"x": 1})
        assert ok

    def test_crashed_drop_sidecar_not_resurrected(self, spark, tmp_path):
        import os
        import shutil

        from agol_pandas_spark.api import create_table

        cat = Catalog(spark, str(tmp_path))
        df = spark.createDataFrame([(1, "a")], "k long, s string")
        create_table(cat, "t", df, key_field_name="k",
                     item_properties={"owner": "old"})
        # simulate a crashed drop: data gone, sidecar orphaned
        shutil.rmtree(cat.path("t"))
        assert os.path.exists(cat._properties_path("t"))
        _, ok = create_table(cat, "t", spark.createDataFrame([(9,)], "z long"))
        assert ok
        props = cat.properties("t")
        assert props.get("owner") is None, props  # old metadata gone
        assert cat.declared_key("t") is None  # stale key not resurrected

    def test_drop_removes_sidecar_first(self, spark, tmp_path):
        import os

        cat = Catalog(spark, str(tmp_path))
        cat.write(spark.createDataFrame([(1,)], "k long"), "t", mode="error")
        cat.set_properties("t", {"a": 1})
        cat.drop("t")
        assert not os.path.exists(cat._properties_path("t"))
        assert not cat.exists("t")

    def test_failed_set_properties_leaves_no_tmp(self, spark, tmp_path):
        import datetime
        import os

        import pytest as _pytest

        cat = Catalog(spark, str(tmp_path))
        cat.write(spark.createDataFrame([(1,)], "k long"), "t", mode="error")
        with _pytest.raises(TypeError):
            cat.set_properties("t", {"bad": datetime.datetime(2026, 1, 1)})
        pdir = os.path.dirname(cat._properties_path("t"))
        leftovers = [f for f in os.listdir(pdir) if "__tmp" in f] if os.path.isdir(pdir) else []
        assert leftovers == [], leftovers
