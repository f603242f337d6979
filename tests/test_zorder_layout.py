"""Z-ORDER OPTIMIZE: row-identical rewrite + measured pruning win.

The pruning assertion works at the exact mechanism parquet readers use:
per-row-group footer min/max stats. For a 2-D box predicate we count how
many row groups of each layout COULD contain matches (stats ranges
intersect the box). A z-ordered layout packs each file into a compact
rectangle of (custkey, totalprice) space, so most row groups are
excluded by stats alone; the natural (orderkey-ordered) layout spreads
both columns across every file, so nothing is excluded.
"""

from __future__ import annotations

import glob
import os
import tempfile

import pyarrow.parquet as pq
import pytest

from agol_pandas_spark.catalog import Catalog

N_FILES = 24
BOX = {"o_custkey": (100, 200), "o_totalprice": (50_000.0, 100_000.0)}


def _rowgroups_intersecting_box(table_path: str) -> tuple[int, int]:
    total = hits = 0
    for f in glob.glob(os.path.join(table_path, "*.parquet")):
        meta = pq.ParquetFile(f).metadata
        idx = {
            meta.row_group(0).column(i).path_in_schema: i
            for i in range(meta.num_columns)
        }
        for rg in range(meta.num_row_groups):
            total += 1
            ok = True
            for col, (lo, hi) in BOX.items():
                st = meta.row_group(rg).column(idx[col]).statistics
                if st is None:
                    continue  # no stats → not prunable, counts as hit
                if st.min > hi or st.max < lo:
                    ok = False
                    break
            hits += ok
    return hits, total


@pytest.fixture(scope="module")
def layouts(spark, sf_dir):
    tmp = tempfile.mkdtemp(prefix="zorder_")
    cat = Catalog(spark, tmp)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cat.write(
        orders.repartitionByRange(N_FILES, "o_orderkey")
        .sortWithinPartitions("o_orderkey"),
        "orders_natural",
    )
    cat.write(
        orders.repartitionByRange(N_FILES, "o_orderkey")
        .sortWithinPartitions("o_orderkey"),
        "orders_z",
    )
    cat.optimize_zorder(
        "orders_z", ["o_custkey", "o_totalprice"], num_files=N_FILES
    )
    return cat


def test_zorder_rewrite_is_row_identical(layouts):
    cat = layouts
    a = sorted(map(tuple, cat.table("orders_natural").collect()))
    b = sorted(map(tuple, cat.table("orders_z").collect()))
    assert a == b


def test_zorder_prunes_rowgroups_on_a_2d_box(layouts):
    cat = layouts
    nat_hits, nat_total = _rowgroups_intersecting_box(
        cat.path("orders_natural")
    )
    z_hits, z_total = _rowgroups_intersecting_box(cat.path("orders_z"))
    # natural order by orderkey: custkey/totalprice stripe every file
    assert nat_hits == nat_total
    # z layout: the small box must exclude the large majority of groups
    assert z_total >= N_FILES // 2
    assert z_hits * 3 <= z_total, (
        f"z layout pruned too little: {z_hits}/{z_total} row groups "
        f"intersect the box (natural: {nat_hits}/{nat_total})"
    )
    # and the predicate returns identical rows on both layouts
    pred = (
        "o_custkey BETWEEN 100 AND 200 "
        "AND o_totalprice BETWEEN 50000.0 AND 100000.0"
    )
    a = sorted(map(tuple, cat.table("orders_natural").filter(pred).collect()))
    b = sorted(map(tuple, cat.table("orders_z").filter(pred).collect()))
    assert a == b and a


def test_zorder_validates_inputs(spark):
    from agol_pandas_spark.errors import TableNotFoundError
    from agol_pandas_spark.functions.geometry import z_value_n

    tmp = tempfile.mkdtemp(prefix="zorder_bad_")
    cat = Catalog(spark, tmp)
    with pytest.raises(TableNotFoundError):
        cat.optimize_zorder("nope", ["x"])
    with pytest.raises(ValueError, match="signed long"):
        z_value_n([spark.range(1).id] * 4, bits=16)
    with pytest.raises(ValueError, match="at least one"):
        z_value_n([], bits=8)


def test_rank_cells_zorder_survives_skew(spark, tmp_path):
    """A single extreme outlier squashes min/max cell scaling: the
    skewed dimension stops contributing to the layout and every file
    covers its full (non-outlier) value range. Equi-depth rank cells
    keep clustering — mean distinct-B-per-file drops sharply."""
    from pyspark.sql import functions as F

    from agol_pandas_spark.catalog import Catalog

    cat = Catalog(spark, str(tmp_path))
    df = spark.range(4000).select(
        F.col("id").alias("a"),
        # b: 10 regular values + one 1e9 outlier => min/max cells
        # collapse all regular rows into cell 0
        F.when(F.col("id") == 0, F.lit(10**9))
        .otherwise(F.col("id") % 10)
        .cast("long")
        .alias("b"),
    )
    def mean_distinct_b_per_file(table):
        per_file = (
            spark.read.parquet(cat.path(table))
            .select(F.input_file_name().alias("f"), "b")
            .filter(F.col("b") < 10**9)
            .groupBy("f")
            .agg(F.countDistinct("b").alias("d"))
            .collect()
        )
        return sum(r["d"] for r in per_file) / len(per_file)

    cat.write(df.repartition(8), "minmax", mode="error")
    cat.optimize_zorder("minmax", ["a", "b"], num_files=16)
    cat.write(df.repartition(8), "ranked", mode="error")
    cat.optimize_zorder("ranked", ["a", "b"], num_files=16, rank_cells=True)
    mm = mean_distinct_b_per_file("minmax")
    rk = mean_distinct_b_per_file("ranked")
    # min/max layout: b contributes nothing -> files see ~all 10 values;
    # rank layout clusters b -> files see far fewer
    assert rk * 2 < mm, (mm, rk)
    # row identity preserved
    assert (
        sorted(map(tuple, cat.table("ranked").collect()))
        == sorted(map(tuple, df.collect()))
    )
