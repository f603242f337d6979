"""Unit tests for operators/ranks.py — the distributed rank family.

The oracle-parity sweep already checks the eight registry queries built
on it; these tests pin the operator's own contract: exact agreement with
Spark's single-partition window functions on randomized data, partition-
count invariance, tie handling across range boundaries, descending
orders, the weighted-histogram mode, and argument validation.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from agol_pandas_spark.operators.ranks import add_global_ranks


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, tie long, payload string")


def _rows(n, n_distinct):
    # heavy ties: n rows over n_distinct key values, deterministic
    return [
        (i % n_distinct, i, f"p{i}") for i in range(n)
    ]


@pytest.mark.parametrize("parts", [1, 3, 17])
def test_rank_dense_rank_match_window_exactly(spark, parts):
    df = _df(spark, _rows(500, 23))
    w = Window.orderBy("k")
    expected = {
        (r["tie"], r["rnk"], r["drnk"])
        for r in df.select(
            "tie",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        ).collect()
    }
    got = {
        (r["tie"], r["rnk"], r["drnk"])
        for r in add_global_ranks(
            df, ["k"], rank_col="rnk", dense_rank_col="drnk",
            num_partitions=parts,
        ).collect()
    }
    assert got == expected


@pytest.mark.parametrize("parts", [1, 4, 33])
@pytest.mark.parametrize("buckets", [1, 4, 7, 600])
def test_ntile_matches_window_on_total_order(spark, parts, buckets):
    df = _df(spark, _rows(211, 211))  # unique keys
    w = Window.orderBy("k", "tie")
    expected = {
        (r["tie"], r["q"])
        for r in df.select(
            "tie", F.ntile(buckets).over(w).alias("q")
        ).collect()
    }
    got = {
        (r["tie"], r["q"])
        for r in add_global_ranks(
            df, ["k", "tie"], unique=True, ntile=buckets, ntile_col="q",
            num_partitions=parts,
        ).collect()
    }
    assert got == expected


def test_percent_rank_cume_dist_and_descending(spark):
    df = _df(spark, _rows(300, 40))
    w = Window.orderBy(F.col("k").desc(), "tie")
    expected = {
        (r["tie"], r["pr"], r["cd"])
        for r in df.select(
            "tie",
            F.percent_rank().over(w).alias("pr"),
            F.cume_dist().over(w).alias("cd"),
        ).collect()
    }
    got = {
        (r["tie"], r["pr"], r["cd"])
        for r in add_global_ranks(
            df,
            ["k", "tie"],
            descending=[True, False],
            unique=True,
            percent_rank_col="pr",
            cume_dist_col="cd",
            num_partitions=5,
        ).collect()
    }
    assert got == expected


def test_weight_col_ranks_expanded_multiset(spark):
    # histogram (value, weight): ranks must equal the expanded multiset's
    hist = spark.createDataFrame(
        [(10, 3), (20, 1), (30, 4)], "v long, w long"
    )
    out = {
        r["v"]: (r["rnk"], r["drnk"], r["n"])
        for r in add_global_ranks(
            hist,
            ["v"],
            weight_col="w",
            rank_col="rnk",
            dense_rank_col="drnk",
            total_col="n",
            num_partitions=2,
        ).collect()
    }
    # expanded: 10,10,10,20,30,30,30,30 → first positions 1, 4, 5
    assert out == {10: (1, 1, 8), 20: (4, 2, 8), 30: (5, 3, 8)}


def test_row_number_requires_unique_total_order(spark):
    df = _df(spark, _rows(10, 3))
    with pytest.raises(ValueError, match="total order"):
        add_global_ranks(df, ["k"], row_number_col="rn")
    with pytest.raises(ValueError, match="mutually exclusive"):
        add_global_ranks(
            df, ["k"], unique=True, weight_col="tie", rank_col="r"
        )
    with pytest.raises(ValueError, match="at least one output"):
        add_global_ranks(df, ["k"])


def test_empty_input(spark):
    df = _df(spark, []).filter("k > 0")
    out = add_global_ranks(df, ["k"], rank_col="rnk", num_partitions=3)
    assert out.count() == 0
    assert "rnk" in out.columns


def test_non_unique_join_back_preserves_rows_and_payload(spark):
    df = _df(spark, _rows(100, 7))
    out = add_global_ranks(df, ["k"], rank_col="rnk", num_partitions=4)
    rows = out.collect()
    assert len(rows) == 100
    assert {r["payload"] for r in rows} == {f"p{i}" for i in range(100)}
    # all rows of one key share the rank
    by_key = {}
    for r in rows:
        by_key.setdefault(r["k"], set()).add(r["rnk"])
    assert all(len(s) == 1 for s in by_key.values())


@pytest.mark.parametrize("parts", [1, 4, 19])
@pytest.mark.parametrize("exclusive", [True, False])
def test_partitioned_prefix_sum_matches_window(spark, parts, exclusive):
    from agol_pandas_spark.operators.ranks import add_partitioned_prefix_sum

    rows = [(i % 3, i, (i * 7) % 11 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "g long, o long, w long")
    frame = (
        Window.partitionBy("g")
        .orderBy("o")
        .rowsBetween(Window.unboundedPreceding, -1 if exclusive else 0)
    )
    expected = {
        (r["g"], r["o"], r["ps"])
        for r in df.select(
            "g", "o", F.coalesce(F.sum("w").over(frame), F.lit(0)).alias("ps")
        ).collect()
    }
    got = {
        (r["g"], r["o"], r["ps"])
        for r in add_partitioned_prefix_sum(
            df, ["g"], ["o"], "w", "ps",
            exclusive=exclusive, num_partitions=parts,
        ).collect()
    }
    assert got == expected


def test_partitioned_prefix_sum_validates_keys(spark):
    from agol_pandas_spark.operators.ranks import add_partitioned_prefix_sum

    df = spark.createDataFrame([(1, 2, 3)], "g long, o long, w long")
    with pytest.raises(ValueError, match="required"):
        add_partitioned_prefix_sum(df, [], ["o"], "w", "ps")
    with pytest.raises(ValueError, match="required"):
        add_partitioned_prefix_sum(df, ["g"], [], "w", "ps")


@pytest.mark.slow
def test_ranks_fuzz_vs_python_reference(spark):
    """Property fuzz: for random multisets and partition counts, the
    distributed rank/dense_rank/prefix-sum equal a trivial sorted-list
    Python reference."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from agol_pandas_spark.operators.ranks import (
        add_global_ranks,
        add_partitioned_prefix_sum,
    )

    values = st.lists(
        st.integers(min_value=-5, max_value=5), min_size=1, max_size=40
    )
    parts = st.sampled_from([1, 2, 5, 13])

    @given(vals=values, p=parts)
    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    def run(vals, p):
        rows = [(v, i) for i, v in enumerate(vals)]
        df = spark.createDataFrame(rows, "v long, rid long")
        got = {
            r["rid"]: (r["rnk"], r["drnk"])
            for r in add_global_ranks(
                df, ["v"], rank_col="rnk", dense_rank_col="drnk",
                num_partitions=p,
            ).collect()
        }
        srt = sorted(vals)
        distinct = sorted(set(vals))
        expect = {
            i: (srt.index(v) + 1, distinct.index(v) + 1)
            for i, v in enumerate(vals)
        }
        assert got == expect

        # prefix sum per parity group, ordered by rid
        df2 = df.withColumn("g", (df.rid % 2).cast("long")).withColumn(
            "w", (df.v + 6).cast("long")
        )
        got_ps = {
            r["rid"]: r["ps"]
            for r in add_partitioned_prefix_sum(
                df2, ["g"], ["rid"], "w", "ps",
                exclusive=True, num_partitions=p,
            ).collect()
        }
        acc = {0: 0, 1: 0}
        expect_ps = {}
        for i, v in enumerate(vals):
            g = i % 2
            expect_ps[i] = acc[g]
            acc[g] += v + 6
        assert got_ps == expect_ps

    run()


def test_null_keys_survive_join_back(spark):
    """ADVICE r5: the non-unique join-back must be null-safe — a window
    rank ranks NULL keys, so the distributed operator must keep those
    rows instead of silently dropping them through an equi-join."""
    from pyspark.sql.window import Window

    df = spark.createDataFrame(
        [(None, "a"), (1, "b"), (1, "c"), (None, "d"), (3, "e")],
        "k int, payload string",
    )
    got = add_global_ranks(
        df, ["k"], rank_col="rk", dense_rank_col="dk", num_partitions=3
    )
    assert got.count() == 5  # no rows lost
    expect = {
        (r["payload"]): (r["rk"], r["dk"])
        for r in df.withColumn(
            "rk", F.rank().over(Window.orderBy("k"))
        ).withColumn("dk", F.dense_rank().over(Window.orderBy("k"))).collect()
    }
    for r in got.collect():
        assert (r["rk"], r["dk"]) == expect[r["payload"]], r


def test_release_persisted_unpersists(spark):
    from agol_pandas_spark.operators import ranks

    df = spark.range(100).withColumn("k", F.col("id") % 10)
    add_global_ranks(df, ["k"], rank_col="rk", num_partitions=2).count()
    assert len(ranks._PERSISTED) > 0
    ranks.release_persisted()
    assert ranks._PERSISTED == []
