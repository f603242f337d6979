"""Column profiling: nulls/distinct/minmax over a mixed-type frame, and
the approx mode's plan contract (no Expand)."""

from __future__ import annotations

import datetime as dt

from agol_pandas_spark.operators.profile import profile_columns


def _frame(spark):
    rows = [
        (1, "a", 1.5, dt.datetime(2024, 1, 1)),
        (2, "b", None, dt.datetime(2024, 6, 1)),
        (3, None, 2.5, None),
        (4, "a", 2.5, dt.datetime(2024, 1, 1)),
    ]
    return spark.createDataFrame(rows, "k long, s string, x double, ts timestamp")


def test_profile_exact_values(spark):
    out = {r["column"]: r for r in profile_columns(_frame(spark), distinct="exact").collect()}
    assert set(out) == {"k", "s", "x", "ts"}
    assert all(r["n_rows"] == 4 for r in out.values())
    assert out["k"]["n_nulls"] == 0 and out["k"]["n_distinct"] == 4
    assert out["s"]["n_nulls"] == 1 and out["s"]["n_distinct"] == 2
    assert out["x"]["n_nulls"] == 1 and out["x"]["n_distinct"] == 2
    assert out["x"]["min_str"] == "1.5" and out["x"]["max_str"] == "2.5"
    assert out["ts"]["n_nulls"] == 1
    assert out["ts"]["min_str"].startswith("2024-01-01")


def test_profile_approx_mode_has_no_expand(spark):
    df = _frame(spark)
    exact_plan = profile_columns(df, distinct="exact")._jdf.queryExecution().executedPlan().toString()
    approx_plan = profile_columns(df, distinct="approx")._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in exact_plan      # the cost the approx mode avoids
    assert "Expand" not in approx_plan  # HLL buffers: single-pass at scale
    got = {r["column"]: r["n_distinct"] for r in profile_columns(df, distinct="approx").collect()}
    assert got["k"] == 4  # HLL exact at tiny cardinalities


def test_profile_none_mode_skips_distinct(spark):
    out = {r["column"]: r for r in profile_columns(_frame(spark), distinct="none").collect()}
    assert all(r["n_distinct"] is None for r in out.values())
