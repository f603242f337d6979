"""Skyline operator (operators/skyline.py) against brute-force dominance
on crafted and randomized inputs, under adversarial partitionings."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from agol_pandas_spark.operators.skyline import skyline


def brute_skyline(rows, minimize, maximize):
    def dominates(q, p):
        le = all(q[c] <= p[c] for c in minimize) and all(
            q[c] >= p[c] for c in maximize
        )
        lt = any(q[c] < p[c] for c in minimize) or any(
            q[c] > p[c] for c in maximize
        )
        return le and lt

    return sorted(
        r["id"] for r in rows if not any(dominates(q, r) for q in rows)
    )


class TestSkyline:
    def test_crafted_frontier(self, spark):
        rows = [
            {"id": 1, "cost": 10, "quality": 90},
            {"id": 2, "cost": 20, "quality": 95},
            {"id": 3, "cost": 15, "quality": 80},  # dominated by 1
            {"id": 4, "cost": 5, "quality": 50},
            {"id": 5, "cost": 10, "quality": 91},  # dominates 1
            {"id": 6, "cost": 30, "quality": 99},
            {"id": 7, "cost": 30, "quality": 99},  # duplicate vector: kept
            {"id": 8, "cost": 40, "quality": 10},  # dominated by 6/7
        ]
        df = spark.createDataFrame(rows).repartition(3)
        got = sorted(
            r["id"]
            for r in skyline(df, minimize=["cost"], maximize=["quality"]).collect()
        )
        assert got == [2, 4, 5, 6, 7]
        assert got == brute_skyline(rows, ["cost"], ["quality"])

    @pytest.mark.parametrize("n_parts", [1, 3, 16])
    def test_partition_invariance_random_3d(self, spark, n_parts):
        rng = random.Random(42)
        rows = [
            {
                "id": i,
                "a": rng.randrange(20),
                "b": rng.randrange(20),
                "c": rng.randrange(20),
            }
            for i in range(200)
        ]
        df = spark.createDataFrame(rows).repartition(n_parts)
        got = sorted(
            r["id"]
            for r in skyline(df, minimize=["a", "b"], maximize=["c"]).collect()
        )
        assert got == brute_skyline(rows, ["a", "b"], ["c"])

    def test_single_objective_is_global_min_with_ties(self, spark):
        rows = [{"id": i, "v": v} for i, v in enumerate([5, 3, 9, 3, 7])]
        df = spark.createDataFrame(rows).repartition(2)
        got = sorted(r["id"] for r in skyline(df, minimize=["v"]).collect())
        assert got == [1, 3]  # both minimal ties survive

    def test_null_objective_raises(self, spark):
        df = spark.createDataFrame(
            [(1, 1, None), (2, 2, 3)], "id long, a long, b long"
        )
        with pytest.raises(Exception, match="NULL in objective"):
            skyline(df, minimize=["a"], maximize=["b"]).collect()

    def test_validation(self, spark):
        df = spark.createDataFrame([(1, 2)], "id long, a long")
        with pytest.raises(ValueError, match="at least one objective"):
            skyline(df)
        with pytest.raises(ValueError, match="not in DataFrame"):
            skyline(df, minimize=["nope"])

    def test_non_objective_columns_ride_along(self, spark):
        df = spark.createDataFrame(
            [(1, "x", 1, 9), (2, "y", 2, 1)], "id long, tag string, a long, b long"
        )
        out = skyline(df, minimize=["a"], maximize=["b"])
        assert set(out.columns) == {"id", "tag", "a", "b"}
        assert [r["tag"] for r in out.collect()] == ["x"]


def test_local_frontier_sweep_scales_and_matches(spark):
    """The sort-filter-skyline sweep on a large single block equals the
    brute-force reference (correctness of the frontier-only comparison)
    and finishes fast enough to prove it is not O(m^2)."""
    import random
    import time

    import pandas as pd

    from agol_pandas_spark.operators.skyline import _local_frontier

    rng = random.Random(99)
    n = 60_000
    pdf = pd.DataFrame(
        {
            "id": range(n),
            "a": [rng.randrange(1_000_000) for _ in range(n)],
            "b": [rng.randrange(1_000_000) for _ in range(n)],
            "c": [rng.randrange(1_000_000) for _ in range(n)],
        }
    )
    t0 = time.time()
    got = _local_frontier(pdf, ["a", "b"], ["c"])
    elapsed = time.time() - t0
    assert elapsed < 30  # the naive O(m^2) scan took minutes at this size
    sample = pdf.sample(400, random_state=1)
    rows = pdf[["a", "b", "c"]].to_numpy()
    for _, r in sample.iterrows():
        dominated = (
            (rows[:, 0] <= r["a"])
            & (rows[:, 1] <= r["b"])
            & (rows[:, 2] >= r["c"])
            & ((rows[:, 0] < r["a"]) | (rows[:, 1] < r["b"]) | (rows[:, 2] > r["c"]))
        ).any()
        assert (r["id"] in set(got["id"])) == (not dominated)
