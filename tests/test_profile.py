"""Column profiling: nulls/distinct/minmax over a mixed-type frame, and
the approx mode's plan contract (no Expand)."""

from __future__ import annotations

import datetime as dt

import pytest

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


def _ks_reference(s1: list[int], s2: list[int]):
    """Direct integer KS: walk the merged value grid in order."""
    from collections import Counter

    n1, n2 = len(s1), len(s2)
    cnt1, cnt2 = Counter(s1), Counter(s2)
    c1 = c2 = 0
    best, at = -1, None
    for v in sorted(set(s1) | set(s2)):
        c1 += cnt1[v]
        c2 += cnt2[v]
        d = abs(c1 * n2 - c2 * n1)
        if d > best:
            best, at = d, v
    return n1, n2, best, best * 10**6 // (n1 * n2), at


@pytest.mark.slow
def test_ks_drift_fuzz_against_python_reference(spark):
    """Integer-KS over random samples equals the direct walk, per group;
    includes the identical-samples (D=0) and disjoint-support (D=max)
    edges."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from agol_pandas_spark.operators.profile import ks_drift

    sample = st.lists(st.integers(min_value=-50, max_value=50), min_size=1, max_size=40)

    @given(g1=st.tuples(sample, sample), g2=st.tuples(sample, sample))
    @settings(
        max_examples=15,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def run(g1, g2):
        rows = []
        for grp, (s1, s2) in (("a", g1), ("b", g2)):
            rows += [(grp, v, 1) for v in s1] + [(grp, v, 2) for v in s2]
        df = spark.createDataFrame(rows, "grp string, v long, side int")
        got = {
            r.grp: (r.n1, r.n2, r.ks_num, r.ks_ppm, r.at_value)
            for r in ks_drift(df, "grp", "v", "side").collect()
        }
        assert got == {"a": _ks_reference(*g1), "b": _ks_reference(*g2)}

    run()

    # pinned edges: identical samples → D = 0 at the smallest value;
    # disjoint supports → D = n1·n2 (ppm exactly 10^6)
    same = [1, 2, 2, 9]
    df = spark.createDataFrame(
        [("g", v, 1) for v in same] + [("g", v, 2) for v in same],
        "grp string, v long, side int",
    )
    from agol_pandas_spark.operators.profile import ks_drift as kd

    r = kd(df, "grp", "v", "side").collect()[0]
    assert (r.ks_num, r.ks_ppm, r.at_value) == (0, 0, 1)

    df2 = spark.createDataFrame(
        [("g", 1, 1), ("g", 2, 1), ("g", 10, 2)],
        "grp string, v long, side int",
    )
    r2 = kd(df2, "grp", "v", "side").collect()[0]
    assert (r2.ks_num, r2.ks_ppm) == (2 * 1, 10**6)


def _chi2_reference(s1: list[str], s2: list[str]):
    """Big-int evaluation of the per-cell staged-division contract."""
    from collections import Counter

    c1, c2 = Counter(s1), Counter(s2)
    n1, n2 = len(s1), len(s2)
    out = {}
    for cell in sorted(set(s1) | set(s2)):
        o1, o2 = c1[cell], c2[cell]
        d = abs(o1 * n2 - o2 * n1)
        big = n1 * n2 * (o1 + o2)
        out[cell] = (o1, o2, n1, n2, d, d * d * 10**6 // big)
    return out


def test_chi2_drift_fuzz_against_bigint_reference(spark):
    """Staged long division equals unbounded-precision d^2*1e6 // D for
    random categorical samples; identical mixes give 0 everywhere."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from agol_pandas_spark.operators.profile import chi2_drift

    cat = st.sampled_from(["p", "q", "r", "s"])
    sample = st.lists(cat, min_size=1, max_size=60)

    @given(s1=sample, s2=sample)
    @settings(
        max_examples=15,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def run(s1, s2):
        rows = [(v, 1) for v in s1] + [(v, 2) for v in s2]
        df = spark.createDataFrame(rows, "cell string, side int")
        got = {
            r.cell: (r.o1, r.o2, r.n1, r.n2, r.d_abs, r.contrib_ppm)
            for r in chi2_drift(df, "cell", "side").collect()
        }
        assert got == _chi2_reference(s1, s2)

    run()

    same = ["p", "p", "q", "r"]
    df = spark.createDataFrame(
        [(v, 1) for v in same] + [(v, 2) for v in same], "cell string, side int"
    )
    assert all(
        r.contrib_ppm == 0 and r.d_abs == 0
        for r in chi2_drift(df, "cell", "side").collect()
    )


def test_cusum_unroll_equals_recursive_reference(spark):
    """The window form C_i = S_i - min(0, min_{j<=i} S_j) used by
    stats_cusum_changepoint must equal the textbook recursion
    C_i = max(0, C_{i-1} + dev_i) on adversarial series."""
    import datetime as dt
    import random

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    rng = random.Random(11)
    series = {
        "flat": [0] * 20,
        "step_up": [-5] * 10 + [50] * 10,
        "sawtooth": [(-1) ** i * (i % 7) * 3 for i in range(30)],
        "random": [rng.randrange(-40, 40) for _ in range(50)],
    }
    rows = []
    expected = {}
    for name, devs in series.items():
        c = 0
        for i, d in enumerate(devs):
            c = max(0, c + d)
            rows.append((name, dt.date(2024, 1, 1) + dt.timedelta(days=i), d))
            expected[(name, i)] = c
    df = spark.createDataFrame(rows, "grp string, day date, dev long").repartition(4)
    w = (
        Window.partitionBy("grp")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = (
        df.withColumn("cs", F.sum("dev").over(w))
        .withColumn("runmin", F.least(F.lit(0).cast("long"), F.min("cs").over(w)))
        .withColumn("cusum", F.col("cs") - F.col("runmin"))
    )
    got = {}
    for r in out.collect():
        idx = (r["day"] - dt.date(2024, 1, 1)).days
        got[(r["grp"], idx)] = r["cusum"]
    assert got == expected


def test_gini_rank_formula_against_reference(spark):
    """The integer-ppm Gini used by stats_gini_concentration vs a float
    reference implementation, including the all-equal (G=0) and
    one-owner (G -> (n-1)/n) extremes."""
    import random

    from pyspark.sql import functions as F

    from agol_pandas_spark.operators.ranks import add_partitioned_prefix_sum

    rng = random.Random(3)
    cases = {
        "equal": [100] * 10,
        "one_owner": [0] * 9 + [1000],
        "random": [rng.randrange(0, 10_000) for _ in range(60)],
    }
    rows = [
        (g, i, v) for g, vals in cases.items() for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "grp string, k long, x long")
    ranked = add_partitioned_prefix_sum(
        df.withColumn("__one", F.lit(1)),
        part_keys=["grp"],
        order_keys=["x", "k"],
        weight_col="__one",
        out_col="__r0",
        exclusive=True,
    )
    agg = ranked.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum((F.col("__r0") + 1) * F.col("x")).alias("srx"),
    )
    got = {
        r["grp"]: (2 * r["srx"] - (r["n"] + 1) * r["sx"]) * 1_000_000 // (r["n"] * r["sx"])
        for r in agg.collect()
    }
    for g, vals in cases.items():
        n = len(vals)
        xs = sorted(vals)
        ref = (2 * sum((i + 1) * x for i, x in enumerate(xs))
               - (n + 1) * sum(xs)) / (n * sum(xs))
        assert abs(got[g] - ref * 1_000_000) <= 1  # truncation only
    assert got["equal"] == 0
    assert got["one_owner"] == ((10 - 1) * 1_000_000) // 10


def test_auc_rank_formula_vs_sklearn_style_reference(spark):
    """The tie-averaged doubled-rank AUC used by stats_auc_mann_whitney
    vs a direct pairwise reference (wins + half-ties), including
    all-ties, perfect, and inverted separations."""
    from pyspark.sql import functions as F

    from agol_pandas_spark.operators.ranks import add_global_ranks

    cases = {
        "perfect": [(1, 10), (1, 9), (0, 2), (0, 1)],
        "inverted": [(1, 1), (1, 2), (0, 9), (0, 10)],
        "all_ties": [(1, 5), (1, 5), (0, 5), (0, 5)],
        "mixed": [(1, 3), (0, 3), (1, 7), (0, 2), (0, 7), (1, 1)],
    }
    for name, rows in cases.items():
        df = spark.createDataFrame(
            [(lab, sc) for lab, sc in rows], "label int, score long"
        )
        hist = df.groupBy(F.col("score").alias("v")).agg(
            F.count(F.lit(1)).alias("c")
        )
        chist = add_global_ranks(
            hist, keys=["v"], weight_col="c", rank_col="__rk", total_col="__n"
        ).select("v", "c", (F.col("__rk") - 1).alias("cb"), "__n")
        pos = df.filter("label = 1").groupBy(F.col("score").alias("v")).agg(
            F.count(F.lit(1)).alias("pc")
        )
        agg = (
            pos.join(chist, "v")
            .agg(
                F.sum("pc").alias("np"),
                F.sum(F.col("pc") * (2 * F.col("cb") + F.col("c") + 1)).alias("r2"),
                F.first("__n").alias("n"),
            )
            .first()
        )
        u2 = agg["r2"] - agg["np"] * (agg["np"] + 1)
        auc = u2 / (2 * agg["np"] * (agg["n"] - agg["np"]))
        # pairwise reference: P(score_pos > score_neg) + 0.5 P(tie)
        wins = ties = 0
        poss = [s for lb, s in rows if lb == 1]
        negs = [s for lb, s in rows if lb == 0]
        for p in poss:
            for q in negs:
                wins += p > q
                ties += p == q
        ref = (wins + 0.5 * ties) / (len(poss) * len(negs))
        assert auc == ref, (name, auc, ref)


class TestTCloseness:
    def _audit(self, spark, rows, t_ppm=100_000):
        from pyspark.sql import functions as F

        from agol_pandas_spark.operators.profile import t_closeness_audit

        df = spark.createDataFrame(rows, "q string, v long")
        out = t_closeness_audit(df, "q", F.col("v"), t_ppm=t_ppm)
        return {r["q"]: (r["n_class"], r["emd_ppm"], r["t_close"]) for r in out.collect()}

    def test_identical_distributions_emd_zero(self, spark):
        rows = [(q, v) for q in ("a", "b") for v in (0, 1, 2, 3)]
        got = self._audit(spark, rows)
        assert got == {"a": (4, 0, True), "b": (4, 0, True)}

    def test_concentrated_class_flagged(self, spark):
        # class 'lo' sits entirely at bucket 0, 'hi' entirely at bucket 3:
        # maximal separation over 4 buckets -> EMD well above any sane t
        rows = [("lo", 0)] * 4 + [("hi", 3)] * 4
        got = self._audit(spark, rows, t_ppm=200_000)
        assert not got["lo"][2] and not got["hi"][2]
        # each class is distance 3/2 of max 3 from the 50/50 mix: EMD = 1/2
        assert got["lo"][1] == got["hi"][1] == 500_000

    def test_matches_python_reference(self, spark):
        import itertools

        rows = [
            ("a", 0), ("a", 0), ("a", 1), ("a", 5),
            ("b", 1), ("b", 2), ("b", 5), ("b", 5), ("b", 5),
            ("c", 0), ("c", 2),
        ]
        got = self._audit(spark, rows)

        buckets = sorted({v for _, v in rows})
        m = len(buckets)
        n_total = len(rows)
        for q in ("a", "b", "c"):
            cls = [v for g, v in rows if g == q]
            n_class = len(cls)
            acc = 0
            cum_c = cum_g = 0
            for b in buckets:
                cum_c += sum(1 for v in cls if v == b)
                cum_g += sum(1 for _, v in rows if v == b)
                acc += abs(cum_c * n_total - cum_g * n_class)
            emd = (1_000_000 * acc) // ((m - 1) * n_class * n_total)
            assert got[q] == (n_class, emd, emd <= 100_000), q


def test_kendall_tau_b_vs_pairwise_reference(spark):
    """Histogram-cell τ-b vs the direct O(n²) definition (concordant −
    discordant over the tie-corrected denominator), including perfect,
    inverted, heavily-tied, and independent-ish groups."""
    import math
    from itertools import combinations

    from agol_pandas_spark.operators.profile import kendall_tau_b

    cases = {
        "perfect": [(1, 1), (2, 2), (3, 3), (4, 4)],
        "inverted": [(1, 4), (2, 3), (3, 2), (4, 1)],
        "tied": [(1, 1), (1, 2), (2, 1), (2, 2), (2, 2), (3, 1)],
        "mixed": [(5, 2), (1, 9), (3, 3), (3, 7), (8, 1), (2, 2), (7, 7)],
    }
    rows = [(g, x, y) for g, pts in cases.items() for x, y in pts]
    got = {
        r["g"]: (r["n"], r["tau_b"])
        for r in kendall_tau_b(
            spark.createDataFrame(rows, "g string, xv long, yv long"),
            "g", "xv", "yv",
        ).collect()
    }
    for g, pts in cases.items():
        nc = nd = tx = ty = 0
        for (x1, y1), (x2, y2) in combinations(pts, 2):
            if x1 == x2:
                tx += 1
                if y1 == y2:
                    ty += 1
                continue
            if y1 == y2:
                ty += 1
                continue
            if (x1 < x2) == (y1 < y2):
                nc += 1
            else:
                nd += 1
        n0 = len(pts) * (len(pts) - 1) // 2
        # reference tie counts are PAIR counts; recompute per-value form
        tx = sum(
            c * (c - 1) // 2
            for c in __import__("collections").Counter(x for x, _ in pts).values()
        )
        ty = sum(
            c * (c - 1) // 2
            for c in __import__("collections").Counter(y for _, y in pts).values()
        )
        ref = (nc - nd) / math.sqrt((n0 - tx) * (n0 - ty))
        assert got[g] == (len(pts), ref), g
    assert got["perfect"][1] == 1.0 and got["inverted"][1] == -1.0
