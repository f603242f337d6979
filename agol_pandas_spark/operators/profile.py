"""Single-pass column profiling — the data-quality DESCRIBE the reference
delegates to its server (per-field metadata comes back from the AGOL
analyze step, ``src/agol_pandas.py:441-447``; here profiling is a query).

One aggregation computes every column's metrics, then one explode
unpivots the single metrics row into (column, metrics…) rows — the whole
profile is a single scan regardless of column count.

Distinct-count modes, because the choice IS the 100 TB decision:

- ``exact`` — ``countDistinct`` per column. Catalyst plans multiple
  distinct aggregates with an ``Expand``: every input row is replicated
  once per distinct aggregate, so the pre-shuffle volume is rows × (cols
  + 1). Right for audits of modest tables; wrong as a default at corpus
  scale.
- ``approx`` — ``approx_count_distinct`` (HLL++, rsd 0.01). No Expand:
  one pass, one buffer per column, shuffle carries only sketches. The
  scale default.
- ``none`` — skip distinct counts entirely (cheapest; null/min/max only).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    distinct: str = "approx",
) -> DataFrame:
    """Per-column profile: ``(column, n_rows, n_nulls, n_distinct,
    min_str, max_str)``; min/max rendered as strings so mixed-type tables
    profile into one uniform schema.
    """
    if distinct not in ("exact", "approx", "none"):
        raise ValueError(f"distinct must be exact|approx|none, got {distinct!r}")
    cols = list(cols) if cols is not None else list(df.columns)
    aggs = [F.count(F.lit(1)).alias("__total")]
    for i, c in enumerate(cols):
        aggs.append(F.count(F.col(c)).alias(f"__nn_{i}"))
        if distinct == "exact":
            aggs.append(F.countDistinct(F.col(c)).alias(f"__nd_{i}"))
        elif distinct == "approx":
            aggs.append(F.approx_count_distinct(F.col(c)).alias(f"__nd_{i}"))
        aggs.append(F.min(F.col(c)).cast("string").alias(f"__mn_{i}"))
        aggs.append(F.max(F.col(c)).cast("string").alias(f"__mx_{i}"))
    row = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__total").alias("n_rows"),
                (F.col("__total") - F.col(f"__nn_{i}")).alias("n_nulls"),
                (
                    F.col(f"__nd_{i}")
                    if distinct != "none"
                    else F.lit(None).cast("long")
                ).alias("n_distinct"),
                F.col(f"__mn_{i}").alias("min_str"),
                F.col(f"__mx_{i}").alias("max_str"),
            )
            for i, c in enumerate(cols)
        ]
    )
    return row.select(F.explode(entries).alias("p")).select("p.*")


def ks_drift(
    df: DataFrame, group_col: str, value_col: str, side_col: str
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov drift per group, integer-exact.

    ``side_col`` labels each row 1 or 2 (the two samples). With
    empirical CDFs F₁ = cum1/n1 and F₂ = cum2/n2 over the merged value
    grid, the statistic ``D = max|F₁ − F₂|`` is carried as the
    cross-multiplied LONG numerator ``max|cum1·n2 − cum2·n1|`` over
    denominator n1·n2 — no derived double is ever rounded (the round-3
    audit rule). ``ks_ppm`` is an exact integer division and
    ``at_value`` the smallest grid value attaining the max. Products
    stay under 2⁶³ while both samples hold ≤ ~3·10⁶ rows per group with
    ppm scaling; beyond that carry the numerator as DECIMAL(38,0).

    Groups where either sample is empty are undefined (ANSI division by
    zero) — filter them out upstream.

    Scale shape: one scan builds a per-(group, value) histogram with
    both samples as conditional counts (map-side combined — billions of
    rows shrink to the distinct-value grid); cumulative windows run over
    that histogram only; the tiny per-group max broadcasts back to
    locate the argmax. Returns ``(group_col, n1, n2, ks_num, ks_ppm,
    at_value)``.
    """
    from pyspark.sql.window import Window

    hist = df.groupBy(group_col, value_col).agg(
        F.sum(F.when(F.col(side_col) == 1, 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col(side_col) == 2, 1).otherwise(0)).alias("c2"),
    )
    w_cum = (
        Window.partitionBy(group_col)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(group_col)
    diffs = hist.select(
        group_col,
        F.col(value_col).alias("__v"),
        (
            F.abs(
                F.sum("c1").over(w_cum) * F.sum("c2").over(w_all)
                - F.sum("c2").over(w_cum) * F.sum("c1").over(w_all)
            )
        ).alias("dnum"),
        F.sum("c1").over(w_all).alias("n1"),
        F.sum("c2").over(w_all).alias("n2"),
    )
    # argmax in the SAME pass (r11): attaching max(dnum) as one more
    # group-partitioned window reuses the exchange/sort the cumulative
    # windows already established, so the histogram pipeline runs ONCE —
    # the previous max-then-broadcast-join-back shape duplicated the
    # whole hist+windows subtree (two scans of the input in the plan)
    # to locate the argmax row.
    mx = diffs.withColumn("__kmax", F.max("dnum").over(w_all))
    return (
        mx.filter(F.col("dnum") == F.col("__kmax"))
        .groupBy(group_col)
        .agg(
            F.max("n1").alias("n1"),
            F.max("n2").alias("n2"),
            F.max("dnum").alias("ks_num"),
            F.min("__v").alias("at_value"),
        )
        .select(
            group_col,
            "n1",
            "n2",
            "ks_num",
            F.expr("ks_num * 1000000L div (n1 * n2)").alias("ks_ppm"),
            "at_value",
        )
    )


def chi2_drift(df: DataFrame, cell_col: str, side_col: str) -> DataFrame:
    """Two-sample chi-square homogeneity contributions per category,
    integer-exact — the categorical companion to :func:`ks_drift`
    (numeric) and ``textops.token_distribution_drift`` (vocabulary).

    For a 2×k contingency table the cell's χ² term algebraically reduces
    to ``d² / (N1·N2·c)`` with ``d = o1·N2 − o2·N1`` and ``c = o1+o2``
    (both sides' (O−E)²/E terms combined). Each cell's contribution is
    emitted as an exact ppm long via STAGED integer division —
    ``d²·10⁶ div D`` computed as ``q0·10⁶ + q1·10³ + (r1·10³ div D)``
    where ``q0,r0 = divmod(d², D)``, ``q1,r1 = divmod(r0·10³, D)``. The
    exact int64 envelope is ``d² < 2⁶³`` (worst case |d| ≤ n1·n2, i.e.
    n1·n2 ≤ 3·10⁹ — ~55 k rows per side under total skew, far more for
    balanced tables where |d| stays near √(n1·n2·c)) AND
    ``D·10³ = n1·n2·(o1+o2)·10³ < 2⁶³`` (n1·n2·c ≤ 9.2·10¹⁵). Beyond
    either bound ANSI mode fails the job loudly (never a silent wrap);
    the escape is the same DECIMAL(38,0) swap the other scaled-long
    operators document. Per-cell FLOORS are the deterministic
    contract; summing them under-counts the global χ² by < k ppm.

    Scale shape: one map-side-combined groupBy on the category; the
    2-long totals row is broadcast; everything after is a codegen map.
    Returns ``(cell_col, o1, o2, n1, n2, d_abs, contrib_ppm)``.
    """
    cells = df.groupBy(cell_col).agg(
        F.sum(F.when(F.col(side_col) == 1, 1).otherwise(0)).alias("o1"),
        F.sum(F.when(F.col(side_col) == 2, 1).otherwise(0)).alias("o2"),
    )
    tot = cells.agg(F.sum("o1").alias("n1"), F.sum("o2").alias("n2"))
    return (
        cells.crossJoin(F.broadcast(tot))
        .withColumn("d_abs", F.abs(F.col("o1") * F.col("n2") - F.col("o2") * F.col("n1")))
        .withColumn("__D", F.col("n1") * F.col("n2") * (F.col("o1") + F.col("o2")))
        .withColumn("__d2", F.col("d_abs") * F.col("d_abs"))
        .withColumn("__r0", F.col("__d2") % F.col("__D"))
        .withColumn("__r1", (F.col("__r0") * 1000) % F.col("__D"))
        .select(
            cell_col,
            "o1",
            "o2",
            "n1",
            "n2",
            "d_abs",
            (
                F.expr("__d2 div __D") * F.lit(1000000).cast("long")
                + F.expr("(__r0 * 1000L) div __D") * F.lit(1000).cast("long")
                + F.expr("(__r1 * 1000L) div __D")
            ).alias("contrib_ppm"),
        )
    )


def k_anonymity_audit(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str,
    k: int = 5,
    l: int = 2,
) -> DataFrame:
    """k-anonymity / l-diversity audit — the privacy gate a dataset
    passes before release or training use: every combination of
    quasi-identifiers (the columns an attacker can link externally) must
    cover at least ``k`` rows, and within each such equivalence class
    the sensitive attribute must take at least ``l`` distinct values
    (k-anonymity alone still leaks when a whole class shares one
    sensitive value).

    One hash aggregation on the quasi columns (map-side combined;
    ``count`` + ``count_distinct`` share the shuffle) — at 100 TB this
    is a single groupBy over the release candidate, and the output is
    one row per equivalence class, orders of magnitude smaller than the
    data. Rows with NULL quasi values form their own classes (standard
    grouping semantics; both engines agree).

    Output: quasi columns, ``class_size``, ``l_distinct``,
    ``k_anonymous``, ``l_diverse`` — the release gate is
    ``every(k_anonymous AND l_diverse)``; the per-class rows tell you
    exactly which slices to generalize or suppress.
    """
    qs = list(quasi_cols)
    return (
        df.groupBy(*qs)
        .agg(
            F.count(F.lit(1)).alias("class_size"),
            F.countDistinct(sensitive_col).alias("l_distinct"),
        )
        .select(
            *qs,
            "class_size",
            "l_distinct",
            (F.col("class_size") >= F.lit(k)).alias("k_anonymous"),
            (F.col("l_distinct") >= F.lit(l)).alias("l_diverse"),
        )
    )


def t_closeness_audit(
    df: DataFrame,
    quasi_col: str,
    bucket_col,
    t_ppm: int = 200_000,
) -> DataFrame:
    """t-closeness audit (Li/Li/Venkatasubramanian 2007) for an ORDERED
    sensitive attribute: k-anonymity hides row identity and l-diversity
    forces distinct sensitive values, but a class whose salary
    distribution sits entirely in the top decile still leaks — the gate
    that catches it bounds the Earth Mover's Distance between each
    quasi-identifier class's sensitive distribution and the global one.

    For ordered buckets with unit spacing the EMD is the mean absolute
    cumulative-probability gap: ``Σ_i |cumP_i − cumQ_i| / (m−1)``. All
    of it evaluates in exact integers — per-bucket numerators are
    ``|cum_class·n_total − cum_glob·n_class|`` BIGINTs, and the final
    ppm is one truncating division — so the verdict never hinges on
    float rounding.

    Scale shape: one hash aggregation over the data → (class × bucket)
    histogram; everything after runs on the histogram. The dense
    (class × bucket) grid is two tiny distinct-joins (classes and
    buckets are audit-bounded, not data-sized); per-class cumulative
    sums are windows PARTITIONED by class; the global cumulative is the
    SUM of the per-class cums per bucket — no unpartitioned window
    anywhere.

    Returns one row per class: ``(quasi, n_class, emd_ppm, t_close)``.
    """
    from pyspark.sql import Window

    hist = (
        df.select(F.col(quasi_col).alias("q"), bucket_col.alias("b"))
        .groupBy("q", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    classes = hist.select("q").distinct()
    buckets = hist.select("b").distinct()
    grid = classes.join(F.broadcast(buckets))
    dense = grid.join(hist, ["q", "b"], "left").select(
        "q", "b", F.coalesce(F.col("c"), F.lit(0)).alias("c")
    )
    w = Window.partitionBy("q").orderBy("b")
    cums = dense.select("q", "b", F.sum("c").over(w).alias("cum_class"))
    glob = cums.groupBy("b").agg(F.sum("cum_class").alias("cum_glob"))
    per_class = cums.groupBy("q").agg(
        F.max("cum_class").alias("n_class")
    )
    n_total = per_class.agg(F.sum("n_class").alias("n_total"))
    m = buckets.agg(F.count(F.lit(1)).alias("m"))
    return (
        cums.join(F.broadcast(glob), "b")
        .join(F.broadcast(per_class), "q")
        .join(F.broadcast(n_total))
        .join(F.broadcast(m))
        .groupBy(F.col("q").alias(quasi_col))
        .agg(
            F.max("n_class").cast("long").alias("n_class"),
            F.expr(
                "(1000000 * sum(abs(cum_class * n_total - cum_glob * n_class)))"
                " div (max(m - 1) * max(n_class) * max(n_total))"
            ).cast("long").alias("emd_ppm"),
        )
        .select(
            quasi_col,
            "n_class",
            "emd_ppm",
            (F.col("emd_ppm") <= F.lit(int(t_ppm))).alias("t_close"),
        )
    )


def kendall_tau_b(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Kendall's τ-b (tie-corrected rank correlation) per group, for
    INTEGER-quantized variables — the definition is an O(n²) sweep over
    row pairs, but for quantized data the joint distribution collapses
    to a per-group (x, y) histogram and every pair count falls out of
    cell-count products: concordant/discordant totals are a histogram
    self-join on ``x_a < x_b`` (bounded by distinct-value counts, not
    rows — the same size at 100 TB as at 100 MB), tie terms come from
    the marginal histograms, and all products accumulate in exact
    DECIMAL(38,0).

    The final τ divides through the split-cast correctly-rounded double
    of ``nc − nd``; each variance factor ``n(n−1)/2 − t`` stays under
    2⁶³ so its sqrt takes the plain BIGINT→double path. Returns
    ``(group, n, tau_b)``.
    """
    x = df.select(
        F.col(group_col).alias("g"),
        F.col(x_col).alias("xv"),
        F.col(y_col).alias("yv"),
    )
    cells = x.groupBy("g", "xv", "yv").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("c")
    )
    a = cells.select(
        F.col("g"), F.col("xv").alias("xa"), F.col("yv").alias("ya"),
        F.col("c").alias("ca"),
    )
    b = cells.select(
        F.col("g").alias("gb"), F.col("xv").alias("xb"),
        F.col("yv").alias("yb"), F.col("c").alias("cb"),
    )
    cd = (
        a.join(b, (a.g == b.gb) & (a.xa < b.xb))
        .groupBy("g")
        .agg(
            F.sum(
                F.when(F.col("ya") < F.col("yb"), F.col("ca") * F.col("cb"))
                .otherwise(F.lit(0).cast("decimal(38,0)"))
            ).alias("nc"),
            F.sum(
                F.when(F.col("ya") > F.col("yb"), F.col("ca") * F.col("cb"))
                .otherwise(F.lit(0).cast("decimal(38,0)"))
            ).alias("nd"),
        )
    )

    def tie_term(col: str, alias: str) -> DataFrame:
        t = x.groupBy("g", col).agg(F.count(F.lit(1)).alias("t"))
        return t.groupBy("g").agg(
            F.sum(F.col("t") * (F.col("t") - 1) / 2).cast("long").alias(alias)
        )

    # split-cast: correctly-rounded doubles of the exact decimals. The
    # denominator multiplies (n0-n1)(n0-n2) EXACTLY in DECIMAL(38,0)
    # before its single sqrt — sqrt(a)*sqrt(b) would cost one ulp and
    # perfect correlations would miss exact +/-1.
    def split(expr: str) -> str:
        return (
            f"CAST(({expr}) div 4294967296 AS DOUBLE) * 4294967296D "
            f"+ CAST(({expr}) % 4294967296 AS DOUBLE)"
        )

    nn = x.groupBy("g").agg(F.count(F.lit(1)).alias("n"))
    den = (
        "CAST(n * (n - 1) div 2 - n1 AS DECIMAL(38,0))"
        " * CAST(n * (n - 1) div 2 - n2 AS DECIMAL(38,0))"
    )
    return (
        nn.join(cd, "g")
        .join(tie_term("xv", "n1"), "g")
        .join(tie_term("yv", "n2"), "g")
        .select(
            "g",
            F.col("n").cast("long").alias("n"),
            F.expr(
                f"({split('nc - nd')}) / sqrt({split(den)})"
            ).alias("tau_b"),
        )
    )
