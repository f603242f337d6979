"""ML feature-engineering operators (training-pipeline preprocessing).

First citizen: leakage-free out-of-fold target encoding — the categorical
encoder used in tabular ML where encoding a category with a statistic of
its OWN rows' targets leaks labels into features. The out-of-fold scheme
(fold f's rows are encoded from every fold EXCEPT f) is the standard
remedy; the m-estimate prior smooths rare categories toward the global
(also out-of-fold) mean.

Determinism contract: folds are a salted portable hash of the row key
(stable across partitionings / engines, unlike randomSplit), targets are
exact integer cents, and the encoding is integer milli-unit arithmetic —
truncated division only at the final step, reproducible verbatim in the
DuckDB oracle.

Scale shape: ONE slim shuffle builds the (category × fold) aggregate
table (map-side combine; cardinality = |categories| × k, independent of
row count); category totals, per-fold globals, and grand totals re-
aggregate that tiny table. Joining the encoding back onto rows is a
broadcast join — the encoder never shuffles the corpus a second time.

Reference parity: the reference (src/agol_pandas.py) has no feature
surface; this extends SURVEY §2b's north-star training-data operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from agol_pandas_spark.functions.text import portable_hash60

__all__ = ["fold_of", "quantile_normalize", "target_encode_oof"]


def fold_of(key_col: str, folds: int, salt: str = "fold") -> F.Column:
    """Deterministic fold id: salted 60-bit portable hash of the key,
    mod ``folds`` (hash is non-negative, so ``%`` == ``pmod``)."""
    return F.pmod(
        portable_hash60(F.concat(F.lit(salt), F.col(key_col).cast("string"))),
        F.lit(int(folds)),
    )


def target_encode_oof(
    df: DataFrame,
    cat_col: str,
    target_cents_col: str,
    key_col: str,
    folds: int = 5,
    smoothing: int = 0,
    salt: str = "fold",
) -> DataFrame:
    """Out-of-fold m-estimate target encoding table:
    ``(cat_col, fold, n_rows, enc_milli)``.

    For category c and fold f (targets in exact integer cents):

    ``enc_milli = (S_c\\f · 1000 + m · prior_milli) div (N_c\\f + m)``

    where ``S_c\\f`` / ``N_c\\f`` are the category's target sum / count
    EXCLUDING fold f, and ``prior_milli`` is the global out-of-fold mean
    ``(S_all\\f · 1000) div N_all\\f``. With ``smoothing=0`` a category
    seen only inside fold f (``N_c\\f = 0``) falls back to the prior; if
    the out-of-fold corpus itself is empty the encoding is NULL.

    Join the result back on ``(cat_col, fold_of(key_col, folds, salt))``
    to attach the feature to rows — the table is
    ``|categories| × folds`` rows, always broadcastable.
    """
    if folds < 2:
        raise ValueError(f"folds must be >= 2, got {folds}")
    if smoothing < 0:
        raise ValueError(f"smoothing must be >= 0, got {smoothing}")
    m = int(smoothing)
    base = df.select(
        F.col(cat_col),
        fold_of(key_col, folds, salt).alias("fold"),
        F.col(target_cents_col).cast("long").alias("__cents"),
    )
    cf = base.groupBy(cat_col, "fold").agg(
        F.count(F.lit(1)).alias("__n"), F.sum("__cents").alias("__s")
    )
    ct = cf.groupBy(cat_col).agg(
        F.sum("__n").alias("__n_tot"), F.sum("__s").alias("__s_tot")
    )
    gf = cf.groupBy("fold").agg(
        F.sum("__n").alias("__n_f_all"), F.sum("__s").alias("__s_f_all")
    )
    g = cf.agg(F.sum("__n").alias("__n_all"), F.sum("__s").alias("__s_all"))

    joined = (
        cf.join(ct, cat_col)
        .join(gf, "fold")
        .crossJoin(F.broadcast(g))
    )
    n_excl = F.col("__n_tot") - F.col("__n")
    prior_den = F.col("__n_all") - F.col("__n_f_all")
    prior_milli = F.when(
        prior_den > 0,
        F.expr("(__s_all - __s_f_all) * 1000L div (__n_all - __n_f_all)"),
    )
    enc_den = n_excl + F.lit(m)
    # integer div throughout; all operands non-negative by construction
    enc_milli = F.when(
        (enc_den > 0) & ((n_excl > 0) | (F.lit(m) > 0)),
        F.expr(
            f"((__s_tot - __s) * 1000L + {m}L * "
            "((__s_all - __s_f_all) * 1000L div (__n_all - __n_f_all))) "
            f"div ((__n_tot - __n) + {m}L)"
        )
        if m > 0
        else F.expr("(__s_tot - __s) * 1000L div (__n_tot - __n)"),
    ).otherwise(prior_milli)

    return joined.select(
        F.col(cat_col),
        F.col("fold").cast("long").alias("fold"),
        F.col("__n").cast("long").alias("n_rows"),
        enc_milli.cast("long").alias("enc_milli"),
    )


def quantile_normalize(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
) -> DataFrame:
    """Cross-group quantile normalization (the batch-effect remedy from
    expression-array statistics, unequal group sizes variant): each row's
    value is replaced by the POOLED distribution's value at the row's
    within-group quantile, so every group leaves with the same value
    distribution while preserving within-group order.

    Per row: within-group rank r (total order ``value, id``), quantile
    ``q = (r-1)/(n_g-1)`` (``q=0`` when the group is a singleton), target
    position ``p = max(1, ceil(q·N))`` over the pooled count N, and the
    normalized value is the pooled PERCENTILE_DISC at p — the smallest
    value whose pooled cumulative count reaches p. All arithmetic is
    exact integers (the quantile never materializes as a float).

    Scale shape:

    - within-group ranks via :func:`~agol_pandas_spark.operators.ranks.
      add_partitioned_prefix_sum` — groups SPAN partitions (a
      ``Window.partitionBy(source)`` would funnel the corpus through
      |groups| tasks);
    - the pooled distribution is a DISTINCT-VALUE histogram with global
      cumulative counts from :func:`~agol_pandas_spark.operators.ranks.
      add_global_ranks` (weighted-histogram mode) — never an expanded
      multiset;
    - the position→value lookup is a broadcast interval join against the
      histogram (bounded by distinct values, not rows). For a histogram
      too large to broadcast, grid-bin the intervals first exactly as
      ``join_interval_overlap_windows`` does.

    Output: ``(id_col, group_col, value_col, norm_value)``.
    """
    from agol_pandas_spark.operators.ranks import (
        add_global_ranks,
        add_partitioned_prefix_sum,
    )

    # NULL ordering diverges across engines (Spark NULLS FIRST, DuckDB
    # NULLS LAST) and a NULL quantile is undefined — fail in-plan instead
    # of silently rank-shifting a whole group; the guard rides the value
    # column so pruning cannot drop it
    def _guarded(c: str) -> F.Column:
        return (
            F.when(
                F.col(group_col).isNull()
                | F.col(value_col).isNull()
                | F.col(id_col).isNull(),
                F.raise_error(
                    F.lit(
                        "quantile_normalize: NULL in "
                        f"({group_col}, {value_col}, {id_col}) — filter or "
                        "impute first"
                    )
                ).cast(df.schema[c].dataType),
            )
            .otherwise(F.col(c))
            .alias(c)
        )

    df = df.select(_guarded(id_col), _guarded(group_col), _guarded(value_col))

    ranked = add_partitioned_prefix_sum(
        df.select(id_col, group_col, value_col).withColumn("__one", F.lit(1)),
        part_keys=[group_col],
        order_keys=[value_col, id_col],
        weight_col="__one",
        out_col="__r0",  # exclusive: rank - 1
        exclusive=True,
    ).drop("__one")
    sizes = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__ng"))
    rows = ranked.join(F.broadcast(sizes), group_col)

    counts = df.groupBy(F.col(value_col).alias("__v")).agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    hist = add_global_ranks(
        counts,
        keys=["__v"],
        weight_col="__cnt",
        rank_col="__rk",
        total_col="__N",
    ).join(counts, "__v").select(
        "__v",
        (F.col("__rk") - 1).alias("__lo"),  # positions covered: (lo, hi]
        (F.col("__rk") - 1 + F.col("__cnt")).alias("__hi"),
        "__N",
    )

    # p = max(1, ceil((r-1)·N / (ng-1))); singleton groups pin q to 0
    pos = F.when(
        F.col("__ng") > 1,
        F.greatest(
            F.lit(1).cast("long"),
            F.expr("(__r0 * __N + (__ng - 1) - 1) div (__ng - 1)"),
        ),
    ).otherwise(F.lit(1).cast("long"))

    # the join condition needs pos, which references __N — attach N first
    n_total = hist.select(F.first("__N").alias("__N"))
    rows_n = rows.crossJoin(F.broadcast(n_total)).withColumn("__p", pos)
    out = rows_n.join(
        F.broadcast(hist.drop("__N")),
        (F.col("__p") > F.col("__lo")) & (F.col("__p") <= F.col("__hi")),
    )
    return out.select(
        F.col(id_col),
        F.col(group_col),
        F.col(value_col),
        F.col("__v").alias("norm_value"),
    )


def hashing_trick_features(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = 64,
) -> DataFrame:
    """Hashing-trick (feature-hashing) vectorization: tokens map to a
    fixed ``n_buckets``-dimensional count vector through a hash instead
    of a learned vocabulary — the stateless featurizer that needs no
    driver-side dictionary, no second pass, and no vocabulary shuffle,
    which is exactly what makes it the 100 TB-safe baseline: the only
    wide operation is one aggregation keyed on (doc, bucket) and one on
    doc.

    Buckets come from the engine-portable 60-bit md5 hash mod
    ``n_buckets`` (nonnegative, so ``%`` agrees across engines). The
    sparse vector serializes as ``"bucket:count"`` pairs in bucket
    order — a deterministic string both engines can build bit-equal,
    and the format a downstream trainer's parser expects.

    Returns ``(id, n_tokens, nnz, vec)``.
    """
    from agol_pandas_spark.functions.text import portable_hash60, tokens

    tok = df.select(
        F.col(id_col).alias("id"),
        F.explode(tokens(F.col(text_col))).alias("t"),
    )
    per_bucket = tok.groupBy(
        "id", (portable_hash60(F.col("t")) % n_buckets).alias("b")
    ).agg(F.count(F.lit(1)).alias("c"))
    return (
        per_bucket.groupBy(F.col("id").alias(id_col))
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("int").alias("nnz"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("b"), F.col("c")))
                    ),
                    lambda s: F.concat_ws(":", s["b"], s["c"]),
                ),
                " ",
            ).alias("vec"),
        )
    )


def isotonic_fit(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_num_col: str,
    y_den_col: str,
) -> DataFrame:
    """Isotonic regression (the PAVA fit) per group, via the closed-form
    minimax identity ``fit(i) = max_{j≤i} min_{k≥j} mean(y_j..y_k)`` —
    the calibration step that turns raw model scores into monotone
    probabilities (Zadrozny & Elkan 2002). The sequential
    pool-adjacent-violators loop distributes poorly; the minimax form
    is pure joins and windows.

    Inputs are PRE-AGGREGATED points: one row per (group, x) with the
    numerator/denominator of its mean (e.g. positives and trials for a
    calibration curve) — so the O(n²) interval enumeration runs on the
    per-group HISTOGRAM, the same size at any corpus scale. Interval
    means come from exact integer prefix sums; the min/max comparisons
    run on mirrored IEEE doubles (same division both engines). Returns
    ``(group, x, y_raw, y_fit)`` with ``y_fit`` nondecreasing in x.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(x_col)
    pts = df.select(
        F.col(group_col).alias("g"),
        F.col(x_col).alias("x"),
        F.col(y_num_col).cast("long").alias("num"),
        F.col(y_den_col).cast("long").alias("den"),
    ).select(
        "g", "x", "num", "den",
        F.sum("num").over(
            Window.partitionBy("g").orderBy("x")
        ).alias("cnum"),
        F.sum("den").over(
            Window.partitionBy("g").orderBy("x")
        ).alias("cden"),
    )
    j = pts.select(
        "g", F.col("x").alias("xj"),
        (F.col("cnum") - F.col("num")).alias("pnum_j"),
        (F.col("cden") - F.col("den")).alias("pden_j"),
    )
    k = pts.select(
        F.col("g").alias("g2"), F.col("x").alias("xk"),
        F.col("cnum").alias("cnum_k"), F.col("cden").alias("cden_k"),
    )
    # min over k >= j of the interval mean (prefix-sum difference)
    mins = (
        j.join(k, (j.g == k.g2) & (F.col("xk") >= F.col("xj")))
        .groupBy("g", "xj")
        .agg(
            F.min(
                (F.col("cnum_k") - F.col("pnum_j")).cast("double")
                / (F.col("cden_k") - F.col("pden_j")).cast("double")
            ).alias("m")
        )
    )
    wmax = Window.partitionBy("g").orderBy("xj")
    fit = mins.select(
        "g", F.col("xj").alias("x"), F.max("m").over(wmax).alias("y_fit")
    )
    return (
        df.select(
            F.col(group_col).alias("g"), F.col(x_col).alias("x"),
            (
                F.col(y_num_col).cast("double")
                / F.col(y_den_col).cast("double")
            ).alias("y_raw"),
        )
        .join(fit, ["g", "x"])
        .select(
            F.col("g").alias(group_col), "x", "y_raw", "y_fit"
        )
    )
