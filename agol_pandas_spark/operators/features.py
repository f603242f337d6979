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

__all__ = ["fold_of", "target_encode_oof"]


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
