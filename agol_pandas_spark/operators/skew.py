"""Skew mitigation: salted joins.

AQE's skew-join split (``spark.sql.adaptive.skewJoin``) handles moderate
sort-merge skew at runtime; an *explicit* salt is the tool when one join
key owns executor-breaking row counts (the classic heavy-hitter user_id at
100 TB) or when the build side can't broadcast. Aggregation skew usually
needs no salt at all — Spark's partial (map-side) aggregation already
combines per-partition before the shuffle.

Pattern: replicate the dimension across ``n`` salt values (explode — dim
grows n×, which is why this targets small-to-medium dims), scatter the
fact side uniformly with a deterministic hash-derived salt, and equi-join
on (key, salt). Result is row-identical to the unsalted join; the hot
key's rows now land on n partitions instead of one.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    salt_buckets: int = 16,
    scatter_col: str | Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join: fact scattered over ``salt_buckets``, dim
    replicated to every bucket.

    ``scatter_col`` seeds the fact-side salt (any roughly-unique column —
    deterministic, unlike ``F.rand``); defaults to a hash of the join keys
    plus all fact columns, which is uniform even when the key itself is
    constant.

    ``how`` is restricted to fact-side-preserving joins: with the dim side
    exploded across every salt, a right/full outer join would emit each
    unmatched dim row once per salt replica — not row-identical to the
    unsalted join. Those modes raise rather than silently duplicate.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "semi", "left_anti", "leftanti", "anti"}
    if how not in allowed:
        raise ValueError(
            f"salted_join supports fact-preserving joins only "
            f"({sorted(allowed)}); got {how!r} — the replicated dim side "
            f"would duplicate unmatched dim rows across salt buckets"
        )
    seed = (
        F.col(scatter_col)
        if isinstance(scatter_col, str)
        else scatter_col
        if scatter_col is not None
        else F.struct(*[F.col(c) for c in fact.columns])
    )
    fact_s = fact.withColumn(SALT_COL, F.pmod(F.xxhash64(seed), F.lit(salt_buckets)))
    dim_r = dim.withColumn(
        SALT_COL,
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)).cast("array<long>")),
    )
    out = fact_s.join(dim_r, [*on, SALT_COL], how)
    return out.drop(SALT_COL)
