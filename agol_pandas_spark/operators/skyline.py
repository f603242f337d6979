"""Distributed skyline (Pareto frontier) operator.

The classic OLAP "best trade-offs" query: keep every row not *dominated*
by another (dominated = at-least-as-good on every objective, strictly
better on at least one). Relational engines lack a native operator; the
textbook distributed algorithm (MR-style two-phase skyline) maps cleanly
onto Spark:

1. **Local frontier** (map stage): each partition reduces to its own
   skyline with a vectorized numpy dominance scan inside ``mapInPandas``
   — no shuffle, and the reduction is *lossless*: dominance is transitive
   and strict, so a locally-dominated row is dominated by a local
   survivor (or transitively by that survivor's dominator) and can never
   re-enter the global frontier.
2. **Global refine**: the surviving candidates (tiny next to the input —
   frontier size grows ~polylog for independent dims) are checked with a
   dominance LEFT ANTI self-join. The non-equi condition makes Catalyst
   pick BroadcastNestedLoopJoin over the *candidate set only*; the
   corpus-scale input never sees a cross join.

Exactness contract: objectives must be exactly-comparable types (integers
/ decimals / dates / strings); ties and duplicate vectors survive (neither
dominates the other), so results are deterministic under any partitioning.

Reference parity: the reference (src/agol_pandas.py) has no analytical
operators at all; this extends SURVEY §2b's aggregation/window family with
a preference-query operator a curation pipeline uses for model/data
selection trade-offs (e.g. quality vs cost vs staleness).
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from agol_pandas_spark.operators.ranks import _persist_bounded

__all__ = ["skyline"]


def _local_frontier(
    pdf: pd.DataFrame, minimize: Sequence[str], maximize: Sequence[str]
) -> pd.DataFrame:
    """Exact skyline of one in-memory block.

    Sort-filter-skyline sweep: rows are visited in lexicographic order of
    the sign-normalized objectives, so no later row can dominate an
    accepted one — each candidate is compared against the CURRENT
    FRONTIER only (vectorized numpy), never all m rows. Cost is
    O(m log m + m·f) with f the frontier size (polylog for independent
    dims) instead of the naive O(m²·d); a 1M-row partition with a
    100-point frontier does 1e8 comparisons, not 1e12.
    """
    import numpy as np

    if len(pdf) == 0:
        return pdf
    # sign-normalize into all-minimize space
    # keep the native dtype: a float64 cast would corrupt int64
    # objectives beyond 2^53 (column_stack promotes only when mixed)
    mat = np.column_stack(
        [pdf[c].to_numpy() for c in minimize]
        + [-pdf[c].to_numpy() for c in maximize]
    )
    m = len(pdf)
    order = np.lexsort(mat.T[::-1])  # lexicographic by dim 0, 1, ...
    frontier_rows = np.empty_like(mat)
    frontier_idx = np.empty(m, dtype=np.int64)
    f = 0
    for i in order:
        row = mat[i]
        if f:
            fr = frontier_rows[:f]
            # dominated by an earlier (lex-smaller) frontier member?
            le = (fr <= row).all(axis=1)
            lt = (fr < row).any(axis=1)
            if (le & lt).any():
                continue
            # lex order guarantees `row` cannot strictly dominate a kept
            # member, but EQUAL vectors tie-survive — nothing to evict
        frontier_rows[f] = row
        frontier_idx[f] = i
        f += 1
    return pdf.iloc[np.sort(frontier_idx[:f])]


def skyline(
    df: DataFrame,
    minimize: Sequence[str] = (),
    maximize: Sequence[str] = (),
) -> DataFrame:
    """Rows of ``df`` not dominated on the given objective columns.

    ``minimize``/``maximize`` name the objective columns (at least one
    total). Non-objective columns ride along untouched. NULL objectives
    are rejected up front (dominance is undefined on NULL) — filter or
    impute first.
    """
    minimize, maximize = list(minimize), list(maximize)
    dims = minimize + maximize
    if not dims:
        raise ValueError("skyline needs at least one objective column")
    missing = [c for c in dims if c not in df.columns]
    if missing:
        raise ValueError(f"objective columns not in DataFrame: {missing}")

    # the guard lives INSIDE each objective column (a separate guard column
    # would be pruned away unread by Catalyst): any NULL objective fails the
    # job instead of silently producing undefined dominance
    def _guard(c: str) -> Column:
        col = F.col(c)
        return (
            F.when(
                col.isNull(),
                F.raise_error(
                    F.lit(
                        f"skyline: NULL in objective column '{c}' — "
                        "dominance is undefined on NULL"
                    )
                ).cast(df.schema[c].dataType),
            )
            .otherwise(col)
            .alias(c)
        )

    guarded = df.select(
        *[_guard(c) if c in dims else F.col(c) for c in df.columns]
    )

    schema = guarded.schema

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        blocks = [b for b in batches if len(b)]
        if not blocks:
            return
        block = pd.concat(blocks, ignore_index=True)
        yield _local_frontier(block, minimize, maximize)

    candidates = _persist_bounded(guarded.mapInPandas(gen, schema=schema))

    a, b = candidates.alias("a"), candidates.alias("b")

    def _le(c: str) -> Column:
        better = F.col(f"b.{c}") <= F.col(f"a.{c}")
        return better if c in minimize else F.col(f"b.{c}") >= F.col(f"a.{c}")

    def _lt(c: str) -> Column:
        strictly = F.col(f"b.{c}") < F.col(f"a.{c}")
        return strictly if c in minimize else F.col(f"b.{c}") > F.col(f"a.{c}")

    cond = _le(dims[0])
    for c in dims[1:]:
        cond = cond & _le(c)
    strict = _lt(dims[0])
    for c in dims[1:]:
        strict = strict | _lt(c)

    return a.join(b, cond & strict, "left_anti")
