"""Declarative CHECK constraints on the write path.

The lakehouse guard the reference's service never had (its only write
guard is the unique-key constraint, ``src/agol_pandas.py:253-312``):
``enforce_checks`` validates every rule in ONE aggregation over ONE scan
of the source — per-rule sequential passes don't survive a 100 TB
source — and fails the write with every failing rule's violation count
before anything reaches the two-phase commit.

Semantics follow SQL/Delta CHECK: a row violates a rule only when the
predicate evaluates to FALSE — NULL (unknown) passes, so nullability is
policed by an explicit ``x IS NOT NULL`` rule, not implicitly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from agol_pandas_spark.errors import ConstraintViolationError


def enforce_checks(df: DataFrame, checks: dict[str, str | Column]) -> DataFrame:
    """Validate ``checks`` (rule name → SQL predicate string or Column)
    against ``df``; raise :class:`ConstraintViolationError` with ALL
    per-rule violation counts if any row fails any rule, else return
    ``df`` unchanged for the write to proceed.

    One job, one scan: each rule contributes a ``SUM(predicate IS
    FALSE)`` column to a single aggregation (map-side combined — the
    shuffle carries one partial row per partition regardless of source
    size).
    """
    if not checks:
        return df
    aggs = []
    for rule, pred in checks.items():
        col = F.expr(pred) if isinstance(pred, str) else pred
        aggs.append(
            F.sum(F.when(col == False, 1).otherwise(0)).alias(rule)  # noqa: E712
        )
    row = df.agg(*aggs).collect()[0]
    counts = {rule: int(row[rule] or 0) for rule in checks}
    bad = {r: c for r, c in counts.items() if c > 0}
    if bad:
        raise ConstraintViolationError(bad)
    return df
