"""Equivalence pins for relational-query restructurings that replaced a
semantically-right-but-slow expression with a codegen-friendly form —
the restructured query must stay bit-identical to the original
expression on exactly the values where they could diverge."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_overflow_guard_matches_try_multiply(spark):
    """math_try_overflow_guard's range-guarded cube (codegen) must be
    bit-identical to the try_multiply chain it replaced (TryEval is
    codegen-fallback — guide §4.4 class), ON THE EXACT int64 BOUNDARY:
    2097151³ is the largest positive representable cube, (−2097152)³ is
    exactly int64 min (representable — NOT an overflow), and one step
    past either end overflows. Also: NULL input, zero, an
    intermediate-square overflow value (|pc| ≥ 3037000500, where the
    INNER try_multiply nulls first), and int64 extremes."""
    vals = [
        None,
        0,
        1,
        -1,
        2097151,  # largest pc with representable cube
        2097152,  # cube = 2^63 -> overflow
        -2097152,  # cube = -2^63 = int64 min -> representable
        -2097153,  # overflow
        3037000499,  # largest pc with representable SQUARE
        3037000500,  # inner square overflows first
        -3037000500,
        9223372036854775807,
        -9223372036854775808,
    ]
    df = spark.createDataFrame([(v,) for v in vals], "pc long")
    chain = df.select(
        "pc",
        F.expr("try_multiply(try_multiply(pc, pc), pc)").alias("cube"),
    )
    guarded = df.select(
        "pc",
        F.when(
            F.col("pc").between(-2097152, 2097151),
            F.col("pc") * F.col("pc") * F.col("pc"),
        ).alias("cube"),
    )
    got_chain = {r["pc"]: r["cube"] for r in chain.collect()}
    got_guard = {r["pc"]: r["cube"] for r in guarded.collect()}
    assert got_chain == got_guard
    # spot-pin the boundary semantics themselves, not just agreement
    assert got_guard[2097151] == 2097151**3
    assert got_guard[2097152] is None
    assert got_guard[-2097152] == -(2**63)
    assert got_guard[-2097153] is None
    assert got_guard[None] is None
