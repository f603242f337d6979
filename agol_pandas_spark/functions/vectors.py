"""Embedding-vector math over ``array<float>`` columns.

All built from Spark higher-order functions (``zip_with`` / ``aggregate``),
which execute inside the JVM per row — no Python UDF, no serialization.
This is the primitive layer for similarity search (``operators/similarity``)
and embedding-cosine near-dedup (``operators/dedup``).

Why higher-order fns and not a Pandas UDF: at 100 TB the hot path is a
joined pair-stream of vectors; keeping the arithmetic inside codegen means
the dot products pipeline into the same stage as the join, with zero
Arrow round-trips.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot_product(a: Column | str, b: Column | str) -> Column:
    """sum_i a_i*b_i via zip_with + aggregate (JVM-side)."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(
            _c(a),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity of two array<numeric> columns. Zero-norm inputs
    yield NULL (try_divide) under any ANSI setting instead of aborting
    the job with DIVIDE_BY_ZERO."""
    return F.try_divide(dot_product(a, b), l2_norm(a) * l2_norm(b))


def normalize_vector(a: Column | str) -> Column:
    """Unit-normalize, so downstream cosine = plain dot product.

    Pre-normalizing once at ingest and storing the unit vector turns every
    subsequent similarity computation into a dot product — at scale this
    halves the arithmetic in the pairwise stage.

    The norm is let-bound via a 1-element ``transform`` lambda: referencing
    the ``l2_norm`` subtree inside the per-element lambda would re-evaluate
    it once per component — O(d^2) per row in interpreted
    higher-order-function eval (same pitfall as ``word_shingles``).
    """
    arr = _c(a)

    def scale(pair: Column) -> Column:
        return F.transform(
            pair.getField("v"), lambda x: x.cast("double") / pair.getField("n")
        )

    return F.flatten(
        F.transform(
            F.array(F.struct(arr.alias("v"), l2_norm(arr).alias("n"))), scale
        )
    )
