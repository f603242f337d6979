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
