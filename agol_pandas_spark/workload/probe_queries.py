"""Driver-harness semantic probes (VERDICT r4 "Next round" item 1).

Round 4 ended with 11 driver-red CORRECTNESS rows that bit-matched the
DuckDB oracle under the documented comparison in this container — both
for the builder's local sweep and for the judge's independent re-run.
Round-5 localization found a property that separates the 11 reds from
the 39 greens **exactly** (zero mispredictions): every red query's
oracle SQL produced a result column of DuckDB type HUGEINT (DuckDB
widens ``SUM(<integer>)`` to HUGEINT) or DECIMAL(38,0), and no green
query's oracle did. DuckDB clients render HUGEINT differently per fetch
path — ``fetchall()`` yields exact ints, but the Arrow and pandas paths
coerce HUGEINT to float64 — so a driver harness fetching oracle rows
through Arrow/pandas sees ``60000.0`` where Spark returns ``60000``,
and the order-insensitive value hash (``repr`` floats) diverges while
row counts and schemas still match. That is precisely the observed
failure signature.

Every oracle in the registry now pins its output columns to
BIGINT/DOUBLE/VARCHAR (``tests/test_oracle_types.py`` enforces it).
These two probes make the diagnosis falsifiable from the driver's own
artifact:

- ``agg_probe_hugeint_bare`` — a 1-row constant aggregate whose oracle
  deliberately left ``SUM`` un-cast (HUGEINT) in round 5. The theory
  predicted driver-RED for this row and green for the cast control;
  ``CORRECTNESS_r05.json`` delivered exactly that readout (bare RED,
  cast GREEN, all 11 former reds GREEN) — theory CONFIRMED. Per
  VERDICT r5 item 1 the sentinel is now RETIRED: its oracle is cast to
  BIGINT too (name unchanged, freeze-compatible, VERDICT-authorized)
  so the driver artifact reads fully green again. The confirmation
  write-up lives in COVERAGE.md §probes.
- ``agg_probe_hugeint_cast`` — the identical aggregate with
  ``CAST(... AS BIGINT)``; green everywhere. Former control.

Both probes are constant-input (no table reads) so any divergence is
attributable to the harness, never to data or plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from agol_pandas_spark.workload import register


def _three_rows(spark: SparkSession) -> DataFrame:
    # constant input: x ∈ {1, 2, 3} as INT — mirrors the oracle's VALUES
    return spark.range(1, 4).select(F.col("id").cast("int").alias("x"))


@register(
    "agg_probe_hugeint_bare",
    tags=("probe", "harness"),
    oracle="""
    SELECT 'k' AS grp, CAST(SUM(x) AS BIGINT) AS s
    FROM (VALUES (1), (2), (3)) t(x)
    GROUP BY grp
    """,
)
def agg_probe_hugeint_bare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retired sentinel (confirmed r5, retired r6 per VERDICT r5 item
    1): in round 5 this oracle was deliberately un-cast (HUGEINT) and
    came back driver-RED while the cast control stayed green — the
    confirming readout for the Arrow/pandas HUGEINT→float64 fetch-path
    theory. Now cast to BIGINT like every other oracle; expected green
    under every fetch path. See module docstring."""
    return _three_rows(spark).groupBy(F.lit("k").alias("grp")).agg(
        F.sum("x").alias("s")
    )


@register(
    "agg_probe_hugeint_cast",
    tags=("probe", "harness"),
    oracle="""
    SELECT 'k' AS grp, CAST(SUM(x) AS BIGINT) AS s
    FROM (VALUES (1), (2), (3)) t(x)
    GROUP BY grp
    """,
)
def agg_probe_hugeint_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Control for ``agg_probe_hugeint_bare``: same aggregate, oracle
    output pinned to BIGINT — expected green under every fetch path."""
    return _three_rows(spark).groupBy(F.lit("k").alias("grp")).agg(
        F.sum("x").alias("s")
    )
