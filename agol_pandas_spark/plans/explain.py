"""Physical-plan assertions: the engine's "did Catalyst do what we
designed for?" checks.

The reference couldn't push anything down (``return_all_records=True``,
``src/agol_pandas.py:246``); this engine's scale posture *depends* on
pushdown, pruning, and broadcast choices actually landing in the physical
plan — so tests assert on the plan text, not just on results.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters that reached the Parquet scan (``PushedFilters: [...]``)."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            out.extend(s.strip() for s in body.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists each scan actually reads (``ReadSchema`` entries) —
    the projection-pruning check."""
    plan = formatted_plan(df)
    schemas = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        body = m.group(1)
        schemas.append([c.split(":")[0].strip() for c in body.split(",") if c.strip()])
    return schemas


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def scan_reads_only(df: DataFrame, table_cols: dict[str, set[str]]) -> bool:
    """True iff every scan's ReadSchema ⊆ the allowed column set of some
    table in ``table_cols`` (loose matching by subset)."""
    for cols in read_schema_columns(df):
        if not any(set(cols) <= allowed for allowed in table_cols.values()):
            return False
    return True
