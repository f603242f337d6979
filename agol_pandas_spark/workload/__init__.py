"""Named query workload: one entry per implemented operator (SURVEY §2).

Each :class:`Query` pairs a Spark DataFrame builder with the equivalent
ANSI-SQL oracle DuckDB runs on the same Parquet tables. The driver's
correctness gate compares them (row count + schema + order-insensitive
value hash), so both sides alias computed columns identically.

Float discipline: double summation order differs across engines, so every
SUM/AVG over doubles casts the per-row expression to ``DECIMAL(38,10)``
first (deterministic, associative) and casts the final aggregate back to
double. Per-row double arithmetic (products etc.) is IEEE-identical in
both engines, so only the *aggregation* needs the decimal detour.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None  # None → driver runs rows-only check
    headline: bool = False  # include in bench.py
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None = None,
    headline: bool = False,
    tags: tuple[str, ...] = (),
):
    """Decorator: add a (spark, sf_dir) -> DataFrame builder to the registry."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, headline=headline, tags=tags)
        return fn

    return deco


def load_all() -> dict[str, Query]:
    """Import every workload module (they self-register) and return the registry."""
    from agol_pandas_spark.workload import (  # noqa: F401
        dedup_queries,
        geo_queries,
        joins_queries,
        merge_queries,
        multimodal_queries,
        probe_queries,
        relational,
        similarity_queries,
        source_queries,
        streaming_queries,
        text_queries,
        udf_queries,
        window_queries,
    )

    return REGISTRY
