"""Oracle-checked queries for the sanctioned Python-UDF surface
(``exchange.py``): scalar ``pandas_udf``, grouped-agg ``pandas_udf``, and
``applyInPandas`` grouped transform.

This replaces the reference's driver-side pandas loop
(``src/agol_pandas.py:159-216``) with executor-side Arrow batches. Float
discipline is stricter than the JVM queries': pandas/numpy summation order
differs from DuckDB's, so every aggregate here is computed in **exact
int64 space** (values are 2-decimal fixed-point in the corpus) and only
divided once, if at all. ``sqrt`` is IEEE-exact in both engines, so it is
the one transcendental allowed.

Scale note: grouped-agg pandas UDFs have NO partial aggregation — all rows
shuffle to their group. Use built-in aggregates when expressible; these
queries exist to keep the escape hatch tested for logic that genuinely
needs numpy/pandas.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from agol_pandas_spark.catalog import Catalog
from agol_pandas_spark.exchange import grouped_apply
from agol_pandas_spark.workload import register


@register(
    "udf_scalar_sqrt_bucket",
    tags=("udf", "pandas-udf", "scalar"),
    oracle="""
    SELECT o_orderkey,
           CAST(floor(sqrt(o_totalprice)) AS BIGINT) AS price_sqrt_bucket
    FROM orders
    """,
)
def udf_scalar_sqrt_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar pandas_udf (Arrow batches, numpy kernel)."""

    @F.pandas_udf("long")
    def sqrt_bucket(x: pd.Series) -> pd.Series:
        return pd.Series(np.floor(np.sqrt(x.to_numpy())).astype("int64"))

    return (
        Catalog(spark, sf_dir)
        .table("orders")
        .select("o_orderkey", sqrt_bucket("o_totalprice").alias("price_sqrt_bucket"))
    )


@register(
    "udf_grouped_weighted_avg",
    tags=("udf", "pandas-udf", "grouped-agg"),
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
               * CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS num_scaled,
           CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS den,
           CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * CAST(round(l_quantity) AS BIGINT)) AS DOUBLE)
               / SUM(CAST(round(l_quantity) AS BIGINT)) / 100.0 AS weighted_avg_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def udf_grouped_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas_udf: quantity-weighted mean price per return
    flag, accumulated in exact int64 (price is 2-decimal fixed-point)."""

    @F.pandas_udf("long")
    def wsum(p: pd.Series, q: pd.Series) -> int:
        pi = np.rint(p.to_numpy() * 100).astype("int64")
        qi = np.rint(q.to_numpy()).astype("int64")
        return int((pi * qi).sum())

    @F.pandas_udf("long")
    def qsum(q: pd.Series) -> int:
        return int(np.rint(q.to_numpy()).astype("int64").sum())

    return (
        Catalog(spark, sf_dir)
        .table("lineitem")
        .groupBy("l_returnflag")
        .agg(
            wsum("l_extendedprice", "l_quantity").alias("num_scaled"),
            qsum("l_quantity").alias("den"),
        )
        .withColumn(
            "weighted_avg_price",
            F.col("num_scaled").cast("double") / F.col("den") / 100.0,
        )
    )


@register(
    "udf_grouped_median_center",
    tags=("udf", "applyInPandas", "grouped-map"),
    oracle="""
    SELECT event_id, event_type,
           2 * CAST(round(value * 100) AS BIGINT)
           - CAST(round(2 * median(CAST(round(value * 100) AS BIGINT))
                        OVER (PARTITION BY event_type)) AS BIGINT)
               AS centered2_scaled
    FROM events
    """,
)
def udf_grouped_median_center(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas grouped transform: median-center each event's value
    within its type. Doubled scaled-int output keeps the half-step median
    exact (a group median of ints is x.0 or x.5)."""

    def center(pdf: pd.DataFrame) -> pd.DataFrame:
        sv = np.rint(pdf["value"].to_numpy() * 100).astype("int64")
        med2 = int(round(2 * float(np.median(sv))))
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "event_type": pdf["event_type"],
                "centered2_scaled": 2 * sv - med2,
            }
        )

    ev = Catalog(spark, sf_dir).table("events").select("event_id", "event_type", "value")
    return grouped_apply(
        ev,
        ["event_type"],
        center,
        "event_id long, event_type string, centered2_scaled long",
    )


@register(
    "udf_grouped_arrow_minmax_spread",
    tags=("udf", "applyInArrow", "grouped"),
    oracle="""
    SELECT l_linestatus,
           CAST(MAX(CAST(round(l_extendedprice * 100) AS BIGINT))
              - MIN(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS price_spread_cents,
           COUNT(*) AS n_rows
    FROM lineitem GROUP BY l_linestatus
    """,
)
def udf_grouped_arrow_minmax_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped ``applyInArrow`` transform (the Arrow-native sibling of
    applyInPandas, ``exchange.py:grouped_apply_arrow``): per-group kernel
    computes the price spread with pyarrow.compute on the raw Arrow
    table — no pandas conversion. Exact int64 cents, so the oracle is
    bit-exact.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from agol_pandas_spark.exchange import grouped_apply_arrow

    def spread(tbl: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(tbl["l_extendedprice"], 100.0)), pa.int64())
        mm = pc.min_max(cents)
        return pa.table(
            {
                "l_linestatus": [tbl["l_linestatus"][0].as_py()],
                "price_spread_cents": [mm["max"].as_py() - mm["min"].as_py()],
                "n_rows": [tbl.num_rows],
            }
        )

    li = Catalog(spark, sf_dir).table("lineitem").select("l_linestatus", "l_extendedprice")
    return grouped_apply_arrow(
        li,
        ["l_linestatus"],
        spread,
        "l_linestatus string, price_spread_cents long, n_rows long",
    )


@register(
    "udf_udtf_token_positions",
    tags=("udf", "udtf", "table-function"),
    oracle="""
    SELECT doc_id, CAST(u.pos AS INT) AS pos, u.tok AS token
    FROM (
      SELECT doc_id,
             UNNEST(list_transform(string_split_regex(trim(text), '\\s+'),
                                   (x, i) -> {'pos': i, 'tok': x})) AS u
      FROM documents WHERE doc_id < 20)
    """,
)
def udf_udtf_token_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function): one input row → N output rows with
    per-token positions — the lateral-expansion surface for custom
    Python tokenizers that genuinely can't be a builtin ``posexplode``
    (here it deliberately CAN be, so the oracle verifies the UDTF
    plumbing row-for-row). The UDTF runs per-row in the Python worker;
    at scale prefer builtin ``posexplode(split(...))`` — this entry
    pins the escape hatch's correctness, not a recommendation.
    """
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="pos int, token string")
    class TokenizeWithPos:
        def eval(self, text: str):
            if text is None:
                return
            for i, tok in enumerate(text.strip().split()):
                yield i + 1, tok  # 1-based, matching the SQL lambda index

    spark.udtf.register("tokenize_with_pos", TokenizeWithPos)
    docs = Catalog(spark, sf_dir).table("documents").filter(F.col("doc_id") < 20)
    docs.createOrReplaceTempView("udtf_docs_in")
    return spark.sql(
        "SELECT d.doc_id, t.pos, t.token "
        "FROM udtf_docs_in d, LATERAL tokenize_with_pos(d.text) t"
    )


@register(
    "udf_iter_batch_cents",
    tags=("udf", "pandas-udf", "iterator"),
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS total_cents
    FROM orders GROUP BY o_orderstatus
    """,
)
def udf_iter_batch_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterator-form scalar pandas UDF (``Iterator[pd.Series] ->
    Iterator[pd.Series]``) — the variant for per-executor one-time setup
    (model loads, dictionaries): the generator body runs once per task,
    each Arrow batch streams through. Here the 'model' is a trivial cents
    scaler: ``floor(x·100 + 0.5)`` — exactly DuckDB's round() for the
    positive prices — so the downstream integer totals are value-checked.
    """
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    def _to_cents_gen(batches):
        scale = np.float64(100.0)  # stands in for per-task setup state
        for s in batches:
            yield pd.Series(
                np.floor(s.to_numpy() * scale + 0.5).astype(np.int64)
            )

    # module-wide postponed annotations stringify hints, so declare the
    # iterator signature explicitly with typing objects
    from collections.abc import Iterator as _It
    _to_cents_gen.__annotations__ = {
        "batches": _It[pd.Series], "return": _It[pd.Series]
    }
    to_cents = pandas_udf(_to_cents_gen, T.LongType())

    orders = Catalog(spark, sf_dir).table("orders")
    return (
        orders.select("o_orderstatus", to_cents("o_totalprice").alias("cents"))
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("cents").alias("total_cents"))
    )


@register(
    "udf_arrow_python_scalar",
    tags=("udf", "arrow-python-udf", "scalar"),
    oracle="""
    SELECT o_orderkey,
           reverse(CAST(o_orderkey AS VARCHAR)) || '#'
             || CAST(length(CAST(o_orderkey AS VARCHAR)) AS VARCHAR)
               AS key_tag
    FROM orders
    """,
)
def udf_arrow_python_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized row-at-a-time Python UDF (``useArrow=True``,
    Spark 4): completes the UDF execution matrix alongside pandas_udf
    (vectorized), applyInPandas, mapInPandas, the iterator form, and the
    UDTF. Arrow serialization replaces pickle — ~2-5× on transfer — but
    the Python loop still runs per row, so the engine's guidance stands:
    this surface is for logic that genuinely needs per-row Python, never
    the hot path. Deterministic string logic keeps it value-checkable.
    """

    @F.udf(returnType=T.StringType(), useArrow=True)
    def key_tag(k) -> str:
        s = str(k)
        return f"{s[::-1]}#{len(s)}"

    return (
        Catalog(spark, sf_dir)
        .table("orders")
        .select("o_orderkey", key_tag("o_orderkey").alias("key_tag"))
    )


@register(
    "udf_ewma_integer_recurrence",
    tags=("udf", "applyInPandas", "timeseries"),
    oracle="""
    WITH RECURSIVE daily AS (
      SELECT event_type,
             CAST(epoch_ms(ts) // 86400000 AS BIGINT) AS day,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
      FROM events GROUP BY 1, 2),
    seq AS (
      SELECT event_type, day, x,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY day) AS rn
      FROM daily),
    r AS (
      SELECT event_type, day, x, rn, x AS s
      FROM seq WHERE rn = 1
      UNION ALL
      SELECT seq.event_type, seq.day, seq.x, seq.rn,
             (3 * r.s + seq.x) // 4
      FROM seq JOIN r ON seq.event_type = r.event_type
                     AND seq.rn = r.rn + 1)
    SELECT event_type, day, x AS daily_cents, s AS ewma_cents FROM r
    """,
)
def udf_ewma_integer_recurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA smoothing of the daily per-type revenue series — the
    inherently SEQUENTIAL recurrence (sₜ = (3·sₜ₋₁ + xₜ) div 4, i.e.
    α = 1/4 in exact floor-integer arithmetic, so every engine and
    every run agrees bit-for-bit — float EWMA recurrences drift).
    This is the sanctioned ``applyInPandas`` case: the recurrence
    cannot be a window expression (each value depends on the previous
    OUTPUT, not previous inputs), so each type's ≤31-row daily series
    is smoothed in one Arrow batch per group after a calendar-bounded
    pre-aggregation — the heavy reduction is JVM-side, Python touches
    only groups × days rows. The oracle is a RECURSIVE CTE computing
    the identical recurrence.
    """
    import pandas as pd

    ev = Catalog(spark, sf_dir).table("events")
    daily = ev.groupBy(
        "event_type",
        F.expr("CAST(unix_timestamp(ts) div 86400 AS BIGINT)").alias("day"),
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("x"))

    def smooth(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day").reset_index(drop=True)
        s = 0
        out = []
        for i, x in enumerate(pdf["x"]):
            s = int(x) if i == 0 else (3 * s + int(x)) // 4
            out.append(s)
        pdf["ewma_cents"] = out
        return pdf

    schema = "event_type string, day long, x long, ewma_cents long"
    sm = daily.groupBy("event_type").applyInPandas(smooth, schema=schema)
    return sm.select(
        "event_type", "day",
        F.col("x").alias("daily_cents"),
        "ewma_cents",
    )
