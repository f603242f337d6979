"""Oracle-checked queries for the time-series joins (``operators/joins.py``):
as-of join and range join — join surfaces the reference lacks entirely
(its only "joins" are server-side key-equi merge modes,
``src/agol_pandas.py:388-413``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from agol_pandas_spark.catalog import Catalog
from agol_pandas_spark.operators.joins import asof_join, range_join
from agol_pandas_spark.workload import register
from agol_pandas_spark.workload.relational import SQL_DSUM, dsum


@register(
    "join_asof_click_purchase",
    headline=True,
    tags=("join", "asof", "events"),
    oracle="""
    WITH s AS (
      SELECT event_id, user_id, ts,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS side,
             CASE WHEN event_type = 'purchase' THEN ts END AS p_ts,
             CASE WHEN event_type = 'purchase' THEN event_id END AS p_eid,
             CASE WHEN event_type = 'purchase' THEN value END AS p_val
      FROM events WHERE event_type IN ('click', 'purchase')
    )
    SELECT event_id, user_id, ts AS click_ts,
           last_value(p_ts IGNORE NULLS) OVER w AS last_purchase_ts,
           last_value(p_eid IGNORE NULLS) OVER w AS purchase_event_id,
           last_value(p_val IGNORE NULLS) OVER w AS purchase_value
    FROM s
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, side, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    QUALIFY side = 1
    """,
)
def join_asof_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each click event gets the user's most recent
    purchase at-or-before it (event_id first in the payload makes the
    equal-timestamp tie-break fully deterministic)."""
    ev = Catalog(spark, sf_dir).table("events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.col("event_id").alias("purchase_event_id"),
        F.col("value").alias("purchase_value"),
    )
    return asof_join(
        clicks,
        purchases,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_cols=["purchase_event_id", "purchase_value"],
        matched_ts_alias="last_purchase_ts",
    ).select(
        "event_id",
        "user_id",
        F.col("ts").alias("click_ts"),
        "last_purchase_ts",
        "purchase_event_id",
        "purchase_value",
    )


@register(
    "join_asof_forward_tolerance",
    tags=("join", "asof", "events"),
    oracle="""
    WITH s AS (
      SELECT event_id, user_id, ts,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS side,
             CASE WHEN event_type = 'click' THEN ts END AS c_ts,
             CASE WHEN event_type = 'click' THEN event_id END AS c_eid
      FROM events WHERE event_type IN ('click', 'purchase')
    ),
    m AS (
      SELECT event_id, user_id, ts AS purchase_ts,
             last_value(c_ts IGNORE NULLS) OVER w AS nxt_ts,
             last_value(c_eid IGNORE NULLS) OVER w AS nxt_eid
      FROM s
      WINDOW w AS (PARTITION BY user_id ORDER BY ts DESC, side, event_id DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      QUALIFY side = 1
    )
    SELECT event_id, user_id, purchase_ts,
           CASE WHEN nxt_ts <= purchase_ts + INTERVAL 1 HOUR
                THEN nxt_ts END AS next_click_ts,
           CASE WHEN nxt_ts <= purchase_ts + INTERVAL 1 HOUR
                THEN nxt_eid END AS click_event_id
    FROM m
    """,
)
def join_asof_forward_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join WITH tolerance: each purchase gets the user's
    next click at-or-after it, voided (NULLs, row kept) when that click is
    more than one hour later — pandas ``merge_asof(direction='forward',
    tolerance=...)`` parity on the distributed union+window plan. The
    oracle replays the forward scan as a DESC-ordered running
    ``last_value IGNORE NULLS`` (the last click seen walking down from
    +inf is the smallest click-ts at-or-after the purchase; equal-ts
    clicks are ordered event_id DESC so the survivor is the smallest id,
    matching the operator's min-tuple pick)."""
    ev = Catalog(spark, sf_dir).table("events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_event_id")
    )
    return asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_cols=["click_event_id"],
        direction="forward",
        matched_ts_alias="next_click_ts",
        tolerance_seconds=3600,
    ).select(
        "event_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        "next_click_ts",
        "click_event_id",
    )


_BANDS = [
    ("b0_budget", 0.0, 20_000.0),
    ("b1_mid", 20_000.0, 40_000.0),
    ("b2_upper", 40_000.0, 60_000.0),
    ("b3_premium", 60_000.0, 120_000.0),
]
_SQL_BANDS = ", ".join(f"('{n}', {lo}, {hi})" for n, lo, hi in _BANDS)


@register(
    "join_range_price_bands",
    tags=("join", "range"),
    oracle=f"""
    WITH bands(band, lo, hi) AS (VALUES {_SQL_BANDS})
    SELECT band, COUNT(*) AS n_items,
           {SQL_DSUM("l_extendedprice * (1 - l_discount)", "revenue")}
    FROM lineitem JOIN bands
      ON l_extendedprice >= lo AND l_extendedprice < hi
    GROUP BY band
    """,
)
def join_range_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (band) join: classify lineitems into broadcast price bands via
    a non-equi interval condition, then aggregate per band."""
    li = Catalog(spark, sf_dir).table("lineitem")
    bands = spark.createDataFrame(
        _BANDS,
        T.StructType(
            [
                T.StructField("band", T.StringType()),
                T.StructField("lo", T.DoubleType()),
                T.StructField("hi", T.DoubleType()),
            ]
        ),
    )
    return (
        range_join(li, bands, "l_extendedprice", "lo", "hi")
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
        )
    )


@register(
    "join_scd2_point_in_time",
    tags=("join", "scd2", "temporal", "events"),
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN LAG(event_type) OVER w IS NULL
                    OR LAG(event_type) OVER w <> event_type
                  THEN 1 ELSE 0 END AS chg
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    versioned AS (
      SELECT user_id, ts, event_type,
             SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS ver
      FROM ordered),
    runs AS (
      SELECT user_id, ver, event_type, MIN(ts) AS vf
      FROM versioned GROUP BY user_id, ver, event_type),
    dim AS (
      SELECT user_id, event_type, vf,
             LEAD(vf) OVER (PARTITION BY user_id ORDER BY ver) AS vt
      FROM runs),
    probe AS (
      SELECT event_id, user_id, ts FROM events
      WHERE event_type = 'purchase')
    SELECT p.event_id, p.user_id,
           d.event_type AS version_type,
           epoch_us(p.ts) AS ts_us,
           epoch_us(d.vf) AS valid_from_us
    FROM probe p JOIN dim d
      ON p.user_id = d.user_id
     AND p.ts >= d.vf AND (d.vt IS NULL OR p.ts < d.vt)
    """,
)
def join_scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time lookup against the SCD Type-2 dimension built by
    ``scd2_history``: each purchase event joins the user's event-type
    version valid at its timestamp. Key equi-join + interval filter —
    never a cartesian; exactly one version matches per probe row."""
    from agol_pandas_spark.operators.joins import point_in_time_join
    from agol_pandas_spark.operators.merge import scd2_history

    ev = Catalog(spark, sf_dir).table("events")
    dim = scd2_history(
        ev, key="user_id", ts_col="ts", tracked="event_type",
        tie_breakers=[F.col("event_id")],
    ).select("user_id", "event_type", "valid_from", "valid_to")
    probe = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    pit = point_in_time_join(probe, dim, "user_id", "ts")
    return pit.select(
        "event_id",
        "user_id",
        F.col("event_type").alias("version_type"),
        F.unix_micros("ts").alias("ts_us"),
        F.unix_micros("valid_from").alias("valid_from_us"),
    )


@register(
    "join_interval_overlap_windows",
    tags=("join", "interval", "events"),
    oracle="""
    WITH c AS (
      SELECT user_id, event_id, epoch_us(ts) AS s,
             epoch_us(ts) + 14400000000 AS e
      FROM events WHERE event_type = 'click'),
    p AS (
      SELECT user_id, event_id, epoch_us(ts) AS s,
             epoch_us(ts) + 14400000000 AS e
      FROM events WHERE event_type = 'purchase')
    SELECT c.user_id,
           c.event_id AS event_id_a, p.event_id AS event_id_b,
           c.s AS s_a, p.s AS s_b,
           least(c.e, p.e) - greatest(c.s, p.s) AS overlap
    FROM c JOIN p ON c.user_id = p.user_id
                 AND c.s < p.e AND p.s < c.e
    """,
)
def join_interval_overlap_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval × interval overlap join via grid binning
    (``operators/joins.py:interval_overlap_join``): 4-hour click
    activity windows × 4-hour purchase windows per user, grid cell =
    window length so each interval covers ≤ 2 cells. The oracle is the
    direct non-equi join — the binned equi-join must reproduce it
    exactly, including the exact integer overlap lengths and the
    emit-once guarantee (no duplicate pairs from multi-cell
    collisions)."""
    from agol_pandas_spark.operators.joins import interval_overlap_join

    WIN_US = 4 * 3600 * 1_000_000
    ev = Catalog(spark, sf_dir).table("events")

    def windows(event_type: str) -> DataFrame:
        return ev.filter(F.col("event_type") == event_type).select(
            "user_id",
            "event_id",
            F.unix_micros("ts").alias("s"),
            (F.unix_micros("ts") + F.lit(WIN_US)).alias("e"),
        )

    out = interval_overlap_join(
        windows("click"),
        windows("purchase"),
        "s",
        "e",
        grid=WIN_US,
        keys=("user_id",),
    )
    return out.select(
        "user_id",
        "event_id_a",
        "event_id_b",
        "s_a",
        "s_b",
        "overlap",
    )


@register(
    "join_asof_nearest_purchase",
    tags=("join", "asof", "events", "nearest"),
    oracle="""
    WITH s AS (
      SELECT event_id, user_id, ts,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS side,
             CASE WHEN event_type = 'purchase' THEN ts END AS p_ts,
             CASE WHEN event_type = 'purchase' THEN event_id END AS p_eid,
             CASE WHEN event_type = 'purchase' THEN value END AS p_val
      FROM events WHERE event_type IN ('click', 'purchase')
    ),
    m AS (
      SELECT event_id, user_id, ts,
             last_value(p_ts IGNORE NULLS) OVER wb AS b_ts,
             last_value(p_eid IGNORE NULLS) OVER wb AS b_eid,
             last_value(p_val IGNORE NULLS) OVER wb AS b_val,
             first_value(p_ts IGNORE NULLS) OVER wf AS f_ts,
             first_value(p_eid IGNORE NULLS) OVER wf AS f_eid,
             first_value(p_val IGNORE NULLS) OVER wf AS f_val
      FROM s
      WINDOW wb AS (PARTITION BY user_id ORDER BY ts, side, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wf AS (PARTITION BY user_id ORDER BY ts, side DESC, event_id
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
      QUALIFY side = 1
    ),
    tol AS (
      SELECT event_id, user_id, ts,
             CASE WHEN epoch_us(ts) - epoch_us(b_ts) <= 3600000000
                  THEN b_ts END AS b_ts,
             CASE WHEN epoch_us(ts) - epoch_us(b_ts) <= 3600000000
                  THEN b_eid END AS b_eid,
             CASE WHEN epoch_us(ts) - epoch_us(b_ts) <= 3600000000
                  THEN b_val END AS b_val,
             CASE WHEN epoch_us(f_ts) - epoch_us(ts) <= 3600000000
                  THEN f_ts END AS f_ts,
             CASE WHEN epoch_us(f_ts) - epoch_us(ts) <= 3600000000
                  THEN f_eid END AS f_eid,
             CASE WHEN epoch_us(f_ts) - epoch_us(ts) <= 3600000000
                  THEN f_val END AS f_val
      FROM m
    )
    SELECT event_id, user_id, ts AS click_ts,
           CASE WHEN b_ts IS NULL THEN f_ts
                WHEN f_ts IS NULL THEN b_ts
                WHEN epoch_us(ts) - epoch_us(b_ts)
                     <= epoch_us(f_ts) - epoch_us(ts) THEN b_ts
                ELSE f_ts END AS nearest_purchase_ts,
           CASE WHEN b_ts IS NULL THEN f_eid
                WHEN f_ts IS NULL THEN b_eid
                WHEN epoch_us(ts) - epoch_us(b_ts)
                     <= epoch_us(f_ts) - epoch_us(ts) THEN b_eid
                ELSE f_eid END AS purchase_event_id,
           CASE WHEN b_ts IS NULL THEN f_val
                WHEN f_ts IS NULL THEN b_val
                WHEN epoch_us(ts) - epoch_us(b_ts)
                     <= epoch_us(f_ts) - epoch_us(ts) THEN b_val
                ELSE f_val END AS purchase_value
    FROM tol
    """,
)
def join_asof_nearest_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-direction as-of join (VERDICT r5 item 7, completing the
    backward/forward/nearest matrix): each click gets the user's
    purchase with the smallest |Δt| on either side, tie → the earlier
    row (pandas ``merge_asof(direction='nearest')`` parity, unit-tested
    against pandas in tests/test_joins.py), candidates voided per side
    beyond a 1-hour tolerance BEFORE the choice. The oracle replays both
    scans as windowed last/first_value IGNORE NULLS over one ordering
    family (event_id in the sort makes equal-ts ties deterministic,
    matching the operator's max/min-tuple picks) and re-derives the
    |Δt| choice in plain CASE arithmetic."""
    ev = Catalog(spark, sf_dir).table("events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.col("event_id").alias("purchase_event_id"),
        F.col("value").alias("purchase_value"),
    )
    return asof_join(
        clicks,
        purchases,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_cols=["purchase_event_id", "purchase_value"],
        direction="nearest",
        matched_ts_alias="nearest_purchase_ts",
        tolerance_seconds=3600,
    ).select(
        "event_id",
        "user_id",
        F.col("ts").alias("click_ts"),
        "nearest_purchase_ts",
        "purchase_event_id",
        "purchase_value",
    )


@register(
    "join_bloom_semi_reduction",
    tags=("join", "sketch", "scale"),
    oracle="""
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING' AND c.c_acctbal < 0
    GROUP BY o.o_orderpriority
    """,
)
def join_bloom_semi_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom semi-join reduction (``operators/sketches.py:bloom_reduce``):
    the selective dimension predicate (delinquent BUILDING customers)
    compresses its key set to an 8192-bit Bloom map; the orders fact
    side is filtered through it BELOW the join shuffle — zero false
    negatives, so the subsequent EXACT shuffle join returns results
    identical to the unreduced join (which is precisely what the oracle
    computes, bloom-free). This is the explicit, connector-portable form
    of runtime row-level bloom filtering: at 100 TB the Exchange carries
    only can-possibly-match rows instead of the whole fact table.
    Mechanism (reduction factor, no-false-negative invariant, plan
    shape) pinned in tests/test_plans.py and tests/test_joins.py.
    """
    from agol_pandas_spark.operators.sketches import (
        bloom_as_map,
        bloom_build,
        bloom_reduce,
    )

    cat = Catalog(spark, sf_dir)
    dim = (
        cat.table("customer")
        .filter((F.col("c_mktsegment") == "BUILDING") & (F.col("c_acctbal") < 0))
        .select("c_custkey")
    )
    bloom_map = bloom_as_map(
        bloom_build(dim.select(F.col("c_custkey").cast("string").alias("k")), "k")
    )
    fact = cat.table("orders").withColumn(
        "__k", F.col("o_custkey").cast("string")
    )
    reduced = bloom_reduce(fact, bloom_map, "__k").drop("__k")
    # exact join scrubs bloom false positives; merge hint models the
    # big-dim regime where broadcast is off the table and the reduction
    # actually pays (the shuffle moves only bloom survivors)
    joined = reduced.join(dim.hint("merge"), reduced.o_custkey == dim.c_custkey)
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("total_cents"),
    )


@register(
    "join_attribution_linear_touch",
    tags=("join", "attribution", "events"),
    oracle="""
    WITH purchases AS (
      SELECT event_id AS pid, user_id, epoch_us(ts) AS pts,
             CAST(round(value * 100) AS BIGINT) AS pc
      FROM events WHERE event_type = 'purchase'),
    touches AS (
      SELECT user_id, event_type AS touch_type, event_id AS tid,
             epoch_us(ts) AS tts
      FROM events WHERE event_type IN ('click', 'view')),
    pairs AS (
      SELECT p.pid, p.pc, t.touch_type, t.tid
      FROM purchases p JOIN touches t
        ON p.user_id = t.user_id
       AND t.tts < p.pts
       AND t.tts >= p.pts - 259200000000),
    credited AS (
      SELECT touch_type, tid, pc,
             COUNT(*) OVER (PARTITION BY pid) AS n_touches
      FROM pairs)
    SELECT touch_type,
           CAST(COUNT(*) AS BIGINT) AS n_credits,
           CAST(SUM(CAST(round(CAST(pc AS DOUBLE)
                                / CAST(n_touches AS DOUBLE) * 1000)
                         AS BIGINT)) AS BIGINT) AS credit_milli_cents
    FROM credited GROUP BY touch_type
    """,
)
def join_attribution_linear_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: every click/view in the 3-day
    lookback before a purchase shares the purchase value equally — the
    marketing-analytics join that generalizes the last-touch as-of join
    (`join_asof_click_purchase`). The pairing is a user-equi join with
    a time-band residual (shuffles once on user_id; per-user fan-out is
    bounded by the lookback window, the skew lever at 100 TB), the
    per-purchase touch count is a PARTITIONED window, and each credit
    ``pc/n`` quantizes to integer milli-cents BEFORE the final sum so
    the aggregate is order-independent and bit-identical across
    engines.
    """
    from pyspark.sql import Window

    ev = Catalog(spark, sf_dir).table("events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        "user_id",
        F.unix_micros("ts").alias("pts"),
        F.round(F.col("value") * 100).cast("long").alias("pc"),
    )
    touches = ev.filter(F.col("event_type").isin("click", "view")).select(
        F.col("user_id").alias("t_user"),
        F.col("event_type").alias("touch_type"),
        F.col("event_id").alias("tid"),
        F.unix_micros("ts").alias("tts"),
    )
    pairs = purchases.join(
        touches,
        (F.col("user_id") == F.col("t_user"))
        & (F.col("tts") < F.col("pts"))
        & (F.col("tts") >= F.col("pts") - F.lit(259_200_000_000)),
    ).select("pid", "pc", "touch_type", "tid")
    w = Window.partitionBy("pid")
    credited = pairs.withColumn("n_touches", F.count(F.lit(1)).over(w))
    return credited.groupBy("touch_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_credits"),
        F.sum(
            F.round(
                F.col("pc").cast("double")
                / F.col("n_touches").cast("double")
                * 1000
            ).cast("long")
        ).cast("long").alias("credit_milli_cents"),
    )
