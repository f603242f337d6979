"""Window-function surface + batch event-time windowing (SURVEY §2b).

The reference has no window functions; they're required anyway for exact
chunking (SURVEY S1/S2) and top-k-per-group. Event-time tumbling windows
process the ``events`` table in batch — the same ``F.window`` expression
works under Structured Streaming (see ``streaming/``).

Window orderings always carry a unique tie-break column so results are
deterministic across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from agol_pandas_spark.catalog import Catalog
from agol_pandas_spark.workload import register
from agol_pandas_spark.workload.relational import dsum


@register(
    "window_topk_orders_per_segment",
    headline=True,
    tags=("window", "topk"),
    oracle="""
    SELECT c_mktsegment, o_orderkey, o_totalprice, rnk FROM (
      SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY c.c_mktsegment
                                ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rnk
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey)
    WHERE rnk <= 3
    """,
)
def window_topk_orders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        cat.table("orders")
        .join(cat.table("customer"), F.col("o_custkey") == F.col("c_custkey"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("c_mktsegment", "o_orderkey", "o_totalprice", "rnk")
    )


@register(
    "window_rank_dense_rank",
    tags=("window",),
    oracle="""
    SELECT s_suppkey, s_nationkey, s_acctbal,
           RANK() OVER (ORDER BY s_nationkey) AS rnk,
           DENSE_RANK() OVER (ORDER BY s_nationkey) AS drnk
    FROM supplier
    """,
)
def window_rank_dense_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global rank/dense_rank WITHOUT a single-partition window: the
    distributed rank operator collapses to the distinct-nationkey
    histogram, range-partitions it, and offsets per-partition positions
    (operators/ranks.py) — same values as the SQL window at any scale.
    """
    from agol_pandas_spark.operators.ranks import add_global_ranks

    sup = Catalog(spark, sf_dir).table("supplier").select(
        "s_suppkey", "s_nationkey", "s_acctbal"
    )
    return add_global_ranks(
        sup, ["s_nationkey"], rank_col="rnk", dense_rank_col="drnk"
    )


@register(
    "window_lag_lead_events",
    tags=("window",),
    oracle="""
    SELECT event_id, user_id, value,
           LAG(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
           LEAD(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value
    FROM events
    """,
)
def window_lag_lead_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        Catalog(spark, sf_dir)
        .table("events")
        .select(
            "event_id",
            "user_id",
            "value",
            F.lag("value").over(w).alias("prev_value"),
            F.lead("value").over(w).alias("next_value"),
        )
    )


@register(
    "window_running_sum",
    tags=("window",),
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(round(value * 10000) AS BIGINT))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) / 10000.0 AS running_value
    FROM events
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        Catalog(spark, sf_dir)
        .table("events")
        .select(
            "event_id",
            "user_id",
            (
                F.sum(F.round(F.col("value") * 10000).cast("long"))
                .over(w)
                .cast("double")
                / 10000.0
            ).alias("running_value"),
        )
    )


@register(
    "events_tumbling_window",
    headline=True,
    tags=("window", "events", "streaming-compatible"),
    oracle="""
    SELECT (epoch_ms(ts) // 3600000) * 3600 AS window_start_s,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(round((value) * 10000) AS BIGINT)) AS DOUBLE) / 10000.0 AS total_value
    FROM events
    GROUP BY window_start_s, event_type
    ORDER BY window_start_s, event_type
    """,
)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling event-time windows, batch mode. ``F.window`` is the
    streaming-native construct; the window start is exposed as epoch
    seconds so the oracle can recompute it TZ-independently."""
    return (
        Catalog(spark, sf_dir)
        .table("events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value"), "total_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start_s"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("window_start_s", "event_type")
    )


@register(
    "events_session_gaps",
    tags=("window", "events"),
    oracle="""
    WITH deltas AS (
      SELECT user_id, ts,
             (epoch_ms(ts) // 1000)
               - (epoch_ms(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) // 1000)
               AS gap_s
      FROM events)
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(MAX(gap_s) AS DOUBLE) AS max_gap_s,
           COUNT(CASE WHEN gap_s > 3600 THEN 1 END) AS n_session_breaks
    FROM deltas GROUP BY user_id
    """,
)
def events_session_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization primitive: inter-event gaps per user (lag + epoch)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        Catalog(spark, sf_dir)
        .table("events")
        .select(
            "user_id",
            (
                F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
            ).alias("gap_s"),
        )
    )
    return gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("gap_s").cast("double").alias("max_gap_s"),
        F.count(F.when(F.col("gap_s") > 3600, 1)).alias("n_session_breaks"),
    )


@register(
    "events_resample_hourly_gapfill",
    tags=("window", "events", "resample"),
    oracle="""
    WITH bounds AS (
      SELECT time_bucket(INTERVAL 1 HOUR, MIN(ts)) AS lo,
             time_bucket(INTERVAL 1 HOUR, MAX(ts)) AS hi
      FROM events),
    hours AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
      FROM bounds),
    grid AS (
      SELECT h.bucket, et.event_type
      FROM hours h CROSS JOIN (SELECT DISTINCT event_type FROM events) et),
    agg AS (
      SELECT time_bucket(INTERVAL 1 HOUR, ts) AS bucket, event_type,
             COUNT(*) AS n
      FROM events GROUP BY bucket, event_type)
    SELECT epoch_us(g.bucket) AS bucket_us, g.event_type,
           COALESCE(a.n, 0) AS n_events
    FROM grid g LEFT JOIN agg a
      ON a.bucket = g.bucket AND a.event_type = g.event_type
    """,
)
def events_resample_hourly_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample to an hourly grid with zero-filled gaps: a generated
    time×key grid (sequence + explode — no driver loop) left-joined to the
    hourly aggregate. The grid is dimension-sized, broadcastable; the only
    corpus-sized operation is the aggregation itself."""
    ev = Catalog(spark, sf_dir).table("events")
    bounds = ev.select(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    grid = (
        bounds.select(
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
            ).alias("bucket")
        )
        .crossJoin(ev.select("event_type").distinct())
    )
    agg = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("bucket"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    return (
        grid.join(agg, ["bucket", "event_type"], "left")
        .select(
            F.unix_micros("bucket").alias("bucket_us"),
            "event_type",
            F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
        )
    )


@register(
    "window_rolling_1h_user_sum",
    tags=("window", "range-frame", "events"),
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(round(value * 10000) AS BIGINT))
                OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                      RANGE BETWEEN 3599999999 PRECEDING AND CURRENT ROW)
                AS DOUBLE) / 10000.0 AS rolling_1h_value
    FROM events
    """,
)
def window_rolling_1h_user_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE frame: trailing-hour rolling sum per user, ordered
    by epoch-µs with a (3.6e9 - 1) µs lookback. Range frames bound state by
    *time* — the batch twin of a sliding stream window. Sum is scaled-int
    for cross-engine determinism; events sharing a timestamp share the
    frame (RANGE, not ROWS), so ties are well-defined without a tie-break."""
    ev = Catalog(spark, sf_dir).table("events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_599_999_999, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        (
            F.sum(F.round(F.col("value") * 10000).cast("long")).over(w).cast("double")
            / 10000.0
        ).alias("rolling_1h_value"),
    )


@register(
    "window_ntile_price_quartiles",
    tags=("window", "ntile"),
    oracle="""
    SELECT q, COUNT(*) AS n,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS total_scaled
    FROM (
      SELECT o_totalprice,
             NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey) AS q
      FROM orders)
    GROUP BY q
    """,
)
def window_ntile_price_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE bucketing into price quartiles (deterministic via the
    o_orderkey tie-break), aggregated per bucket. The bucket assignment
    comes from the distributed rank operator (range-partitioned global
    row number + the SQL NTILE formula) — no single-partition window, so
    the plan survives orders growing 100× (operators/ranks.py)."""
    from agol_pandas_spark.operators.ranks import add_global_ranks

    ev = Catalog(spark, sf_dir).table("orders").select(
        "o_totalprice", "o_orderkey"
    )
    bucketed = add_global_ranks(
        ev,
        ["o_totalprice", "o_orderkey"],
        unique=True,
        ntile=4,
        ntile_col="q",
    )
    return bucketed.groupBy("q").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "total_scaled"
        ),
    )


@register(
    "window_percent_rank_cume_dist",
    tags=("window",),
    oracle="""
    SELECT s_suppkey, s_acctbal,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume
    FROM supplier
    WINDOW w AS (ORDER BY s_acctbal, s_suppkey)
    """,
)
def window_percent_rank_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-rank window functions (both are exact rational ratios of
    row positions — (rank-1)/(n-1) and rank/n — so doubles compare
    bit-for-bit cross-engine). Computed through the distributed rank
    operator (operators/ranks.py): no single-partition window."""
    from agol_pandas_spark.operators.ranks import add_global_ranks

    sup = Catalog(spark, sf_dir).table("supplier").select(
        "s_suppkey", "s_acctbal"
    )
    return add_global_ranks(
        sup,
        ["s_acctbal", "s_suppkey"],
        unique=True,
        percent_rank_col="pct_rank",
        cume_dist_col="cume",
    )


@register(
    "events_funnel_stages",
    tags=("events", "funnel"),
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t1
        AND e.ts <= v.t1 + INTERVAL 24 HOUR GROUP BY e.user_id),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t2
        AND e.ts <= c.t2 + INTERVAL 24 HOUR GROUP BY e.user_id),
    f AS (
      SELECT v.user_id,
             CASE WHEN t3 IS NOT NULL THEN 3
                  WHEN t2 IS NOT NULL THEN 2 ELSE 1 END AS stage,
             CASE WHEN t3 IS NOT NULL THEN epoch_ms(t3)//1000 - epoch_ms(t1)//1000
                  WHEN t2 IS NOT NULL THEN epoch_ms(t2)//1000 - epoch_ms(t1)//1000
                  ELSE 0 END AS secs
      FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id))
    SELECT stage, COUNT(*) AS n_users, CAST(SUM(secs) AS BIGINT) AS sum_secs
    FROM f GROUP BY stage
    """,
)
def events_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view -> click -> purchase: each stage's
    event must strictly follow the user's previous stage time within a
    24-hour conversion deadline (first qualifying event wins). Emits
    per-stage user counts and the exact sum of seconds from first view to
    the deepest stage reached.

    Scale shape: three passes over events, each with the event_type filter
    pushed to the parquet scan, aggregating to slim per-user tables; the
    stage joins are all keyed on user_id so AQE plans them as co-located
    shuffle joins (the per-user aggregates are orders of magnitude smaller
    than the raw events).
    """
    ev = Catalog(spark, sf_dir).table("events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id").agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(
            (F.col("ts") > F.col("t1"))
            & (F.col("ts") <= F.col("t1") + F.expr("INTERVAL 24 HOURS"))
        )
        .groupBy("user_id").agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(
            (F.col("ts") > F.col("t2"))
            & (F.col("ts") <= F.col("t2") + F.expr("INTERVAL 24 HOURS"))
        )
        .groupBy("user_id").agg(F.min("ts").alias("t3"))
    )
    f = (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            F.when(F.col("t3").isNotNull(), F.lit(3))
            .when(F.col("t2").isNotNull(), F.lit(2))
            .otherwise(F.lit(1)).alias("stage"),
            F.when(
                F.col("t3").isNotNull(),
                F.unix_timestamp("t3") - F.unix_timestamp("t1"),
            )
            .when(
                F.col("t2").isNotNull(),
                F.unix_timestamp("t2") - F.unix_timestamp("t1"),
            )
            .otherwise(F.lit(0).cast("long")).alias("secs"),
        )
    )
    return f.groupBy("stage").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("secs").alias("sum_secs"),
    )


@register(
    "events_sliding_window",
    tags=("window", "events", "streaming-compatible"),
    oracle="""
    WITH starts AS (
      SELECT event_type, value,
             unnest([((epoch_ms(ts) // 1000) // 1800) * 1800 - 1800,
                     ((epoch_ms(ts) // 1000) // 1800) * 1800]) AS window_start_s
      FROM events)
    SELECT window_start_s, event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(round((value) * 10000) AS BIGINT)) AS DOUBLE)
               / 10000.0 AS total_value
    FROM starts GROUP BY window_start_s, event_type
    """,
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 minutes (each event counted in two
    overlapping windows) — ``F.window(ts, len, slide)``, the
    streaming-native sliding aggregation run in batch. The oracle derives
    both member window starts per event arithmetically.
    """
    return (
        Catalog(spark, sf_dir)
        .table("events")
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value"), "total_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start_s"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "window_running_distinct_types",
    tags=("window", "events", "distinct"),
    oracle="""
    WITH firsts AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                          ORDER BY ts, event_id) = 1
                  THEN 1 ELSE 0 END AS is_first
      FROM events)
    SELECT user_id, event_id,
           CAST(SUM(is_first) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS distinct_types_so_far
    FROM firsts
    """,
)
def window_running_distinct_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT) over an ordered stream — not directly
    expressible as a window aggregate in either engine, so it lowers to
    the first-occurrence-flag + running-sum form: flag each (user, type)'s
    first event, then cumulative-sum the flags. Two windows over one
    shuffle on user_id; exact integers throughout."""
    from pyspark.sql.window import Window

    ev = Catalog(spark, sf_dir).table("events")
    w_first = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.row_number().over(w_first) == 1, 1).otherwise(0).alias(
            "is_first"
        ),
    )
    return flagged.select(
        "user_id",
        "event_id",
        F.sum("is_first").over(w_run).alias("distinct_types_so_far"),
    )


@register(
    "window_gaps_and_islands_streaks",
    tags=("window", "gaps-islands", "events"),
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
    marked AS (
      SELECT user_id, d,
             CAST(d - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d)
                  AS INTEGER) AS DATE) AS island
      FROM days),
    islands AS (
      SELECT user_id, island, COUNT(*) AS len, MIN(d) AS start_day
      FROM marked GROUP BY user_id, island),
    best AS (
      SELECT user_id, COUNT(*) AS n_streaks, MAX(len) AS longest_days
      FROM islands GROUP BY user_id)
    SELECT b.user_id, b.n_streaks, b.longest_days,
           (SELECT MIN(i.start_day) FROM islands i
            WHERE i.user_id = b.user_id AND i.len = b.longest_days)
               AS longest_start
    FROM best b
    """,
)
def window_gaps_and_islands_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: consecutive-active-day streaks per user via the
    classic ``day − row_number`` island key (consecutive days share it;
    any gap starts a new island) — the engagement-streak query every
    activity warehouse runs. All integer/date arithmetic; the longest
    streak's start disambiguates by MIN. Scale shape: the distinct
    (user, day) grid collapses the corpus first; one ranking window per
    user partition over days, then plain aggregations.
    """
    from pyspark.sql.window import Window

    ev = Catalog(spark, sf_dir).table("events")
    days = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    marked = days.select(
        "user_id",
        "d",
        F.date_sub(F.col("d"), F.row_number().over(w)).alias("island"),
    )
    islands = marked.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("len"), F.min("d").alias("start_day")
    )
    best = islands.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_streaks"),
        F.max("len").alias("longest_days"),
    )
    bestb = F.broadcast(
        best.select(
            F.col("user_id").alias("__u"), F.col("longest_days").alias("__l")
        )
    )
    at = (
        islands.join(
            bestb,
            (F.col("user_id") == F.col("__u")) & (F.col("len") == F.col("__l")),
        )
        .groupBy("user_id")
        .agg(F.min("start_day").alias("longest_start"))
    )
    return best.join(at, "user_id").select(
        "user_id", "n_streaks", "longest_days", "longest_start"
    )


@register(
    "window_first_last_nth_event",
    tags=("window", "first-last-nth", "events"),
    oracle="""
    SELECT DISTINCT user_id,
           first_value(event_type) OVER w AS first_type,
           last_value(event_type) OVER w AS last_type,
           nth_value(event_type, 2) OVER w AS second_type,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_events
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_first_last_nth_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value over the FULL frame — the
    surface where the default frame bites: without ``ROWS BETWEEN
    UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING``, last_value sees only
    the running frame and silently returns the CURRENT row (the classic
    wrong-answer footgun, identical in both engines — pinning the full
    frame is the portable contract). Total order (ts, event_id) makes
    every value deterministic. Scale shape: one window per user
    partition, DISTINCT collapses to one row per user.
    """
    from pyspark.sql.window import Window

    ev = Catalog(spark, sf_dir).table("events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        ev.select(
            "user_id",
            F.first("event_type").over(w).alias("first_type"),
            F.last("event_type").over(w).alias("last_type"),
            F.nth_value("event_type", 2).over(w).alias("second_type"),
            F.count(F.lit(1)).over(w).alias("n_events"),
        )
        .distinct()
    )


@register(
    "window_capped_session_stats",
    tags=("window", "events", "sessionize"),
    oracle="""
    WITH o AS (
      SELECT user_id, event_id, epoch_ms(ts) // 1000 AS s,
             CASE WHEN (epoch_ms(ts) // 1000)
                       - (epoch_ms(LAG(ts) OVER (PARTITION BY user_id
                                                 ORDER BY ts, event_id)) // 1000)
                       > 1800
                  OR LAG(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS brk
      FROM events),
    g AS (
      SELECT user_id, event_id, s,
             SUM(brk) OVER (PARTITION BY user_id
                            ORDER BY s, event_id) AS sess
      FROM o),
    st AS (
      SELECT user_id, event_id, s, sess,
             MIN(s) OVER (PARTITION BY user_id, sess) AS sess_start
      FROM g),
    sub AS (
      SELECT user_id, sess, (s - sess_start) // 7200 AS sub_id, s
      FROM st)
    SELECT user_id, CAST(sess AS BIGINT) AS session_id,
           CAST(sub_id AS BIGINT) AS sub_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MIN(s) AS BIGINT) AS start_s,
           CAST(MAX(s) - MIN(s) AS BIGINT) AS duration_s
    FROM sub GROUP BY 1, 2, 3
    """,
)
def window_capped_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with BOTH standard cut rules: a new session on
    >30-min inactivity (gaps-and-islands cumulative-break-sum) AND a
    hard 2-hour duration cap splitting marathon sessions into
    sub-sessions (offset-from-session-start integer division — no
    second pass, no recursion). The cap is what real analytics
    pipelines add once bot traffic appears: an unbounded session is a
    memory leak in every downstream rollup. All windows are
    partitioned by user (or user+session); sub-session duration is
    ≤ 7200 s by construction.
    """
    ev = Catalog(spark, sf_dir).table("events").select(
        "user_id", "event_id", F.unix_timestamp("ts").alias("s")
    )
    w = Window.partitionBy("user_id").orderBy("s", "event_id")
    brk = F.when(
        F.lag("s").over(w).isNull() | ((F.col("s") - F.lag("s").over(w)) > 1800),
        1,
    ).otherwise(0)
    g = ev.withColumn("sess", F.sum(brk).over(w))
    sub = g.withColumn(
        "sub_id",
        F.expr("(s - min(s) OVER (PARTITION BY user_id, sess)) div 7200"),
    )
    return (
        sub.groupBy("user_id", "sess", "sub_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.min("s").cast("long").alias("start_s"),
            (F.max("s") - F.min("s")).cast("long").alias("duration_s"),
        )
        .select(
            "user_id",
            F.col("sess").cast("long").alias("session_id"),
            F.col("sub_id").cast("long"),
            "n_events",
            "start_s",
            "duration_s",
        )
    )


@register(
    "window_funnel_regex_match",
    tags=("window", "events", "funnel", "pattern"),
    oracle="""
    WITH seq AS (
      SELECT user_id,
             string_agg(substring(event_type, 1, 1), ''
                        ORDER BY ts, event_id) AS path
      FROM events GROUP BY user_id)
    SELECT user_id,
           CAST(length(path) AS INTEGER) AS n_events,
           regexp_matches(path, 'v.*c.*p') AS converted,
           CAST(length(regexp_extract(path, '^[^p]*')) AS INTEGER)
             AS events_before_first_purchase
    FROM seq
    """,
)
def window_funnel_regex_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-lite sequence-pattern funnel: each user's ordered
    event history collapses to a compact symbol string (one partitioned
    window + aggregation), and the funnel definition is a REGEX over it
    — 'view then cart-click then purchase, any gaps' is ``v.*c.*p``,
    far more expressive than fixed-stage counters and still one codegen
    map over user-sized strings. Also extracts a position feature (the
    prefix before the first purchase) the regex engine computes for
    free. Pattern evaluation cost scales with per-user history length,
    never corpus size.
    """
    ev = Catalog(spark, sf_dir).table("events")
    seq = (
        ev.groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("ts", "event_id", "event_type")
                        )
                    ),
                    lambda s: F.substring(s["event_type"], 1, 1),
                ),
                "",
            ).alias("path")
        )
    )
    return seq.select(
        "user_id",
        F.length("path").cast("int").alias("n_events"),
        F.col("path").rlike("v.*c.*p").alias("converted"),
        F.length(F.regexp_extract(F.col("path"), "^[^p]*", 0))
        .cast("int")
        .alias("events_before_first_purchase"),
    )
