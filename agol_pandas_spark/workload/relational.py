"""Relational query surface: scans, filters, joins, aggregations, set ops,
scalar functions (SURVEY §2b rows: scans, projection, filter, joins,
aggregations, sorts/limits, set ops, string/date/math/JSON fns).

Everything is plain ``pyspark.sql`` — Catalyst provides pushdown, pruning,
join selection (broadcast for the dimension tables here), partial
aggregation and whole-stage codegen without custom machinery.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from agol_pandas_spark.catalog import Catalog
from agol_pandas_spark.workload import REGISTRY, register

# Deterministic aggregation of doubles. Double summation order varies with
# partitioning, and even double→decimal casts disagree across engines near
# rounding boundaries (Spark rounds the exact binary expansion; DuckDB
# multiplies by 10^s then rounds — different answers within one ulp of a
# tie). The portable scheme: quantize per-row to an *integer* of scaled
# units via round(x·10^4) — both engines evaluate the identical double
# product and both round ties away from zero, so the integers match
# bit-for-bit — then sum exactly as BIGINT and divide once at the end.
# Headroom: |sum·10^4| < 2^63 holds up to ~9×10^14 totals.
SCALE = 10_000  # 4 decimal places of quantization


def dsum(expr: Column, alias: str) -> Column:
    """Deterministic double sum via scaled-integer quantization."""
    return (
        (F.sum(F.round(expr * SCALE).cast("long")).cast("double") / F.lit(float(SCALE)))
        .alias(alias)
    )


def davg(expr: Column, alias: str) -> Column:
    return (
        (
            F.sum(F.round(expr * SCALE).cast("long")).cast("double")
            / F.lit(float(SCALE))
            / F.count(expr)
        ).alias(alias)
    )


# SQL-side twins of dsum/davg (kept textual so oracles stay copy-readable)
def SQL_DSUM(expr: str, alias: str) -> str:
    return (
        f"CAST(SUM(CAST(round(({expr}) * {SCALE}) AS BIGINT)) AS DOUBLE)"
        f" / {SCALE}.0 AS {alias}"
    )


def SQL_DAVG(expr: str, alias: str) -> str:
    return (
        f"CAST(SUM(CAST(round(({expr}) * {SCALE}) AS BIGINT)) AS DOUBLE)"
        f" / {SCALE}.0 / COUNT({expr}) AS {alias}"
    )


REVENUE = "l_extendedprice * (1 - l_discount)"


def _rev() -> Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# --------------------------------------------------------------------------
# Flagship: revenue by region — scan, filter, 4-way equi-join chain over the
# star schema (dims broadcast), hash agg, sort. The reference's read surface
# was an unfiltered full fetch (src/agol_pandas.py:246); this is the same
# data access expressed so Catalyst pushes the l_shipdate predicate into the
# Parquet scan and prunes to 4 of 11 lineitem columns.
# --------------------------------------------------------------------------
@register(
    "flagship_region_revenue",
    headline=True,
    tags=("join", "agg", "filter"),
    oracle=f"""
    SELECT r.r_name,
           {SQL_DSUM(REVENUE, 'revenue')},
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN orders o    ON l.l_orderkey = o.o_orderkey
    JOIN customer c  ON o.o_custkey = c.c_custkey
    JOIN nation n    ON c.c_nationkey = n.n_nationkey
    JOIN region r    ON n.n_regionkey = r.r_regionkey
    WHERE l.l_shipdate >= TIMESTAMP '1995-01-01'
    GROUP BY r.r_name
    ORDER BY revenue DESC
    """,
)
def flagship_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    lineitem = cat.table("lineitem").filter(F.col("l_shipdate") >= "1995-01-01")
    joined = (
        lineitem.join(cat.table("orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cat.table("customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cat.table("nation")), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(cat.table("region")), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        joined.groupBy("r_name")
        .agg(dsum(_rev(), "revenue"), F.count(F.lit(1)).alias("n_items"))
        .orderBy(F.col("revenue").desc())
    )


# --------------------------------------------------------------------------
# Pricing summary (TPC-H Q1 shape): wide aggregate over the fact table —
# partial+final hash agg, no join, no shuffle beyond the final agg exchange.
# --------------------------------------------------------------------------
@register(
    "pricing_summary",
    headline=True,
    tags=("agg",),
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {SQL_DSUM('l_quantity', 'sum_qty')},
           {SQL_DSUM('l_extendedprice', 'sum_base_price')},
           {SQL_DSUM(REVENUE, 'sum_disc_price')},
           {SQL_DSUM(REVENUE + ' * (1 + l_tax)', 'sum_charge')},
           {SQL_DAVG('l_quantity', 'avg_qty')},
           {SQL_DAVG('l_discount', 'avg_disc')},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).table("lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity"), "sum_qty"),
            dsum(F.col("l_extendedprice"), "sum_base_price"),
            dsum(_rev(), "sum_disc_price"),
            dsum(_rev() * (1 + F.col("l_tax")), "sum_charge"),
            davg(F.col("l_quantity"), "avg_qty"),
            davg(F.col("l_discount"), "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# Top-k with deterministic tie-break: TakeOrderedAndProject physical op —
# per-partition top-k then driver merge of k·parts rows, not a global sort.
# --------------------------------------------------------------------------
@register(
    "top_revenue_orders",
    headline=True,
    tags=("join", "agg", "topk"),
    oracle=f"""
    SELECT o.o_orderkey,
           CAST(o.o_orderdate AS DATE) AS order_date,
           o.o_orderpriority,
           {SQL_DSUM(REVENUE, 'revenue')}
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY o.o_orderkey, order_date, o.o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    return (
        cat.table("customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .join(cat.table("orders"), F.col("c_custkey") == F.col("o_custkey"))
        .join(cat.table("lineitem"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("order_date"),
            "o_orderpriority",
        )
        .agg(dsum(_rev(), "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# Filter + projection pushdown: the anti-reference. The reference reads all
# rows/columns always (src/agol_pandas.py:246); here the predicate and the
# 3-column projection reach the Parquet scan (PushedFilters / ReadSchema).
# --------------------------------------------------------------------------
@register(
    "filter_project_pushdown",
    tags=("scan", "filter"),
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE l_quantity > 45 AND l_returnflag = 'R'
    """,
)
def filter_project_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).table("lineitem")
    return li.filter((F.col("l_quantity") > 45) & (F.col("l_returnflag") == "R")).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


# --------------------------------------------------------------------------
# Join-type coverage: inner / left / full / semi / anti.
# --------------------------------------------------------------------------
@register(
    "join_inner_supplier_nation",
    tags=("join",),
    oracle="""
    SELECT n.n_name, COUNT(*) AS n_suppliers,
           CAST(SUM(CAST(round((s.s_acctbal) * 10000) AS BIGINT)) AS DOUBLE) / 10000.0 AS total_bal
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name ORDER BY n.n_name
    """,
)
def join_inner_supplier_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    return (
        cat.table("supplier")
        .join(F.broadcast(cat.table("nation")), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            dsum(F.col("s_acctbal"), "total_bal"),
        )
        .orderBy("n_name")
    )


@register(
    "join_left_customer_orders",
    tags=("join",),
    oracle="""
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    """,
)
def join_left_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    return (
        cat.table("customer")
        .join(cat.table("orders"), F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@register(
    "join_full_nation_balances",
    tags=("join",),
    oracle="""
    WITH cust AS (
      SELECT c_nationkey,
             CAST(SUM(CAST(round((c_acctbal) * 10000) AS BIGINT)) AS DOUBLE) / 10000.0 AS cust_bal
      FROM customer GROUP BY c_nationkey),
    supp AS (
      SELECT s_nationkey,
             CAST(SUM(CAST(round((s_acctbal) * 10000) AS BIGINT)) AS DOUBLE) / 10000.0 AS supp_bal
      FROM supplier GROUP BY s_nationkey)
    SELECT COALESCE(c.c_nationkey, s.s_nationkey) AS nationkey,
           c.cust_bal, s.supp_bal
    FROM cust c FULL OUTER JOIN supp s ON c.c_nationkey = s.s_nationkey
    """,
)
def join_full_nation_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    cust = (
        cat.table("customer").groupBy("c_nationkey").agg(dsum(F.col("c_acctbal"), "cust_bal"))
    )
    supp = (
        cat.table("supplier").groupBy("s_nationkey").agg(dsum(F.col("s_acctbal"), "supp_bal"))
    )
    j = cust.join(supp, cust["c_nationkey"] == supp["s_nationkey"], "full_outer")
    return j.select(
        F.coalesce("c_nationkey", "s_nationkey").alias("nationkey"),
        "cust_bal",
        "supp_bal",
    )


@register(
    "join_semi_customers_with_orders",
    tags=("join",),
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_semi_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    return (
        cat.table("customer")
        .join(cat.table("orders"), F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    )


@register(
    "join_anti_customers_without_orders",
    tags=("join",),
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 300000)
    """,
)
def join_anti_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join with a filtered right side (customers lacking any large
    order) — every customer has *some* order in the corpus, so the
    unfiltered variant would vacuously return zero rows."""
    cat = Catalog(spark, sf_dir)
    big_orders = cat.table("orders").filter(F.col("o_totalprice") > 300000)
    return (
        cat.table("customer")
        .join(big_orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    )


# --------------------------------------------------------------------------
# Aggregations: distinct, rollup, cube.
# --------------------------------------------------------------------------
@register(
    "agg_distinct_custkeys",
    tags=("agg",),
    oracle="""
    SELECT c_mktsegment,
           COUNT(DISTINCT c_nationkey) AS n_nations,
           COUNT(*) AS n_customers
    FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def agg_distinct_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        Catalog(spark, sf_dir)
        .table("customer")
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("c_nationkey").alias("n_nations"),
            F.count(F.lit(1)).alias("n_customers"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "rollup_region_nation_revenue",
    tags=("agg", "rollup"),
    oracle=f"""
    SELECT r.r_name, n.n_name, {SQL_DSUM('c.c_acctbal', 'total_bal')}
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
)
def rollup_region_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    j = (
        cat.table("customer")
        .join(F.broadcast(cat.table("nation")), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(cat.table("region")), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return j.rollup("r_name", "n_name").agg(dsum(F.col("c_acctbal"), "total_bal"))


@register(
    "cube_flag_status_counts",
    tags=("agg", "cube"),
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_flag_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        Catalog(spark, sf_dir)
        .table("lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# approx_count_distinct: HLL estimates differ across engines by design, so
# the CHECKED surface is (exact count, estimate-within-5%-of-exact boolean)
# — deterministic on both engines — while the estimate itself stays internal.
@register(
    "agg_approx_distinct_parts",
    tags=("agg", "approx"),
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_exact,
           TRUE AS within_tol
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++, rsd=0.01) bounded against the exact
    count: the query emits a within-5%% boolean the oracle can hash-check,
    converting an engine-specific estimate into a deterministic contract."""
    agg = (
        Catalog(spark, sf_dir)
        .table("lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_exact"),
            F.approx_count_distinct("l_partkey", 0.01).alias("approx_parts"),
        )
    )
    return agg.select(
        "l_returnflag",
        "n_exact",
        (
            F.abs(F.col("approx_parts") - F.col("n_exact"))
            <= F.col("n_exact") * 0.05
        ).alias("within_tol"),
    )


# --------------------------------------------------------------------------
# Sort / limit / offset.
# --------------------------------------------------------------------------
@register(
    "sort_limit_offset",
    tags=("sort", "limit"),
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20 OFFSET 10
    """,
)
def sort_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        Catalog(spark, sf_dir)
        .table("orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .offset(10)
        .limit(20)
    )


# --------------------------------------------------------------------------
# Set operations.
# --------------------------------------------------------------------------
@register(
    "setops_segment_keys",
    tags=("setop",),
    oracle="""
    WITH hi AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000),
         bld AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
    SELECT 'union' AS op, c_custkey FROM (SELECT * FROM hi UNION SELECT * FROM bld)
    UNION ALL
    SELECT 'intersect' AS op, c_custkey FROM (SELECT * FROM hi INTERSECT SELECT * FROM bld)
    UNION ALL
    SELECT 'except' AS op, c_custkey FROM (SELECT * FROM hi EXCEPT SELECT * FROM bld)
    """,
)
def setops_segment_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = Catalog(spark, sf_dir).table("customer")
    hi = cust.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    bld = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    u = hi.union(bld).distinct().select(F.lit("union").alias("op"), "c_custkey")
    i = hi.intersect(bld).select(F.lit("intersect").alias("op"), "c_custkey")
    e = hi.subtract(bld).select(F.lit("except").alias("op"), "c_custkey")
    return u.unionByName(i).unionByName(e)


# --------------------------------------------------------------------------
# Scalar functions: string / date / math / JSON.
# --------------------------------------------------------------------------
@register(
    "string_normalize_names",
    tags=("string",),
    oracle="""
    SELECT c_custkey,
           substring(
             lower(regexp_replace(regexp_replace(
               CASE WHEN regexp_matches(trim(c_name), '^[0-9]')
                    THEN '_' || trim(c_name) ELSE trim(c_name) END,
               '[^a-zA-Z0-9_]', '_', 'g'), '_+', '_', 'g')),
             1, 128) AS norm_name,
           length(c_name) AS name_len
    FROM customer
    """,
)
def string_normalize_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    from agol_pandas_spark.functions.names import normalize_service_name_col

    return (
        Catalog(spark, sf_dir)
        .table("customer")
        .select(
            "c_custkey",
            normalize_service_name_col("c_name").alias("norm_name"),
            F.length("c_name").alias("name_len"),
        )
    )


@register(
    "date_monthly_revenue",
    tags=("date", "agg"),
    oracle="""
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(round((o_totalprice) * 10000) AS BIGINT)) AS DOUBLE) / 10000.0 AS total
    FROM orders GROUP BY order_month ORDER BY order_month
    """,
)
def date_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        Catalog(spark, sf_dir)
        .table("orders")
        .groupBy(F.date_trunc("month", "o_orderdate").cast("date").alias("order_month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice"), "total"),
        )
        .orderBy("order_month")
    )


@register(
    "math_price_buckets",
    tags=("math",),
    oracle="""
    SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
           COUNT(*) AS n,
           CAST(MIN(o_totalprice) AS DOUBLE) AS min_price,
           CAST(MAX(o_totalprice) AS DOUBLE) AS max_price,
           CAST(SUM(CAST(round((sqrt(o_totalprice)) * 10000) AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_sqrt
    FROM orders GROUP BY bucket ORDER BY bucket
    """,
)
def math_price_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        Catalog(spark, sf_dir)
        .table("orders")
        .groupBy(
            F.floor(F.col("o_totalprice") / 50000).cast("long").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
            dsum(F.sqrt("o_totalprice"), "sum_sqrt"),
        )
        .orderBy("bucket")
    )


@register(
    "json_extract_props",
    tags=("json",),
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           COUNT(*) AS n,
           CAST(SUM(CAST(round((value) * 10000) AS BIGINT)) AS DOUBLE) / 10000.0 AS total_value
    FROM events GROUP BY k_bucket ORDER BY k_bucket
    """,
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        Catalog(spark, sf_dir)
        .table("events")
        .groupBy(
            (F.get_json_object("props", "$.k").cast("long") % 10).alias("k_bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(F.col("value"), "total_value"),
        )
        .orderBy("k_bucket")
    )


@register(
    # r5 rename (was case_when_order_class): moved out of the driver's
    # 50-name window to make room for the agg_probe_* harness probes —
    # displacement documented in COVERAGE.md §probes.
    "expr_case_when_order_class",
    tags=("math", "conditional"),
    oracle="""
    SELECT CASE WHEN o_totalprice >= 200000 THEN 'large'
                WHEN o_totalprice >= 100000 THEN 'medium'
                ELSE 'small' END AS size_class,
           o_orderstatus,
           COUNT(*) AS n
    FROM orders GROUP BY size_class, o_orderstatus
    ORDER BY size_class, o_orderstatus
    """,
)
def expr_case_when_order_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    size_class = (
        F.when(F.col("o_totalprice") >= 200000, "large")
        .when(F.col("o_totalprice") >= 100000, "medium")
        .otherwise("small")
        .alias("size_class")
    )
    return (
        Catalog(spark, sf_dir)
        .table("orders")
        .groupBy(size_class, "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("size_class", "o_orderstatus")
    )


_GSETS_SQL = f"""
    SELECT r_name, n_name,
           {SQL_DSUM(REVENUE, "revenue")},
           CAST(GROUPING(r_name) AS BIGINT) AS g_region,
           CAST(GROUPING(n_name) AS BIGINT) AS g_nation
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY GROUPING SETS ((r_name, n_name), (r_name), ())
"""


@register(
    "grouping_sets_revenue",
    tags=("agg", "grouping-sets"),
    oracle=_GSETS_SQL,
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS over the supplier rollup path — finer control than
    rollup/cube (identical SQL runs on both engines; GROUPING() columns
    disambiguate aggregate NULLs from data NULLs)."""
    cat = Catalog(spark, sf_dir)
    cat.register_views(("lineitem", "supplier", "nation", "region"))
    return spark.sql(_GSETS_SQL)


def _duck_pctl_s4(j: int, alias: str) -> str:
    """DuckDB fragment: interpolated percentile q=j/4 over the cum
    histogram, ×4-scaled so the quarter-step interpolation stays in
    BIGINT (see agg_exact_percentiles docstring). The outer CAST pins the
    result type to BIGINT: window SUMs promote to HUGEINT in DuckDB, and
    HUGEINT survives into arithmetic — a type the driver's fetch path may
    coerce lossily (the r4 red-row root cause), so no oracle emits it."""
    return f"""
             CAST(MIN(CASE WHEN cum_cnt >= ((n_total - 1) * {j}) // 4 + 1
                      THEN qc END) * (4 - ((MAX(n_total) - 1) * {j}) % 4)
             + CASE WHEN ((MAX(n_total) - 1) * {j}) % 4 = 0 THEN 0
                    ELSE MIN(CASE WHEN cum_cnt >= ((n_total - 1) * {j}) // 4 + 2
                             THEN qc END) * (((MAX(n_total) - 1) * {j}) % 4)
               END AS BIGINT) AS {alias}"""


@register(
    "agg_exact_percentiles",
    tags=("agg", "percentile"),
    oracle=f"""
    WITH scaled AS (
      SELECT l_returnflag, CAST(round(l_quantity * 100) AS BIGINT) AS qc
      FROM lineitem),
    hist AS (
      SELECT l_returnflag, qc, COUNT(*) AS cnt
      FROM scaled GROUP BY l_returnflag, qc),
    cum AS (
      SELECT l_returnflag, qc,
             SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY qc
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS cum_cnt,
             SUM(cnt) OVER (PARTITION BY l_returnflag) AS n_total
      FROM hist)
    SELECT l_returnflag,
           {_duck_pctl_s4(1, "p25_scaled4")},
           {_duck_pctl_s4(2, "p50_scaled4")},
           {_duck_pctl_s4(3, "p75_scaled4")},
           CAST(MAX(n_total) AS BIGINT) AS n
    FROM cum GROUP BY l_returnflag
    """,
)
def agg_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolation percentiles, computed entirely in
    integer arithmetic. For q = j/4 over n sorted values the (n-1)q
    interpolation point has a denominator of at most 4, so 4× the
    percentile of scaled-cent longs is itself an integer:
    ``4·p = v[k]·(4-r) + v[k+1]·r`` with ``t = (n-1)·j``, ``k = t div 4``
    (0-based), ``r = t mod 4``. No derived double is ever rounded — the
    audit-class fix for the round-3 knife edge (rounding an engine's
    interpolated percentile is one-ulp-fragile by construction). Order
    statistics come from a distinct-value cumulative histogram (groupBy
    shrinks the window input to distinct values, the 100 TB shape); at
    extreme scale swap in approx_percentile — the API shape is identical.
    """
    from pyspark.sql.window import Window

    li = Catalog(spark, sf_dir).table("lineitem").select(
        "l_returnflag",
        F.round(F.col("l_quantity") * 100).cast("long").alias("qc"),
    )
    hist = li.groupBy("l_returnflag", "qc").agg(F.count(F.lit(1)).alias("cnt"))
    w_cum = (
        Window.partitionBy("l_returnflag")
        .orderBy("qc")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.select(
        "l_returnflag",
        "qc",
        F.sum("cnt").over(w_cum).alias("cum_cnt"),
        F.sum("cnt").over(Window.partitionBy("l_returnflag")).alias("n_total"),
    )

    def p_s4(j: int, alias: str):
        t = (F.col("n_total") - 1) * j
        k1 = F.expr(f"((n_total - 1) * {j}) div 4") + 1
        r = t % 4
        lo = F.min(F.when(F.col("cum_cnt") >= k1, F.col("qc")))
        hi = F.min(F.when(F.col("cum_cnt") >= k1 + 1, F.col("qc")))
        # r is constant per group, so max() just carries it through the agg
        return (lo * (4 - F.max(r)) + F.when(F.max(r) == 0, 0).otherwise(
            hi * F.max(r)
        )).alias(alias)

    return cum.groupBy("l_returnflag").agg(
        p_s4(1, "p25_scaled4"),
        p_s4(2, "p50_scaled4"),
        p_s4(3, "p75_scaled4"),
        F.max("n_total").alias("n"),
    )


_SUBQ_SQL = """
    SELECT c.c_custkey, c.c_nationkey, c.c_acctbal
    FROM customer c
    WHERE CAST(round(c.c_acctbal * 100) AS BIGINT)
          * (SELECT COUNT(*) FROM customer c2
             WHERE c2.c_nationkey = c.c_nationkey)
          > (SELECT SUM(CAST(round(c3.c_acctbal * 100) AS BIGINT))
             FROM customer c3 WHERE c3.c_nationkey = c.c_nationkey)
"""


@register(
    "subquery_above_avg_balance",
    tags=("subquery", "correlated"),
    oracle=_SUBQ_SQL,
)
def subquery_above_avg_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subqueries (Catalyst decorrelates both into
    aggregate+join). The above-average test is integer-exact: balance·count
    > sum(balances), all in scaled longs — no float summation order in the
    comparison."""
    cat = Catalog(spark, sf_dir)
    cat.register_views(("customer",))
    return spark.sql(_SUBQ_SQL)


@register(
    "pivot_orderstatus_by_segment",
    tags=("agg", "pivot"),
    oracle="""
    SELECT c_mktsegment,
           COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS "F",
           COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS "O",
           COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS "P"
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def pivot_orderstatus_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long→wide): order counts per status column. The pivot value
    list is explicit — an implicit pivot adds a distinct-values job before
    planning can start, a needless extra pass at scale."""
    cat = Catalog(spark, sf_dir)
    return (
        cat.table("orders")
        .join(cat.table("customer"), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
    )


@register(
    "unpivot_lineitem_metrics",
    tags=("unpivot", "agg"),
    oracle="""
    SELECT metric, COUNT(*) AS n,
           CAST(SUM(CAST(round(value * 10000) AS BIGINT)) AS BIGINT)
               AS value_scaled
    FROM (
      SELECT 'l_extendedprice' AS metric, l_extendedprice AS value FROM lineitem
      UNION ALL
      SELECT 'l_discount', l_discount FROM lineitem
      UNION ALL
      SELECT 'l_tax', l_tax FROM lineitem
    ) GROUP BY metric
    """,
)
def unpivot_lineitem_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide→long, melt) + aggregate — one scan, no union of three
    scans (what the SQL oracle spells out)."""
    return (
        Catalog(spark, sf_dir)
        .table("lineitem")
        .unpivot(
            [],
            ["l_extendedprice", "l_discount", "l_tax"],
            "metric",
            "value",
        )
        .groupBy("metric")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 10000).cast("long")).alias("value_scaled"),
        )
    )


@register(
    "map_explode_event_values",
    tags=("map", "explode"),
    oracle="""
    SELECT event_id, 'value' AS metric, value AS v FROM events
    UNION ALL
    SELECT event_id, 'value_half', value / 2 FROM events
    """,
)
def map_explode_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType construction + explode to rows (compared post-explode —
    map literal representations aren't cross-engine comparable, rows are).
    value/2 is a single IEEE division, bit-identical in both engines."""
    ev = Catalog(spark, sf_dir).table("events")
    m = F.create_map(
        F.lit("value"), F.col("value"),
        F.lit("value_half"), F.col("value") / 2,
    )
    return ev.select("event_id", F.explode(m).alias("metric", "v"))


@register(
    "string_levenshtein_nations",
    tags=("string", "fuzzy"),
    oracle="""
    SELECT a.n_name AS name_a, b.n_name AS name_b,
           levenshtein(a.n_name, b.n_name) AS dist
    FROM nation a JOIN nation b ON a.n_nationkey < b.n_nationkey
    WHERE levenshtein(a.n_name, b.n_name) <= 6
    """,
)
def string_levenshtein_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy matching (the classic small-dim variant; at
    corpus scale block first — n-gram or LSH — exactly as the dedup
    operators do)."""
    nat = Catalog(spark, sf_dir).table("nation")
    a = nat.select(F.col("n_nationkey").alias("ka"), F.col("n_name").alias("name_a"))
    b = nat.select(F.col("n_nationkey").alias("kb"), F.col("n_name").alias("name_b"))
    return (
        a.join(b, F.col("ka") < F.col("kb"))
        .select(
            "name_a",
            "name_b",
            F.levenshtein("name_a", "name_b").alias("dist"),
        )
        .filter(F.col("dist") <= 6)
    )


@register(
    "stats_price_quantity_corr",
    tags=("agg", "statistics"),
    oracle="""
    WITH m AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS sx,
             SUM(CAST(round(l_quantity) AS BIGINT)) AS sy,
             SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                 * CAST(round(l_quantity) AS BIGINT)) AS sxy,
             SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                 * CAST(round(l_extendedprice * 100) AS BIGINT)) AS sxx,
             SUM(CAST(round(l_quantity) AS BIGINT)
                 * CAST(round(l_quantity) AS BIGINT)) AS syy
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag, n,
           (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
           / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
              * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
               AS price_qty_corr
    FROM m
    """,
)
def stats_price_quantity_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation from exact integer moments: the five sums
    accumulate as BIGINT (price is 2-decimal fixed-point), so the final
    double formula is identical cross-engine — F.corr's streaming float
    accumulation would not be. The same one-pass moment shape is how corr
    distributes at 100 TB."""
    sx = F.round(F.col("l_extendedprice") * 100).cast("long")
    sy = F.round(F.col("l_quantity")).cast("long")
    m = (
        Catalog(spark, sf_dir)
        .table("lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(sx).alias("sx"),
            F.sum(sy).alias("sy"),
            F.sum(sx * sy).alias("sxy"),
            F.sum(sx * sx).alias("sxx"),
            F.sum(sy * sy).alias("syy"),
        )
    )
    n = F.col("n").cast("double")
    num = n * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    den = F.sqrt(n * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")) * F.sqrt(
        n * F.col("syy") - F.col("sy").cast("double") * F.col("sy")
    )
    return m.select("l_returnflag", "n", (num / den).alias("price_qty_corr"))


_Q17_SQL = """
    SELECT l.l_partkey,
           COUNT(*) AS n_small,
           CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS revenue_scaled
    FROM lineitem l
    WHERE l.l_partkey < 2000
      AND CAST(round(l.l_quantity) AS BIGINT)
          * 5 * (SELECT COUNT(*) FROM lineitem l2
                 WHERE l2.l_partkey = l.l_partkey)
          < (SELECT SUM(CAST(round(l2.l_quantity) AS BIGINT))
             FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
    GROUP BY l.l_partkey
"""


@register(
    "subquery_q17_small_quantity_parts",
    tags=("subquery", "correlated", "agg"),
    oracle=_Q17_SQL,
)
def subquery_q17_small_quantity_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: lineitems under 20% of their part's average
    quantity — a correlated aggregate subquery over the fact table itself
    (Catalyst decorrelates to an aggregate + self-join; a different path
    than the dimension-correlated subquery query). The 20%-of-average test
    is integer-exact: qty*5*count < sum(qty), all scaled longs."""
    cat = Catalog(spark, sf_dir)
    cat.register_views(("lineitem",))
    return spark.sql(_Q17_SQL)


@register(
    "agg_hll_sketch_union",
    tags=("agg", "sketch", "approx"),
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_exact,
           TRUE AS within_tol
    FROM customer GROUP BY c_mktsegment
    UNION ALL
    SELECT '_ALL_' AS c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_exact,
           TRUE AS within_tol
    FROM customer
    """,
)
def agg_hll_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL sketches (Apache DataSketches via Spark built-ins):
    per-segment customer sketches built in one pass, then UNIONED into a
    global estimate — the sketch algebra that lets 1000 executors count
    distincts without re-scanning (re-aggregatable, unlike
    approx_count_distinct's one-shot HLL++). Sketch binaries aren't
    SQL-portable, so the CHECKED surface is the exact count plus an
    estimate-within-5%%-of-exact boolean (c_custkey is unique per row, so
    COUNT(*) == COUNT(DISTINCT))."""
    cust = Catalog(spark, sf_dir).table("customer")
    per_seg = cust.groupBy("c_mktsegment").agg(
        F.hll_sketch_agg("c_custkey").alias("sk"),
        F.count(F.lit(1)).alias("n_exact"),
    )
    segs = per_seg.select(
        "c_mktsegment",
        F.hll_sketch_estimate("sk").alias("n_distinct_est"),
        "n_exact",
    )
    total = per_seg.agg(
        F.lit("_ALL_").alias("c_mktsegment"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("n_distinct_est"),
        F.sum("n_exact").alias("n_exact"),
    )
    return segs.unionByName(total).select(
        "c_mktsegment",
        "n_exact",
        (
            F.abs(F.col("n_distinct_est") - F.col("n_exact"))
            <= F.col("n_exact") * 0.05
        ).alias("within_tol"),
    )


@register(
    "math_try_divide_safe",
    tags=("math", "null-safety"),
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice / NULLIF(l_quantity - 1, 0) AS price_per_extra_unit
    FROM lineitem WHERE l_orderkey < 100
    """,
)
def math_try_divide_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe division: try_divide yields NULL on division by zero
    instead of failing the job (ANSI mode) or emitting Inf (legacy) —
    per-row IEEE division otherwise, bit-identical cross-engine."""
    li = Catalog(spark, sf_dir).table("lineitem").filter(F.col("l_orderkey") < 100)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide(
            F.col("l_extendedprice"), F.col("l_quantity") - 1
        ).alias("price_per_extra_unit"),
    )


@register(
    "agg_collect_sorted_set",
    tags=("agg", "array"),
    oracle="""
    SELECT l_returnflag,
           array_to_string(list_sort(list(DISTINCT l_linestatus)), ',') AS statuses,
           COUNT(DISTINCT l_linestatus) AS n_statuses
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_collect_sorted_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped array collection: collect_set is orderless, so results are
    array_sort-ed — the determinism rule for any collected array at any
    scale — then array_join-ed to a scalar so the checked surface is
    hashable (driver canonicalizers cannot sort list cells)."""
    return (
        Catalog(spark, sf_dir)
        .table("lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.array_join(
                F.array_sort(F.collect_set("l_linestatus")), ","
            ).alias("statuses"),
            F.countDistinct("l_linestatus").alias("n_statuses"),
        )
    )


@register(
    "agg_approx_percentile_bounded",
    tags=("agg", "approx", "percentile"),
    oracle="""
    WITH scaled AS (
      SELECT l_returnflag, CAST(round(l_extendedprice * 100) AS BIGINT) AS pc
      FROM lineitem),
    hist AS (
      SELECT l_returnflag, pc, COUNT(*) AS cnt
      FROM scaled GROUP BY l_returnflag, pc),
    cum AS (
      SELECT l_returnflag, pc,
             SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY pc
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS cum_cnt,
             SUM(cnt) OVER (PARTITION BY l_returnflag) AS n_total
      FROM hist)
    SELECT l_returnflag,
           MIN(CASE WHEN cum_cnt >= (n_total + 1) // 2 THEN pc END)
           + MIN(CASE WHEN cum_cnt >= n_total // 2 + 1 THEN pc END)
               AS p50_exact_scaled2,
           TRUE AS within_tol
    FROM cum GROUP BY l_returnflag
    """,
)
def agg_approx_percentile_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``approx_percentile`` (sketch-based, accuracy 10000) bounded against
    the exact median: the query emits a within-1%% boolean the oracle
    hash-checks — same deterministic-contract pattern as
    ``agg_approx_distinct_parts``. The exact median is reported as 2× the
    scaled-cent median (lower-mid + upper-mid order statistics summed), so
    the even-n half-step stays in BIGINT and no interpolated double is
    ever emitted or rounded (audit-class fix: the old version hash-compared
    a raw interpolated double bitwise across engines). The tolerance check
    is pure integer too: Spark's sketch returns an actual data value, so
    ``|200·approx_cents − p50_scaled2| ≤ p50_scaled2`` is ±0.5%%.
    At 100 TB the sketch is the only option (exact medians need a
    per-group sort); the bound is what makes it trustworthy.
    """
    from pyspark.sql.window import Window

    li = Catalog(spark, sf_dir).table("lineitem").select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("pc"),
    )
    hist = li.groupBy("l_returnflag", "pc").agg(F.count(F.lit(1)).alias("cnt"))
    w_cum = (
        Window.partitionBy("l_returnflag")
        .orderBy("pc")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.select(
        "l_returnflag",
        "pc",
        F.sum("cnt").over(w_cum).alias("cum_cnt"),
        F.sum("cnt").over(Window.partitionBy("l_returnflag")).alias("n_total"),
    )
    lo_mid = F.min(
        F.when(F.col("cum_cnt") >= F.expr("(n_total + 1) div 2"), F.col("pc"))
    )
    hi_mid = F.min(
        F.when(F.col("cum_cnt") >= F.expr("n_total div 2") + 1, F.col("pc"))
    )
    exact = cum.groupBy("l_returnflag").agg(
        (lo_mid + hi_mid).alias("p50_exact_scaled2")
    )
    approx = (
        Catalog(spark, sf_dir)
        .table("lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(
                F.expr("approx_percentile(l_extendedprice, 0.5, 10000)") * 100
            )
            .cast("long")
            .alias("approx_cents")
        )
    )
    return exact.join(F.broadcast(approx), "l_returnflag").select(
        "l_returnflag",
        "p50_exact_scaled2",
        (
            F.abs(F.col("approx_cents") * 2 - F.col("p50_exact_scaled2"))
            * 100
            <= F.col("p50_exact_scaled2")
        ).alias("within_tol"),
    )


@register(
    "join_lateral_top2_lineitems",
    tags=("join", "lateral", "topk"),
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, t.l_linenumber, t.l_extendedprice
    FROM orders o CROSS JOIN LATERAL (
      SELECT l_linenumber, l_extendedprice FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
      ORDER BY l_extendedprice DESC, l_linenumber LIMIT 2) t
    WHERE o.o_orderkey % 97 = 0
    """,
)
def join_lateral_top2_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL join (DataFrame ``lateralJoin``, Spark 4): the
    two highest-price lineitems per sampled order, the per-outer-row
    subquery surface that windowed top-k can't express when the inner
    query is arbitrary. Catalyst decorrelates this into a join +
    per-group limit — no per-row re-execution.
    """
    cat = Catalog(spark, sf_dir)
    orders = (
        cat.table("orders")
        .select("o_orderkey", "o_totalprice")
        .filter(F.col("o_orderkey") % 97 == 0)
    )
    li = cat.table("lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    top2 = (
        li.where(F.col("l_orderkey") == F.col("o_orderkey").outer())
        .orderBy(F.col("l_extendedprice").desc(), "l_linenumber")
        .limit(2)
    )
    return orders.lateralJoin(top2).select(
        "o_orderkey", "o_totalprice", "l_linenumber", "l_extendedprice"
    )


@register(
    "json_variant_typed_extract",
    tags=("json", "variant"),
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 7 AS k_bucket,
           COUNT(*) AS n,
           COUNT(json_extract_string(props, '$.missing')) AS n_missing
    FROM events GROUP BY k_bucket ORDER BY k_bucket
    """,
)
def json_variant_typed_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT surface (Spark 4): ``parse_json`` once into
    the binary variant encoding, then typed path extraction
    (``try_variant_get``) — the scale answer to repeated string-JSON
    parsing (parse once, extract many, columnar-shred under the hood).
    Missing paths return NULL, pinned by the n_missing column.
    """
    ev = Catalog(spark, sf_dir).table("events")
    v = ev.select(F.parse_json("props").alias("v"))
    extracted = v.select(
        F.try_variant_get("v", "$.k", "bigint").alias("k"),
        F.try_variant_get("v", "$.missing", "string").alias("miss"),
    )
    return (
        extracted.groupBy((F.col("k") % 7).alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("miss").alias("n_missing"),
        )
        .orderBy("k_bucket")
    )


@register(
    "stats_ols_price_on_quantity",
    tags=("agg", "statistics", "regression"),
    oracle="""
    WITH m AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             SUM(CAST(round(l_quantity) AS BIGINT)) AS sx,
             SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS sy,
             SUM(CAST(round(l_quantity) AS BIGINT)
                 * CAST(round(l_extendedprice * 100) AS BIGINT)) AS sxy,
             SUM(CAST(round(l_quantity) AS BIGINT)
                 * CAST(round(l_quantity) AS BIGINT)) AS sxx
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag, n,
           (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
           / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) / 100.0
               AS slope,
           (CAST(sy AS DOUBLE)
            - ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
               / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx))
              * CAST(sx AS DOUBLE))
           / CAST(n AS DOUBLE) / 100.0 AS intercept
    FROM m
    """,
)
def stats_ols_price_on_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group closed-form OLS (price ~ quantity) from exact integer
    moments — one hash-aggregation pass, the distributed shape for any
    per-segment linear fit at corpus scale. The four sums accumulate as
    BIGINT over fixed-point values, so slope and intercept are
    bit-identical cross-engine (streaming float accumulation would not
    be); the /100 rescales cents back to natural units.
    """
    qx = F.round(F.col("l_quantity")).cast("long")
    py = F.round(F.col("l_extendedprice") * 100).cast("long")
    m = (
        Catalog(spark, sf_dir)
        .table("lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(qx).alias("sx"),
            F.sum(py).alias("sy"),
            F.sum(qx * py).alias("sxy"),
            F.sum(qx * qx).alias("sxx"),
        )
    )
    n = F.col("n").cast("double")
    slope_scaled = (n * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")) / (
        n * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    )
    return m.select(
        "l_returnflag",
        "n",
        (slope_scaled / 100.0).alias("slope"),
        (
            (F.col("sy").cast("double") - slope_scaled * F.col("sx").cast("double"))
            / n
            / 100.0
        ).alias("intercept"),
    )


@register(
    "agg_winsorized_revenue",
    tags=("agg", "statistics", "outliers"),
    oracle="""
    WITH scaled AS (
      SELECT l_returnflag, CAST(round(l_extendedprice * 100) AS BIGINT) AS pc
      FROM lineitem),
    hist AS (
      SELECT l_returnflag, pc, COUNT(*) AS cnt
      FROM scaled GROUP BY l_returnflag, pc),
    cum AS (
      SELECT l_returnflag, pc,
             SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY pc
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS cum_cnt,
             SUM(cnt) OVER (PARTITION BY l_returnflag) AS n_total
      FROM hist),
    bounds AS (
      SELECT l_returnflag,
             MIN(CASE WHEN cum_cnt >= (n_total + 19) // 20 THEN pc END) AS lo,
             MIN(CASE WHEN cum_cnt >= (19 * n_total + 19) // 20 THEN pc END)
                 AS hi
      FROM cum GROUP BY l_returnflag)
    SELECT s.l_returnflag,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN pc < lo OR pc > hi THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clipped,
           CAST(SUM(CASE WHEN pc < lo THEN lo
                    WHEN pc > hi THEN hi
                    ELSE pc END) AS BIGINT) AS winsorized_scaled
    FROM scaled s JOIN bounds b ON s.l_returnflag = b.l_returnflag
    GROUP BY s.l_returnflag
    """,
)
def agg_winsorized_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group winsorization (clip to [p5, p95]) — the outlier-robust
    aggregation pattern, computed entirely in integer arithmetic so the
    result is engine-portable by construction (the round-3 driver red row
    came from rounding an *interpolated* percentile that landed one ulp
    from a .5 boundary — no derived double is ever rounded here). Bounds
    are discrete order statistics (SQL-standard PERCENTILE_DISC: first
    value whose cumulative count reaches ceil(q·n)) taken over a
    distinct-value histogram of scaled-cent longs: groupBy (flag, cents)
    shrinks the window input to distinct values only, so the cumulative
    window sorts thousands of rows per group, not billions — the shape
    that survives 100 TB. Bounds broadcast back; clip is a codegen map;
    totals sum exactly as BIGINT.
    """
    from pyspark.sql.window import Window

    li = Catalog(spark, sf_dir).table("lineitem").select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("pc"),
    )
    hist = li.groupBy("l_returnflag", "pc").agg(F.count(F.lit(1)).alias("cnt"))
    w_cum = (
        Window.partitionBy("l_returnflag")
        .orderBy("pc")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("l_returnflag")
    cum = hist.select(
        "l_returnflag",
        "pc",
        F.sum("cnt").over(w_cum).alias("cum_cnt"),
        F.sum("cnt").over(w_all).alias("n_total"),
    )
    lo_k = F.expr("(n_total + 19) div 20")
    hi_k = F.expr("(19 * n_total + 19) div 20")
    bounds = cum.groupBy("l_returnflag").agg(
        F.min(F.when(F.col("cum_cnt") >= lo_k, F.col("pc"))).alias("lo"),
        F.min(F.when(F.col("cum_cnt") >= hi_k, F.col("pc"))).alias("hi"),
    )
    clipped = li.join(F.broadcast(bounds), "l_returnflag").select(
        "l_returnflag",
        F.least(F.greatest(F.col("pc"), F.col("lo")), F.col("hi")).alias("w"),
        ((F.col("pc") < F.col("lo")) | (F.col("pc") > F.col("hi")))
        .cast("long")
        .alias("c"),
    )
    return clipped.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("n_clipped"),
        F.sum("w").alias("winsorized_scaled"),
    )


@register(
    "clean_impute_group_mean",
    tags=("cleaning", "imputation"),
    oracle="""
    WITH masked AS (
      SELECT l_returnflag,
             CASE WHEN CAST(('0x' || substring(md5('null' || CAST(l_orderkey AS VARCHAR)
                                                || '_' || CAST(l_linenumber AS VARCHAR)),
                                               1, 15)) AS BIGINT) % 10 = 0
                  THEN NULL ELSE l_extendedprice END AS p
      FROM lineitem),
    means AS (
      SELECT l_returnflag,
             (2 * SUM(CAST(round(p * 100) AS BIGINT)) + COUNT(p))
                 // (2 * COUNT(p)) AS fill_scaled
      FROM masked GROUP BY l_returnflag)
    SELECT m.l_returnflag,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN p IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_imputed,
           CAST(SUM(coalesce(CAST(round(p * 100) AS BIGINT), fill_scaled))
               AS BIGINT) AS imputed_total_scaled
    FROM masked m JOIN means g ON m.l_returnflag = g.l_returnflag
    GROUP BY m.l_returnflag
    """,
)
def clean_impute_group_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-mean imputation — the missing-value cleaning staple: nulls
    (planted deterministically on ~10% of rows by row hash) are filled
    with their group's mean computed from the NON-null rows (one tiny
    group aggregate broadcast back). The fill value is kept as an exact
    rational of scaled longs and rounded in *integer* arithmetic —
    round(S/c) = floor((2S + c) / (2c)) for the positive sums here — so
    no derived double is ever rounded (the round-3 driver red row came
    from ``round(sum/count/100.0)``, which is one-ulp-fragile across
    engines by construction). Imputed counts and post-fill totals are
    value-checked.
    """
    from agol_pandas_spark.functions.text import portable_hash60

    li = Catalog(spark, sf_dir).table("lineitem").select(
        "l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    gate = (
        F.pmod(
            portable_hash60(
                F.concat(
                    F.lit("null"),
                    F.col("l_orderkey").cast("string"),
                    F.lit("_"),
                    F.col("l_linenumber").cast("string"),
                )
            ),
            F.lit(10),
        )
        == 0
    )
    masked = li.select(
        "l_returnflag",
        F.when(gate, F.lit(None))
        .otherwise(F.round(F.col("l_extendedprice") * 100).cast("long"))
        .alias("p"),
    )
    means = masked.groupBy("l_returnflag").agg(
        F.expr("(2 * sum(p) + count(p)) div (2 * count(p))").alias("fill_scaled")
    )
    return (
        masked.join(F.broadcast(means), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("p").isNull().cast("long")).alias("n_imputed"),
            F.sum(F.coalesce(F.col("p"), F.col("fill_scaled"))).alias(
                "imputed_total_scaled"
            ),
        )
    )


@register(
    "events_user_retention_cohorts",
    tags=("analytics", "cohorts", "events"),
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             MIN((epoch_ms(ts) // 1000 // 86400) // 7) AS cohort_week
      FROM events GROUP BY user_id),
    activity AS (
      SELECT DISTINCT e.user_id, f.cohort_week,
             ((epoch_ms(e.ts) // 1000 // 86400) // 7) - f.cohort_week
                 AS weeks_since
      FROM events e JOIN firsts f ON e.user_id = f.user_id)
    SELECT cohort_week, weeks_since,
           COUNT(*) AS n_active_users
    FROM activity GROUP BY cohort_week, weeks_since
    """,
)
def events_user_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users bucketed by first-activity week, counted
    once per (cohort, weeks-since-cohort) they were active — the classic
    product-analytics triangle. Two shuffles (first-touch aggregate on
    user, distinct activity on (user, week)); the cohort dimension joins
    back broadcast. Week arithmetic is pure integer division on epoch
    seconds, so every cell is value-checked.
    """
    ev = Catalog(spark, sf_dir).table("events").select("user_id", "ts")
    week = (F.unix_timestamp("ts") / F.lit(86400)).cast("long") / F.lit(7)
    ev_w = ev.select("user_id", week.cast("long").alias("week"))
    firsts = ev_w.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    activity = (
        ev_w.join(F.broadcast(firsts), "user_id")
        .select(
            "user_id",
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("weeks_since"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_week", "weeks_since").agg(
        F.count(F.lit(1)).alias("n_active_users")
    )


@register(
    "stats_mad_outliers",
    tags=("stats", "robust", "outliers"),
    oracle="""
    WITH scaled AS (
      SELECT l_returnflag, CAST(round(l_extendedprice * 100) AS BIGINT) AS pc
      FROM lineitem),
    hist AS (
      SELECT l_returnflag, pc, COUNT(*) AS cnt
      FROM scaled GROUP BY l_returnflag, pc),
    cum AS (
      SELECT l_returnflag, pc,
             SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY pc
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS cum_cnt,
             SUM(cnt) OVER (PARTITION BY l_returnflag) AS n_total
      FROM hist),
    med AS (
      SELECT l_returnflag, MAX(n_total) AS n,
             MIN(CASE WHEN cum_cnt >= (n_total + 1) // 2 THEN pc END)
                 AS median_cents
      FROM cum GROUP BY l_returnflag),
    devhist AS (
      SELECT h.l_returnflag, abs(h.pc - m.median_cents) AS dev,
             SUM(h.cnt) AS cnt
      FROM hist h JOIN med m ON h.l_returnflag = m.l_returnflag
      GROUP BY h.l_returnflag, abs(h.pc - m.median_cents)),
    devcum AS (
      SELECT l_returnflag, dev,
             SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY dev
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS cum_cnt,
             SUM(cnt) OVER (PARTITION BY l_returnflag) AS n_total
      FROM devhist),
    mad AS (
      SELECT l_returnflag,
             MIN(CASE WHEN cum_cnt >= (n_total + 1) // 2 THEN dev END)
                 AS mad_cents
      FROM devcum GROUP BY l_returnflag)
    SELECT m.l_returnflag, CAST(m.n AS BIGINT) AS n, m.median_cents,
           d.mad_cents,
           CAST((SELECT coalesce(SUM(h.cnt), 0) FROM devhist h
            WHERE h.l_returnflag = m.l_returnflag
              AND h.dev > 3 * d.mad_cents) AS BIGINT) AS n_outliers
    FROM med m JOIN mad d ON m.l_returnflag = d.l_returnflag
    """,
)
def stats_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per group via MAD (median absolute
    deviation): rows with ``|x - median| > 3·MAD`` are flagged. Both
    medians are DISCRETE lower medians (first value whose cumulative
    count reaches ceil(n/2)) over scaled-cent longs, so every output is
    an exact integer — no derived double is ever rounded (the audit rule
    from the round-3 knife edges). Scale shape: the cumulative windows
    run over the distinct-VALUE histogram (groupBy shrinks billions of
    rows to thousands of distinct cents per group before any window
    sort); medians broadcast back; the deviation histogram reuses the
    first histogram instead of rescanning lineitem. The reference has no
    statistics surface at all (SURVEY §2b math row).
    """
    from pyspark.sql.window import Window

    from pyspark.storagelevel import StorageLevel

    li = Catalog(spark, sf_dir).table("lineitem").select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("pc"),
    )
    # the value histogram feeds four downstream branches (median, deviation
    # histogram, MAD, outlier count) — persist it so the corpus is scanned
    # once; the histogram is distinct cents per group, tiny at any scale
    hist = (
        li.groupBy("l_returnflag", "pc")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    def lower_median(df, val_col, out_col):
        w_cum = (
            Window.partitionBy("l_returnflag")
            .orderBy(val_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        cum = df.select(
            "l_returnflag",
            val_col,
            F.sum("cnt").over(w_cum).alias("cum_cnt"),
            F.sum("cnt").over(Window.partitionBy("l_returnflag")).alias(
                "n_total"
            ),
        )
        return cum.groupBy("l_returnflag").agg(
            F.max("n_total").alias("n"),
            F.min(
                F.when(
                    F.col("cum_cnt") >= F.expr("(n_total + 1) div 2"),
                    F.col(val_col),
                )
            ).alias(out_col),
        )

    med = lower_median(hist, "pc", "median_cents")
    devhist = (
        hist.join(F.broadcast(med.select("l_returnflag", "median_cents")),
                  "l_returnflag")
        .select(
            "l_returnflag",
            F.abs(F.col("pc") - F.col("median_cents")).alias("dev"),
            "cnt",
        )
        .groupBy("l_returnflag", "dev")
        .agg(F.sum("cnt").alias("cnt"))
    )
    mad = lower_median(devhist, "dev", "mad_cents").select(
        "l_returnflag", "mad_cents"
    )
    outliers = (
        devhist.join(F.broadcast(mad), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("dev") > 3 * F.col("mad_cents"),
                             F.col("cnt"))),
                F.lit(0),
            ).alias("n_outliers")
        )
    )
    return (
        med.join(mad, "l_returnflag")
        .join(outliers, "l_returnflag")
        .select("l_returnflag", "n", "median_cents", "mad_cents", "n_outliers")
    )


@register(
    "stats_key_skew",
    tags=("stats", "skew", "profiling"),
    oracle="""
    WITH counts AS (
      SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total, COUNT(*) AS n_keys
            FROM counts),
    top AS (SELECT user_id, cnt FROM counts
            ORDER BY cnt DESC, user_id LIMIT 10)
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, user_id) AS INTEGER)
               AS rnk,
           user_id, cnt,
           cnt * 1000000 // total AS share_ppm,
           total, n_keys
    FROM top, tot
    """,
)
def stats_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew profile: the top-10 heaviest keys with their traffic
    share in exact ppm (integer division — no derived double). This is
    the diagnostic that decides salting/AQE-skew-join strategy before a
    big join ships: a key carrying >~5% of a 100 TB shuffle is the
    straggler. Scale shape: one partial-aggregated groupBy on the key,
    then top-10 via orderBy+limit (TakeOrderedAndProject — never a global
    window over all keys); the 2-column totals row is a broadcast.
    """
    from pyspark.sql.window import Window

    ev = Catalog(spark, sf_dir).table("events").select("user_id")
    counts = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    tot = counts.agg(
        F.sum("cnt").alias("total"), F.count(F.lit(1)).alias("n_keys")
    )
    top = counts.orderBy(F.col("cnt").desc(), "user_id").limit(10)
    # row_number over the surviving 10 rows only (empty frame = tiny)
    w = Window.orderBy(F.col("cnt").desc(), "user_id")
    return (
        top.crossJoin(F.broadcast(tot))
        .withColumn("rnk", F.row_number().over(w))
        .select(
            "rnk",
            "user_id",
            "cnt",
            F.expr("cnt * 1000000 div total").alias("share_ppm"),
            "total",
            "n_keys",
        )
    )


@register(
    "stats_ks_drift",
    headline=True,
    tags=("stats", "drift", "distribution"),
    oracle="""
    WITH base AS (
      SELECT CAST(round(l_discount * 100) AS INTEGER) AS discount_pct,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
             CASE WHEN year(l_shipdate) = 1996 THEN 1 ELSE 0 END AS is1,
             CASE WHEN year(l_shipdate) = 1997 THEN 1 ELSE 0 END AS is2
      FROM lineitem WHERE year(l_shipdate) IN (1996, 1997)),
    hist AS (
      SELECT discount_pct, pc, SUM(is1) AS c1, SUM(is2) AS c2
      FROM base GROUP BY discount_pct, pc),
    cum AS (
      SELECT discount_pct, pc,
             SUM(c1) OVER (PARTITION BY discount_pct ORDER BY pc
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS cum1,
             SUM(c2) OVER (PARTITION BY discount_pct ORDER BY pc
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS cum2,
             SUM(c1) OVER (PARTITION BY discount_pct) AS n1,
             SUM(c2) OVER (PARTITION BY discount_pct) AS n2
      FROM hist),
    diffs AS (
      SELECT discount_pct, pc,
             abs(cum1 * n2 - cum2 * n1) AS dnum, n1, n2
      FROM cum),
    mx AS (
      SELECT discount_pct, MAX(dnum) AS ks_num,
             MAX(n1) AS n1, MAX(n2) AS n2
      FROM diffs GROUP BY discount_pct)
    SELECT m.discount_pct, CAST(m.n1 AS BIGINT) AS n1,
           CAST(m.n2 AS BIGINT) AS n2, CAST(m.ks_num AS BIGINT) AS ks_num,
           CAST(m.ks_num * 1000000 // (m.n1 * m.n2) AS BIGINT) AS ks_ppm,
           (SELECT MIN(d.pc) FROM diffs d
            WHERE d.discount_pct = m.discount_pct
              AND d.dnum = m.ks_num) AS at_cents
    FROM mx m
    """,
)
def stats_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov drift between the 1996 and 1997
    price distributions, per discount band — the snapshot-drift gate a
    training-data pipeline runs before admitting a new crawl. Delegates
    to :func:`operators.profile.ks_drift` (integer-exact: D carried as
    the cross-multiplied long numerator, no derived double anywhere —
    round-3 audit rule; fuzz-checked against a pure-Python reference in
    tests/test_profile.py). The raw l_shipdate range filter is pushable
    to the parquet scan where year() would not be. The reference has no
    statistics surface at all (SURVEY §2b math row).
    """
    from agol_pandas_spark.operators.profile import ks_drift

    li = (
        Catalog(spark, sf_dir)
        .table("lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1998-01-01"))
        )
        .select(
            F.round(F.col("l_discount") * 100).cast("int").alias("discount_pct"),
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("pc"),
            F.when(F.year("l_shipdate") == 1996, 1).otherwise(2).alias("side"),
        )
    )
    return ks_drift(li, "discount_pct", "pc", "side").withColumnRenamed(
        "at_value", "at_cents"
    )


@register(
    "events_anomaly_zscore",
    tags=("events", "anomaly", "stats"),
    oracle="""
    WITH hourly AS (
      SELECT event_type, epoch_ms(ts) // 3600000 AS hour, COUNT(*) AS c
      FROM events GROUP BY event_type, hour),
    moments AS (
      SELECT event_type, COUNT(*) AS h,
             SUM(c) AS s, SUM(c * c) AS s2
      FROM hourly GROUP BY event_type)
    SELECT hr.event_type, hr.hour, hr.c,
           ((hr.c * m.h - m.s) * (hr.c * m.h - m.s)
              > 9 * (m.h * m.s2 - m.s * m.s)) AS is_anomaly
    FROM hourly hr JOIN moments m ON hr.event_type = m.event_type
    """,
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-sigma anomaly flags on hourly event volumes with ZERO floating
    point: |c − μ| > 3σ is cross-multiplied into
    ``(c·H − S)² > 9·(H·Σc² − S²)`` over integer moments — no division,
    no sqrt, engine-portable by construction. Scale shape: one hourly
    aggregation (map-side combined), a per-type moment row broadcast
    back; the anomaly predicate is a codegen map.
    """
    ev = Catalog(spark, sf_dir).table("events")
    hourly = (
        ev.select(
            "event_type",
            F.expr("unix_millis(ts) div 3600000").alias("hour"),
        )
        .groupBy("event_type", "hour")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    moments = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("h"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("s2"),
    )
    d = F.col("c") * F.col("h") - F.col("s")
    return hourly.join(F.broadcast(moments), "event_type").select(
        "event_type",
        "hour",
        "c",
        (d * d > 9 * (F.col("h") * F.col("s2") - F.col("s") * F.col("s")))
        .alias("is_anomaly"),
    )


@register(
    "events_time_weighted_avg",
    tags=("events", "timeseries", "twap"),
    oracle="""
    WITH seg AS (
      SELECT user_id,
             CAST(round(value * 10000) AS BIGINT) AS v,
             epoch_us(ts) AS t,
             LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS t_next
      FROM events),
    w AS (
      SELECT user_id, v, t_next - t AS dt
      FROM seg WHERE t_next IS NOT NULL)
    SELECT user_id,
           COUNT(*) AS n_segments,
           CAST(SUM(dt) AS BIGINT) AS total_us,
           CAST(SUM(v * dt) AS BIGINT) AS weighted_sum,
           CAST(SUM(v * dt) // SUM(dt) AS BIGINT) AS twap_scaled
    FROM w GROUP BY user_id
    """,
)
def events_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average (TWAP) of each user's event value: every
    reading holds until the next one, weighted by its holding interval in
    exact integer microseconds; values are fixed-point 1e-4 units and the
    final mean is one integer division (identical truncation semantics in
    both engines). The IoT/finance staple the plain AVG gets wrong under
    irregular sampling. One window shuffle on (user, ts); weights never
    leave integer space.
    """
    from pyspark.sql.window import Window

    ev = Catalog(spark, sf_dir).table("events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = ev.select(
        "user_id",
        F.round(F.col("value") * 10000).cast("long").alias("v"),
        F.unix_micros("ts").alias("t"),
        F.lead(F.unix_micros("ts")).over(w).alias("t_next"),
    ).filter(F.col("t_next").isNotNull())
    return (
        seg.select("user_id", "v", (F.col("t_next") - F.col("t")).alias("dt"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.sum("dt").alias("total_us"),
            F.sum(F.col("v") * F.col("dt")).alias("weighted_sum"),
        )
        .select(
            "user_id",
            "n_segments",
            "total_us",
            "weighted_sum",
            F.expr("weighted_sum div total_us").alias("twap_scaled"),
        )
    )


@register(
    "stats_equidepth_histogram",
    tags=("stats", "histogram", "optimizer"),
    oracle="""
    WITH scaled AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS pc FROM orders),
    ranked AS (
      SELECT pc, ROW_NUMBER() OVER (ORDER BY pc) AS rn, COUNT(*) OVER () AS n
      FROM scaled),
    bucketed AS (
      SELECT pc, ((rn - 1) * 8) // n AS bucket FROM ranked)
    SELECT bucket, COUNT(*) AS n_rows,
           MIN(pc) AS lo_cents, MAX(pc) AS hi_cents,
           CAST(SUM(pc) AS BIGINT) AS sum_cents
    FROM bucketed GROUP BY bucket
    """,
)
def stats_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equal-height) histogram of order totals — the
    optimizer-statistics building block: 8 buckets of (near-)equal row
    count via integer rank arithmetic ``bucket = (rn−1)·B div n``, with
    per-bucket bounds and exact sums. Ties land deterministically because
    equal values share contiguous ranks (tied rows carry the same value,
    so however a tie-run straddles a bucket boundary, every per-bucket
    aggregate is unchanged — the oracle's ROW_NUMBER form is
    tie-order-invariant for exactly that reason).

    Scale shape (r5): no per-row row_number at all. The distinct-value
    histogram gets a distributed weighted rank (operators/ranks.py), so
    each value v knows its 0-based position interval [p0, p1]; the
    positions of bucket b are [⌈bn/8⌉, ⌈(b+1)n/8⌉−1], and the per-bucket
    contribution of v is the integer overlap of the two intervals —
    ``sequence`` + ``explode`` emits at most min(8, span) rows per value.
    Everything after the one range shuffle of distinct values is codegen
    arithmetic; nothing is single-partition.
    """
    from agol_pandas_spark.operators.ranks import add_global_ranks

    orders = Catalog(spark, sf_dir).table("orders").select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("pc")
    )
    hist = orders.groupBy("pc").agg(F.count(F.lit(1)).alias("cnt"))
    ranked = add_global_ranks(
        hist, ["pc"], weight_col="cnt", rank_col="rnk", total_col="n"
    )
    spans = ranked.select(
        "pc",
        "n",
        (F.col("rnk") - 1).alias("p0"),
        (F.col("rnk") + F.col("cnt") - 2).alias("p1"),
    ).select(
        "pc",
        "n",
        "p0",
        "p1",
        F.explode(
            F.sequence(
                F.expr("(p0 * 8) div n"), F.expr("(p1 * 8) div n")
            )
        ).alias("bucket"),
    )
    contrib = spans.select(
        "pc",
        "bucket",
        (
            F.least(F.col("p1"), F.expr("((bucket + 1) * n + 7) div 8 - 1"))
            - F.greatest(F.col("p0"), F.expr("(bucket * n + 7) div 8"))
            + 1
        ).alias("k"),
    )
    return contrib.groupBy("bucket").agg(
        F.sum("k").alias("n_rows"),
        F.min("pc").alias("lo_cents"),
        F.max("pc").alias("hi_cents"),
        F.sum(F.col("pc") * F.col("k")).alias("sum_cents"),
    )


@register(
    "string_levenshtein_pairs",
    tags=("string", "fuzzy", "dedup"),
    oracle="""
    WITH p AS (
      SELECT p_partkey, p_name,
             string_split(p_name, ' ')[-1] AS noun
      FROM part),
    pairs AS (
      SELECT a.noun, levenshtein(a.p_name, b.p_name) AS edit_dist
      FROM p a JOIN p b
        ON a.noun = b.noun AND a.p_partkey < b.p_partkey)
    SELECT noun,
           COUNT(*) AS n_pairs,
           CAST(SUM(CASE WHEN edit_dist = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_exact,
           CAST(SUM(CASE WHEN edit_dist BETWEEN 1 AND 4 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_close,
           CAST(SUM(edit_dist) AS BIGINT) AS total_dist
    FROM pairs GROUP BY noun
    """,
)
def string_levenshtein_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string matching for entity resolution: per-block edit-distance
    profile of part names, BLOCKED on the head noun so the quadratic
    Levenshtein never runs across blocks (the unblocked version is a cross
    join and is intentionally not offered — same contract as the Jaccard
    operators). Exact-dup / near-dup pair counts and the total distance
    are value-checked; Levenshtein is exact DP, identical in both
    engines."""
    p = Catalog(spark, sf_dir).table("part").select(
        "p_partkey",
        "p_name",
        F.element_at(F.split("p_name", " "), -1).alias("noun"),
    )
    a = p.select(
        F.col("p_partkey").alias("key_a"),
        F.col("p_name").alias("name_a"),
        "noun",
    )
    b = p.select(
        F.col("p_partkey").alias("key_b"),
        F.col("p_name").alias("name_b"),
        "noun",
    )
    dist = F.levenshtein("name_a", "name_b")
    return (
        a.join(b, "noun")
        .filter(F.col("key_a") < F.col("key_b"))
        .select("noun", dist.alias("edit_dist"))
        .groupBy("noun")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum((F.col("edit_dist") == 0).cast("long")).alias("n_exact"),
            F.sum(
                ((F.col("edit_dist") >= 1) & (F.col("edit_dist") <= 4)).cast("long")
            ).alias("n_close"),
            F.sum("edit_dist").alias("total_dist"),
        )
    )


@register(
    "agg_mode_per_group",
    tags=("agg", "mode"),
    oracle="""
    WITH counts AS (
      SELECT c_mktsegment, o_orderpriority, COUNT(*) AS n
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment, o_orderpriority),
    ranked AS (
      SELECT c_mktsegment, o_orderpriority, n,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY n DESC, o_orderpriority) AS rn
      FROM counts)
    SELECT c_mktsegment, o_orderpriority AS mode_priority, n AS mode_count
    FROM ranked WHERE rn = 1
    """,
)
def agg_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical mode per group with a deterministic tie-break (highest
    count, then lexicographically smallest value) — Spark's ``mode()``
    aggregate is tie-nondeterministic, so the engine uses the count+window
    formulation that survives any partitioning."""
    from pyspark.sql.window import Window

    cat = Catalog(spark, sf_dir)
    counts = (
        cat.table("orders")
        .join(cat.table("customer"),
              F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("n").desc(), "o_orderpriority"
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "c_mktsegment",
            F.col("o_orderpriority").alias("mode_priority"),
            F.col("n").alias("mode_count"),
        )
    )


@register(
    "sketch_theta_year_overlap",
    tags=("sketch", "theta", "setops"),
    oracle="""
    WITH flags AS (
      SELECT o_custkey,
             MAX(CASE WHEN year(o_orderdate) = 1995 THEN 1 ELSE 0 END) AS h95,
             MAX(CASE WHEN year(o_orderdate) = 1996 THEN 1 ELSE 0 END) AS h96
      FROM orders GROUP BY o_custkey)
    SELECT CAST(SUM(h95) AS BIGINT) AS n_1995,
           CAST(SUM(h96) AS BIGINT) AS n_1996,
           CAST(SUM(h95 * h96) AS BIGINT) AS n_both_exact,
           TRUE AS inter_est_ok
    FROM flags
    """,
)
def sketch_theta_year_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch set intersection — the sketch capability HLL lacks
    (HLL unions only; theta supports ∩ and difference): customers active
    in BOTH 1995 and 1996, estimated from two mergeable per-year sketches
    built in one pass each, then checked against the exact intersection
    (computed via one per-key flag aggregation). The boolean pins the
    estimate within 5% using integer arithmetic; exact counts anchor the
    value hash. At 100 TB the sketches are the only state that moves —
    two KB-sized blobs instead of a distinct-key shuffle.
    """
    o = Catalog(spark, sf_dir).table("orders").select(
        "o_custkey", F.year("o_orderdate").alias("y")
    )
    sk = o.agg(
        F.expr(
            "theta_sketch_estimate(theta_intersection("
            "  theta_sketch_agg(CASE WHEN y = 1995 THEN o_custkey END),"
            "  theta_sketch_agg(CASE WHEN y = 1996 THEN o_custkey END)))"
        ).alias("est_both")
    )
    flags = o.groupBy("o_custkey").agg(
        F.max((F.col("y") == 1995).cast("long")).alias("h95"),
        F.max((F.col("y") == 1996).cast("long")).alias("h96"),
    )
    exact = flags.agg(
        F.sum("h95").alias("n_1995"),
        F.sum("h96").alias("n_1996"),
        F.sum(F.col("h95") * F.col("h96")).alias("n_both_exact"),
    )
    return exact.crossJoin(F.broadcast(sk)).select(
        "n_1995",
        "n_1996",
        "n_both_exact",
        (
            20 * F.abs(F.col("est_both") - F.col("n_both_exact"))
            <= F.col("n_both_exact")
        ).alias("inter_est_ok"),
    )


@register(
    "events_transition_matrix",
    tags=("events", "sequence", "markov"),
    oracle="""
    WITH seq AS (
      SELECT event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events)
    SELECT event_type AS from_type, next_type AS to_type,
           COUNT(*) AS n_transitions
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
    """,
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order transition counts between consecutive event types per
    user (the Markov-chain / next-action mining primitive): one lead
    window over the (user, time) order, then a tiny (types²) aggregation
    — the shuffle carries type pairs, not events."""
    from pyspark.sql.window import Window

    ev = Catalog(spark, sf_dir).table("events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    return seq.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )


@register(
    "setops_multiset_all",
    tags=("setop", "multiset"),
    oracle="""
    WITH a AS (SELECT o_orderpriority AS p FROM orders WHERE o_orderstatus = 'O'),
         b AS (SELECT o_orderpriority AS p FROM orders WHERE o_custkey % 2 = 0)
    SELECT 'intersect_all' AS op, p, COUNT(*) AS n FROM
      (SELECT * FROM a INTERSECT ALL SELECT * FROM b) GROUP BY p
    UNION ALL
    SELECT 'except_all' AS op, p, COUNT(*) AS n FROM
      (SELECT * FROM a EXCEPT ALL SELECT * FROM b) GROUP BY p
    """,
)
def setops_multiset_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset set operations (INTERSECT ALL / EXCEPT ALL) — duplicate
    counts carry bag semantics: each value survives min(cnt_a, cnt_b)
    times (intersect) or max(cnt_a − cnt_b, 0) times (except). The
    overlapping inputs make the multiplicities non-trivial; the grouped
    counts are value-checked exactly."""
    orders = Catalog(spark, sf_dir).table("orders")
    a = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_orderpriority").alias("p")
    )
    b = orders.filter(F.col("o_custkey") % 2 == 0).select(
        F.col("o_orderpriority").alias("p")
    )
    i = (
        a.intersectAll(b)
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("intersect_all").alias("op"), "p", "n")
    )
    e = (
        a.exceptAll(b)
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("except_all").alias("op"), "p", "n")
    )
    return i.unionByName(e)


@register(
    "date_week_over_week_growth",
    tags=("date", "window", "growth"),
    oracle="""
    WITH weekly AS (
      SELECT (epoch_ms(CAST(o_orderdate AS TIMESTAMP)) // 1000 // 86400) // 7
                 AS week,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS rev_cents
      FROM orders GROUP BY week)
    SELECT week, rev_cents,
           rev_cents - LAG(rev_cents) OVER (ORDER BY week) AS delta_cents,
           CASE WHEN LAG(rev_cents) OVER (ORDER BY week) > 0
                THEN (rev_cents - LAG(rev_cents) OVER (ORDER BY week))
                     * 1000000 // LAG(rev_cents) OVER (ORDER BY week)
           END AS growth_ppm
    FROM weekly
    """,
)
def date_week_over_week_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week revenue growth: epoch-week bucketing, lag window,
    and growth in exact ppm via integer division (no float ratio). The
    single global window runs over one row per week — dozens of rows at
    any corpus scale, after the map-side-combined weekly aggregation."""
    from pyspark.sql.window import Window

    orders = Catalog(spark, sf_dir).table("orders").select(
        F.expr(
            "(unix_millis(CAST(o_orderdate AS TIMESTAMP)) div 1000 div 86400) div 7"
        ).alias("week"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    weekly = orders.groupBy("week").agg(F.sum("cents").alias("rev_cents"))
    w = Window.orderBy("week")
    prev = F.lag("rev_cents").over(w)
    return weekly.select(
        "week",
        "rev_cents",
        (F.col("rev_cents") - prev).alias("delta_cents"),
        F.when(
            prev > 0,
            F.expr(
                "(rev_cents - lag(rev_cents) over (order by week)) * 1000000"
                " div lag(rev_cents) over (order by week)"
            ),
        ).alias("growth_ppm"),
    )


@register(
    "clean_pseudonymize_keys",
    tags=("cleaning", "privacy", "pseudonymization"),
    oracle="""
    WITH cust AS (
      SELECT CAST(('0x' || substring(md5('pz' || CAST(c_custkey AS VARCHAR)),
                                     1, 15)) AS BIGINT) AS cust_token,
             c_mktsegment
      FROM customer),
    ords AS (
      SELECT CAST(('0x' || substring(md5('pz' || CAST(o_custkey AS VARCHAR)),
                                     1, 15)) AS BIGINT) AS cust_token
      FROM orders)
    SELECT c.c_mktsegment,
           COUNT(DISTINCT c.cust_token) AS n_customers,
           COUNT(o.cust_token) AS n_orders_joined
    FROM cust c LEFT JOIN ords o ON c.cust_token = o.cust_token
    GROUP BY c.c_mktsegment
    """,
)
def clean_pseudonymize_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-preserving pseudonymization (the GDPR de-identification
    pattern): the customer key is replaced by a salted portable hash on
    BOTH tables, so referential integrity survives masking — the
    per-segment join cardinalities over tokens equal the raw-key join's.
    Salt rotation revokes linkability without touching consumers. A pure
    map on each side; the join shuffles tokens, never raw identifiers.
    """
    from agol_pandas_spark.functions.text import portable_hash60

    def token(col):
        return portable_hash60(
            F.concat(F.lit("pz"), F.col(col).cast("string"))
        ).alias("cust_token")

    cat = Catalog(spark, sf_dir)
    cust = cat.table("customer").select(token("c_custkey"), "c_mktsegment")
    # distinct right-side alias: the count must see NULL for unmatched
    # customers, not the using-join's merged (always non-null) column
    ords = cat.table("orders").select(
        token("o_custkey").alias("order_token")
    )
    return (
        cust.join(ords, cust["cust_token"] == ords["order_token"], "left")
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("cust_token").alias("n_customers"),
            F.count("order_token").alias("n_orders_joined"),
        )
    )


@register(
    "audit_rule_violations",
    tags=("audit", "quality", "constraints"),
    oracle="""
    SELECT rule, CAST(n_violations AS BIGINT) AS n_violations, n_checked
    FROM (
      SELECT 'qty_positive' AS rule,
             SUM(CASE WHEN NOT (l_quantity > 0) THEN 1 ELSE 0 END) AS n_violations,
             COUNT(*) AS n_checked
      FROM lineitem
      UNION ALL
      SELECT 'price_positive',
             SUM(CASE WHEN NOT (l_extendedprice > 0) THEN 1 ELSE 0 END),
             COUNT(*)
      FROM lineitem
      UNION ALL
      SELECT 'discount_in_unit_range',
             SUM(CASE WHEN NOT (l_discount >= 0 AND l_discount <= 1)
                 THEN 1 ELSE 0 END),
             COUNT(*)
      FROM lineitem
      UNION ALL
      SELECT 'shipdate_in_range',
             SUM(CASE WHEN NOT (l_shipdate >= DATE '1992-01-01'
                                AND l_shipdate < DATE '2000-01-01')
                 THEN 1 ELSE 0 END),
             COUNT(*)
      FROM lineitem
      UNION ALL
      SELECT 'returnflag_domain',
             SUM(CASE WHEN NOT (l_returnflag IN ('A','N','R')) THEN 1 ELSE 0 END),
             COUNT(*)
      FROM lineitem)
    """,
)
def audit_rule_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality rule engine: every rule is a predicate
    column summed in ONE aggregation pass over the table (the oracle's
    five scans exist only for SQL readability) — at 100 TB the difference
    between one scan and one per rule is the whole audit budget. NULL
    predicate results count as violations (NOT NULL-safe negation)."""
    rules = {
        "qty_positive": F.col("l_quantity") > 0,
        "price_positive": F.col("l_extendedprice") > 0,
        "discount_in_unit_range": (F.col("l_discount") >= 0)
        & (F.col("l_discount") <= 1),
        "shipdate_in_range": (F.col("l_shipdate") >= F.lit("1992-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("2000-01-01").cast("date")),
        "returnflag_domain": F.col("l_returnflag").isin("A", "N", "R"),
    }
    li = Catalog(spark, sf_dir).table("lineitem")
    agg = li.agg(
        F.count(F.lit(1)).alias("n_checked"),
        *[
            F.sum(
                F.when(~F.coalesce(pred, F.lit(False)), 1).otherwise(0)
            ).alias(f"__v_{name}")
            for name, pred in rules.items()
        ],
    )
    # unpivot the single result row into (rule, n_violations, n_checked)
    stack = ", ".join(f"'{n}', __v_{n}" for n in rules)
    return agg.selectExpr(
        f"stack({len(rules)}, {stack}) AS (rule, n_violations)", "n_checked"
    )


@register(
    "array_struct_order_lines",
    tags=("array", "struct", "nested"),
    oracle="""
    WITH lines AS (
      SELECT l_orderkey, l_linenumber,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem),
    packed AS (
      SELECT l_orderkey,
             list({'l_linenumber': l_linenumber, 'cents': cents} ORDER BY l_linenumber, cents) AS ls
      FROM lines GROUP BY l_orderkey)
    SELECT l_orderkey,
           CAST(len(ls) AS INTEGER) AS n_lines,
           ls[1].cents AS first_line_cents,
           ls[-1].cents AS last_line_cents,
           CAST(list_sum(list_transform(ls, s -> s.l_linenumber * s.cents))
                AS BIGINT) AS position_weighted_cents
    FROM packed
    """,
)
def array_struct_order_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-type round trip: each order's line items collect into a
    sorted ``array<struct>`` and are consumed by higher-order functions
    (element_at on struct fields, a position-weighted aggregate) — the
    construct-nested-then-compute pattern document/feature stores rely
    on. One shuffle on the order key; the struct sort is array-local.
    """
    li = Catalog(spark, sf_dir).table("lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    packed = li.groupBy("l_orderkey").agg(
        F.sort_array(
            F.collect_list(F.struct("l_linenumber", "cents"))
        ).alias("ls")
    )
    return packed.select(
        "l_orderkey",
        F.size("ls").alias("n_lines"),
        F.element_at("ls", 1)["cents"].alias("first_line_cents"),
        F.element_at("ls", -1)["cents"].alias("last_line_cents"),
        F.aggregate(
            F.col("ls"),
            F.lit(0).cast("long"),
            lambda acc, s: acc + s["l_linenumber"] * s["cents"],
        ).alias("position_weighted_cents"),
    )


@register(
    "stats_chi2_priority_drift",
    tags=("stats", "drift", "categorical"),
    oracle="""
    WITH base AS (
      SELECT o_orderpriority,
             CASE WHEN year(o_orderdate) = 1996 THEN 1 ELSE 0 END AS is1,
             CASE WHEN year(o_orderdate) = 1997 THEN 1 ELSE 0 END AS is2
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1998-01-01'),
    cells AS (
      SELECT o_orderpriority, CAST(SUM(is1) AS BIGINT) AS o1,
             CAST(SUM(is2) AS BIGINT) AS o2
      FROM base GROUP BY o_orderpriority),
    tot AS (SELECT CAST(SUM(o1) AS BIGINT) AS n1,
                   CAST(SUM(o2) AS BIGINT) AS n2 FROM cells),
    terms AS (
      SELECT c.o_orderpriority, c.o1, c.o2, t.n1, t.n2,
             abs(c.o1 * t.n2 - c.o2 * t.n1) AS d_abs,
             t.n1 * t.n2 * (c.o1 + c.o2) AS dd,
             abs(c.o1 * t.n2 - c.o2 * t.n1)
               * abs(c.o1 * t.n2 - c.o2 * t.n1) AS d2
      FROM cells c CROSS JOIN tot t),
    staged AS (
      SELECT *, d2 % dd AS r0, (d2 % dd) * 1000 % dd AS r1 FROM terms)
    SELECT o_orderpriority, o1, o2, n1, n2, d_abs,
           (d2 // dd) * 1000000 + ((r0 * 1000) // dd) * 1000
             + (r1 * 1000) // dd AS contrib_ppm
    FROM staged
    """,
)
def stats_chi2_priority_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical drift gate: per-priority chi-square homogeneity
    contributions between the 1996 and 1997 order mixes, integer-exact
    via staged long division (no derived double — round-3 audit rule;
    fuzz-checked against a big-int Python reference in
    tests/test_profile.py). Completes the drift family: KS (numeric),
    TV (vocabulary), chi-square (categorical)."""
    from agol_pandas_spark.operators.profile import chi2_drift

    orders = (
        Catalog(spark, sf_dir)
        .table("orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01"))
            & (F.col("o_orderdate") < F.lit("1998-01-01"))
        )
        .select(
            "o_orderpriority",
            F.when(F.year("o_orderdate") == 1996, 1).otherwise(2).alias("side"),
        )
    )
    return chi2_drift(orders, "o_orderpriority", "side")


@register(
    "events_gap_log2_histogram",
    tags=("events", "histogram", "latency"),
    oracle="""
    WITH gaps AS (
      SELECT event_type,
             epoch_us(ts) - LAG(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events),
    bucketed AS (
      SELECT event_type,
             CASE WHEN gap_us <= 0 THEN -1
                  ELSE length(bin(gap_us)) - 1 END AS log2_bucket
      FROM gaps WHERE gap_us IS NOT NULL)
    SELECT event_type, log2_bucket, COUNT(*) AS n_gaps
    FROM bucketed GROUP BY event_type, log2_bucket
    """,
)
def events_gap_log2_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HdrHistogram-style inter-event gap distribution: per event type,
    counts of user inter-arrival gaps in power-of-2 microsecond buckets.
    ``floor(log2(x))`` is computed EXACTLY as ``length(bin(x)) − 1`` —
    pure integer/string ops in both engines, where float ``log2`` sits
    on a knife edge at every power of two (round-3 audit rule). Zero
    gaps (same-ts events) land in bucket −1. Scale shape: one lag
    window per user partition, then a map-side-combined groupBy over ~60
    (type, bucket) cells — the fixed-size histogram shape that survives
    any corpus size.
    """
    from pyspark.sql.window import Window

    ev = Catalog(spark, sf_dir).table("events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "event_type",
        (
            F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
        ).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    bucketed = gaps.select(
        "event_type",
        F.when(F.col("gap_us") <= 0, F.lit(-1))
        .otherwise(F.length(F.bin(F.col("gap_us"))) - 1)
        .cast("int")
        .alias("log2_bucket"),
    )
    return bucketed.groupBy("event_type", "log2_bucket").agg(
        F.count(F.lit(1)).alias("n_gaps")
    )


@register(
    "agg_weighted_median_price",
    tags=("agg", "robust", "weighted"),
    oracle="""
    WITH hist AS (
      SELECT l_returnflag,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
             SUM(CAST(l_quantity AS BIGINT)) AS w
      FROM lineitem GROUP BY l_returnflag, pc),
    cum AS (
      SELECT l_returnflag, pc,
             SUM(w) OVER (PARTITION BY l_returnflag ORDER BY pc
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS cum_w,
             SUM(w) OVER (PARTITION BY l_returnflag) AS total_w
      FROM hist)
    SELECT l_returnflag, CAST(MAX(total_w) AS BIGINT) AS total_weight,
           MIN(CASE WHEN 2 * cum_w >= total_w THEN pc END)
               AS weighted_median_cents
    FROM cum GROUP BY l_returnflag
    """,
)
def agg_weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted discrete median price per return flag: the
    first value whose cumulative weight reaches half the total —
    integer-exact over scaled-cent longs and integer quantities (the
    2·cum ≥ total comparison avoids dividing the total; round-3 audit
    rule). Weighted medians are the robust price-level statistic unit
    tests can't fake with plain medians. Scale shape: the cumulative
    window runs over the distinct-value histogram (one map-side-combined
    groupBy collapses the corpus), never the raw rows.
    """
    from pyspark.sql.window import Window

    li = Catalog(spark, sf_dir).table("lineitem").select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("pc"),
        F.col("l_quantity").cast("long").alias("w"),
    )
    hist = li.groupBy("l_returnflag", "pc").agg(F.sum("w").alias("w"))
    w_cum = (
        Window.partitionBy("l_returnflag")
        .orderBy("pc")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("l_returnflag")
    cum = hist.select(
        "l_returnflag",
        "pc",
        F.sum("w").over(w_cum).alias("cum_w"),
        F.sum("w").over(w_all).alias("total_w"),
    )
    return cum.groupBy("l_returnflag").agg(
        F.max("total_w").alias("total_weight"),
        F.min(
            F.when(2 * F.col("cum_w") >= F.col("total_w"), F.col("pc"))
        ).alias("weighted_median_cents"),
    )


@register(
    "date_calendar_gaps",
    tags=("date", "calendar", "audit"),
    oracle="""
    WITH span AS (
      SELECT CAST(min(o_orderdate) AS DATE) AS d0,
             CAST(max(o_orderdate) AS DATE) AS d1
      FROM orders),
    days AS (
      SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
                 AS day
      FROM span),
    daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n
      FROM orders GROUP BY 1)
    SELECT d.day,
           CAST(year(d.day) AS INTEGER) AS yr,
           CAST(quarter(d.day) AS INTEGER) AS qtr,
           CAST(month(d.day) AS INTEGER) AS mon,
           CAST(isodow(d.day) - 1 AS INTEGER) AS dow,
           coalesce(daily.n, 0) AS n_orders,
           daily.n IS NULL AS is_gap
    FROM days d LEFT JOIN daily ON daily.day = d.day
    """,
)
def date_calendar_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-spine generation + freshness-gap audit: materialize
    every day of the order span (``sequence`` + explode — the warehouse
    calendar-dim pattern, no external generator), left-join daily order
    counts, and flag zero-activity days — the data-freshness check a
    pipeline runs per ingestion source. dow uses ISO weekday−1 so both
    engines agree (Monday=0). Scale shape: the spine is a few thousand
    rows from a 1-row aggregate; the daily counts are map-side combined;
    the join broadcasts the spine.
    """
    orders = Catalog(spark, sf_dir).table("orders")
    span = orders.agg(
        F.min(F.to_date("o_orderdate")).alias("d0"),
        F.max(F.to_date("o_orderdate")).alias("d1"),
    )
    days = span.select(
        F.explode(F.sequence(F.col("d0"), F.col("d1"))).alias("day")
    )
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        days.join(daily, "day", "left")
        .select(
            "day",
            F.year("day").alias("yr"),
            F.quarter("day").alias("qtr"),
            F.month("day").alias("mon"),
            F.weekday("day").alias("dow"),
            F.coalesce(F.col("n"), F.lit(0)).alias("n_orders"),
            F.col("n").isNull().alias("is_gap"),
        )
    )


@register(
    "events_peak_concurrency",
    tags=("events", "interval", "sweep-line"),
    oracle="""
    WITH bounds AS (
      SELECT event_type, epoch_us(ts) AS t, 1 AS delta
      FROM events
      UNION ALL
      SELECT event_type, epoch_us(ts) + 14400000000 AS t, -1 AS delta
      FROM events),
    swept AS (
      SELECT event_type, t, delta,
             SUM(delta) OVER (PARTITION BY event_type
                              ORDER BY t, delta
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW) AS conc
      FROM bounds),
    peak AS (
      SELECT event_type, CAST(MAX(conc) AS BIGINT) AS peak_concurrency
      FROM swept GROUP BY event_type)
    SELECT p.event_type, p.peak_concurrency,
           (SELECT MIN(s.t) FROM swept s
            WHERE s.event_type = p.event_type
              AND s.conc = p.peak_concurrency) AS at_us
    FROM peak p
    """,
)
def events_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line peak concurrency: how many 4-hour activity windows of
    each event type overlap at the busiest instant, and when it first
    happens. Every window [ts, ts+4h) contributes +1/−1 boundary rows;
    the running sum over the time-ordered boundaries is instantaneous
    concurrency (ends sort before coincident starts via the delta
    tie-break — end-exclusive semantics, same contract as the interval
    join). All integer: counts, microsecond timestamps, argmax by MIN.
    Scale shape (r5): the sweep is TWO-LEVEL — the running sum runs per
    (event_type, utc-day) partition (parallelism grows with the time
    span, never a whole type through one task), and each day's starting
    concurrency is the prefix sum of the previous days' net deltas — a
    per-type cumulative over ONE ROW PER DAY (calendar-bounded, the
    same boundedness class as the week-over-week lag). Identical values
    to the single-window form; the oracle keeps the direct SQL sweep.
    """
    from pyspark.sql.window import Window

    ev = Catalog(spark, sf_dir).table("events")
    WIN_US = 4 * 3600 * 1_000_000
    DAY_US = 86_400 * 1_000_000
    starts = ev.select(
        "event_type", F.unix_micros("ts").alias("t"), F.lit(1).alias("delta")
    )
    ends = ev.select(
        "event_type",
        (F.unix_micros("ts") + F.lit(WIN_US)).alias("t"),
        F.lit(-1).alias("delta"),
    )
    bounds = starts.unionByName(ends).withColumn(
        "__day", F.expr(f"t div {DAY_US}")
    )
    # level 1: in-day running sum — partitions = types × days
    w_day = (
        Window.partitionBy("event_type", "__day")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = bounds.select(
        "event_type", "__day", "t", F.sum("delta").over(w_day).alias("__c")
    )
    # level 2: carry-in per day = cumulative net delta of PRIOR days —
    # one row per (type, day), calendar-bounded window input
    day_net = bounds.groupBy("event_type", "__day").agg(
        F.sum("delta").alias("__net")
    )
    w_carry = (
        Window.partitionBy("event_type")
        .orderBy("__day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = day_net.select(
        "event_type",
        "__day",
        F.coalesce(F.sum("__net").over(w_carry), F.lit(0)).alias("__off"),
    )
    swept = local.join(carry, ["event_type", "__day"]).select(
        "event_type", "t", (F.col("__c") + F.col("__off")).alias("conc")
    )
    peak = swept.groupBy("event_type").agg(
        F.max("conc").alias("peak_concurrency")
    )
    peakb = F.broadcast(
        peak.select(
            F.col("event_type").alias("__et"),
            F.col("peak_concurrency").alias("__pk"),
        )
    )
    at = (
        swept.join(
            peakb,
            (F.col("event_type") == F.col("__et"))
            & (F.col("conc") == F.col("__pk")),
        )
        .groupBy("event_type")
        .agg(F.min("t").alias("at_us"))
    )
    return peak.join(at, "event_type").select(
        "event_type", "peak_concurrency", "at_us"
    )


@register(
    "agg_decimal128_exact_sum",
    tags=("agg", "decimal", "exact"),
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
                         AS DECIMAL(38, 0))
               * CAST(l_quantity AS DECIMAL(38, 0))
               * CAST(100000000 AS DECIMAL(38, 0))) AS VARCHAR)
               AS weighted_scaled,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_decimal128_exact_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Existence proof for the DECIMAL(38,0) escape every scaled-long
    docstring points at: cents × quantity × 10⁸ per row is ~5·10¹⁶, and
    the per-flag sums reach ~10²⁰ at any test scale — far past 2⁶³, where the long fixed-point
    path would overflow. Both engines aggregate in exact 128-bit decimal
    and must agree digit-for-digit. The comparison surface ships the sum
    as its plain-digit STRING on both sides: the proof (exact 128-bit
    aggregation) is unchanged, but no 128-bit numeric type crosses the
    harness fetch boundary, where DECIMAL/HUGEINT renderings are
    client-dependent (the r4 red-row root cause). Scale shape: plain
    map-side-combined hash aggregation; decimal sums cost ~2× long sums
    and stay inside codegen — the documented price of the >2⁶³ envelope.
    """
    li = Catalog(spark, sf_dir).table("lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long").cast(
        "decimal(38,0)"
    )
    qty = F.col("l_quantity").cast("decimal(38,0)")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.sum(cents * qty * F.lit(100_000_000).cast("decimal(38,0)"))
            .cast("string")
            .alias("weighted_scaled"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@register(
    "stats_benford_first_digit",
    tags=("stats", "audit", "benford"),
    oracle="""
    WITH digits AS (
      SELECT CAST(substring(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
                                 AS VARCHAR), 1, 1) AS INTEGER) AS d
      FROM lineitem
      WHERE l_extendedprice > 0),
    counts AS (
      SELECT d, COUNT(*) AS n FROM digits GROUP BY d),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM counts)
    SELECT c.d AS first_digit, c.n,
           c.n * 1000000 // t.total AS share_ppm,
           t.total
    FROM counts c CROSS JOIN tot t
    """,
)
def stats_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit over price cents — the classic
    fabricated-data screen (organic magnitudes follow log-uniform first
    digits; synthetic uniform prices will visibly deviate, which is
    itself the finding on this corpus). First digit extracted by string
    head over the integer cents — no log10, no float (round-3 audit
    rule); shares as exact integer ppm. Scale shape: one map +
    9-cell hash aggregation; the totals row broadcasts.
    """
    li = Catalog(spark, sf_dir).table("lineitem").filter(
        F.col("l_extendedprice") > 0
    )
    digits = li.select(
        F.substring(
            F.round(F.col("l_extendedprice") * 100).cast("long").cast("string"),
            1,
            1,
        )
        .cast("int")
        .alias("d")
    )
    counts = digits.groupBy("d").agg(F.count(F.lit(1)).alias("n"))
    tot = counts.agg(F.sum("n").alias("total"))
    return counts.crossJoin(F.broadcast(tot)).select(
        F.col("d").alias("first_digit"),
        "n",
        F.expr("n * 1000000L div total").alias("share_ppm"),
        "total",
    )


@register(
    "subquery_exists_multi_supplier_parts",
    tags=("subquery", "exists", "correlated"),
    oracle="""
    SELECT p.p_partkey, p.p_name, p.p_brand
    FROM part p
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_partkey = p.p_partkey
        AND l.l_quantity >= 40)
      AND NOT EXISTS (
      SELECT 1 FROM lineitem l2
      WHERE l2.l_partkey = p.p_partkey
        AND l2.l_discount > 0.08)
    """,
)
def subquery_exists_multi_supplier_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS pair, written as the SQL a
    reference user would: Catalyst decorrelates to a left-semi plus a
    left-anti join — no per-row subquery execution (the scale contract;
    the anti side prunes to the correlation key before shuffling).
    """
    cat = Catalog(spark, sf_dir)
    cat.register_views(("part", "lineitem"))
    return cat.spark.sql("""
        SELECT p.p_partkey, p.p_name, p.p_brand
        FROM part p
        WHERE EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_partkey = p.p_partkey
            AND l.l_quantity >= 40)
          AND NOT EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_partkey = p.p_partkey
            AND l2.l_discount > 0.08)
    """)


@register(
    "date_business_day_latency",
    tags=("date", "business-days", "latency"),
    oracle="""
    WITH base AS (
      SELECT date_trunc('month', o.o_orderdate) AS mon,
             datediff('day', DATE '1995-01-02', CAST(o.o_orderdate AS DATE))
                 AS n0,
             datediff('day', DATE '1995-01-02', CAST(l.l_shipdate AS DATE))
                 AS n1
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE l.l_shipdate >= o.o_orderdate),
    w AS (
      SELECT mon,
             ((n1 // 7) * 5 + least(n1 % 7, 5))
               - ((n0 // 7) * 5 + least(n0 % 7, 5)) AS bdays
      FROM base)
    SELECT CAST(mon AS DATE) AS order_month,
           COUNT(*) AS n_items,
           CAST(SUM(bdays) AS BIGINT) AS total_business_days,
           CAST(SUM(bdays) * 1000 // COUNT(*) AS BIGINT) AS avg_bdays_milli
    FROM w GROUP BY mon
    """,
)
def date_business_day_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order→ship latency in BUSINESS days per order month: weekdays are
    counted with the closed-form integer formula ``W(d) = (n div 7)·5 +
    least(n mod 7, 5)`` anchored at a Monday epoch (1995-01-02), so
    ``W(ship) − W(order)`` needs no calendar table, no loop, no float —
    identical arithmetic in both engines by construction. The mean
    latency ships as exact milli-days (integer division). Scale shape:
    one fact-fact equi-join on the order key and a per-month hash agg;
    everything else is codegen arithmetic.
    """
    cat = Catalog(spark, sf_dir)
    orders = cat.table("orders").select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").cast("date").alias("order_month"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-02")).alias("n0"),
    )
    li = cat.table("lineitem").select(
        "l_orderkey",
        F.datediff(F.to_date("l_shipdate"), F.lit("1995-01-02")).alias("n1"),
    )
    joined = orders.join(
        li, orders["o_orderkey"] == li["l_orderkey"]
    ).filter(F.col("n1") >= F.col("n0"))
    w = joined.select(
        "order_month",
        (
            F.expr("(n1 div 7) * 5 + least(n1 % 7, 5)")
            - F.expr("(n0 div 7) * 5 + least(n0 % 7, 5)")
        ).alias("bdays"),
    )
    return w.groupBy("order_month").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("bdays").alias("total_business_days"),
        F.expr("sum(bdays) * 1000 div count(1)").alias("avg_bdays_milli"),
    )


@register(
    "events_top_trigram_sequences",
    tags=("events", "sequence-mining", "window"),
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type,
             LEAD(event_type, 1) OVER w AS e2,
             LEAD(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    tri AS (
      SELECT event_type || '>' || e2 || '>' || e3 AS seq
      FROM ordered WHERE e3 IS NOT NULL),
    counts AS (SELECT seq, COUNT(*) AS n FROM tri GROUP BY seq),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM counts)
    SELECT c.seq, c.n, c.n * 1000000 // t.total AS share_ppm
    FROM counts c CROSS JOIN tot t
    ORDER BY c.n DESC, c.seq LIMIT 25
    """,
)
def events_top_trigram_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence mining lite: the 25 most common event-type trigrams
    across user timelines (two LEADs over the per-user window, then a
    small hash agg) — the navigation-pattern / funnel-discovery query.
    Shares in exact integer ppm; deterministic tie-break on the
    sequence string. Scale shape: the window shuffles once per user
    partition; trigram cardinality is |types|³ so the aggregation and
    top-k are tiny regardless of corpus size.
    """
    from pyspark.sql.window import Window

    ev = Catalog(spark, sf_dir).table("events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tri = (
        ev.select(
            "event_type",
            F.lead("event_type", 1).over(w).alias("e2"),
            F.lead("event_type", 2).over(w).alias("e3"),
        )
        .filter(F.col("e3").isNotNull())
        .select(
            F.concat_ws(">", "event_type", "e2", "e3").alias("seq")
        )
    )
    counts = tri.groupBy("seq").agg(F.count(F.lit(1)).alias("n"))
    tot = counts.agg(F.sum("n").alias("total"))
    return (
        counts.crossJoin(F.broadcast(tot))
        .select("seq", "n", F.expr("n * 1000000L div total").alias("share_ppm"))
        .orderBy(F.col("n").desc(), "seq")
        .limit(25)
    )


@register(
    "events_rfm_segments",
    tags=("events", "rfm", "segmentation"),
    oracle="""
    WITH mx AS (SELECT MAX(ts) AS mts FROM events),
    per_user AS (
      SELECT user_id,
             CAST(datediff('day', CAST(MAX(ts) AS DATE),
                           CAST(MAX(m.mts) AS DATE)) AS INTEGER)
                 AS recency_days,
             COUNT(*) AS frequency,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                 AS monetary_cents
      FROM events CROSS JOIN mx m
      GROUP BY user_id),
    scored AS (
      SELECT user_id, recency_days, frequency, monetary_cents,
             NTILE(5) OVER (ORDER BY recency_days DESC, user_id) AS r,
             NTILE(5) OVER (ORDER BY frequency, user_id) AS f,
             NTILE(5) OVER (ORDER BY monetary_cents, user_id) AS m
      FROM per_user)
    SELECT user_id, recency_days, frequency, monetary_cents,
           r * 100 + f * 10 + m AS rfm_score
    FROM scored
    """,
)
def events_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: recency (days since last event, against the
    corpus max), frequency (event count), monetary (exact cent sum) per
    user, each scored into quintiles — NTILE made deterministic by the
    user_id tie-break (position-based ntile over a non-total order is
    engine-dependent; round-3 audit discipline applied to ORDERING, not
    just arithmetic). Higher quintile = better on every axis. Scale
    shape (r5): the three quintile assignments run through the
    distributed rank operator (operators/ranks.py — range-partitioned
    global row number + the SQL NTILE formula), so there is NO
    single-partition window even though users grow with the corpus;
    each axis costs one range shuffle of the slim per-user table.
    """
    from agol_pandas_spark.operators.ranks import add_global_ranks

    ev = Catalog(spark, sf_dir).table("events")
    mx = ev.agg(F.max("ts").alias("mts"))
    per_user = (
        ev.crossJoin(F.broadcast(mx))
        .groupBy("user_id")
        .agg(
            F.datediff(
                F.to_date(F.max("mts")), F.to_date(F.max("ts"))
            ).alias("recency_days"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                "monetary_cents"
            ),
        )
    )
    scored = add_global_ranks(
        per_user,
        ["recency_days", "user_id"],
        descending=[True, False],
        unique=True,
        ntile=5,
        ntile_col="__r",
    )
    scored = add_global_ranks(
        scored,
        ["frequency", "user_id"],
        unique=True,
        ntile=5,
        ntile_col="__f",
    )
    scored = add_global_ranks(
        scored,
        ["monetary_cents", "user_id"],
        unique=True,
        ntile=5,
        ntile_col="__m",
    )
    return scored.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary_cents",
        (F.col("__r") * 100 + F.col("__f") * 10 + F.col("__m")).alias(
            "rfm_score"
        ),
    )


@register(
    "pivot_status_multi_measure",
    tags=("pivot", "multi-measure"),
    oracle="""
    SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
           CAST(SUM(CASE WHEN o_orderstatus = 'F'
                    THEN CAST(round(o_totalprice * 100) AS BIGINT) END)
               AS BIGINT) AS F_cents,
           COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS F_n,
           CAST(SUM(CASE WHEN o_orderstatus = 'O'
                    THEN CAST(round(o_totalprice * 100) AS BIGINT) END)
               AS BIGINT) AS O_cents,
           COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS O_n,
           CAST(SUM(CASE WHEN o_orderstatus = 'P'
                    THEN CAST(round(o_totalprice * 100) AS BIGINT) END)
               AS BIGINT) AS P_cents,
           COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS P_n
    FROM orders
    GROUP BY yr
    """,
)
def pivot_status_multi_measure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-measure pivot: order revenue (exact cents) AND order count
    per status, one column pair per pivoted value — the explicit-values
    form (`pivot(col, values)`), which skips the extra distinct-values
    job Spark otherwise runs and keeps the output schema STATIC, the
    requirement for any production table contract. Measures are
    aliased so both engines emit identical `{value}_{measure}` names.
    """
    orders = Catalog(spark, sf_dir).table("orders")
    return (
        orders.select(
            F.year("o_orderdate").alias("yr"),
            "o_orderstatus",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .groupBy("yr")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(
            F.sum("cents").alias("cents"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "math_try_overflow_guard",
    tags=("math", "ansi", "overflow"),
    oracle="""
    WITH c AS (
      SELECT l_returnflag,
             CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS HUGEINT)
                 AS pc
      FROM lineitem),
    cubes AS (
      SELECT l_returnflag, pc * pc * pc AS cube,
             (pc * pc * pc > 9223372036854775807
              OR pc * pc * pc < -9223372036854775808) AS overflowed
      FROM c)
    SELECT l_returnflag,
           COUNT(CASE WHEN overflowed THEN 1 END) AS n_overflow,
           CAST(CAST(SUM(CASE WHEN NOT overflowed THEN cube END)
                     AS DECIMAL(38, 0)) AS VARCHAR) AS sum_cube
    FROM cubes GROUP BY l_returnflag
    """,
)
def math_try_overflow_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI overflow-safety surface: NULL exactly where the int64 cube
    would overflow (the session runs ANSI mode, so unguarded arithmetic
    would ERROR mid-job — at 100 TB that's a dead 6-hour run; the try_*
    family is the per-expression escape). Price cents cubed overflows
    for pc > ~2.1M and the oracle reproduces the exact overflow boundary
    in 128-bit arithmetic; the surviving cubes sum in DECIMAL(38,0) on
    both engines and ship as a plain-digit VARCHAR (the sum itself
    exceeds int64; no 128-bit numeric crosses the harness fetch boundary
    — r4 red-row rule).

    r11 (guide §4.2 by analogy, §1.2): the original
    ``try_multiply(try_multiply(pc, pc), pc)`` chain is semantically
    right but ``TryEval`` is a codegen-fallback expression — the whole
    projection dropped out of WholeStageCodegen and evaluated the
    nested expression tree interpreted per row (measured 7.7 s vs
    0.4 s on this scan). The cube is now guarded by the EXACT int64
    boundary (cube representable iff −2097152 ≤ pc ≤ 2097151;
    (−2097152)³ = −2⁶³ is exactly int64 min) with a plain codegen
    multiply inside the guard — bit-identical to the try_multiply
    chain, pinned on the boundary values by
    ``tests/test_relational_model.py::test_overflow_guard_matches_try_multiply``.
    """
    li = Catalog(spark, sf_dir).table("lineitem").select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("pc"),
    )
    cubed = li.select(
        "l_returnflag",
        F.when(
            F.col("pc").between(-2097152, 2097151),
            F.col("pc") * F.col("pc") * F.col("pc"),
        ).alias("cube"),
    )
    return cubed.groupBy("l_returnflag").agg(
        F.count(F.when(F.col("cube").isNull(), 1)).alias("n_overflow"),
        F.sum(F.col("cube").cast("decimal(38,0)"))
        .cast("string")
        .alias("sum_cube"),
    )


@register(
    "privacy_k_anonymity_audit",
    tags=("privacy", "governance", "k-anonymity", "l-diversity"),
    oracle="""
    SELECT c_nationkey, c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS class_size,
           CAST(COUNT(DISTINCT c_custkey % 7) AS BIGINT) AS l_distinct,
           COUNT(*) >= 5 AS k_anonymous,
           COUNT(DISTINCT c_custkey % 7) >= 2 AS l_diverse
    FROM customer
    GROUP BY c_nationkey, c_mktsegment
    """,
)
def privacy_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity release gate (r6,
    ``operators/profile.k_anonymity_audit``): every
    (nation, market-segment) quasi-identifier class must cover ≥5 rows
    AND show ≥2 distinct sensitive values (``c_custkey % 7`` stands in
    for a categorical sensitive attribute — the corpus carries no real
    one). One map-side-combined aggregation; output is one row per
    equivalence class naming exactly which slices need generalization
    or suppression before a release."""
    from agol_pandas_spark.operators.profile import k_anonymity_audit

    cust = (
        Catalog(spark, sf_dir)
        .table("customer")
        .withColumn("sensitive", F.col("c_custkey") % 7)
    )
    return k_anonymity_audit(
        cust, ["c_nationkey", "c_mktsegment"], "sensitive", k=5, l=2
    )


@register(
    "stats_skyline_suppliers",
    tags=("stats", "skyline", "pareto"),
    oracle="""
    WITH m AS (
      SELECT l_suppkey AS s_suppkey,
             CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                           AS BIGINT)) AS BIGINT) AS revenue_cents,
             COUNT(*) AS n_items,
             SUM(CAST(round(l_discount * 10000) AS BIGINT)) // COUNT(*)
                 AS avg_discount_bp
      FROM lineitem GROUP BY 1)
    SELECT s_suppkey, revenue_cents,
           CAST(n_items AS BIGINT) AS n_items,
           CAST(avg_discount_bp AS BIGINT) AS avg_discount_bp
    FROM m a
    WHERE NOT EXISTS (
      SELECT 1 FROM m b
      WHERE b.revenue_cents >= a.revenue_cents
        AND b.n_items >= a.n_items
        AND b.avg_discount_bp <= a.avg_discount_bp
        AND (b.revenue_cents > a.revenue_cents
             OR b.n_items > a.n_items
             OR b.avg_discount_bp < a.avg_discount_bp))
    """,
)
def stats_skyline_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline / Pareto frontier (operators/skyline.py): suppliers not
    dominated on (revenue DESC, volume DESC, avg discount ASC) — the
    preference query relational engines lack natively. Two-phase exact
    algorithm: per-partition numpy frontier (lossless, shuffle-free) then
    a dominance anti-join over the tiny candidate set; the corpus never
    sees a cross join. All metrics exact integers (cents / bp)."""
    from agol_pandas_spark.operators.skyline import skyline

    li = Catalog(spark, sf_dir).table("lineitem")
    per_supplier = li.groupBy(F.col("l_suppkey").alias("s_suppkey")).agg(
        F.sum(
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
            .cast("long")
        ).alias("revenue_cents"),
        F.count(F.lit(1)).alias("n_items"),
        F.expr(
            "sum(cast(round(l_discount * 10000) AS bigint)) div count(*)"
        ).alias("avg_discount_bp"),
    )
    return skyline(
        per_supplier,
        minimize=["avg_discount_bp"],
        maximize=["revenue_cents", "n_items"],
    )


@register(
    "feature_target_encoding",
    tags=("feature", "ml", "encoding"),
    oracle="""
    WITH base AS (
      SELECT o_orderpriority AS cat,
             CAST(('0x' || substring(md5('fold' || CAST(o_orderkey AS VARCHAR)),
                                     1, 15)) AS BIGINT) % 5 AS fold,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders),
    cf AS (SELECT cat, fold, COUNT(*) AS n, SUM(cents) AS s
           FROM base GROUP BY 1, 2),
    ct AS (SELECT cat, SUM(n) AS n_tot, SUM(s) AS s_tot FROM cf GROUP BY 1),
    gf AS (SELECT fold, SUM(n) AS n_f_all, SUM(s) AS s_f_all
           FROM cf GROUP BY 1),
    g AS (SELECT SUM(n) AS n_all, SUM(s) AS s_all FROM cf)
    SELECT cf.cat AS o_orderpriority, CAST(cf.fold AS BIGINT) AS fold,
           CAST(cf.n AS BIGINT) AS n_rows,
           CAST(((ct.s_tot - cf.s) * 1000
                 + 10 * ((g.s_all - gf.s_f_all) * 1000
                         // (g.n_all - gf.n_f_all)))
                // ((ct.n_tot - cf.n) + 10) AS BIGINT) AS enc_milli
    FROM cf JOIN ct USING (cat) JOIN gf USING (fold) CROSS JOIN g
    """,
)
def feature_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free out-of-fold target encoding (operators/features.py):
    each (priority, fold) cell encoded from every OTHER fold's exact-cent
    order totals, m-estimate-smoothed (m=10) toward the global out-of-fold
    mean. One slim (cat x fold) shuffle; the encoding table is always
    broadcastable back onto rows. Integer milli-unit arithmetic end to
    end — truncated division only at the final step."""
    from agol_pandas_spark.operators.features import target_encode_oof

    orders = Catalog(spark, sf_dir).table("orders").select(
        "o_orderpriority",
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    return target_encode_oof(
        orders,
        cat_col="o_orderpriority",
        target_cents_col="cents",
        key_col="o_orderkey",
        folds=5,
        smoothing=10,
    )


@register(
    "stats_quantile_normalize",
    tags=("stats", "normalization", "ranks"),
    oracle="""
    WITH base AS (SELECT doc_id, source, n_chars FROM documents),
    ranked AS (
      SELECT doc_id, source, n_chars,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY n_chars, doc_id) - 1 AS r0,
             COUNT(*) OVER (PARTITION BY source) AS ng
      FROM base),
    tot AS (SELECT COUNT(*) AS n FROM base),
    hist AS (SELECT n_chars AS v, COUNT(*) AS cnt FROM base GROUP BY 1),
    chist AS (
      SELECT v, SUM(cnt) OVER (ORDER BY v) - cnt AS lo,
             SUM(cnt) OVER (ORDER BY v) AS hi
      FROM hist),
    pos AS (
      SELECT doc_id, source, n_chars,
             CASE WHEN ng > 1
                  THEN greatest(1, (r0 * tot.n + (ng - 1) - 1) // (ng - 1))
                  ELSE 1 END AS p
      FROM ranked CROSS JOIN tot),
    norm AS (
      SELECT pos.source, pos.n_chars, c.v AS norm_value
      FROM pos JOIN chist c ON pos.p > c.lo AND pos.p <= c.hi)
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(SUM(norm_value) AS BIGINT) AS sum_norm,
           CAST(MIN(norm_value) AS BIGINT) AS min_norm,
           CAST(MAX(norm_value) AS BIGINT) AS max_norm
    FROM norm GROUP BY source
    """,
)
def stats_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source quantile normalization (operators/features.py) of
    document lengths: every source's n_chars distribution is mapped onto
    the pooled corpus distribution via exact integer rank arithmetic —
    within-group ranks from the distributed prefix-sum operator (groups
    span partitions), pooled PERCENTILE_DISC from the weighted-histogram
    rank operator, position->value via a broadcast interval join bounded
    by DISTINCT values. Census per source proves the full per-row map."""
    from agol_pandas_spark.operators.features import quantile_normalize

    docs = Catalog(spark, sf_dir).table("documents")
    normed = quantile_normalize(docs, "source", "n_chars", "doc_id")
    return normed.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
        F.sum("norm_value").cast("long").alias("sum_norm"),
        F.min("norm_value").cast("long").alias("min_norm"),
        F.max("norm_value").cast("long").alias("max_norm"),
    )


@register(
    "stats_cusum_changepoint",
    tags=("stats", "changepoint", "monitoring"),
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
      FROM events GROUP BY 1, 2),
    per AS (
      SELECT event_type, SUM(n) AS tot, COUNT(*) AS days
      FROM daily GROUP BY 1),
    j AS (
      SELECT d.event_type, d.day, d.n,
             d.n * 1000 - (p.tot * 1000 // p.days) AS dev,
             p.tot * 1000 // p.days AS mean_milli
      FROM daily d JOIN per p USING (event_type)),
    s AS (
      SELECT event_type, day, n, mean_milli,
             SUM(dev) OVER (PARTITION BY event_type ORDER BY day) AS cs
      FROM j),
    c AS (
      SELECT event_type, day, n, mean_milli, cs,
             least(CAST(0 AS BIGINT),
                   MIN(cs) OVER (PARTITION BY event_type ORDER BY day))
                 AS runmin
      FROM s)
    SELECT event_type, day, CAST(n AS BIGINT) AS n_events,
           CAST(cs - runmin AS BIGINT) AS cusum_milli,
           (cs - runmin) > 3 * mean_milli AS alarm
    FROM c
    """,
)
def stats_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM change detection over per-type daily event volumes,
    window-expressible exactly: the recursive C_i = max(0, C_{i-1} + dev_i)
    unrolls to C_i = S_i - min(0, min_{j<=i} S_j) — one cumulative sum and
    one running min over the SAME per-type ordering (single shuffle, two
    Window ops). Deviations are exact milli-units against the per-type
    mean rate; alarm = excursion beyond 3x the mean. Day x type rows only
    — the corpus collapses to the daily histogram in the first
    aggregation."""
    from pyspark.sql.window import Window

    ev = Catalog(spark, sf_dir).table("events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    per = daily.groupBy("event_type").agg(
        F.sum("n").alias("tot"), F.count(F.lit(1)).alias("days")
    )
    j = daily.join(F.broadcast(per), "event_type").select(
        "event_type",
        "day",
        "n",
        F.expr("n * 1000L - (tot * 1000L div days)").alias("dev"),
        F.expr("tot * 1000L div days").alias("mean_milli"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    s = j.withColumn("cs", F.sum("dev").over(w))
    c = s.withColumn(
        "runmin", F.least(F.lit(0).cast("long"), F.min("cs").over(w))
    )
    return c.select(
        "event_type",
        "day",
        F.col("n").cast("long").alias("n_events"),
        (F.col("cs") - F.col("runmin")).cast("long").alias("cusum_milli"),
        ((F.col("cs") - F.col("runmin")) > 3 * F.col("mean_milli")).alias("alarm"),
    )


@register(
    "stats_gini_concentration",
    tags=("stats", "inequality", "ranks"),
    oracle="""
    WITH spend AS (
      SELECT c.c_mktsegment, c.c_custkey,
             COALESCE(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)), 0)
                 AS x
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2),
    r AS (
      SELECT c_mktsegment, x,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY x, c_custkey) AS rn
      FROM spend),
    agg AS (
      SELECT c_mktsegment, COUNT(*) AS n, SUM(x) AS sx, SUM(rn * x) AS srx
      FROM r GROUP BY 1)
    SELECT c_mktsegment, CAST(n AS BIGINT) AS n_customers,
           CAST(sx AS BIGINT) AS total_cents,
           CAST((2 * CAST(srx AS HUGEINT) - CAST(n + 1 AS HUGEINT) * sx)
                * 1000000 // (CAST(n AS HUGEINT) * sx) AS BIGINT) AS gini_ppm
    FROM agg
    """,
)
def stats_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer-spend concentration per market segment
    (the rank formula G = (2·Σ rᵢxᵢ − (n+1)·Σx) / (n·Σx) in exact integer
    ppm): per-segment ranks ride the distributed prefix-sum operator
    (segments span partitions — no low-cardinality window funnel), the
    cross terms sum as BIGINT, and the final ppm division runs in
    DECIMAL(38,0) headroom mirrored by the oracle's HUGEINT. Total order
    (spend, custkey) makes tied spends deterministic."""
    from agol_pandas_spark.operators.ranks import add_partitioned_prefix_sum

    cust = Catalog(spark, sf_dir).table("customer")
    orders = Catalog(spark, sf_dir).table("orders")
    spend = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_mktsegment", "c_custkey")
        .agg(
            F.coalesce(
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long")),
                F.lit(0).cast("long"),
            ).alias("x")
        )
    )
    ranked = add_partitioned_prefix_sum(
        spend.withColumn("__one", F.lit(1)),
        part_keys=["c_mktsegment"],
        order_keys=["x", "c_custkey"],
        weight_col="__one",
        out_col="__r0",
        exclusive=True,
    )
    agg = ranked.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum((F.col("__r0") + 1) * F.col("x")).alias("srx"),
    )
    return agg.select(
        "c_mktsegment",
        F.col("n").cast("long").alias("n_customers"),
        F.col("sx").cast("long").alias("total_cents"),
        F.expr(
            "cast((2 * cast(srx as decimal(38,0)) "
            "- cast(n + 1 as decimal(38,0)) * cast(sx as decimal(38,0))) "
            "* 1000000 div (cast(n as decimal(38,0)) "
            "* cast(sx as decimal(38,0))) as long)"
        ).alias("gini_ppm"),
    )


@register(
    "having_q11_valuable_parts",
    tags=("agg", "having", "scalar-subquery", "tpch"),
    oracle="""
    WITH pr AS (
      SELECT l_partkey,
             CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                           AS BIGINT)) AS BIGINT) AS revenue_cents
      FROM lineitem GROUP BY 1),
    tot AS (SELECT SUM(revenue_cents) AS t FROM pr)
    SELECT pr.l_partkey AS p_partkey, pr.revenue_cents,
           CAST(CAST(pr.revenue_cents AS HUGEINT) * 1000000 // tot.t
                AS BIGINT) AS share_ppm
    FROM pr CROSS JOIN tot
    WHERE pr.revenue_cents * 2000 > tot.t
    """,
)
def having_q11_valuable_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: groups whose aggregate exceeds a fraction of the
    GLOBAL total (HAVING against a scalar subquery) — parts carrying more
    than 0.05%% of total revenue, with exact-ppm shares. The global total
    is a 1-row broadcast; the per-part aggregation is the only
    corpus-scale shuffle; the share division runs in DECIMAL(38)/HUGEINT
    headroom."""
    li = Catalog(spark, sf_dir).table("lineitem")
    pr = li.groupBy(F.col("l_partkey").alias("p_partkey")).agg(
        F.sum(
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
            .cast("long")
        ).alias("revenue_cents")
    )
    tot = pr.agg(F.sum("revenue_cents").alias("t"))
    return (
        pr.crossJoin(F.broadcast(tot))
        .filter(F.col("revenue_cents") * 2000 > F.col("t"))
        .select(
            "p_partkey",
            "revenue_cents",
            F.expr(
                "cast(cast(revenue_cents as decimal(38,0)) * 1000000 "
                "div cast(t as decimal(38,0)) as long)"
            ).alias("share_ppm"),
        )
    )


@register(
    "subquery_q22_idle_customers",
    tags=("subquery", "anti-join", "tpch"),
    oracle="""
    WITH ab AS (
      SELECT SUM(CAST(round(c_acctbal * 100) AS BIGINT)) // COUNT(*)
                 AS ab_cents
      FROM customer WHERE c_acctbal > 0.0),
    cutoff AS (
      SELECT MAX(o_orderdate) - INTERVAL 1 YEAR AS co FROM orders),
    recent AS (
      SELECT DISTINCT o.o_custkey
      FROM orders o CROSS JOIN cutoff WHERE o.o_orderdate >= cutoff.co),
    idle AS (
      SELECT c.c_nationkey,
             CAST(round(c.c_acctbal * 100) AS BIGINT) AS bal
      FROM customer c CROSS JOIN ab
      WHERE CAST(round(c.c_acctbal * 100) AS BIGINT) > ab.ab_cents
        AND NOT EXISTS (SELECT 1 FROM recent r
                        WHERE r.o_custkey = c.c_custkey))
    SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_custs,
           CAST(SUM(bal) AS BIGINT) AS total_bal_cents
    FROM idle GROUP BY 1
    """,
)
def subquery_q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global-sales-opportunity): customers with
    above-average positive balance and NO orders in the last year of the
    corpus, grouped by nation — a scalar aggregate subquery and a scalar
    date cutoff (1-row broadcasts), an exact-cents mean via integer
    division, and a left ANTI join against the recent-orders key set.
    The anti join shuffles on custkey; nothing else touches corpus
    scale."""
    cust = Catalog(spark, sf_dir).table("customer")
    orders = Catalog(spark, sf_dir).table("orders")
    ab = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.expr(
            "sum(cast(round(c_acctbal * 100) as bigint)) div count(*)"
        ).alias("ab_cents")
    )
    cutoff = orders.agg(
        F.expr("max(o_orderdate) - interval 1 year").alias("co")
    )
    recent = (
        orders.crossJoin(F.broadcast(cutoff))
        .filter(F.col("o_orderdate") >= F.col("co"))
        .select("o_custkey")
        .distinct()
    )
    idle = (
        cust.crossJoin(F.broadcast(ab))
        .withColumn("bal", F.round(F.col("c_acctbal") * 100).cast("long"))
        .filter(F.col("bal") > F.col("ab_cents"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
    )
    return idle.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_custs"),
        F.sum("bal").cast("long").alias("total_bal_cents"),
    )


@register(
    "stats_auc_mann_whitney",
    tags=("stats", "ml-eval", "ranks"),
    oracle="""
    WITH hist AS (
      SELECT n_chars AS v, COUNT(*) AS c FROM documents GROUP BY 1),
    chist AS (
      SELECT v, c, SUM(c) OVER (ORDER BY v) - c AS cum_before FROM hist),
    pos AS (
      SELECT lang, n_chars AS v, COUNT(*) AS pc
      FROM documents GROUP BY 1, 2),
    tot AS (SELECT COUNT(*) AS n FROM documents),
    r AS (
      SELECT p.lang,
             SUM(p.pc) AS n_pos,
             SUM(p.pc * (2 * ch.cum_before + ch.c + 1)) AS r2
      FROM pos p JOIN chist ch ON ch.v = p.v
      GROUP BY p.lang)
    SELECT r.lang, CAST(r.n_pos AS BIGINT) AS n_pos,
           CAST(tot.n - r.n_pos AS BIGINT) AS n_neg,
           CAST(r.r2 - r.n_pos * (r.n_pos + 1) AS BIGINT) AS u2,
           CAST((r.r2 - r.n_pos * (r.n_pos + 1)) * 500000
                // (r.n_pos * (tot.n - r.n_pos)) AS BIGINT) AS auc_ppm
    FROM r CROSS JOIN tot
    """,
)
def stats_auc_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-vs-rest ROC-AUC (equivalently the Mann-Whitney U statistic)
    for every language class at once, with document length as the score —
    exact integers throughout: tie-averaged ranks carried in DOUBLED
    units (avg2 = 2·cum_before + c + 1) over the distinct-value
    histogram, U₂ = R₂ − n_pos(n_pos+1), AUC_ppm = U₂·5·10⁵ div
    (n_pos·n_neg). The corpus collapses to (value) and (lang, value)
    histograms first; the cumulative window runs over distinct values
    via the weighted-histogram rank operator — never row-at-a-time."""
    from agol_pandas_spark.operators.ranks import add_global_ranks

    docs = Catalog(spark, sf_dir).table("documents")
    hist = docs.groupBy(F.col("n_chars").alias("v")).agg(
        F.count(F.lit(1)).alias("c")
    )
    chist = add_global_ranks(
        hist, keys=["v"], weight_col="c", rank_col="__rk", total_col="__n"
    ).select("v", "c", (F.col("__rk") - 1).alias("cum_before"), F.col("__n"))
    pos = docs.groupBy("lang", F.col("n_chars").alias("v")).agg(
        F.count(F.lit(1)).alias("pc")
    )
    r = (
        pos.join(chist, "v")
        .groupBy("lang")
        .agg(
            F.sum("pc").alias("n_pos"),
            F.sum(
                F.col("pc") * (2 * F.col("cum_before") + F.col("c") + 1)
            ).alias("r2"),
            F.first("__n").alias("n"),
        )
    )
    return r.select(
        "lang",
        F.col("n_pos").cast("long").alias("n_pos"),
        (F.col("n") - F.col("n_pos")).cast("long").alias("n_neg"),
        (F.col("r2") - F.col("n_pos") * (F.col("n_pos") + 1))
        .cast("long")
        .alias("u2"),
        F.expr(
            "cast((r2 - n_pos * (n_pos + 1)) * 500000L "
            "div (n_pos * (n - n_pos)) as long)"
        ).alias("auc_ppm"),
    )


@register(
    "mining_association_rules",
    tags=("mining", "apriori", "baskets"),
    oracle="""
    WITH baskets AS (
      SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS brand
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
    n AS (SELECT COUNT(DISTINCT ok) AS n_orders FROM baskets),
    item AS (
      SELECT brand, COUNT(*) AS n_item FROM baskets GROUP BY brand),
    freq AS (
      SELECT item.brand, item.n_item FROM item CROSS JOIN n
      WHERE item.n_item * 100 >= n.n_orders),
    pair AS (
      SELECT a.brand AS brand_a, b.brand AS brand_b, COUNT(*) AS n_pair
      FROM baskets a
      JOIN freq fa ON fa.brand = a.brand
      JOIN baskets b ON a.ok = b.ok AND a.brand < b.brand
      JOIN freq fb ON fb.brand = b.brand
      GROUP BY 1, 2)
    SELECT p.brand_a, p.brand_b,
           CAST(p.n_pair AS BIGINT) AS n_pair,
           CAST(p.n_pair * 1000000 // fa.n_item AS BIGINT) AS conf_a_to_b_ppm,
           CAST(p.n_pair * 1000000 // fb.n_item AS BIGINT) AS conf_b_to_a_ppm,
           CAST(p.n_pair * n.n_orders * 1000000
                // (fa.n_item * fb.n_item) AS BIGINT) AS lift_ppm
    FROM pair p
    JOIN freq fa ON fa.brand = p.brand_a
    JOIN freq fb ON fb.brand = p.brand_b
    CROSS JOIN n
    WHERE p.n_pair * 200 >= n.n_orders
    """,
)
def mining_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apriori-style association rules over order baskets: which part
    brands co-occur in the same order beyond chance. Exact integers
    end-to-end — support counts, confidence and lift in integer ppm
    (floor division), no doubles anywhere.

    Scale posture: baskets collapse to DISTINCT (order, brand) first
    (map-side combine); infrequent brands (< 1% of orders) are pruned
    via a broadcast semi-join BEFORE pair generation — the apriori
    antimonotonicity cut that keeps the self-join from exploding on the
    heavy tail; the pair self-join shuffles on the order key where each
    basket contributes at most |basket|² rows; pair supports re-shuffle
    on the (a, b) key pair — bounded by the frequent-brand square, not
    the corpus. Min pair support 0.5% of orders.
    """
    cat = Catalog(spark, sf_dir)
    li = cat.table("lineitem").select("l_orderkey", "l_partkey")
    part = cat.table("part").select("p_partkey", "p_brand")
    baskets = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("brand"))
        .distinct()
    )
    n_orders_df = baskets.agg(
        F.count_distinct("ok").alias("n_orders")
    )
    item = baskets.groupBy("brand").agg(F.count(F.lit(1)).alias("n_item"))
    freq = (
        item.crossJoin(F.broadcast(n_orders_df))
        .filter(F.col("n_item") * 100 >= F.col("n_orders"))
        .select("brand", "n_item")
    )
    fa = F.broadcast(freq.select(F.col("brand").alias("brand_a"),
                                 F.col("n_item").alias("n_a")))
    fb = F.broadcast(freq.select(F.col("brand").alias("brand_b"),
                                 F.col("n_item").alias("n_b")))
    a = baskets.select("ok", F.col("brand").alias("brand_a")).join(fa, "brand_a")
    b = baskets.select("ok", F.col("brand").alias("brand_b")).join(fb, "brand_b")
    pairs = (
        a.join(b.drop("n_b"), "ok")
        .filter(F.col("brand_a") < F.col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).alias("n_pair"))
    )
    return (
        pairs.join(fa, "brand_a")
        .join(fb, "brand_b")
        .crossJoin(F.broadcast(n_orders_df))
        .filter(F.col("n_pair") * 200 >= F.col("n_orders"))
        .select(
            "brand_a",
            "brand_b",
            F.col("n_pair").cast("long").alias("n_pair"),
            F.expr("n_pair * 1000000L div n_a").cast("long")
            .alias("conf_a_to_b_ppm"),
            F.expr("n_pair * 1000000L div n_b").cast("long")
            .alias("conf_b_to_a_ppm"),
            F.expr("n_pair * n_orders * 1000000L div (n_a * n_b)")
            .cast("long")
            .alias("lift_ppm"),
        )
    )


_FD_CANDIDATES: dict[str, list[tuple[str, str]]] = {
    # table -> [(determinant, dependent)]; mix of holding and failing
    # dependencies so both verdicts are exercised
    "nation": [("n_nationkey", "n_regionkey")],
    "customer": [("c_nationkey", "c_mktsegment")],
    "orders": [("o_orderkey", "o_orderstatus"), ("o_custkey", "o_orderpriority")],
    "lineitem": [("l_partkey", "l_suppkey")],
    "documents": [("doc_id", "lang"), ("source", "lang")],
}


def _fd_oracle() -> str:
    parts = []
    for tbl, cands in _FD_CANDIDATES.items():
        for det, dep in cands:
            parts.append(f"""
    SELECT '{tbl}' AS tbl, '{det}' AS determinant, '{dep}' AS dependent,
           CAST((SELECT COUNT(DISTINCT {det}) FROM {tbl}) AS BIGINT) AS n_det,
           CAST((SELECT COUNT(*) FROM (SELECT DISTINCT {det}, {dep} FROM {tbl}))
                AS BIGINT) AS n_pairs,
           (SELECT COUNT(DISTINCT {det}) FROM {tbl}) =
           (SELECT COUNT(*) FROM (SELECT DISTINCT {det}, {dep} FROM {tbl}))
             AS holds""")
    return " UNION ALL ".join(parts)


@register(
    "profile_functional_deps",
    tags=("profile", "quality", "metadata"),
    oracle=_fd_oracle(),
)
def profile_functional_deps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency discovery (Metanome/Tane-style profiling,
    verification step): a candidate FD ``det → dep`` holds iff
    ``|distinct det| == |distinct (det, dep)|``. All of a table's
    candidates evaluate in ONE aggregation over ONE scan (Spark expands
    the multi-distinct into a single Expand+partial-agg pass — per-
    candidate scans would read the 100 TB corpus once per candidate);
    the per-table single-row results union into the report. Candidates
    cover both verdicts: key-like FDs hold, genuinely multivalued
    attributes fail.
    """
    cat = Catalog(spark, sf_dir)
    reports = []
    for tbl, cands in _FD_CANDIDATES.items():
        df = cat.table(tbl)
        aggs = []
        for det, dep in cands:
            aggs.append(F.count_distinct(F.col(det)).alias(f"d_{det}_{dep}"))
            aggs.append(
                F.count_distinct(F.col(det), F.col(dep)).alias(f"p_{det}_{dep}")
            )
        one = df.agg(*aggs)
        for det, dep in cands:
            reports.append(
                one.select(
                    F.lit(tbl).alias("tbl"),
                    F.lit(det).alias("determinant"),
                    F.lit(dep).alias("dependent"),
                    F.col(f"d_{det}_{dep}").cast("long").alias("n_det"),
                    F.col(f"p_{det}_{dep}").cast("long").alias("n_pairs"),
                    (F.col(f"d_{det}_{dep}") == F.col(f"p_{det}_{dep}")).alias(
                        "holds"
                    ),
                )
            )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


@register(
    "link_fellegi_sunter_weights",
    tags=("linkage", "entity-resolution", "blocking"),
    oracle="""
    WITH c AS (
      SELECT c_custkey AS id, c_nationkey AS nat, c_mktsegment AS seg,
             CAST(round(c_acctbal * 100) AS BIGINT) AS cents,
             CAST(round(c_acctbal * 100) AS BIGINT) // 100000 AS band
      FROM customer),
    n AS (SELECT COUNT(*) AS n FROM c),
    u_seg AS (
      SELECT GREATEST((SELECT SUM(cnt * cnt) FROM
               (SELECT COUNT(*) AS cnt FROM c GROUP BY seg))
             * 1000000 // (n.n * n.n), 1) AS u FROM n),
    u_band AS (
      SELECT GREATEST((SELECT SUM(cnt * cnt) FROM
               (SELECT COUNT(*) AS cnt FROM c GROUP BY band))
             * 1000000 // (n.n * n.n), 1) AS u FROM n),
    u_cents AS (
      SELECT GREATEST((SELECT SUM(cnt * cnt) FROM
               (SELECT COUNT(*) AS cnt FROM c GROUP BY cents))
             * 1000000 // (n.n * n.n), 1) AS u FROM n),
    cand AS (
      SELECT a.id AS id_a, b.id AS id_b
      FROM c a JOIN c b
        ON a.nat = b.nat AND a.seg = b.seg AND a.band = b.band
       AND a.id < b.id
      UNION
      SELECT a.id, b.id
      FROM c a JOIN c b
        ON a.nat = b.nat AND a.cents = b.cents AND a.id < b.id)
    SELECT cand.id_a, cand.id_b,
           ca.seg = cb.seg AS agree_seg,
           ca.band = cb.band AS agree_band,
           ca.cents = cb.cents AS agree_cents,
           CAST(CASE WHEN ca.seg = cb.seg
                     THEN 1000000000000 // u_seg.u ELSE 0 END
              + CASE WHEN ca.band = cb.band
                     THEN 1000000000000 // u_band.u ELSE 0 END
              + CASE WHEN ca.cents = cb.cents
                     THEN 1000000000000 // u_cents.u ELSE 0 END
             AS BIGINT) AS score
    FROM cand
    JOIN c ca ON ca.id = cand.id_a
    JOIN c cb ON cb.id = cand.id_b
    CROSS JOIN u_seg CROSS JOIN u_band CROSS JOIN u_cents
    """,
)
def link_fellegi_sunter_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probabilistic record linkage, Splink-style: multi-pass blocked
    candidate generation + frequency-derived u-probability weights —
    exact integers end-to-end.

    u-probability per comparison field = the chance two RANDOM records
    agree on it, computed from the value histogram as sum(c_v^2)/N^2 in
    floor ppm (GREATEST 1 guards near-unique fields). A field's match
    weight is the Fellegi-Sunter agreement surprise 1/u (m assumed ~1;
    linear domain instead of log2 so the score stays an exact BIGINT),
    and a candidate pair's score sums the weights of its agreeing
    fields — rare agreements (exact balance cents) dominate common ones
    (market segment), which is the entire FS insight.

    Scale posture: candidates come from TWO blocking passes — (nation,
    segment, balance band) and (nation, exact cents) — each a shuffle
    on its block key with per-block pair fan-out bounded by block size,
    then UNION-deduped; the full quadratic pair space is never
    materialized. Value histograms are map-side-combined aggregates;
    the three u-weights broadcast as single-row tables.
    """
    cat = Catalog(spark, sf_dir)
    c = cat.table("customer").select(
        F.col("c_custkey").alias("id"),
        F.col("c_nationkey").alias("nat"),
        F.col("c_mktsegment").alias("seg"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("cents"),
        F.expr("cast(round(c_acctbal * 100) as bigint) div 100000")
        .cast("long")
        .alias("band"),
    )
    n_df = c.agg(F.count(F.lit(1)).alias("n"))

    def u_weight(field: str, alias: str) -> DataFrame:
        hist = c.groupBy(field).agg(F.count(F.lit(1)).alias("cnt"))
        return (
            hist.agg(F.sum(F.col("cnt") * F.col("cnt")).alias("ss"))
            .crossJoin(F.broadcast(n_df))
            .select(
                F.greatest(
                    F.expr("ss * 1000000L div (n * n)"), F.lit(1).cast("long")
                ).alias(alias)
            )
        )

    a = c.select(*[F.col(x).alias(f"{x}_a") for x in c.columns])
    b = c.select(*[F.col(x).alias(f"{x}_b") for x in c.columns])
    pass1 = a.join(
        b,
        (F.col("nat_a") == F.col("nat_b"))
        & (F.col("seg_a") == F.col("seg_b"))
        & (F.col("band_a") == F.col("band_b"))
        & (F.col("id_a") < F.col("id_b")),
    )
    pass2 = a.join(
        b,
        (F.col("nat_a") == F.col("nat_b"))
        & (F.col("cents_a") == F.col("cents_b"))
        & (F.col("id_a") < F.col("id_b")),
    )
    cand = pass1.select("id_a", "id_b").union(pass2.select("id_a", "id_b")).distinct()
    attrs = (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .crossJoin(F.broadcast(u_weight("seg", "u_seg")))
        .crossJoin(F.broadcast(u_weight("band", "u_band")))
        .crossJoin(F.broadcast(u_weight("cents", "u_cents")))
    )
    w = lambda agree, u: F.when(agree, F.expr(f"1000000000000L div {u}")).otherwise(  # noqa: E731
        F.lit(0).cast("long")
    )
    agree_seg = F.col("seg_a") == F.col("seg_b")
    agree_band = F.col("band_a") == F.col("band_b")
    agree_cents = F.col("cents_a") == F.col("cents_b")
    return attrs.select(
        "id_a",
        "id_b",
        agree_seg.alias("agree_seg"),
        agree_band.alias("agree_band"),
        agree_cents.alias("agree_cents"),
        (w(agree_seg, "u_seg") + w(agree_band, "u_band") + w(agree_cents, "u_cents"))
        .cast("long")
        .alias("score"),
    )



# Exact-integer → double conversion past 2^63: DuckDB's direct
# DECIMAL(38,0)/HUGEINT→DOUBLE cast is off by one ulp for some values
# (observed: 25220379160838261152), while Spark/Python round correctly.
# Splitting into (value div 2^32, value mod 2^32) — both integer-exact in
# a double up to ~2^85 — and reassembling with one mul-add makes BOTH
# engines evaluate the same IEEE expression, so the doubles match
# bit-for-bit. Spark side takes the decimal column name; DuckDB side
# must route through HUGEINT (its DECIMAL // operator goes through
# float, HUGEINT // is exact).
def SPLIT_DOUBLE(col: str) -> str:
    """Spark SQL fragment: correctly-rounded double of an exact decimal."""
    return (
        f"CAST({col} div 4294967296 AS DOUBLE) * 4294967296D "
        f"+ CAST({col} % 4294967296 AS DOUBLE)"
    )


def SQL_SPLIT_DOUBLE(expr: str) -> str:
    """DuckDB fragment matching :func:`SPLIT_DOUBLE` bit-for-bit."""
    return (
        f"CAST(CAST({expr} AS HUGEINT) // 4294967296 AS DOUBLE) * 4294967296 "
        f"+ CAST(CAST({expr} AS HUGEINT) % 4294967296 AS DOUBLE)"
    )


@register(
    "stats_welch_t2_one_vs_rest",
    tags=("stats", "hypothesis-test", "drift"),
    oracle="""
    WITH x AS (
      SELECT o_orderpriority AS pri,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders),
    g0 AS (
      SELECT pri, COUNT(*) AS n,
             SUM(CAST(cents AS DECIMAL(38,0))) AS s_dec,
             CAST(SUM(CAST(cents AS DECIMAL(38,0))
                      * CAST(cents AS DECIMAL(38,0))) AS HUGEINT) AS q_int
      FROM x GROUP BY pri),
    -- DuckDB's direct DECIMAL(38,0)/HUGEINT -> DOUBLE cast is off by one
    -- ulp for some values past 2^63 (not correctly rounded); the exact
    -- hi/lo split below reproduces Spark's correctly-rounded cast:
    -- both halves are integer-exact in a double, and the final
    -- mul-add is the same IEEE expression both engines evaluate.
    g AS (
      SELECT pri, n, CAST(s_dec AS DOUBLE) AS s,
             CAST(q_int // 4294967296 AS DOUBLE) * 4294967296
               + CAST(q_int % 4294967296 AS DOUBLE) AS q
      FROM g0),
    tot0 AS (
      SELECT COUNT(*) AS tn,
             SUM(CAST(cents AS DECIMAL(38,0))) AS ts_dec,
             CAST(SUM(CAST(cents AS DECIMAL(38,0))
                      * CAST(cents AS DECIMAL(38,0))) AS HUGEINT) AS tq_int
      FROM x),
    tot AS (
      SELECT tn, CAST(ts_dec AS DOUBLE) AS ts,
             CAST(tq_int // 4294967296 AS DOUBLE) * 4294967296
               + CAST(tq_int % 4294967296 AS DOUBLE) AS tq
      FROM tot0),
    ovr AS (
      SELECT g.pri, g.n AS n_a, tot.tn - g.n AS n_b,
             g.s / g.n AS m_a, (tot.ts - g.s) / (tot.tn - g.n) AS m_b,
             (g.n * g.q - g.s * g.s) / (CAST(g.n AS DOUBLE) * (g.n - 1))
               AS v_a,
             ((tot.tn - g.n) * (tot.tq - g.q)
              - (tot.ts - g.s) * (tot.ts - g.s))
             / (CAST(tot.tn - g.n AS DOUBLE) * (tot.tn - g.n - 1)) AS v_b
      FROM g CROSS JOIN tot)
    SELECT pri, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           m_a - m_b AS mean_diff_cents,
           ((m_a - m_b) * (m_a - m_b)) / (v_a / n_a + v_b / n_b) AS t2,
           ((v_a / n_a + v_b / n_b) * (v_a / n_a + v_b / n_b))
           / ((v_a / n_a) * (v_a / n_a) / (n_a - 1)
              + (v_b / n_b) * (v_b / n_b) / (n_b - 1)) AS welch_df
    FROM ovr
    """,
)
def stats_welch_t2_one_vs_rest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t² for every order-priority class at once
    (one-vs-rest): does this class's mean order value differ from the
    rest's beyond what its variance explains. ONE scan: per-class exact
    integer moments (n, Σcents, Σcents² in DECIMAL(38,0) — Σx² passes
    2⁶³ at sf≥0.1) plus the grand totals; the rest-side moments are
    exact decimal subtractions, and only the final scalar t²/df assembly
    runs in doubles — per-row IEEE arithmetic over exact aggregates,
    bit-reproducible across engines because the aggregation itself never
    touched floats. df is the Welch-Satterthwaite effective dof.
    """
    x = Catalog(spark, sf_dir).table("orders").select(
        F.col("o_orderpriority").alias("pri"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    dec = F.col("cents").cast("decimal(38,0)")
    g = x.groupBy("pri").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec).cast("double").alias("s"),
        F.sum(dec * dec).alias("q_dec"),
    ).select(
        "pri", "n", "s", F.expr(SPLIT_DOUBLE("q_dec")).alias("q")
    )
    tot = x.agg(
        F.count(F.lit(1)).alias("tn"),
        F.sum(dec).cast("double").alias("ts"),
        F.sum(dec * dec).alias("tq_dec"),
    ).select(
        "tn", "ts", F.expr(SPLIT_DOUBLE("tq_dec")).alias("tq")
    )
    both = g.crossJoin(F.broadcast(tot)).select(
        "pri",
        F.col("n").alias("n_a"),
        (F.col("tn") - F.col("n")).alias("n_b"),
        (F.col("s") / F.col("n")).alias("m_a"),
        ((F.col("ts") - F.col("s")) / (F.col("tn") - F.col("n"))).alias("m_b"),
        (
            (F.col("n") * F.col("q") - F.col("s") * F.col("s"))
            / (F.col("n").cast("double") * (F.col("n") - 1))
        ).alias("v_a"),
        (
            (
                (F.col("tn") - F.col("n")) * (F.col("tq") - F.col("q"))
                - (F.col("ts") - F.col("s")) * (F.col("ts") - F.col("s"))
            )
            / (
                (F.col("tn") - F.col("n")).cast("double")
                * (F.col("tn") - F.col("n") - 1)
            )
        ).alias("v_b"),
    )
    se2_a = F.col("v_a") / F.col("n_a")
    se2_b = F.col("v_b") / F.col("n_b")
    diff = F.col("m_a") - F.col("m_b")
    return both.select(
        "pri",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        diff.alias("mean_diff_cents"),
        ((diff * diff) / (se2_a + se2_b)).alias("t2"),
        (
            ((se2_a + se2_b) * (se2_a + se2_b))
            / (
                se2_a * se2_a / (F.col("n_a") - 1)
                + se2_b * se2_b / (F.col("n_b") - 1)
            )
        ).alias("welch_df"),
    )


_POISSON_PPM = (367879, 735759, 919699, 981012, 996340, 999406, 999917, 999990)


def _poisson_case_sql(u: str) -> str:
    branches = " ".join(
        f"WHEN {u} < {t} THEN {k}" for k, t in enumerate(_POISSON_PPM)
    )
    return f"CASE {branches} ELSE {len(_POISSON_PPM)} END"


@register(
    "stats_poisson_bootstrap_ci",
    tags=("stats", "bootstrap", "resampling"),
    oracle=f"""
    WITH x AS (
      SELECT o_orderkey AS id,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders),
    reps AS (
      SELECT x.id, x.cents, r.b,
             {_poisson_case_sql(
                 "CAST(('0x' || substring(md5('boot' || r.b || '_' || x.id),"
                 "1, 15)) AS BIGINT) % 1000000")} AS w
      FROM x CROSS JOIN (SELECT unnest(range(32)) AS b) r),
    means AS (
      SELECT b, SUM(w) AS n_eff,
             SUM(w * cents) * 100 // SUM(w) AS mean_cc
      FROM reps GROUP BY b),
    sorted_means AS (
      SELECT list_sort(list(mean_cc)) AS ms FROM means),
    point AS (
      SELECT COUNT(*) AS n, SUM(cents) * 100 // COUNT(*) AS point_mean_cc
      FROM x)
    SELECT CAST(point.n AS BIGINT) AS n,
           CAST(point.point_mean_cc AS BIGINT) AS point_mean_cc,
           CAST(sorted_means.ms[2] AS BIGINT) AS ci_lo_cc,
           CAST(sorted_means.ms[31] AS BIGINT) AS ci_hi_cc
    FROM point CROSS JOIN sorted_means
    """,
)
def stats_poisson_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass distributed bootstrap CI for the mean order value — the
    Poisson(1) trick: resampling-with-replacement across a cluster is
    impossible to coordinate per-replica, but each row's multiplicity in
    replica b is ~Poisson(1), independent across rows, so 32 bootstrap
    replicas materialize as 32 deterministic hash-derived weights and
    ONE weighted aggregation. No data movement beyond a 32-row shuffle:
    rows explode onto the replica axis, weights come from the portable
    md5 hash quantized to ppm against the Poisson(1) CDF, and each
    replica's weighted mean reduces with map-side combine. The 95% CI
    reads ranks 2 and 31 of the 32 sorted replica means (~3rd/97th
    percentile); all arithmetic is exact integer (means in centi-cents
    via floor division).
    """
    from agol_pandas_spark.functions.text import portable_hash60

    x = Catalog(spark, sf_dir).table("orders").select(
        F.col("o_orderkey").alias("id"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    reps = x.select(
        "id", "cents", F.explode(F.sequence(F.lit(0), F.lit(31))).alias("b")
    )
    u = F.pmod(
        portable_hash60(
            F.concat(F.lit("boot"), F.col("b"), F.lit("_"), F.col("id"))
        ),
        F.lit(1000000),
    )
    w = F.lit(len(_POISSON_PPM))
    for k, t in reversed(list(enumerate(_POISSON_PPM))):
        w = F.when(u < t, F.lit(k)).otherwise(w)
    means = (
        reps.withColumn("w", w)
        .groupBy("b")
        .agg(
            F.sum("w").alias("n_eff"),
            F.expr("sum(w * cents) * 100L div sum(w)").alias("mean_cc"),
        )
    )
    # 32 replica means: CI bounds via a sorted array in one single-group
    # agg — no window (a global window, even a 32-row one, is banned by
    # the registry-wide plan pin), no second shuffle
    ci = means.agg(
        F.array_sort(F.collect_list("mean_cc")).alias("ms")
    ).select(
        F.element_at("ms", 2).alias("ci_lo_cc"),
        F.element_at("ms", 31).alias("ci_hi_cc"),
    )
    point = x.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr("sum(cents) * 100L div count(1)").alias("point_mean_cc"),
    )
    return point.crossJoin(F.broadcast(ci)).select(
        "n",
        F.col("point_mean_cc").cast("long").alias("point_mean_cc"),
        F.col("ci_lo_cc").cast("long").alias("ci_lo_cc"),
        F.col("ci_hi_cc").cast("long").alias("ci_hi_cc"),
    )


@register(
    "subquery_q21_waiting_suppliers",
    tags=("subquery", "decorrelation", "tpch"),
    oracle="""
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM lineitem l1
    JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE l1.l_returnflag = 'R'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_returnflag = 'R')
    GROUP BY s.s_name
    """,
)
def subquery_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21's correlation shape on this schema's columns: the sole
    at-fault supplier per finalized order — the supplier's line was
    returned, the order had OTHER suppliers (EXISTS), and none of the
    others' lines were returned (NOT EXISTS). The two correlated
    subqueries are expressed directly as the physical plans Catalyst
    would decorrelate them into — a left-semi and a left-anti join, each
    with a composite (equi on orderkey + inequality on suppkey)
    condition — so the whole query is one shuffle family on the order
    key plus a broadcast supplier lookup; no per-row re-execution of a
    subquery anywhere. (The reference schema lacks receipt/commit dates;
    returnflag stands in for lateness, preserving the join structure.)
    """
    cat = Catalog(spark, sf_dir)
    li = cat.table("lineitem").select("l_orderkey", "l_suppkey", "l_returnflag")
    orders = cat.table("orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey"
    )
    supp = cat.table("supplier").select("s_suppkey", "s_name")
    l1 = li.filter(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey")
    l2 = li.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2")
    )
    l3 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("ok3"), F.col("l_suppkey").alias("sk3")
    )
    out = (
        l1.join(orders, l1.l_orderkey == orders.o_orderkey).drop("o_orderkey")
        .join(
            l2,
            (F.col("l_orderkey") == F.col("ok2"))
            & (F.col("l_suppkey") != F.col("sk2")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("ok3"))
            & (F.col("l_suppkey") != F.col("sk3")),
            "left_anti",
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
    )
    return out


@register(
    "join_q07_nation_volume",
    tags=("join", "tpch", "star"),
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
           {SQL_DSUM(REVENUE.replace('l_', 'l.l_'), 'volume')},
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3
    """,
)
def join_q07_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): revenue flow between every
    supplier-nation → customer-nation pair by ship year, two-year
    window. Five-way star: supplier and both nation legs broadcast
    (tiny dims), the lineitem↔orders equi-join is the only real
    shuffle, and the shipdate range predicate pushes to the parquet
    scan so the two-year window prunes row groups before anything
    joins. Revenue via the engine's quantized-integer double sum
    (bit-reproducible across engines).
    """
    cat = Catalog(spark, sf_dir)
    li = cat.table("lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    supp = cat.table("supplier").select("s_suppkey", "s_nationkey")
    orders = cat.table("orders").select("o_orderkey", "o_custkey")
    cust = cat.table("customer").select("c_custkey", "c_nationkey")
    n1 = cat.table("nation").select(
        F.col("n_nationkey").alias("nk1"), F.col("n_name").alias("supp_nation")
    )
    n2 = cat.table("nation").select(
        F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("cust_nation")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("nk1"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("nk2"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            dsum(rev, "volume"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
    )


@register(
    "filter_q19_disjunctive_revenue",
    tags=("filter", "tpch", "pushdown"),
    oracle=f"""
    SELECT {SQL_DSUM(REVENUE.replace('l_', 'l.l_'), 'revenue')},
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#15' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#22' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def filter_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue, disjunctive predicates): the
    OR-of-ANDs filter the optimizer must not lose. Catalyst extracts
    the common conjuncts each disjunct implies — l_quantity ≤ 30 and
    p_size ≥ 1 bound every branch — and pushes those to the respective
    scans as PushedFilters, while the full disjunction evaluates after
    the broadcast join with part. At 100 TB the extracted bounds are
    what keeps the lineitem scan from reading every row group; the
    plan pin in tests/test_plans.py holds Catalyst to it.
    """
    cat = Catalog(spark, sf_dir)
    li = cat.table("lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = cat.table("part").select("p_partkey", "p_brand", "p_size")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    branch = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, smax)
        & F.col("l_quantity").between(qlo, qhi)
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        joined.filter(
            branch("Brand#3", 5, 1, 11)
            | branch("Brand#15", 10, 10, 20)
            | branch("Brand#22", 15, 20, 30)
        ).agg(
            dsum(rev, "revenue"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
    )


@register(
    "top_q10_returned_customers",
    tags=("topk", "tpch", "join"),
    oracle=f"""
    SELECT c.c_custkey, c.c_name, n.n_name,
           {SQL_DSUM(REVENUE.replace('l_', 'l.l_'), 'revenue')}
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE o.o_orderdate >= DATE '1996-01-01'
      AND o.o_orderdate < DATE '1996-04-01'
      AND l.l_returnflag = 'R'
    GROUP BY 1, 2, 3
    ORDER BY 4 DESC, c.c_custkey
    LIMIT 20
    """,
)
def top_q10_returned_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): the 20 customers who
    returned the most revenue in a quarter. Orders prune on the date
    range at the scan, lineitem prunes on returnflag, customer+nation
    broadcast, and the final top-20 runs as TakeOrderedAndProject —
    per-partition heads merged on the driver, never a global sort of
    the grouped result. Ties break on the key so the limit is
    deterministic.
    """
    cat = Catalog(spark, sf_dir)
    cust = cat.table("customer").select("c_custkey", "c_name", "c_nationkey")
    orders = cat.table("orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("date"))
    ).select("o_orderkey", "o_custkey")
    li = cat.table("lineitem").filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    nat = cat.table("nation").select("n_nationkey", "n_name")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(rev, "revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "stats_spearman_rank_corr",
    tags=("stats", "ranks", "correlation"),
    oracle=f"""
    WITH x AS (
      SELECT l_returnflag AS g,
             CAST(round(l_quantity) AS BIGINT) AS xv,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS yv
      FROM lineitem),
    hx AS (
      SELECT g, xv, COUNT(*) AS c,
             2 * (SUM(COUNT(*)) OVER (PARTITION BY g ORDER BY xv)
                  - COUNT(*)) + COUNT(*) + 1 AS rx2
      FROM x GROUP BY g, xv),
    hy AS (
      SELECT g, yv, COUNT(*) AS c,
             2 * (SUM(COUNT(*)) OVER (PARTITION BY g ORDER BY yv)
                  - COUNT(*)) + COUNT(*) + 1 AS ry2
      FROM x GROUP BY g, yv),
    r AS (
      SELECT x.g, hx.rx2, hy.ry2
      FROM x JOIN hx ON hx.g = x.g AND hx.xv = x.xv
             JOIN hy ON hy.g = x.g AND hy.yv = x.yv),
    m AS (
      SELECT g, COUNT(*) AS n,
             SUM(CAST(rx2 AS DECIMAL(38,0))) AS sx,
             SUM(CAST(ry2 AS DECIMAL(38,0))) AS sy,
             SUM(CAST(rx2 AS DECIMAL(38,0)) * rx2) AS sxx,
             SUM(CAST(ry2 AS DECIMAL(38,0)) * ry2) AS syy,
             SUM(CAST(rx2 AS DECIMAL(38,0)) * ry2) AS sxy
      FROM r GROUP BY g)
    SELECT g AS l_returnflag, CAST(n AS BIGINT) AS n,
           ({SQL_SPLIT_DOUBLE('n * sxy - sx * sy')})
           / (sqrt({SQL_SPLIT_DOUBLE('n * sxx - sx * sx')})
              * sqrt({SQL_SPLIT_DOUBLE('n * syy - sy * sy')})) AS rho
    FROM m
    """,
)
def stats_spearman_rank_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between quantity and extended price per
    return flag — the tie-corrected definition (Pearson over tie-averaged
    ranks), computed without ever ranking row-at-a-time: each variable
    collapses to a per-group value histogram, the cumulative window runs
    over DISTINCT values partitioned by group (histogram-sized, never
    corpus-sized), and tie-averaged ranks stay exact integers in DOUBLED
    units (avg2 = 2·cum_before + c + 1). Rank moments accumulate in
    DECIMAL(38,0) (sx·sy passes 2⁶³ at sf0.1); the final ρ assembly uses
    the split-cast helpers (both engines evaluate the identical IEEE
    expression — sqrt is IEEE-correctly-rounded everywhere, unlike
    ln/exp) so the doubles match bit-for-bit.
    """
    x = Catalog(spark, sf_dir).table("lineitem").select(
        F.col("l_returnflag").alias("g"),
        F.round("l_quantity").cast("long").alias("xv"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("yv"),
    )
    from pyspark.sql.window import Window as W

    def hist_ranks(col: str, rank_name: str) -> DataFrame:
        h = x.groupBy("g", col).agg(F.count(F.lit(1)).alias("c"))
        w = W.partitionBy("g").orderBy(col)
        return h.select(
            "g",
            col,
            (
                2 * (F.sum("c").over(w) - F.col("c")) + F.col("c") + 1
            ).alias(rank_name),
        )
    r = (
        x.join(hist_ranks("xv", "rx2"), ["g", "xv"])
        .join(hist_ranks("yv", "ry2"), ["g", "yv"])
    )
    dx = F.col("rx2").cast("decimal(38,0)")
    dy = F.col("ry2").cast("decimal(38,0)")
    m = r.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dx).alias("sx"),
        F.sum(dy).alias("sy"),
        F.sum(dx * F.col("rx2")).alias("sxx"),
        F.sum(dy * F.col("ry2")).alias("syy"),
        F.sum(dx * F.col("ry2")).alias("sxy"),
    )
    num = SPLIT_DOUBLE("(n * sxy - sx * sy)")
    d1 = SPLIT_DOUBLE("(n * sxx - sx * sx)")
    d2 = SPLIT_DOUBLE("(n * syy - sy * sy)")
    return m.select(
        F.col("g").alias("l_returnflag"),
        F.col("n").cast("long").alias("n"),
        F.expr(f"({num}) / (sqrt({d1}) * sqrt({d2}))").alias("rho"),
    )


@register(
    "join_q05_local_supplier_volume",
    tags=("join", "tpch", "star"),
    oracle=f"""
    SELECT n.n_name,
           {SQL_DSUM(REVENUE.replace('l_', 'l.l_'), 'revenue')},
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY 1
    """,
)
def join_q05_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume): revenue from orders where the
    customer and the line's supplier share a nation, per Asian nation,
    one order year. The "local" constraint — supplier nation ==
    customer nation — rides the broadcast supplier join as an extra
    equi-conjunct rather than a post-join filter, so mismatched rows
    die inside the build-side probe instead of surviving a shuffle.
    Orders prune on the date range at the scan; nation⋈region folds to
    a broadcast nationkey set. The only real shuffle is
    lineitem↔orders.
    """
    cat = Catalog(spark, sf_dir)
    nat = cat.table("nation")
    reg = cat.table("region").filter(F.col("r_name") == "ASIA")
    asia_nat = nat.join(
        F.broadcast(reg), nat.n_regionkey == reg.r_regionkey
    ).select("n_nationkey", "n_name")
    orders = cat.table("orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    cust = cat.table("customer").select("c_custkey", "c_nationkey")
    supp = cat.table("supplier").select("s_suppkey", "s_nationkey")
    li = cat.table("lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(asia_nat), supp.s_nationkey == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            dsum(_rev(), "revenue"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
    )


@register(
    "filter_q14_promo_share",
    tags=("filter", "tpch", "agg"),
    oracle=f"""
    SELECT
      CAST(SUM(CASE WHEN p.p_type = 'PROMO'
               THEN CAST(round(({REVENUE.replace('l_', 'l.l_')}) * {SCALE}) AS BIGINT)
               ELSE 0 END) AS DOUBLE) / {SCALE}.0 AS promo_revenue,
      {SQL_DSUM(REVENUE.replace('l_', 'l.l_'), 'total_revenue')},
      CAST(SUM(CASE WHEN p.p_type = 'PROMO'
               THEN CAST(round(({REVENUE.replace('l_', 'l.l_')}) * {SCALE}) AS BIGINT)
               ELSE 0 END) AS DOUBLE) * 100.0
        / CAST(SUM(CAST(round(({REVENUE.replace('l_', 'l.l_')}) * {SCALE}) AS BIGINT)) AS DOUBLE)
        AS promo_pct
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
      AND l.l_shipdate < TIMESTAMP '1996-04-01'
    """,
)
def filter_q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): PROMO-typed revenue share for one
    ship month. Conditional and total revenue land in ONE partial
    aggregation over one pruned scan (the month predicate pushes to
    parquet, part broadcasts); the percentage divides the two
    identical quantized-integer sums, so even the ratio is
    bit-reproducible across engines — no decimal detour needed.
    """
    cat = Catalog(spark, sf_dir)
    li = cat.table("lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    ).select("l_partkey", "l_extendedprice", "l_discount")
    part = cat.table("part").select("p_partkey", "p_type")
    q = F.round(_rev() * SCALE).cast("long")
    promo = F.sum(F.when(F.col("p_type") == "PROMO", q).otherwise(F.lit(0)))
    total = F.sum(q)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey).agg(
            (promo.cast("double") / F.lit(float(SCALE))).alias("promo_revenue"),
            (total.cast("double") / F.lit(float(SCALE))).alias("total_revenue"),
            (promo.cast("double") * 100.0 / total.cast("double")).alias(
                "promo_pct"
            ),
        )
    )


@register(
    "join_q13_order_count_distribution",
    tags=("join", "tpch", "agg"),
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey,
             CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c
      LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                        AND o.o_orderpriority <> '1-URGENT'
      GROUP BY 1) d
    GROUP BY 1
    """,
)
def join_q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer distribution): how many customers placed
    exactly N non-urgent orders — including N=0, which is why the
    LEFT join (with the priority predicate INSIDE the join condition,
    not a WHERE that would turn it inner) is the whole point. Spark
    pre-aggregates orders per custkey before the join, so the join
    carries one row per customer per side instead of one per order;
    the N=0 customers surface via coalesce. Second aggregation is
    histogram-sized.
    """
    cat = Catalog(spark, sf_dir)
    cust = cat.table("customer").select("c_custkey")
    per_cust = (
        cat.table("orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .groupBy(F.col("o_custkey"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return (
        cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "left")
        .select(F.coalesce(F.col("n_orders"), F.lit(0)).cast("long").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("long").alias("custdist"))
    )


@register(
    "top_q18_large_orders",
    tags=("topk", "tpch", "having"),
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           CAST(o.o_orderdate AS VARCHAR) AS o_orderdate,
           CAST(round(o.o_totalprice * 100) AS BIGINT) AS total_cents,
           q.total_qty
    FROM (
      SELECT l_orderkey,
             CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS total_qty
      FROM lineitem GROUP BY 1
      HAVING SUM(CAST(round(l_quantity) AS BIGINT)) > 250) q
    JOIN orders o ON o.o_orderkey = q.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY total_cents DESC, o.o_orderkey
    LIMIT 100
    """,
)
def top_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers): orders whose total quantity
    exceeds 250 units, with their customer, top-100 by price. The
    HAVING aggregation runs FIRST — lineitem collapses to one row per
    qualifying order (~1% survive) before any join, so orders and
    customer join against the tiny survivor set (broadcast), and the
    top-100 is TakeOrderedAndProject. Quantities are integral doubles;
    round→BIGINT makes the sum and the threshold exact.
    """
    cat = Catalog(spark, sf_dir)
    big = (
        cat.table("lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum(F.round(F.col("l_quantity")).cast("long")).alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    orders = cat.table("orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = cat.table("customer").select("c_custkey", "c_name")
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("string").alias("o_orderdate"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("total_cents"),
            F.col("total_qty").cast("long").alias("total_qty"),
        )
        .orderBy(F.col("total_cents").desc(), "o_orderkey")
        .limit(100)
    )


@register(
    "top_q15_supplier_max_revenue",
    tags=("topk", "tpch", "scalar-subquery"),
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey,
             SUM(CAST(round(({REVENUE}) * {SCALE}) AS BIGINT)) AS r_scaled
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY 1)
    SELECT s.s_suppkey, s.s_name,
           CAST(rev.r_scaled AS DOUBLE) / {SCALE}.0 AS total_revenue
    FROM rev JOIN supplier s ON s.s_suppkey = rev.l_suppkey
    WHERE rev.r_scaled = (SELECT MAX(r_scaled) FROM rev)
    """,
)
def top_q15_supplier_max_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): supplier(s) whose quarterly revenue
    equals the maximum — the scalar-subquery-over-a-view shape, with
    the tie semantics LIMIT 1 would get wrong. The per-supplier
    aggregate is computed once; the global max is a 1-row aggregate of
    that (supplier-count-sized) result, broadcast back as an
    equi-join on the exact scaled-integer revenue — float equality
    never decides a match, and no global window is involved.
    """
    cat = Catalog(spark, sf_dir)
    rev = (
        cat.table("lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(F.round(_rev() * SCALE).cast("long")).alias("r_scaled"))
    )
    mx = rev.agg(F.max("r_scaled").alias("r_scaled"))
    supp = cat.table("supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx), "r_scaled")
        .join(F.broadcast(supp), rev.l_suppkey == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            (F.col("r_scaled").cast("double") / F.lit(float(SCALE))).alias(
                "total_revenue"
            ),
        )
    )


@register(
    "join_q08_market_share",
    tags=("join", "tpch", "agg"),
    oracle=f"""
    SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
      CAST(SUM(CASE WHEN n1.n_name = 'NATION_7'
               THEN CAST(round(({REVENUE.replace('l_', 'l.l_')}) * {SCALE}) AS BIGINT)
               ELSE 0 END) AS DOUBLE)
        / CAST(SUM(CAST(round(({REVENUE.replace('l_', 'l.l_')}) * {SCALE}) AS BIGINT)) AS DOUBLE)
        AS mkt_share,
      {SQL_DSUM(REVENUE.replace('l_', 'l.l_'), 'total_volume')}
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n2.n_regionkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY 1
    """,
)
def join_q08_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): NATION_7 suppliers' share of
    revenue sold into ASIA-region customers, per order year. The share
    is conditional-sum over total-sum of the same quantized-integer
    revenue — one partial aggregation carries both, and the division
    of two identical BIGINT-derived doubles is bit-reproducible. All
    dimension legs broadcast; lineitem↔orders is the only shuffle.
    """
    cat = Catalog(spark, sf_dir)
    li = cat.table("lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = cat.table("orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    cust = cat.table("customer").select("c_custkey", "c_nationkey")
    nat = cat.table("nation")
    reg = cat.table("region").filter(F.col("r_name") == "ASIA")
    asia_keys = nat.join(
        F.broadcast(reg), nat.n_regionkey == reg.r_regionkey
    ).select(F.col("n_nationkey").alias("cust_nk"))
    supp = cat.table("supplier").select("s_suppkey", "s_nationkey")
    supp_nat = nat.select(
        F.col("n_nationkey").alias("supp_nk"), F.col("n_name").alias("supp_nation")
    )
    q = F.round(_rev() * SCALE).cast("long")
    nation7 = F.sum(
        F.when(F.col("supp_nation") == "NATION_7", q).otherwise(F.lit(0))
    )
    total = F.sum(q)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(asia_keys), cust.c_nationkey == F.col("cust_nk"))
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(supp_nat), supp.s_nationkey == F.col("supp_nk"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            (nation7.cast("double") / total.cast("double")).alias("mkt_share"),
            (total.cast("double") / F.lit(float(SCALE))).alias("total_volume"),
        )
    )


@register(
    "join_q09_product_profit",
    tags=("join", "tpch", "star"),
    oracle=f"""
    SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
      CAST(SUM(CAST(round((l.l_extendedprice * (1 - l.l_discount)
                  - p.p_retailprice * l.l_quantity * 0.10) * {SCALE}) AS BIGINT))
           AS DOUBLE) / {SCALE}.0 AS profit,
      CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%red%'
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY 1, 2
    """,
)
def join_q09_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit): profit on 'red' parts by
    supplier nation and order year, with supply cost modeled as 10% of
    the part's retail price per unit (this corpus has no partsupp
    table — the join/aggregation shape is Q9's, the cost column is
    derived). The part filter broadcasts a pre-shrunk build side, so
    lineitem rows for other parts die in the first probe; profit is
    one quantized-integer sum per (nation, year).
    """
    cat = Catalog(spark, sf_dir)
    part = cat.table("part").filter(F.col("p_name").like("%red%")).select(
        "p_partkey", "p_retailprice"
    )
    li = cat.table("lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_discount",
    )
    supp = cat.table("supplier").select("s_suppkey", "s_nationkey")
    nat = cat.table("nation").select("n_nationkey", F.col("n_name").alias("nation"))
    orders = cat.table("orders").select("o_orderkey", "o_orderdate")
    profit = _rev() - F.col("p_retailprice") * F.col("l_quantity") * 0.10
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("nation", F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            dsum(profit, "profit"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
    )


@register(
    "join_q12_late_priority_counts",
    tags=("join", "tpch", "agg"),
    oracle="""
    SELECT l.l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY 1
    """,
)
def join_q12_late_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping modes / order priority): of the lines
    shipped more than 60 days after their order in 1996, how many
    belonged to high- vs low-priority orders, per returnflag class
    (this corpus has no shipmode or commit/receipt dates — returnflag
    plays the grouping role, ship-vs-order lag the lateness test).
    The lag predicate compares two columns, so it evaluates right
    above the join while the 1996 ship-year range still pushes to the
    lineitem scan; both CASE counts ride one partial aggregation.
    """
    cat = Catalog(spark, sf_dir)
    li = cat.table("lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_returnflag", "l_shipdate")
    orders = cat.table("orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
    )


@register(
    "profile_q16_supplier_counts",
    tags=("profile", "tpch", "subquery"),
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_size IN (1, 5, 9, 13, 17, 21, 25)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    """,
)
def profile_q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship): distinct suppliers able
    to supply each qualifying (brand, type, size) combination,
    excluding blacklisted suppliers — the NOT IN subquery shape (here:
    negative account balance standing in for the complaints LIKE). The
    exclusion runs as a broadcast LEFT ANTI join (supplier keys are
    non-null, so NOT IN == anti-join); the brand/size predicates push
    into the broadcast part build side; COUNT(DISTINCT) shuffles on
    the group keys once.
    """
    cat = Catalog(spark, sf_dir)
    part = cat.table("part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = cat.table("supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    li = cat.table("lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).cast("long").alias("supplier_cnt"))
    )


@register(
    "subquery_q20_excess_share_suppliers",
    tags=("subquery", "tpch", "semi"),
    oracle="""
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             SUM(CAST(round(l_quantity) AS BIGINT)) AS q
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY 1, 2),
    tot AS (SELECT l_partkey, SUM(q) AS tq FROM ps GROUP BY 1)
    SELECT s.s_suppkey, s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE s.s_suppkey IN (
      SELECT ps.l_suppkey FROM ps JOIN tot ON tot.l_partkey = ps.l_partkey
      WHERE ps.q * 10 > tot.tq * 3)
    """,
)
def subquery_q20_excess_share_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion): suppliers who shipped more
    than 30% of some part's total 1996 volume — the nested correlated
    aggregate shape (ps_availqty > 0.5·sum(...) in the original; this
    corpus has no partsupp, so the dominance test compares the
    supplier's shipped quantity against the part's corpus-wide total).
    Both aggregation levels reuse ONE shuffle family keyed on
    l_partkey — the per-(part,supplier) rollup re-aggregates to the
    part total without a second scan — and the dominance test is
    exact integer cross-multiplication (q·10 > total·3), never a
    float share. The qualifying supplier set semi-joins supplier.
    """
    cat = Catalog(spark, sf_dir)
    ps = (
        cat.table("lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.round(F.col("l_quantity")).cast("long")).alias("q"))
    )
    tot = ps.groupBy("l_partkey").agg(F.sum("q").alias("tq"))
    dominant = (
        ps.join(tot, "l_partkey")
        .filter(F.col("q") * 10 > F.col("tq") * 3)
        .select("l_suppkey")
    )
    supp = cat.table("supplier").select("s_suppkey", "s_name", "s_nationkey")
    nat = cat.table("nation").select("n_nationkey", "n_name")
    return (
        supp.join(
            F.broadcast(dominant), supp.s_suppkey == dominant.l_suppkey, "left_semi"
        ).join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .select("s_suppkey", "s_name", "n_name")
    )


@register(
    "join_q02_min_unit_price_supplier",
    tags=("join", "tpch", "correlated-min"),
    oracle="""
    WITH u AS (
      SELECT l_partkey, l_suppkey,
             CAST(round(l_extendedprice / l_quantity * 100) AS BIGINT) AS unit_cents
      FROM lineitem),
    m AS (SELECT l_partkey, MIN(unit_cents) AS min_cents FROM u GROUP BY 1)
    SELECT DISTINCT p.p_partkey, p.p_brand, s.s_suppkey, s.s_name,
           u.unit_cents
    FROM u
    JOIN m ON m.l_partkey = u.l_partkey AND u.unit_cents = m.min_cents
    JOIN part p ON p.p_partkey = u.l_partkey
    JOIN supplier s ON s.s_suppkey = u.l_suppkey
    WHERE p.p_size = 5
    """,
)
def join_q02_min_unit_price_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier): for every size-5 part, the
    supplier(s) who sold it at its minimum observed unit price — the
    correlated-MIN-subquery shape (supplycost becomes observed
    extendedprice/quantity; no partsupp in this corpus). The per-part
    minimum is a re-aggregation of the same (part, supplier) rollup —
    one shuffle family on l_partkey — joined back on exact integer
    cents so float equality never decides a winner; ties keep every
    achieving supplier, as Q2's semantics require. Part filter and
    supplier lookup broadcast.
    """
    cat = Catalog(spark, sf_dir)
    u = (
        cat.table("lineitem")
        .select(
            "l_partkey",
            "l_suppkey",
            F.round(F.col("l_extendedprice") / F.col("l_quantity") * 100)
            .cast("long")
            .alias("unit_cents"),
        )
        .distinct()
    )
    m = u.groupBy(F.col("l_partkey").alias("__mk")).agg(
        F.min("unit_cents").alias("min_cents")
    )
    part = cat.table("part").filter(F.col("p_size") == 5).select(
        "p_partkey", "p_brand"
    )
    supp = cat.table("supplier").select("s_suppkey", "s_name")
    return (
        u.join(
            m,
            (u.l_partkey == m["__mk"]) & (u.unit_cents == m.min_cents),
        )
        .join(F.broadcast(part), u.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), u.l_suppkey == supp.s_suppkey)
        .select("p_partkey", "p_brand", "s_suppkey", "s_name", "unit_cents")
        .distinct()
    )


@register(
    "privacy_t_closeness_audit",
    tags=("privacy", "audit", "emd"),
    oracle="""
    WITH h AS (
      SELECT c_mktsegment AS q,
             CAST(floor(c_acctbal / 1000) AS BIGINT) AS b,
             COUNT(*) AS c
      FROM customer GROUP BY 1, 2),
    grid AS (
      SELECT q, b
      FROM (SELECT DISTINCT q FROM h) CROSS JOIN (SELECT DISTINCT b FROM h)),
    dense AS (
      SELECT grid.q, grid.b, COALESCE(h.c, 0) AS c
      FROM grid LEFT JOIN h ON h.q = grid.q AND h.b = grid.b),
    cums AS (
      SELECT q, b, SUM(c) OVER (PARTITION BY q ORDER BY b) AS cum_class
      FROM dense),
    gcum AS (SELECT b, SUM(cum_class) AS cum_glob FROM cums GROUP BY b),
    pc AS (SELECT q, MAX(cum_class) AS n_class FROM cums GROUP BY q),
    nt AS (SELECT SUM(n_class) AS n_total FROM pc),
    mm AS (SELECT COUNT(DISTINCT b) AS m FROM h),
    emd AS (
      SELECT cums.q,
             CAST(MAX(pc.n_class) AS BIGINT) AS n_class,
             CAST((1000000 * SUM(ABS(cum_class * n_total - cum_glob * pc.n_class)))
                  // ((MAX(m) - 1) * MAX(pc.n_class) * MAX(n_total)) AS BIGINT)
               AS emd_ppm
      FROM cums
      JOIN gcum ON gcum.b = cums.b
      JOIN pc ON pc.q = cums.q
      CROSS JOIN nt CROSS JOIN mm
      GROUP BY cums.q)
    SELECT q AS c_mktsegment, n_class, emd_ppm,
           emd_ppm <= 100000 AS t_close
    FROM emd
    """,
)
def privacy_t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness release gate (``operators/profile.t_closeness_audit``):
    bounds the Earth Mover's Distance between each market segment's
    account-balance distribution (thousand-unit buckets, ordered) and
    the global one — the leak k-anonymity and l-diversity both miss
    when a class's values cluster at one end. Ordered-bucket EMD =
    mean |cumulative gap|, evaluated entirely in exact integers on the
    (class × bucket) histogram; the global cumulative is the SUM of
    per-class cums, so no unpartitioned window exists anywhere."""
    cat = Catalog(spark, sf_dir)
    from agol_pandas_spark.operators.profile import t_closeness_audit

    return t_closeness_audit(
        cat.table("customer"),
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("long"),
        t_ppm=100_000,
    )


@register(
    "stats_kendall_tau_b",
    tags=("stats", "correlation", "ranks"),
    oracle=f"""
    WITH x AS (
      SELECT l_returnflag AS g,
             CAST(round(l_quantity) AS BIGINT) AS xv,
             CAST(round(l_tax * 100) AS BIGINT) AS yv
      FROM lineitem),
    cells AS (
      SELECT g, xv, yv, CAST(COUNT(*) AS DECIMAL(38,0)) AS c
      FROM x GROUP BY 1, 2, 3),
    cd AS (
      SELECT a.g,
             SUM(CASE WHEN a.yv < b.yv THEN a.c * b.c ELSE 0 END) AS nc,
             SUM(CASE WHEN a.yv > b.yv THEN a.c * b.c ELSE 0 END) AS nd
      FROM cells a JOIN cells b ON a.g = b.g AND a.xv < b.xv
      GROUP BY 1),
    tx AS (
      SELECT g, SUM(t * (t - 1) / 2) AS n1 FROM (
        SELECT g, xv, COUNT(*) AS t FROM x GROUP BY 1, 2) GROUP BY 1),
    ty AS (
      SELECT g, SUM(t * (t - 1) / 2) AS n2 FROM (
        SELECT g, yv, COUNT(*) AS t FROM x GROUP BY 1, 2) GROUP BY 1),
    nn AS (SELECT g, COUNT(*) AS n FROM x GROUP BY 1)
    SELECT nn.g AS l_returnflag, CAST(nn.n AS BIGINT) AS n,
           ({SQL_SPLIT_DOUBLE('nc - nd')})
           / sqrt({SQL_SPLIT_DOUBLE(
               'CAST(nn.n * (nn.n - 1) / 2 - n1 AS DECIMAL(38,0))'
               ' * CAST(nn.n * (nn.n - 1) / 2 - n2 AS DECIMAL(38,0))')}) AS tau_b
    FROM nn
    JOIN cd ON cd.g = nn.g
    JOIN tx ON tx.g = nn.g
    JOIN ty ON ty.g = nn.g
    """,
)
def stats_kendall_tau_b(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's τ-b (tie-corrected) between quantity and tax rate per
    return flag — the rank correlation whose naive form is an O(n²)
    pair sweep. Here n² never happens: both variables quantize to
    small integer grids, so the joint distribution collapses to a
    per-group (x, y) HISTOGRAM, and concordant/discordant pairs are a
    histogram-cell self-join (bounded by distinct-value counts, not
    rows) with exact DECIMAL(38,0) products — at 100 TB the histogram
    is the same size it is here. Tie terms come from the marginal
    histograms; the final τ assembles through the split-cast double
    helpers — the denominator multiplies its two variance factors
    EXACTLY in DECIMAL(38,0) before one sqrt, so perfect correlations
    come out exactly ±1.
    """
    from agol_pandas_spark.operators.profile import kendall_tau_b

    x = Catalog(spark, sf_dir).table("lineitem").select(
        F.col("l_returnflag").alias("g"),
        F.round("l_quantity").cast("long").alias("xv"),
        F.round(F.col("l_tax") * 100).cast("long").alias("yv"),
    )
    return kendall_tau_b(x, "g", "xv", "yv").withColumnsRenamed(
        {"g": "l_returnflag"}
    )


@register(
    "top_q03_shipping_priority",
    tags=("topk", "tpch", "join"),
    oracle=f"""
    SELECT l.l_orderkey,
           {SQL_DSUM(REVENUE.replace('l_', 'l.l_'), 'revenue')},
           CAST(o.o_orderdate AS VARCHAR) AS o_orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1996-06-15'
      AND l.l_shipdate > TIMESTAMP '1996-06-15'
    GROUP BY 1, 3, 4
    ORDER BY 2 DESC, l.l_orderkey
    LIMIT 10
    """,
)
def top_q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority): the 10 highest-revenue BUILDING
    orders placed before the cutoff but not yet fully shipped. Both
    date predicates and the segment filter push to their scans —
    opposite-direction ranges on order vs ship date are the classic
    unshipped-backlog probe — customer broadcasts, and the top-10 of
    the grouped result is TakeOrderedAndProject with a key tie-break.
    """
    cat = Catalog(spark, sf_dir)
    cust = cat.table("customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    orders = cat.table("orders").filter(
        F.col("o_orderdate") < F.lit("1996-06-15").cast("timestamp")
    ).select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    li = cat.table("lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-06-15").cast("timestamp")
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(
            "l_orderkey",
            F.col("o_orderdate").cast("string").alias("o_orderdate"),
            "o_orderpriority",
        )
        .agg(dsum(_rev(), "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@register(
    "subquery_q04_priority_late_lines",
    tags=("subquery", "tpch", "semi"),
    oracle="""
    SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 45 DAY)
    GROUP BY 1
    """,
)
def subquery_q04_priority_late_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order priority checking): quarterly orders with at
    least one late line, counted per priority — the correlated EXISTS
    shape (commit<receipt becomes ship-vs-order lag; this corpus has
    no commit/receipt dates). The EXISTS runs as a LEFT SEMI join
    whose condition mixes the equi-key with the correlated column
    comparison; the quarter predicate pushes to the orders scan, so
    the semi join probes only one quarter's keys.
    """
    cat = Catalog(spark, sf_dir)
    orders = cat.table("orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = cat.table("lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 45 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("order_count"))
    )


@register(
    "filter_q06_forecast_revenue",
    tags=("filter", "tpch", "agg", "pushdown"),
    oracle=f"""
    SELECT {SQL_DSUM('l_extendedprice * l_discount', 'revenue')},
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
)
def filter_q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): the pure scan-filter-agg
    query — no join anywhere, which is the point: all four range
    predicates reach the parquet scan as PushedFilters, the reader
    prunes row groups on the shipdate/discount/quantity footer spans,
    and what survives feeds one partial aggregation. The query whose
    entire cost IS the scan — at 100 TB it measures nothing but
    pushdown quality.
    """
    cat = Catalog(spark, sf_dir)
    li = cat.table("lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
        F.count(F.lit(1)).cast("long").alias("n_lines"),
    )


@register(
    "link_entity_resolution_clusters",
    tags=("linkage", "entity-resolution", "clustering", "pipeline"),
    oracle=f"""
    WITH fs AS ({REGISTRY["link_fellegi_sunter_weights"].oracle}),
    matches AS (SELECT id_a, id_b FROM fs WHERE score > 100000000),
    edges2 AS (SELECT id_a AS a, id_b AS b FROM matches
               UNION SELECT id_b, id_a FROM matches),
    nodes AS (SELECT DISTINCT a AS node FROM edges2),
    reach AS (
      WITH RECURSIVE r(node, label) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT e.b, r.label FROM r JOIN edges2 e ON e.a = r.node
      ) SELECT * FROM r),
    cc AS (SELECT node, MIN(label) AS entity FROM reach GROUP BY node)
    SELECT cc.entity,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(MAX(round(c.c_acctbal * 100)) AS BIGINT) AS max_cents,
           MIN(c.c_name) AS canonical_name
    FROM cc JOIN customer c ON c.c_custkey = cc.node
    GROUP BY cc.entity
    """,
)
def link_entity_resolution_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution end-to-end, composed from the engine's own
    stages: Fellegi-Sunter blocked scoring (the
    ``link_fellegi_sunter_weights`` plan, reused verbatim) → score
    threshold keeping only exact-balance-grade agreements (the 1e8 cut
    sits two orders of magnitude above the seg+band weight ceiling and
    well under any cents-agreement weight at either SF) → connected
    components over the match edges (transitive closure: A≈B≈C is one
    entity even when A and C never paired) → survivorship, one row per
    resolved entity with its canonical member count and max balance.
    The full quadratic pair space is never materialized at any stage.
    (At sf0.01 no two customers share exact balance cents, so zero
    entities is the CORRECT answer there; sf0.1 resolves 8 clusters —
    both sweep rows value-match the recursive-CTE oracle.)
    """
    from agol_pandas_spark.operators.dedup import connected_components
    from agol_pandas_spark.workload import REGISTRY

    scored = REGISTRY["link_fellegi_sunter_weights"].fn(spark, sf_dir)
    matches = scored.filter(F.col("score") > 100_000_000).select("id_a", "id_b")
    cc = connected_components(matches, "id_a", "id_b").select(
        F.col("node"), F.col("component").alias("entity")
    )
    cust = Catalog(spark, sf_dir).table("customer").select(
        F.col("c_custkey"), F.col("c_acctbal"), F.col("c_name")
    )
    return (
        cc.join(cust, cc.node == cust.c_custkey)
        .groupBy("entity")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.max(F.round(F.col("c_acctbal") * 100)).cast("long").alias("max_cents"),
            F.min("c_name").alias("canonical_name"),
        )
    )


@register(
    "stats_mann_kendall_seasonal",
    tags=("stats", "trend", "monitoring"),
    oracle="""
    WITH d AS (
      SELECT event_type,
             CAST(epoch_ms(ts) // 86400000 AS BIGINT) AS day,
             dayofweek(ts) AS season,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY 1, 2, 3),
    pairs AS (
      SELECT a.event_type, a.season,
             SUM(CASE WHEN b.y > a.y THEN 1
                      WHEN b.y < a.y THEN -1 ELSE 0 END) AS s
      FROM d a JOIN d b
        ON a.event_type = b.event_type AND a.season = b.season
       AND a.day < b.day
      GROUP BY 1, 2),
    nties AS (
      SELECT event_type, season, COUNT(*) AS n,
             SUM(t * (t - 1) * (2 * t + 5)) AS tie_term
      FROM (
        SELECT event_type, season, y, COUNT(*) AS t
        FROM d GROUP BY 1, 2, 3)
      GROUP BY 1, 2),
    per_season AS (
      SELECT p.event_type, p.s,
             n.n * (n.n - 1) * (2 * n.n + 5) - n.tie_term AS var18
      FROM pairs p JOIN nties n
        ON n.event_type = p.event_type AND n.season = p.season),
    tot AS (
      SELECT event_type,
             CAST(SUM(s) AS BIGINT) AS s_stat,
             CAST(SUM(var18) AS BIGINT) AS var18
      FROM per_season GROUP BY 1)
    SELECT event_type, s_stat, var18,
           CAST(s_stat - sign(s_stat) AS DOUBLE)
             / sqrt(CAST(var18 AS DOUBLE) / 18.0) AS z
    FROM tot
    """,
)
def stats_mann_kendall_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal Mann-Kendall trend test (Hirsch & Slack 1984) on daily
    revenue-event totals per event type: S statistics computed within
    each day-of-week season (so weekly cycles cannot masquerade as
    trends) and summed, tie-corrected variance summed alongside. The
    pair comparison runs on the per-(type, season) DAILY histogram —
    bounded by the calendar, not the corpus, so the self-join is the
    same size at any SF. S and the 18·Var integers are exact; only the
    final z divides through mirrored IEEE doubles (sqrt is correctly
    rounded), with the standard continuity correction ``S − sign(S)``.
    """
    ev = Catalog(spark, sf_dir).table("events")
    d = ev.groupBy(
        "event_type",
        F.expr("CAST(unix_timestamp(ts) div 86400 AS BIGINT)").alias("day"),
        F.dayofweek("ts").alias("season"),
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("y"))
    a = d.select(
        "event_type", "season", F.col("day").alias("da"), F.col("y").alias("ya")
    )
    b = d.select(
        F.col("event_type").alias("et2"), F.col("season").alias("se2"),
        F.col("day").alias("db"), F.col("y").alias("yb"),
    )
    pairs = (
        a.join(
            b,
            (a.event_type == b.et2) & (a.season == b.se2)
            & (F.col("da") < F.col("db")),
        )
        .groupBy("event_type", "season")
        .agg(
            F.sum(
                F.when(F.col("yb") > F.col("ya"), 1)
                .when(F.col("yb") < F.col("ya"), -1)
                .otherwise(0)
            ).alias("s")
        )
    )
    nt = (
        d.groupBy("event_type", "season", "y")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy("event_type", "season")
        .agg(
            F.count(F.lit(1)).alias("__nvals"),
            F.sum("t").alias("n"),
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            ).alias("tie_term"),
        )
    )
    per = pairs.join(nt, ["event_type", "season"]).select(
        "event_type",
        "s",
        (
            F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
            - F.col("tie_term")
        ).alias("var18"),
    )
    return (
        per.groupBy("event_type")
        .agg(
            F.sum("s").cast("long").alias("s_stat"),
            F.sum("var18").cast("long").alias("var18"),
        )
        .select(
            "event_type",
            "s_stat",
            "var18",
            (
                (F.col("s_stat") - F.signum("s_stat")).cast("double")
                / F.sqrt(F.col("var18").cast("double") / 18.0)
            ).alias("z"),
        )
    )


@register(
    "stats_isotonic_calibration",
    tags=("stats", "ml", "calibration", "isotonic"),
    oracle="""
    WITH pts AS (
      SELECT o_orderstatus AS g,
             CAST(round(o_totalprice * 100) AS BIGINT) // 5000000 AS x,
             CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
                      THEN 1 ELSE 0 END) AS BIGINT) AS num,
             CAST(COUNT(*) AS BIGINT) AS den
      FROM orders GROUP BY 1, 2),
    cum AS (
      SELECT g, x, num, den,
             SUM(num) OVER (PARTITION BY g ORDER BY x) AS cnum,
             SUM(den) OVER (PARTITION BY g ORDER BY x) AS cden
      FROM pts),
    mins AS (
      SELECT j.g, j.x,
             MIN(CAST(k.cnum - (j.cnum - j.num) AS DOUBLE)
                 / CAST(k.cden - (j.cden - j.den) AS DOUBLE)) AS m
      FROM cum j JOIN cum k ON k.g = j.g AND k.x >= j.x
      GROUP BY 1, 2),
    fit AS (
      SELECT g, x, MAX(m) OVER (PARTITION BY g ORDER BY x) AS y_fit
      FROM mins)
    SELECT p.g AS o_orderstatus, p.x,
           CAST(p.num AS DOUBLE) / CAST(p.den AS DOUBLE) AS y_raw,
           f.y_fit
    FROM pts p JOIN fit f ON f.g = p.g AND f.x = p.x
    """,
)
def stats_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (PAVA) calibration via the distributed minimax identity
    (``operators/features.isotonic_fit``): the urgent-order rate per
    $50k price band, forced monotone in price per order status — the
    monotone-probability calibration a ranking model's scores go
    through before thresholding. The O(n²) interval enumeration runs
    on the per-group price-band HISTOGRAM (same size at any SF);
    interval means come from exact integer prefix sums, with only the
    final mirrored-IEEE divisions compared. ``y_fit`` is nondecreasing
    in x by construction.
    """
    from agol_pandas_spark.operators.features import isotonic_fit

    pts = (
        Catalog(spark, sf_dir)
        .table("orders")
        .groupBy(
            F.col("o_orderstatus"),
            F.expr(
                "CAST(round(o_totalprice * 100) AS BIGINT) div 5000000"
            ).alias("x"),
        )
        .agg(
            F.sum(
                F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
            ).cast("long").alias("num"),
            F.count(F.lit(1)).cast("long").alias("den"),
        )
    )
    return isotonic_fit(pts, "o_orderstatus", "x", "num", "den")


@register(
    "stats_cramers_v_association",
    tags=("stats", "categorical", "association"),
    oracle="""
    WITH cells AS (
      SELECT o_orderpriority AS r, o_orderstatus AS c,
             CAST(COUNT(*) AS BIGINT) AS o
      FROM orders GROUP BY 1, 2),
    rm AS (SELECT r, SUM(o) AS rt FROM cells GROUP BY 1),
    cm AS (SELECT c, SUM(o) AS ct FROM cells GROUP BY 1),
    nn AS (SELECT SUM(o) AS n, COUNT(DISTINCT r) AS nr,
                  COUNT(DISTINCT c) AS nc FROM cells),
    acc AS (
      SELECT CAST(SUM(CAST(cells.o AS HUGEINT) * cells.o * nn.n * 1000000000
                      // (rm.rt * cm.ct)) AS BIGINT) AS s_ppb,
             MAX(nn.nr) AS nr, MAX(nn.nc) AS nc
      FROM cells
      JOIN rm ON rm.r = cells.r
      JOIN cm ON cm.c = cells.c
      CROSS JOIN nn)
    SELECT CAST(nr AS INTEGER) AS n_rows, CAST(nc AS INTEGER) AS n_cols,
           s_ppb - 1000000000 AS chi2_over_n_ppb,
           sqrt(CAST(s_ppb - 1000000000 AS DOUBLE) / 1000000000.0
                / CAST(least(nr - 1, nc - 1) AS DOUBLE)) AS cramers_v
    FROM acc
    """,
)
def stats_cramers_v_association(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V between order priority and order status — the
    normalized categorical-association profile a data audit reports
    (0 = independent, 1 = deterministic). χ²/n reduces to
    ``Σ o²·n/(r_row·c_col) − 1`` — evaluated per cell as a truncating
    integer division in DECIMAL/HUGEINT headroom (deterministic and
    engine-identical, no float until the final sqrt, which is
    correctly rounded everywhere). Contingency cells, marginals, and
    the scalar are all histogram-sized aggregations.
    """
    cells = (
        Catalog(spark, sf_dir)
        .table("orders")
        .groupBy(
            F.col("o_orderpriority").alias("r"),
            F.col("o_orderstatus").alias("c"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("o"))
    )
    rm = cells.groupBy(F.col("r").alias("r2")).agg(F.sum("o").alias("rt"))
    cm = cells.groupBy(F.col("c").alias("c2")).agg(F.sum("o").alias("ct"))
    nn = cells.agg(
        F.sum("o").alias("n"),
        F.countDistinct("r").alias("nr"),
        F.countDistinct("c").alias("nc"),
    )
    acc = (
        cells.join(F.broadcast(rm), cells.r == rm.r2)
        .join(F.broadcast(cm), cells.c == cm.c2)
        .join(F.broadcast(nn))
        .agg(
            F.sum(
                F.expr(
                    "CAST(o AS DECIMAL(38,0)) * o * n * 1000000000"
                    " div (rt * ct)"
                )
            ).cast("long").alias("s_ppb"),
            F.max("nr").alias("nr"),
            F.max("nc").alias("nc"),
        )
    )
    return acc.select(
        F.col("nr").cast("int").alias("n_rows"),
        F.col("nc").cast("int").alias("n_cols"),
        (F.col("s_ppb") - 1_000_000_000).alias("chi2_over_n_ppb"),
        F.sqrt(
            (F.col("s_ppb") - 1_000_000_000).cast("double")
            / 1.0e9
            / F.least(F.col("nr") - 1, F.col("nc") - 1).cast("double")
        ).alias("cramers_v"),
    )


@register(
    "stats_cohens_kappa_ppm",
    tags=("stats", "agreement", "categorical"),
    oracle="""
    WITH base AS (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS r1,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS r2
      FROM orders),
    cm AS (
      SELECT yr,
             CAST(SUM(r1 * r2) AS BIGINT) AS a,
             CAST(SUM(r1 * (1 - r2)) AS BIGINT) AS b,
             CAST(SUM((1 - r1) * r2) AS BIGINT) AS c,
             CAST(SUM((1 - r1) * (1 - r2)) AS BIGINT) AS d
      FROM base GROUP BY 1),
    k AS (
      SELECT yr, a, b, c, d, a + b + c + d AS n,
             (a + b + c + d) * (a + d)
               - ((a + b) * (a + c) + (c + d) * (b + d)) AS num,
             (a + b + c + d) * (a + b + c + d)
               - ((a + b) * (a + c) + (c + d) * (b + d)) AS den
      FROM cm)
    SELECT yr, a, b, c, d,
           CAST(CASE WHEN num < 0 THEN -1 ELSE 1 END
                * (abs(CAST(num AS HUGEINT)) * 1000000 // den)
                AS BIGINT) AS kappa_ppm
    FROM k
    """,
)
def stats_cohens_kappa_ppm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's κ inter-rater agreement per order year, exact integer
    ppm — the label-quality metric a multi-annotator pipeline gates
    on: here 'priority says urgent' vs 'status says fulfilled' as the
    two raters. κ = (p_o − p_e)/(1 − p_e) cross-multiplies to a ratio
    of exact BIGINTs from the 2×2 confusion counts; the sign is
    factored out before the truncating division so Spark's
    toward-zero ``div`` and DuckDB's floor ``//`` agree on negative
    κ. One map-side-combined aggregation over one scan.
    """
    base = Catalog(spark, sf_dir).table("orders").select(
        F.year("o_orderdate").cast("long").alias("yr"),
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
        .otherwise(0)
        .alias("r1"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("r2"),
    )
    cm = base.groupBy("yr").agg(
        F.sum(F.col("r1") * F.col("r2")).cast("long").alias("a"),
        F.sum(F.col("r1") * (1 - F.col("r2"))).cast("long").alias("b"),
        F.sum((1 - F.col("r1")) * F.col("r2")).cast("long").alias("c"),
        F.sum((1 - F.col("r1")) * (1 - F.col("r2"))).cast("long").alias("d"),
    )
    n = F.col("a") + F.col("b") + F.col("c") + F.col("d")
    pe_num = (F.col("a") + F.col("b")) * (F.col("a") + F.col("c")) + (
        F.col("c") + F.col("d")
    ) * (F.col("b") + F.col("d"))
    num = n * (F.col("a") + F.col("d")) - pe_num
    den = n * n - pe_num
    return cm.select(
        "yr", "a", "b", "c", "d",
        (
            F.when(num < 0, -1).otherwise(1)
            * F.expr(
                "abs(CAST((a+b+c+d) * (a+d)"
                " - ((a+b)*(a+c) + (c+d)*(b+d)) AS DECIMAL(38,0)))"
                " * 1000000 div ((a+b+c+d)*(a+b+c+d)"
                " - ((a+b)*(a+c) + (c+d)*(b+d)))"
            )
        ).cast("long").alias("kappa_ppm"),
    )


@register(
    "stats_theil_sen_slope",
    tags=("stats", "trend", "robust"),
    oracle="""
    WITH d AS (
      SELECT event_type,
             CAST(epoch_ms(ts) // 86400000 AS BIGINT) AS day,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY 1, 2),
    slopes AS (
      SELECT a.event_type,
             CAST(b.y - a.y AS DOUBLE) / CAST(b.day - a.day AS DOUBLE)
               AS slope,
             a.day AS di, b.day AS dj
      FROM d a JOIN d b
        ON a.event_type = b.event_type AND a.day < b.day),
    ranked AS (
      SELECT event_type, slope,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY slope, di, dj) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM slopes)
    SELECT event_type, CAST(n AS BIGINT) AS n_pairs,
           slope AS theil_sen_slope
    FROM ranked WHERE rn = (n + 1) // 2
    """,
)
def stats_theil_sen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend slope per event type: the median of all
    pairwise day-to-day slopes — the estimator a single outlier day
    cannot drag, the robust companion to the seasonal Mann-Kendall
    direction test. Pairwise slopes enumerate over the DAILY histogram
    (calendar-bounded — the self-join is the same size at any SF);
    each slope is one mirrored IEEE division of exact integers, the
    median picks rank ⌈n/2⌉ per type through a PARTITIONED window with
    a deterministic (slope, day-pair) tie order.
    """
    ev = Catalog(spark, sf_dir).table("events")
    d = ev.groupBy(
        "event_type",
        F.expr("CAST(unix_timestamp(ts) div 86400 AS BIGINT)").alias("day"),
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("y"))
    a = d.select(
        "event_type", F.col("day").alias("di"), F.col("y").alias("yi")
    )
    b = d.select(
        F.col("event_type").alias("et2"), F.col("day").alias("dj"),
        F.col("y").alias("yj"),
    )
    slopes = a.join(
        b, (a.event_type == b.et2) & (F.col("di") < F.col("dj"))
    ).select(
        "event_type",
        (
            (F.col("yj") - F.col("yi")).cast("double")
            / (F.col("dj") - F.col("di")).cast("double")
        ).alias("slope"),
        "di",
        "dj",
    )
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy("slope", "di", "dj")
    wn = Window.partitionBy("event_type")
    return (
        slopes.withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(wn))
        .filter(F.col("rn") == (F.col("n") + 1) / 2)
        .select(
            "event_type",
            F.col("n").cast("long").alias("n_pairs"),
            F.col("slope").alias("theil_sen_slope"),
        )
    )


@register(
    "join_null_safe_region_match",
    tags=("join", "null-semantics"),
    oracle="""
    WITH a AS (
      SELECT c_custkey,
             CASE WHEN c_mktsegment = 'MACHINERY' THEN NULL
                  ELSE c_nationkey END AS nk
      FROM customer),
    b AS (
      SELECT s_suppkey,
             CASE WHEN s_acctbal < 0 THEN NULL ELSE s_nationkey END AS nk
      FROM supplier)
    SELECT a.nk IS NULL AS null_key,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(a.c_custkey) AS BIGINT) AS cust_checksum,
           CAST(SUM(b.s_suppkey) AS BIGINT) AS supp_checksum
    FROM a JOIN b ON a.nk IS NOT DISTINCT FROM b.nk
    GROUP BY 1
    """,
)
def join_null_safe_region_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (``<=>`` / IS NOT DISTINCT FROM): both
    sides carve a NULL class out of their nation key, and the join
    must MATCH the NULL groups to each other instead of silently
    dropping them — the semantics an ordinary equi-join gets wrong and
    the difference silently corrupts any dedup or linkage over
    nullable keys (the r5 rank-operator ADVICE fix made the same
    point). Value-checked: pair counts and both checksums for the
    NULL-key and real-key classes.
    """
    cat = Catalog(spark, sf_dir)
    a = cat.table("customer").select(
        "c_custkey",
        F.when(F.col("c_mktsegment") == "MACHINERY", F.lit(None))
        .otherwise(F.col("c_nationkey"))
        .alias("nk_a"),
    )
    b = cat.table("supplier").select(
        "s_suppkey",
        F.when(F.col("s_acctbal") < 0, F.lit(None))
        .otherwise(F.col("s_nationkey"))
        .alias("nk_b"),
    )
    return (
        a.join(b, a.nk_a.eqNullSafe(b.nk_b))
        .groupBy(F.col("nk_a").isNull().alias("null_key"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum("c_custkey").cast("long").alias("cust_checksum"),
            F.sum("s_suppkey").cast("long").alias("supp_checksum"),
        )
    )


@register(
    "stats_hellinger_drift",
    tags=("stats", "drift", "distribution"),
    oracle="""
    WITH base AS (
      SELECT event_type,
             LEAST(CAST(floor(value / 50) AS INTEGER), 9) AS vbucket,
             CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END
               AS is_early
      FROM events),
    cells AS (
      SELECT event_type, vbucket,
             CAST(SUM(is_early) AS BIGINT) AS ne,
             CAST(SUM(1 - is_early) AS BIGINT) AS nl
      FROM base GROUP BY 1, 2),
    tot AS (SELECT CAST(SUM(ne) AS BIGINT) AS te,
                   CAST(SUM(nl) AS BIGINT) AS tl FROM cells),
    contrib AS (
      SELECT (sqrt(CAST(c.ne AS DOUBLE) / CAST(t.te AS DOUBLE))
              - sqrt(CAST(c.nl AS DOUBLE) / CAST(t.tl AS DOUBLE)))
             * (sqrt(CAST(c.ne AS DOUBLE) / CAST(t.te AS DOUBLE))
                - sqrt(CAST(c.nl AS DOUBLE) / CAST(t.tl AS DOUBLE))) AS c
      FROM cells c CROSS JOIN tot t)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST(SUM(CAST(round(c * 1000000000000000) AS BIGINT)) AS BIGINT)
             AS h2_scaled,
           sqrt(CAST(SUM(CAST(round(c * 1000000000000000) AS BIGINT))
                     AS DOUBLE) / 2000000000000000.0) AS hellinger
    FROM contrib
    """,
)
def stats_hellinger_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hellinger distance between the early-half and late-half
    (event_type × value-bucket) distributions — the f-divergence drift
    gate that needs NO logarithms, so unlike KL/JS it is exactly
    reproducible across engines: IEEE 754 requires sqrt and the four
    arithmetic ops to be correctly rounded, so every per-cell
    contribution ``(√p−√q)²`` is bit-identical in Spark and DuckDB,
    and the cross-cell sum is made order-independent by quantizing
    each contribution to an integer at 1e-15 before summing (the same
    histogram-collapse discipline as `stats_ks_drift`). One shuffle on
    the cell key; totals ride a broadcast single-row cross join.
    """
    ev = Catalog(spark, sf_dir).table("events")
    base = ev.select(
        "event_type",
        F.least(
            F.floor(F.col("value") / 50).cast("int"), F.lit(9)
        ).alias("vbucket"),
        (F.col("ts") < F.lit("2024-01-16").cast("timestamp"))
        .cast("int")
        .alias("is_early"),
    )
    cells = base.groupBy("event_type", "vbucket").agg(
        F.sum("is_early").cast("long").alias("ne"),
        F.sum(F.lit(1) - F.col("is_early")).cast("long").alias("nl"),
    )
    tot = cells.agg(
        F.sum("ne").cast("long").alias("te"),
        F.sum("nl").cast("long").alias("tl"),
    )
    d = F.sqrt(F.col("ne").cast("double") / F.col("te").cast("double")) - F.sqrt(
        F.col("nl").cast("double") / F.col("tl").cast("double")
    )
    contrib = cells.crossJoin(F.broadcast(tot)).select(
        (d * d).alias("c")
    )
    scaled = F.sum(F.round(F.col("c") * 1e15).cast("long")).cast("long")
    return contrib.agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        scaled.alias("h2_scaled"),
        F.sqrt(scaled.cast("double") / 2e15).alias("hellinger"),
    )


@register(
    "graph_degree_assortativity",
    tags=("graph", "stats"),
    oracle="""
    WITH edges AS (
      SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    dp AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS dx
           FROM edges GROUP BY 1),
    ds AS (SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS dy
           FROM edges GROUP BY 1),
    e2 AS (
      SELECT dp.dx, ds.dy
      FROM edges e JOIN dp USING (l_partkey) JOIN ds USING (l_suppkey)),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(dx) AS BIGINT) AS sx,
             CAST(SUM(dy) AS BIGINT) AS sy,
             CAST(SUM(dx * dx) AS BIGINT) AS sxx,
             CAST(SUM(dy * dy) AS BIGINT) AS syy,
             CAST(SUM(dx * dy) AS BIGINT) AS sxy
      FROM e2)
    SELECT n AS n_edges, sx, sy, sxx, syy, sxy,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
             AS assortativity
    FROM s
    """,
)
def graph_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the part–supplier bipartite graph:
    the Pearson correlation between endpoint degrees across the edge
    list (Newman 2002) — do high-degree parts attach to high-degree
    suppliers? All six sufficient statistics are EXACT BIGINT sums of
    integer degrees (no float accumulation anywhere); the correlation
    itself is one single-row scalar expression over those integers,
    so it is bit-identical across engines (casts, *, −, /, sqrt are
    all correctly rounded under IEEE 754). Degrees come from two
    grouped counts on the deduplicated edge list; the join-back
    shuffles on each endpoint key only.
    """
    li = Catalog(spark, sf_dir).table("lineitem")
    edges = li.select("l_partkey", "l_suppkey").distinct()
    dp = edges.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("dx")
    )
    ds = edges.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).cast("long").alias("dy")
    )
    e2 = edges.join(dp, "l_partkey").join(ds, "l_suppkey")
    s = e2.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("dx").cast("long").alias("sx"),
        F.sum("dy").cast("long").alias("sy"),
        F.sum(F.col("dx") * F.col("dx")).cast("long").alias("sxx"),
        F.sum(F.col("dy") * F.col("dy")).cast("long").alias("syy"),
        F.sum(F.col("dx") * F.col("dy")).cast("long").alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sxd, syd = F.col("sx").cast("double"), F.col("sy").cast("double")
    return s.select(
        F.col("n").alias("n_edges"),
        "sx", "sy", "sxx", "syy", "sxy",
        (
            (nd * F.col("sxy").cast("double") - sxd * syd)
            / (
                F.sqrt(nd * F.col("sxx").cast("double") - sxd * sxd)
                * F.sqrt(nd * F.col("syy").cast("double") - syd * syd)
            )
        ).alias("assortativity"),
    )


@register(
    "stats_levene_brown_forsythe",
    tags=("stats", "hypothesis-test"),
    oracle="""
    WITH x AS (
      SELECT event_type, event_id,
             CAST(round(value * 100) AS BIGINT) AS xq
      FROM events),
    ranked AS (
      SELECT event_type, xq,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY xq, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM x),
    med AS (
      SELECT event_type, xq AS m FROM ranked WHERE rn = (n + 1) // 2),
    z AS (
      SELECT x.event_type, abs(x.xq - med.m) AS z
      FROM x JOIN med USING (event_type)),
    g AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS ni,
             CAST(SUM(z) AS BIGINT) AS ti,
             CAST(SUM(z * z) AS BIGINT) AS qi
      FROM z GROUP BY 1),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(ni) AS BIGINT) AS n,
             CAST(SUM(ti) AS BIGINT) AS t,
             CAST(SUM(qi) AS BIGINT) AS q,
             CAST(SUM(CAST(round(CAST(ti AS DOUBLE) * CAST(ti AS DOUBLE)
                                 / CAST(ni AS DOUBLE) * 1000)
                           AS BIGINT)) AS BIGINT) AS b_milli
      FROM g)
    SELECT k, n, t, q, b_milli,
           (CAST(n - k AS DOUBLE) / CAST(k - 1 AS DOUBLE))
           * (CAST(b_milli AS DOUBLE) / 1000.0
              - CAST(t AS DOUBLE) * CAST(t AS DOUBLE) / CAST(n AS DOUBLE))
           / (CAST(q AS DOUBLE) - CAST(b_milli AS DOUBLE) / 1000.0)
             AS w_stat
    FROM s
    """,
)
def stats_levene_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown–Forsythe variance-homogeneity test across event types:
    Levene's W computed on absolute deviations from the GROUP MEDIAN
    (the robust variant). The pipeline is exact end-to-end: values
    quantize to integer cents, the lower median comes from a
    PARTITIONED rank window with a deterministic (xq, event_id) tie
    order, the deviations and both sums-of-squares are exact BIGINTs,
    and the only rounding is the per-group ``Tᵢ²/nᵢ`` term quantized
    to 1e-3 before its (order-independent) integer sum. W itself is a
    single-row scalar over those integers — bit-identical across
    engines. Two shuffles: the rank window and the group aggregate;
    the k-row median table broadcasts back.
    """
    from pyspark.sql import Window

    ev = Catalog(spark, sf_dir).table("events")
    x = ev.select(
        "event_type",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("xq"),
    )
    w = Window.partitionBy("event_type").orderBy("xq", "event_id")
    wn = Window.partitionBy("event_type")
    med = (
        x.withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(wn))
        .filter(F.col("rn") == F.floor((F.col("n") + 1) / 2))
        .select("event_type", F.col("xq").alias("m"))
    )
    z = x.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("xq") - F.col("m")).alias("z")
    )
    g = z.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("ni"),
        F.sum("z").cast("long").alias("ti"),
        F.sum(F.col("z") * F.col("z")).cast("long").alias("qi"),
    )
    b_term = F.round(
        F.col("ti").cast("double")
        * F.col("ti").cast("double")
        / F.col("ni").cast("double")
        * 1000
    ).cast("long")
    s = g.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("ni").cast("long").alias("n"),
        F.sum("ti").cast("long").alias("t"),
        F.sum("qi").cast("long").alias("q"),
        F.sum(b_term).cast("long").alias("b_milli"),
    )
    kd = F.col("k").cast("double")
    nd = F.col("n").cast("double")
    td = F.col("t").cast("double")
    qd = F.col("q").cast("double")
    bd = F.col("b_milli").cast("double") / 1000.0
    return s.select(
        "k", "n", "t", "q", "b_milli",
        (
            ((nd - kd) / (kd - 1))
            * (bd - td * td / nd)
            / (qd - bd)
        ).alias("w_stat"),
    )


@register(
    "feature_loo_target_encoding",
    tags=("feature", "ml-prep"),
    oracle="""
    WITH o AS (
      SELECT o_orderkey, o_orderpriority,
             CAST(round(o_totalprice * 100) AS BIGINT) AS yc
      FROM orders),
    enc AS (
      SELECT o_orderkey, o_orderpriority, yc,
             SUM(yc) OVER (PARTITION BY o_orderpriority) AS s,
             COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM o)
    SELECT o_orderkey, o_orderpriority, yc,
           CAST(s - yc AS DOUBLE) / CAST(n - 1 AS DOUBLE)
             AS loo_price_cents
    FROM enc
    """,
)
def feature_loo_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of order priority against order
    value — the standard leakage-safe categorical encoder for model
    training: each row's code is the mean target of its OWN group
    with the row itself excluded, ``(Σy − y)/(n−1)``. The group sum
    and count ride one partitioned window (one shuffle on the
    category key); the target quantizes to integer cents so the sums
    are exact, and each row's encoding is a single correctly-rounded
    integer division — bit-identical across engines. At 100 TB this
    is a map-side window per category partition; no per-row Python.
    """
    from pyspark.sql import Window

    o = Catalog(spark, sf_dir).table("orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("yc"),
    )
    w = Window.partitionBy("o_orderpriority")
    return (
        o.withColumn("s", F.sum("yc").over(w))
        .withColumn("n", F.count(F.lit(1)).over(w))
        .select(
            "o_orderkey",
            "o_orderpriority",
            "yc",
            (
                (F.col("s") - F.col("yc")).cast("double")
                / (F.col("n") - 1).cast("double")
            ).alias("loo_price_cents"),
        )
    )


@register(
    "sketch_heavy_hitters_mg",
    tags=("sketch", "frequency"),
    oracle="""
    WITH cats AS (
      SELECT event_type || '|' ||
             CAST(LEAST(CAST(floor(value / 50) AS INTEGER), 9) AS VARCHAR)
               AS cat
      FROM events),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM cats)
    SELECT cat, CAST(COUNT(*) AS BIGINT) AS freq
    FROM cats CROSS JOIN tot
    GROUP BY cat, tot.n
    HAVING COUNT(*) * 64 > tot.n
    """,
)
def sketch_heavy_hitters_mg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters (frequency > N/64) via the two-pass
    Misra–Gries scheme: pass 1 builds bounded per-partition MG
    summaries (≤ 64 counters each, `operators/sketches.py`) whose
    union PROVABLY contains every global heavy hitter; pass 2
    re-counts ONLY the candidates through a broadcast semi-join and
    applies the exact integer threshold ``freq·64 > N``. The
    full-cardinality groupBy never happens — at 100 TB the shuffle
    carries candidate rows only (≤ 64·P), which is what makes top-item
    queries over unbounded-cardinality keys feasible. Output is the
    exact answer (deterministic), not an estimate.
    """
    from agol_pandas_spark.operators.sketches import misra_gries_candidates

    ev = Catalog(spark, sf_dir).table("events")
    cats = ev.select(
        F.concat(
            F.col("event_type"),
            F.lit("|"),
            F.least(
                F.floor(F.col("value") / 50).cast("int"), F.lit(9)
            ).cast("string"),
        ).alias("cat")
    )
    cands = misra_gries_candidates(cats, "cat", 64)
    tot = cats.agg(F.count(F.lit(1)).cast("long").alias("n"))
    return (
        cats.join(F.broadcast(cands), "cat", "left_semi")
        .groupBy("cat")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
        .crossJoin(F.broadcast(tot))
        .filter(F.col("freq") * 64 > F.col("n"))
        .select("cat", "freq")
    )


@register(
    "join_allen_interval_relations",
    tags=("join", "temporal"),
    oracle="""
    WITH iv AS (
      SELECT user_id, event_id,
             epoch_us(ts) AS s,
             epoch_us(ts) + CAST(round(value * 1000) AS BIGINT) * 1000
               AS e
      FROM events),
    pairs AS (
      SELECT s AS s1, e AS e1,
             LEAD(s) OVER w AS s2, LEAD(e) OVER w AS e2
      FROM iv
      WINDOW w AS (PARTITION BY user_id ORDER BY s, event_id)),
    rel AS (
      SELECT CASE
               WHEN s1 = s2 AND e1 = e2 THEN 'equals'
               WHEN s1 = s2 AND e1 < e2 THEN 'starts'
               WHEN s1 = s2 THEN 'started_by'
               WHEN e1 < s2 THEN 'before'
               WHEN e1 = s2 THEN 'meets'
               WHEN e1 < e2 THEN 'overlaps'
               WHEN e1 = e2 THEN 'finished_by'
               ELSE 'contains'
             END AS relation,
             s2 - s1 AS gap_us
      FROM pairs WHERE s2 IS NOT NULL)
    SELECT relation, CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(gap_us) AS BIGINT) AS start_gap_us_sum
    FROM rel GROUP BY relation
    """,
)
def join_allen_interval_relations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Allen's interval-algebra classification over consecutive
    per-user activity intervals ``[ts, ts + value·1ms]``: each
    adjacent pair (ordered by start, earlier interval first) lands in
    exactly one of the eight start-ordered Allen relations (before /
    meets / overlaps / finished_by / contains / starts / equals /
    started_by — the other five are their inverses and cannot occur
    when the first interval starts no later). Endpoints are exact
    INTEGER microseconds so every comparison is deterministic; the
    pairing is one partitioned LEAD window (one shuffle on user_id) —
    the interval-join pattern that needs no range join because
    adjacency, not overlap search, defines the pairs. Counts carry a
    start-gap checksum so the oracle verifies values, not just sizes.
    """
    from pyspark.sql import Window

    ev = Catalog(spark, sf_dir).table("events")
    iv = ev.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts")).alias("s"),
        (
            F.unix_micros(F.col("ts"))
            + F.round(F.col("value") * 1000).cast("long") * 1000
        ).alias("e"),
    )
    w = Window.partitionBy("user_id").orderBy("s", "event_id")
    pairs = iv.select(
        F.col("s").alias("s1"),
        F.col("e").alias("e1"),
        F.lead("s").over(w).alias("s2"),
        F.lead("e").over(w).alias("e2"),
    ).filter(F.col("s2").isNotNull())
    relation = (
        F.when((F.col("s1") == F.col("s2")) & (F.col("e1") == F.col("e2")), "equals")
        .when((F.col("s1") == F.col("s2")) & (F.col("e1") < F.col("e2")), "starts")
        .when(F.col("s1") == F.col("s2"), "started_by")
        .when(F.col("e1") < F.col("s2"), "before")
        .when(F.col("e1") == F.col("s2"), "meets")
        .when(F.col("e1") < F.col("e2"), "overlaps")
        .when(F.col("e1") == F.col("e2"), "finished_by")
        .otherwise("contains")
    )
    return (
        pairs.select(
            relation.alias("relation"),
            (F.col("s2") - F.col("s1")).alias("gap_us"),
        )
        .groupBy("relation")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum("gap_us").cast("long").alias("start_gap_us_sum"),
        )
    )


@register(
    "stats_skewness_kurtosis_grouped",
    tags=("stats", "moments"),
    oracle="""
    WITH x AS (
      SELECT event_type, CAST(round(value) AS BIGINT) AS xq FROM events),
    m AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(xq) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS mi
      FROM x GROUP BY 1),
    d AS (
      SELECT x.event_type, m.n, m.mi, x.xq - m.mi AS d
      FROM x JOIN m USING (event_type)),
    s AS (
      SELECT event_type, n, mi,
             CAST(SUM(d) AS BIGINT) AS s1,
             CAST(SUM(d * d) AS BIGINT) AS s2,
             CAST(SUM(d * d * d) AS BIGINT) AS s3,
             CAST(SUM(d * d * d * d) AS BIGINT) AS s4
      FROM d GROUP BY 1, 2, 3),
    mom AS (
      SELECT event_type, n, mi, s1, s2, s3, s4,
             CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS dl,
             CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS r2,
             CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS r3,
             CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS r4
      FROM s)
    SELECT event_type, n,
           CAST(mi AS DOUBLE) + dl AS mean,
           r2 - dl * dl AS variance,
           (r3 - 3 * dl * r2 + 2 * dl * dl * dl)
             / (sqrt(r2 - dl * dl) * (r2 - dl * dl)) AS skewness,
           (r4 - 4 * dl * r3 + 6 * dl * dl * r2 - 3 * dl * dl * dl * dl)
             / ((r2 - dl * dl) * (r2 - dl * dl)) - 3 AS excess_kurtosis
    FROM mom
    """,
)
def stats_skewness_kurtosis_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact grouped skewness and excess kurtosis via two-pass centered
    integer power sums: pass 1 takes each group's INTEGER floor-mean,
    pass 2 accumulates Σd..Σd⁴ of the integer deviations — all BIGINT
    exact (|d| ≤ ~600 here keeps Σd⁴ < 2^53 through sf10; the decimal128
    sum path of `agg_decimal128_exact_sum` is the drop-in for beyond).
    Central moments about the TRUE mean come from the standard shift
    identities (μ = m + δ, δ = Σd/n), so the float work is a handful of
    correctly-rounded scalar ops per group — bit-identical across
    engines, unlike streaming float moment updates which depend on
    partitioning. Two shuffles (the two grouped sums); the k-row mean
    table broadcasts back.
    """
    ev = Catalog(spark, sf_dir).table("events")
    x = ev.select(
        "event_type", F.round(F.col("value")).cast("long").alias("xq")
    )
    m = x.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.floor(F.sum("xq") / F.count(F.lit(1))).cast("long").alias("mi"),
    )
    d = x.join(F.broadcast(m), "event_type").select(
        "event_type", "n", "mi", (F.col("xq") - F.col("mi")).alias("d")
    )
    s = d.groupBy("event_type", "n", "mi").agg(
        F.sum("d").cast("long").alias("s1"),
        F.sum(F.col("d") * F.col("d")).cast("long").alias("s2"),
        F.sum(F.col("d") * F.col("d") * F.col("d")).cast("long").alias("s3"),
        F.sum(F.col("d") * F.col("d") * F.col("d") * F.col("d"))
        .cast("long")
        .alias("s4"),
    )
    nd = F.col("n").cast("double")
    dl = F.col("s1").cast("double") / nd
    r2 = F.col("s2").cast("double") / nd
    r3 = F.col("s3").cast("double") / nd
    r4 = F.col("s4").cast("double") / nd
    var = r2 - dl * dl
    return s.select(
        "event_type",
        "n",
        (F.col("mi").cast("double") + dl).alias("mean"),
        var.alias("variance"),
        (
            (r3 - F.lit(3) * dl * r2 + F.lit(2) * dl * dl * dl)
            / (F.sqrt(var) * var)
        ).alias("skewness"),
        (
            (
                r4
                - F.lit(4) * dl * r3
                + F.lit(6) * dl * dl * r2
                - F.lit(3) * dl * dl * dl * dl
            )
            / (var * var)
            - F.lit(3)
        ).alias("excess_kurtosis"),
    )


@register(
    "stats_wilson_interval",
    tags=("stats", "confidence"),
    oracle="""
    WITH g AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN value > 100 THEN 1 ELSE 0 END) AS BIGINT)
               AS k
      FROM events GROUP BY 1),
    w AS (
      SELECT event_type, n, k,
             CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS p,
             CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE)
               / CAST(n AS DOUBLE) AS zz
      FROM g)
    SELECT event_type, n, k, p AS p_hat,
           (p + zz / 2 - CAST(1.96 AS DOUBLE)
              * sqrt(p * (1 - p) / CAST(n AS DOUBLE)
                     + zz / (4 * CAST(n AS DOUBLE))))
             / (1 + zz) AS wilson_lo,
           (p + zz / 2 + CAST(1.96 AS DOUBLE)
              * sqrt(p * (1 - p) / CAST(n AS DOUBLE)
                     + zz / (4 * CAST(n AS DOUBLE))))
             / (1 + zz) AS wilson_hi
    FROM w
    """,
)
def stats_wilson_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson 95% score interval for the per-type proportion of
    high-value events — the binomial CI that behaves at the extremes
    where the normal approximation fails (the right tool for gate
    pass-rates and dedup hit-rates). Inputs are exact integer (k, n)
    from one grouped aggregate; the interval itself needs only the
    four arithmetic ops and sqrt — ALL correctly rounded under IEEE
    754 — so unlike t/log-based intervals it reproduces bit-identically
    across engines with no quantization step. One portability trap,
    hit and fixed here: a bare ``1.96`` literal is DECIMAL in DuckDB,
    so ``1.96 * 1.96`` folds to exactly 3.8416 instead of the double
    product — the oracle casts every float literal to DOUBLE.
    """
    ev = Catalog(spark, sf_dir).table("events")
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("value") > 100, 1).otherwise(0))
        .cast("long")
        .alias("k"),
    )
    nd = F.col("n").cast("double")
    p = F.col("k").cast("double") / nd
    zz = F.lit(1.96) * F.lit(1.96) / nd
    rad = F.lit(1.96) * F.sqrt(
        p * (F.lit(1) - p) / nd + zz / (F.lit(4) * nd)
    )
    return g.select(
        "event_type",
        "n",
        "k",
        p.alias("p_hat"),
        ((p + zz / 2 - rad) / (F.lit(1) + zz)).alias("wilson_lo"),
        ((p + zz / 2 + rad) / (F.lit(1) + zz)).alias("wilson_hi"),
    )


@register(
    "privacy_l_diversity_gate",
    tags=("privacy", "governance"),
    oracle="""
    WITH s AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band
      FROM customer),
    g AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(DISTINCT bal_band) AS BIGINT) AS l_distinct
      FROM s GROUP BY 1, 2)
    SELECT c_nationkey, c_mktsegment, n, l_distinct
    FROM g WHERE l_distinct < 3
    """,
)
def privacy_l_diversity_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (l = 3) complementing the k-anonymity and
    t-closeness gates: for each quasi-identifier group
    (nation × market segment), the SENSITIVE attribute (account-balance
    band) must take at least l distinct values — k-anonymity alone
    allows a group of 50 records that all share one salary band, which
    re-identifies the attribute if not the row. Emits the violating
    groups for suppression/generalization. One grouped
    COUNT(DISTINCT) — Spark plans it as the standard two-phase expand
    + partial-agg, no row explosion leaves the executor.
    """
    cust = Catalog(spark, sf_dir).table("customer")
    s = cust.select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_band"),
    )
    return (
        s.groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.countDistinct("bal_band").cast("long").alias("l_distinct"),
        )
        .filter(F.col("l_distinct") < 3)
    )


@register(
    "window_running_distinct_users",
    tags=("window", "distinct"),
    oracle="""
    WITH firsts AS (
      SELECT event_type, user_id,
             MIN(CAST(epoch_ms(ts) // 86400000 AS BIGINT)) AS first_day
      FROM events GROUP BY 1, 2),
    daily AS (
      SELECT event_type, first_day AS day,
             CAST(COUNT(*) AS BIGINT) AS new_users
      FROM firsts GROUP BY 1, 2)
    SELECT event_type, day, new_users,
           CAST(SUM(new_users) OVER (PARTITION BY event_type
                                     ORDER BY day) AS BIGINT) AS cum_users
    FROM daily
    """,
)
def window_running_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running DISTINCT user count per event type by day — the DAU→CAU
    curve. ``COUNT(DISTINCT) OVER`` doesn't exist in Spark (or most
    engines) for good reason: naively it re-scans every prefix. The
    scalable identity: a user contributes exactly once, on their FIRST
    day — so one grouped MIN gives first-touch days, a count per day
    gives the new-user series, and a plain partitioned running SUM
    gives the cumulative distinct count. Two key-shuffles and a
    per-type window over ≤31 rows, vs the quadratic prefix re-scan.
    """
    from pyspark.sql import Window

    ev = Catalog(spark, sf_dir).table("events")
    firsts = ev.groupBy("event_type", "user_id").agg(
        F.min(F.expr("CAST(unix_timestamp(ts) div 86400 AS BIGINT)")).alias(
            "first_day"
        )
    )
    daily = firsts.groupBy(
        "event_type", F.col("first_day").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("new_users"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return daily.select(
        "event_type",
        "day",
        "new_users",
        F.sum("new_users").over(w).cast("long").alias("cum_users"),
    )


@register(
    "stats_fano_burstiness",
    tags=("stats", "temporal"),
    oracle="""
    WITH hours AS (
      SELECT event_type,
             CAST(epoch_ms(ts) // 3600000 AS BIGINT) AS hr
      FROM events),
    span AS (
      SELECT MAX(hr) - MIN(hr) + 1 AS h FROM hours),
    buckets AS (
      SELECT event_type, hr, CAST(COUNT(*) AS BIGINT) AS c
      FROM hours GROUP BY 1, 2),
    g AS (
      SELECT event_type,
             CAST(SUM(c) AS BIGINT) AS n,
             CAST(SUM(c * c) AS BIGINT) AS ss,
             CAST(COUNT(*) AS BIGINT) AS nonzero_hours
      FROM buckets GROUP BY 1)
    SELECT event_type, n, nonzero_hours, span.h AS span_hours,
           (CAST(span.h AS DOUBLE) * CAST(ss AS DOUBLE)
            - CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
           / (CAST(span.h AS DOUBLE) * CAST(n AS DOUBLE)) AS fano
    FROM g CROSS JOIN span
    """,
)
def stats_fano_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fano factor (index of dispersion, variance/mean of per-hour
    event counts) per event type — the burstiness gate: ≈1 is Poisson
    arrival, ≫1 means clumping (bot bursts, replays, thundering
    herds). Zero-count hours inside the observed span are handled
    WITHOUT materializing a calendar spine: they contribute nothing to
    Σc or Σc², so Fano = (H·Σc² − N²)/(H·N) needs only the exact
    integer bucket sums plus the span H — one grouped count, one tiny
    aggregate, a broadcast single-row cross join, and a final
    correctly-rounded scalar. No window, no gap-fill join.
    """
    ev = Catalog(spark, sf_dir).table("events")
    hours = ev.select(
        "event_type",
        F.expr("CAST(unix_timestamp(ts) div 3600 AS BIGINT)").alias("hr"),
    )
    span = hours.agg(
        (F.max("hr") - F.min("hr") + 1).cast("long").alias("h")
    )
    buckets = hours.groupBy("event_type", "hr").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    g = buckets.groupBy("event_type").agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("ss"),
        F.count(F.lit(1)).cast("long").alias("nonzero_hours"),
    )
    hd = F.col("h").cast("double")
    nd = F.col("n").cast("double")
    return g.crossJoin(F.broadcast(span)).select(
        "event_type",
        "n",
        "nonzero_hours",
        F.col("h").alias("span_hours"),
        (
            (hd * F.col("ss").cast("double") - nd * nd) / (hd * nd)
        ).alias("fano"),
    )


@register(
    "stats_lincoln_petersen_estimate",
    tags=("stats", "capture-recapture"),
    oracle="""
    WITH marked AS (
      SELECT DISTINCT user_id FROM events
      WHERE ts < TIMESTAMP '2024-01-16'),
    recapture AS (
      SELECT DISTINCT user_id FROM events
      WHERE ts >= TIMESTAMP '2024-01-16'),
    s AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM marked) AS m,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM recapture) AS c,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM marked
              WHERE user_id IN (SELECT user_id FROM recapture)) AS r,
             (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT)
              FROM events) AS true_total)
    SELECT m, c, r, true_total,
           CAST(m AS DOUBLE) * CAST(c AS DOUBLE) / CAST(r AS DOUBLE)
             AS n_hat
    FROM s
    """,
)
def stats_lincoln_petersen_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capture–recapture (Lincoln–Petersen) population estimate: users
    'marked' in the first half of the window, 'recaptured' in the
    second; N̂ = M·C/R estimates the TRUE population you never fully
    observe — the estimator for questions like 'how many distinct
    entities exist across partial crawls' or 'how many dups did both
    dedup passes miss'. Three distinct-sets (two semi-joins on the
    hashed key), exact BIGINT inputs, one correctly-rounded scalar;
    the true distinct count rides along so the estimate is checkable.
    """
    ev = Catalog(spark, sf_dir).table("events")
    cut = F.lit("2024-01-16").cast("timestamp")
    marked = ev.filter(F.col("ts") < cut).select("user_id").distinct()
    recap = ev.filter(F.col("ts") >= cut).select("user_id").distinct()
    both = marked.join(recap, "user_id", "left_semi")
    m = marked.agg(F.count(F.lit(1)).cast("long").alias("m"))
    c = recap.agg(F.count(F.lit(1)).cast("long").alias("c"))
    r = both.agg(F.count(F.lit(1)).cast("long").alias("r"))
    t = ev.agg(F.countDistinct("user_id").cast("long").alias("true_total"))
    s = (
        m.crossJoin(F.broadcast(c))
        .crossJoin(F.broadcast(r))
        .crossJoin(F.broadcast(t))
    )
    return s.select(
        "m", "c", "r", "true_total",
        (
            F.col("m").cast("double")
            * F.col("c").cast("double")
            / F.col("r").cast("double")
        ).alias("n_hat"),
    )


@register(
    "stats_runs_test_randomness",
    tags=("stats", "hypothesis-test", "sequence"),
    oracle="""
    WITH x AS (
      SELECT event_type, event_id, ts,
             CAST(round(value * 100) AS BIGINT) AS xq
      FROM events),
    ranked AS (
      SELECT event_type, xq,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY xq, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM x),
    med AS (
      SELECT event_type, xq AS m FROM ranked WHERE rn = (n + 1) // 2),
    signs AS (
      SELECT x.event_type,
             CASE WHEN x.xq > med.m THEN 1 ELSE 0 END AS sgn,
             x.ts, x.event_id
      FROM x JOIN med USING (event_type)
      WHERE x.xq <> med.m),
    steps AS (
      SELECT event_type, sgn,
             LAG(sgn) OVER (PARTITION BY event_type
                            ORDER BY ts, event_id) AS prev
      FROM signs),
    g AS (
      SELECT event_type,
             CAST(SUM(sgn) AS BIGINT) AS n1,
             CAST(SUM(1 - sgn) AS BIGINT) AS n2,
             CAST(1 + SUM(CASE WHEN prev IS NOT NULL AND sgn <> prev
                               THEN 1 ELSE 0 END) AS BIGINT) AS runs
      FROM steps GROUP BY 1)
    SELECT event_type, n1, n2, runs,
           (CAST(runs AS DOUBLE)
            - (2 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
               / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) + 1))
           / sqrt(2 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                  * (2 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                     - CAST(n1 AS DOUBLE) - CAST(n2 AS DOUBLE))
                  / ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
                     * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
                     * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 1)))
             AS z_stat
    FROM g
    """,
)
def stats_runs_test_randomness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald–Wolfowitz runs test per event type: is the time-ordered
    above/below-median sign sequence random, or does it clump (drifting
    sensors, feedback loops, replayed traffic)? Median ties drop (the
    standard treatment), runs count via one partitioned LAG, and the
    normal-approximation z comes from exact integer (n1, n2, R) in a
    single correctly-rounded scalar — deterministic across engines.
    Two partitioned windows (median rank, lag) — both shuffle once on
    event_type.
    """
    from pyspark.sql import Window

    ev = Catalog(spark, sf_dir).table("events")
    x = ev.select(
        "event_type", "event_id", "ts",
        F.round(F.col("value") * 100).cast("long").alias("xq"),
    )
    wr = Window.partitionBy("event_type").orderBy("xq", "event_id")
    wn = Window.partitionBy("event_type")
    med = (
        x.withColumn("rn", F.row_number().over(wr))
        .withColumn("n", F.count(F.lit(1)).over(wn))
        .filter(F.col("rn") == F.floor((F.col("n") + 1) / 2))
        .select("event_type", F.col("xq").alias("m"))
    )
    signs = (
        x.join(F.broadcast(med), "event_type")
        .filter(F.col("xq") != F.col("m"))
        .select(
            "event_type",
            (F.col("xq") > F.col("m")).cast("int").alias("sgn"),
            "ts", "event_id",
        )
    )
    wl = Window.partitionBy("event_type").orderBy("ts", "event_id")
    steps = signs.withColumn("prev", F.lag("sgn").over(wl))
    g = steps.groupBy("event_type").agg(
        F.sum("sgn").cast("long").alias("n1"),
        F.sum(F.lit(1) - F.col("sgn")).cast("long").alias("n2"),
        (
            F.lit(1)
            + F.sum(
                F.when(
                    F.col("prev").isNotNull()
                    & (F.col("sgn") != F.col("prev")),
                    1,
                ).otherwise(0)
            )
        ).cast("long").alias("runs"),
    )
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    nd = n1d + n2d
    two_n1n2 = F.lit(2) * n1d * n2d
    mu = two_n1n2 / nd + F.lit(1)
    var = two_n1n2 * (two_n1n2 - n1d - n2d) / (nd * nd * (nd - F.lit(1)))
    return g.select(
        "event_type", "n1", "n2", "runs",
        ((F.col("runs").cast("double") - mu) / F.sqrt(var)).alias("z_stat"),
    )


@register(
    "stats_seasonal_additive_decompose",
    tags=("stats", "timeseries", "decomposition"),
    oracle="""
    WITH daily AS (
      SELECT event_type,
             CAST(epoch_ms(ts) // 86400000 AS BIGINT) AS day,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS xq
      FROM events GROUP BY 1, 2),
    tr AS (
      SELECT event_type, day, xq,
             SUM(xq) OVER w AS wsum,
             COUNT(*) OVER w AS wn
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
    det AS (
      SELECT event_type, day % 7 AS weekday,
             CAST(round((CAST(xq AS DOUBLE)
                         - CAST(wsum AS DOUBLE) / 7.0) * 1000)
                  AS BIGINT) AS dq
      FROM tr WHERE wn = 7)
    SELECT event_type, weekday,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(dq) AS BIGINT) AS detrended_milli_sum,
           CAST(SUM(dq) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             AS seasonal_milli
    FROM det GROUP BY 1, 2
    """,
)
def stats_seasonal_additive_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition of the daily revenue
    series per event type: trend = centered 7-day moving average
    (PARTITIONED window, edges with incomplete frames excluded by the
    in-frame count), seasonal = weekly profile of the detrended
    series. The detrended values quantize to integer milli-cents
    BEFORE the per-weekday mean, so the only cross-row float operation
    anywhere is replaced by an exact BIGINT sum — the same
    histogram-collapse discipline every stats_* query here rides.
    Calendar-bounded per-type series (≤31 rows) make the window cheap
    at any SF; the shuffle is the daily groupBy.
    """
    from pyspark.sql import Window

    ev = Catalog(spark, sf_dir).table("events")
    daily = ev.groupBy(
        "event_type",
        F.expr("CAST(unix_timestamp(ts) div 86400 AS BIGINT)").alias("day"),
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("xq"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-3, 3)
    )
    tr = daily.select(
        "event_type", "day", "xq",
        F.sum("xq").over(w).alias("wsum"),
        F.count(F.lit(1)).over(w).alias("wn"),
    ).filter(F.col("wn") == 7)
    det = tr.select(
        "event_type",
        (F.col("day") % 7).alias("weekday"),
        F.round(
            (
                F.col("xq").cast("double")
                - F.col("wsum").cast("double") / 7.0
            )
            * 1000
        ).cast("long").alias("dq"),
    )
    return det.groupBy("event_type", "weekday").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("dq").cast("long").alias("detrended_milli_sum"),
        (
            F.sum("dq").cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("seasonal_milli"),
    )


@register(
    "feature_linear_scoring_ppm",
    tags=("feature", "inference", "ml-prep"),
    oracle="""
    WITH weights(feature, w) AS (
      VALUES ('n_tokens', 7), ('n_chars', -2), ('bias', 100)),
    feats AS (
      SELECT doc_id, 'n_tokens' AS feature,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS x
      FROM documents
      UNION ALL
      SELECT doc_id, 'n_chars', CAST(length(text) AS BIGINT)
      FROM documents
      UNION ALL
      SELECT doc_id, 'bias', CAST(1 AS BIGINT) FROM documents),
    z AS (
      SELECT f.doc_id, CAST(SUM(f.x * w.w) AS BIGINT) AS z
      FROM feats f JOIN weights w USING (feature)
      GROUP BY 1)
    SELECT doc_id, z,
           LEAST(GREATEST(CAST(floor(CAST(z * 1000000 AS DOUBLE) / 4096)
                               AS BIGINT) + 500000, 0), 1000000)
             AS score_ppm
    FROM z
    """,
)
def feature_linear_scoring_ppm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch inference of a linear scoring model over document
    features — the quality-classifier application pattern: a broadcast
    (feature, weight) table joins the unpivoted feature rows, the
    logit is an exact integer dot product, and the activation is the
    HARD sigmoid ``clamp(z/4096 + ½)`` in pure integer ppm — the
    piecewise-linear activation that, unlike exp-based sigmoid, is
    exactly reproducible on every engine and never needs a float
    accumulation (one portability trap fixed here: integer ``//`` is
    TRUNCATION toward zero in DuckDB but ``floor`` in Spark — they
    disagree on negative logits, so both sides spell out true floor). At 100 TB this is one map-side join (weights
    broadcast) + a per-doc grouped sum; swapping in trained weights is
    a data change, not a code change.
    """
    docs = Catalog(spark, sf_dir).table("documents")
    weights = docs.sparkSession.createDataFrame(
        [("n_tokens", 7), ("n_chars", -2), ("bias", 100)],
        "feature string, w long",
    )
    feats = (
        docs.select(
            "doc_id",
            F.lit("n_tokens").alias("feature"),
            F.size(F.split(F.col("text"), " ")).cast("long").alias("x"),
        )
        .unionByName(
            docs.select(
                "doc_id",
                F.lit("n_chars").alias("feature"),
                F.length("text").cast("long").alias("x"),
            )
        )
        .unionByName(
            docs.select(
                "doc_id",
                F.lit("bias").alias("feature"),
                F.lit(1).cast("long").alias("x"),
            )
        )
    )
    z = (
        feats.join(F.broadcast(weights), "feature")
        .groupBy("doc_id")
        .agg(F.sum(F.col("x") * F.col("w")).cast("long").alias("z"))
    )
    return z.select(
        "doc_id",
        "z",
        F.least(
            F.greatest(
                F.floor((F.col("z") * 1000000) / 4096) + 500000, F.lit(0)
            ),
            F.lit(1000000),
        ).cast("long").alias("score_ppm"),
    )


@register(
    "stats_kruskal_wallis_h",
    tags=("stats", "hypothesis-test", "ranks"),
    oracle="""
    WITH x AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS xq
      FROM events),
    pooled AS (
      SELECT xq, CAST(COUNT(*) AS BIGINT) AS c FROM x GROUP BY 1),
    ranked AS (
      SELECT xq, c,
             CAST(1 + COALESCE(SUM(c) OVER (ORDER BY xq
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS r
      FROM pooled),
    per_type AS (
      SELECT event_type, xq, CAST(COUNT(*) AS BIGINT) AS ci
      FROM x GROUP BY 1, 2),
    sums AS (
      SELECT p.event_type,
             CAST(SUM(p.ci) AS BIGINT) AS ni,
             CAST(SUM(p.ci * (2 * rk.r + rk.c - 1)) AS BIGINT) AS s2
      FROM per_type p JOIN ranked rk USING (xq)
      GROUP BY 1),
    gtot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(ni) AS BIGINT) AS n,
             CAST(SUM(CAST(round(CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)
                                 / (4 * CAST(ni AS DOUBLE)) * 1000)
                           AS BIGINT)) AS BIGINT) AS a_milli,
             (SELECT CAST(SUM(c * c * c - c) AS BIGINT) FROM pooled)
               AS ties_cubed
      FROM sums)
    SELECT k, n, a_milli, ties_cubed,
           (12.0 * (CAST(a_milli AS DOUBLE) / 1000.0)
              / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1))
            - 3 * (CAST(n AS DOUBLE) + 1))
           / (1 - CAST(ties_cubed AS DOUBLE)
                  / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                     * CAST(n AS DOUBLE) - CAST(n AS DOUBLE)))
             AS h_stat
    FROM gtot
    """,
)
def stats_kruskal_wallis_h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal–Wallis H (rank-based one-way ANOVA) across event types,
    WITH midrank tie handling and the tie-correction divisor — and
    with the pooled ranking done by the repo's distributed rank
    operator (`operators/ranks.add_global_ranks`, histogram/weighted
    mode) instead of a single-partition window: the pooled sample is
    collapsed to a distinct-value histogram (≤ value-range rows
    regardless of corpus size), ranks come from the range-partitioned
    prefix-sum scheme, and each tied group's midrank×2 is the exact
    integer ``2r + c − 1``. Per-type rank sums are exact BIGINTs; the
    only rounding is the Σnᵢ·R̄ᵢ² term quantized at 1e-3 (the Levene/
    Brown-Forsythe discipline). H is one correctly-rounded scalar.
    """
    from agol_pandas_spark.operators.ranks import add_global_ranks

    ev = Catalog(spark, sf_dir).table("events")
    x = ev.select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("xq")
    )
    pooled = x.groupBy("xq").agg(F.count(F.lit(1)).cast("long").alias("c"))
    ranked = add_global_ranks(
        pooled, ["xq"], weight_col="c", rank_col="r"
    ).select("xq", "c", "r")
    per_type = x.groupBy("event_type", "xq").agg(
        F.count(F.lit(1)).cast("long").alias("ci")
    )
    sums = (
        per_type.join(ranked, "xq")
        .groupBy("event_type")
        .agg(
            F.sum("ci").cast("long").alias("ni"),
            F.sum(
                F.col("ci") * (2 * F.col("r") + F.col("c") - 1)
            ).cast("long").alias("s2"),
        )
    )
    a_term = F.round(
        F.col("s2").cast("double")
        * F.col("s2").cast("double")
        / (4 * F.col("ni").cast("double"))
        * 1000
    ).cast("long")
    ties = pooled.agg(
        F.sum(F.col("c") * F.col("c") * F.col("c") - F.col("c"))
        .cast("long")
        .alias("ties_cubed")
    )
    glob = sums.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("ni").cast("long").alias("n"),
        F.sum(a_term).cast("long").alias("a_milli"),
    ).crossJoin(F.broadcast(ties))
    nd = F.col("n").cast("double")
    h_uncorr = (
        F.lit(12.0)
        * (F.col("a_milli").cast("double") / 1000.0)
        / (nd * (nd + 1))
        - 3 * (nd + 1)
    )
    corr = F.lit(1) - F.col("ties_cubed").cast("double") / (nd * nd * nd - nd)
    return glob.select(
        "k", "n", "a_milli", "ties_cubed",
        (h_uncorr / corr).alias("h_stat"),
    )


@register(
    "stats_friedman_blocked_ranks",
    tags=("stats", "hypothesis-test", "ranks"),
    oracle="""
    WITH daily AS (
      SELECT CAST(epoch_ms(ts) // 86400000 AS BIGINT) AS day,
             event_type,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS xq
      FROM events GROUP BY 1, 2),
    k AS (SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS k
          FROM daily),
    complete AS (
      SELECT day FROM daily GROUP BY day
      HAVING COUNT(*) = (SELECT k FROM k)),
    ranked AS (
      SELECT d.day, d.event_type,
             CAST(2 * RANK() OVER (PARTITION BY d.day ORDER BY d.xq)
                  + COUNT(*) OVER (PARTITION BY d.day, d.xq) - 1
                  AS BIGINT) AS r2
      FROM daily d JOIN complete USING (day)),
    sums AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_blocks,
             CAST(SUM(r2) AS BIGINT) AS r2_sum
      FROM ranked GROUP BY 1),
    gtot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(MIN(n_blocks) AS BIGINT) AS n,
             CAST(SUM(r2_sum * r2_sum) AS BIGINT) AS ssq
      FROM sums)
    SELECT k, n, ssq,
           3.0 * CAST(ssq AS DOUBLE)
             / (CAST(n AS DOUBLE) * CAST(k AS DOUBLE)
                * (CAST(k AS DOUBLE) + 1))
           - 3 * CAST(n AS DOUBLE) * (CAST(k AS DOUBLE) + 1) AS chi2_f
    FROM gtot
    """,
)
def stats_friedman_blocked_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman test (within-block rank ANOVA): days are blocks, event
    types are treatments — does any type systematically out-earn the
    others once day-to-day level shifts are blocked out? The
    non-parametric complement to `stats_kruskal_wallis_h` (which pools
    across blocks). Within-day ranks are PARTITIONED windows (k rows
    per block — no global ranking needed, the structural advantage of
    blocked designs at scale); midrank×2 = ``2·rank + ties − 1`` keeps
    everything integer; only complete blocks (all k types present)
    enter, mirroring the textbook design; χ²_F is one correctly-rounded
    scalar from exact BIGINT rank-sum squares.
    """
    from pyspark.sql import Window

    ev = Catalog(spark, sf_dir).table("events")
    daily = ev.groupBy(
        F.expr("CAST(unix_timestamp(ts) div 86400 AS BIGINT)").alias("day"),
        "event_type",
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("xq"))
    k_df = daily.agg(
        F.countDistinct("event_type").cast("long").alias("k")
    )
    complete = (
        daily.groupBy("day")
        .agg(F.count(F.lit(1)).alias("nt"))
        .crossJoin(F.broadcast(k_df))
        .filter(F.col("nt") == F.col("k"))
        .select("day")
    )
    wr = Window.partitionBy("day").orderBy("xq")
    wc = Window.partitionBy("day", "xq")
    ranked = (
        daily.join(complete, "day")
        .select(
            "day", "event_type",
            (
                2 * F.rank().over(wr) + F.count(F.lit(1)).over(wc) - 1
            ).cast("long").alias("r2"),
        )
    )
    sums = ranked.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        F.sum("r2").cast("long").alias("r2_sum"),
    )
    gtot = sums.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.min("n_blocks").cast("long").alias("n"),
        F.sum(F.col("r2_sum") * F.col("r2_sum")).cast("long").alias("ssq"),
    )
    kd = F.col("k").cast("double")
    nd = F.col("n").cast("double")
    return gtot.select(
        "k", "n", "ssq",
        (
            F.lit(3.0) * F.col("ssq").cast("double") / (nd * kd * (kd + 1))
            - 3 * nd * (kd + 1)
        ).alias("chi2_f"),
    )


@register(
    "stats_mcnemar_paired_flips",
    tags=("stats", "hypothesis-test", "paired"),
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             MAX(CASE WHEN ts < TIMESTAMP '2024-01-16'
                       AND event_type = 'purchase' AND value > 100
                      THEN 1 ELSE 0 END) AS h1,
             MAX(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                       AND event_type = 'purchase' AND value > 100
                      THEN 1 ELSE 0 END) AS h2
      FROM events GROUP BY user_id),
    cells AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(CASE WHEN h1 = 1 AND h2 = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS b,
             CAST(SUM(CASE WHEN h1 = 0 AND h2 = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS c
      FROM per_user)
    SELECT n_users, b, c,
           (abs(CAST(b AS DOUBLE) - CAST(c AS DOUBLE)) - 1)
           * (abs(CAST(b AS DOUBLE) - CAST(c AS DOUBLE)) - 1)
           / (CAST(b AS DOUBLE) + CAST(c AS DOUBLE)) AS chi2_mcnemar
    FROM cells
    """,
)
def stats_mcnemar_paired_flips(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test on PAIRED binary outcomes: did each user's
    'makes high-value purchases' flag flip between the two halves of
    the window? Unlike the chi-squared drift gates (which compare
    independent samples), McNemar conditions on the pair — only the
    discordant cells b (yes→no) and c (no→yes) carry information, with
    the continuity-corrected ``(|b−c|−1)²/(b+c)``. One grouped MAX per
    user (a single shuffle), exact integer cells, one correctly-rounded
    scalar.
    """
    ev = Catalog(spark, sf_dir).table("events")
    cut = F.lit("2024-01-16").cast("timestamp")
    hi = (F.col("event_type") == "purchase") & (F.col("value") > 100)
    per_user = ev.groupBy("user_id").agg(
        F.max(((F.col("ts") < cut) & hi).cast("int")).alias("h1"),
        F.max(((F.col("ts") >= cut) & hi).cast("int")).alias("h2"),
    )
    cells = per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum(((F.col("h1") == 1) & (F.col("h2") == 0)).cast("int"))
        .cast("long")
        .alias("b"),
        F.sum(((F.col("h1") == 0) & (F.col("h2") == 1)).cast("int"))
        .cast("long")
        .alias("c"),
    )
    bd = F.col("b").cast("double")
    cd = F.col("c").cast("double")
    return cells.select(
        "n_users", "b", "c",
        (
            (F.abs(bd - cd) - 1) * (F.abs(bd - cd) - 1) / (bd + cd)
        ).alias("chi2_mcnemar"),
    )


@register(
    "stats_cooks_distance_influence",
    tags=("stats", "regression", "diagnostics"),
    oracle="""
    WITH q AS (
      SELECT l_returnflag,
             CAST(round(l_quantity) AS BIGINT) AS x,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS y
      FROM lineitem),
    m AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM q GROUP BY 1),
    fit AS (
      SELECT l_returnflag, n, sx, sxx,
             (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) AS b,
             (CAST(sy AS DOUBLE)
              - ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx))
                * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS a
      FROM m),
    resid AS (
      SELECT q.l_returnflag, f.n,
             CAST(q.y AS DOUBLE) - (f.a + f.b * CAST(q.x AS DOUBLE)) AS e,
             1.0 / CAST(f.n AS DOUBLE)
             + (CAST(q.x AS DOUBLE) - CAST(f.sx AS DOUBLE) / f.n)
               * (CAST(q.x AS DOUBLE) - CAST(f.sx AS DOUBLE) / f.n)
               / (CAST(f.sxx AS DOUBLE)
                  - CAST(f.sx AS DOUBLE) * f.sx / f.n) AS h
      FROM q JOIN fit f USING (l_returnflag)),
    sse AS (
      SELECT l_returnflag, n,
             CAST(SUM(CAST(round(e * e) AS BIGINT)) AS BIGINT) AS sse_sc
      FROM resid GROUP BY 1, 2),
    d AS (
      SELECT r.l_returnflag, r.n,
             (r.e * r.e / (2.0 * (CAST(s.sse_sc AS DOUBLE)
                                  / (r.n - 2))))
             * (r.h / ((1 - r.h) * (1 - r.h))) AS cook
      FROM resid r JOIN sse s USING (l_returnflag))
    SELECT l_returnflag,
           CAST(MAX(n) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN cook > 4.0 / n THEN 1 ELSE 0 END)
                AS BIGINT) AS n_influential,
           MAX(cook) AS max_cooks_d
    FROM d GROUP BY 1
    """,
)
def stats_cooks_distance_influence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cook's distance influence diagnostics over the per-segment OLS
    fit (`stats_ols_price_on_quantity`'s model): which rows, if
    dropped, would move the regression — the leverage×residual product
    that catches both outliers and high-x anomalies. Everything
    derives from the same five exact integer moments (broadcast back
    to the rows); SSE quantizes per-row squared residuals to integers
    before summing (the one cross-row accumulation), and the final
    per-group reductions are MAX and a threshold COUNT — both
    order-independent, so no global sort or top-k tie ambiguity. Three
    passes over the fact table, each a map with a broadcast model —
    the 100 TB shape for regression diagnostics.
    """
    li = Catalog(spark, sf_dir).table("lineitem")
    q = li.select(
        "l_returnflag",
        F.round(F.col("l_quantity")).cast("long").alias("x"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"),
    )
    m = q.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    syd = F.col("sy").cast("double")
    b = (nd * F.col("sxy").cast("double") - sxd * syd) / (
        nd * F.col("sxx").cast("double") - sxd * sxd
    )
    a = (syd - b * sxd) / nd
    fit = m.select("l_returnflag", "n", "sx", "sxx", b.alias("b"), a.alias("a"))
    xd = F.col("x").cast("double")
    xbar = F.col("sx").cast("double") / F.col("n")
    e = F.col("y").cast("double") - (F.col("a") + F.col("b") * xd)
    h = 1.0 / F.col("n").cast("double") + (xd - xbar) * (xd - xbar) / (
        F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx") / F.col("n")
    )
    resid = q.join(F.broadcast(fit), "l_returnflag").select(
        "l_returnflag", "n", e.alias("e"), h.alias("h")
    )
    sse = resid.groupBy("l_returnflag", "n").agg(
        F.sum(F.round(F.col("e") * F.col("e")).cast("long"))
        .cast("long")
        .alias("sse_sc")
    )
    d = resid.join(F.broadcast(sse.drop("n")), "l_returnflag").select(
        "l_returnflag",
        "n",
        (
            (
                F.col("e") * F.col("e")
                / (2.0 * (F.col("sse_sc").cast("double") / (F.col("n") - 2)))
            )
            * (F.col("h") / ((1 - F.col("h")) * (1 - F.col("h"))))
        ).alias("cook"),
    )
    return d.groupBy("l_returnflag").agg(
        F.max("n").cast("long").alias("n"),
        F.sum(
            F.when(F.col("cook") > 4.0 / F.col("n"), 1).otherwise(0)
        ).cast("long").alias("n_influential"),
        F.max("cook").alias("max_cooks_d"),
    )


@register(
    "stats_dunn_posthoc_pairs",
    tags=("stats", "hypothesis-test", "ranks", "posthoc"),
    oracle="""
    WITH x AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS xq
      FROM events),
    pooled AS (
      SELECT xq, CAST(COUNT(*) AS BIGINT) AS c FROM x GROUP BY 1),
    ranked AS (
      SELECT xq, c,
             CAST(1 + COALESCE(SUM(c) OVER (ORDER BY xq
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS r
      FROM pooled),
    per_type AS (
      SELECT event_type, xq, CAST(COUNT(*) AS BIGINT) AS ci
      FROM x GROUP BY 1, 2),
    sums AS (
      SELECT p.event_type,
             CAST(SUM(p.ci) AS BIGINT) AS ni,
             CAST(SUM(p.ci * (2 * rk.r + rk.c - 1)) AS BIGINT) AS s2
      FROM per_type p JOIN ranked rk USING (xq)
      GROUP BY 1),
    gtot AS (
      SELECT CAST(SUM(ni) AS BIGINT) AS n,
             (SELECT CAST(SUM(c * c * c - c) AS BIGINT) FROM pooled)
               AS ties_cubed
      FROM sums)
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           a.ni AS n_a, b.ni AS n_b,
           (CAST(a.s2 AS DOUBLE) / (2 * CAST(a.ni AS DOUBLE))
            - CAST(b.s2 AS DOUBLE) / (2 * CAST(b.ni AS DOUBLE)))
           / sqrt((CAST(g.n AS DOUBLE) * (CAST(g.n AS DOUBLE) + 1) / 12
                   - CAST(g.ties_cubed AS DOUBLE)
                     / (12 * (CAST(g.n AS DOUBLE) - 1)))
                  * (1 / CAST(a.ni AS DOUBLE) + 1 / CAST(b.ni AS DOUBLE)))
             AS z_dunn
    FROM sums a JOIN sums b ON a.event_type < b.event_type
    CROSS JOIN gtot g
    """,
)
def stats_dunn_posthoc_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dunn's post-hoc test: after `stats_kruskal_wallis_h` rejects
    'all types equal', WHICH pairs differ? Every unordered type pair
    gets the z-statistic on mean-rank difference with the tie-corrected
    variance ``(N(N+1)/12 − Σ(t³−t)/(12(N−1)))(1/nᵢ+1/nⱼ)``. Reuses the
    same distributed-rank histogram machinery (midrank×2 integers from
    `add_global_ranks` in weighted mode); the pair join is k×k over the
    k-row rank-sum table — trivially broadcast — and every statistic is
    a correctly-rounded scalar over exact BIGINTs.
    """
    from agol_pandas_spark.operators.ranks import add_global_ranks

    ev = Catalog(spark, sf_dir).table("events")
    x = ev.select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("xq")
    )
    pooled = x.groupBy("xq").agg(F.count(F.lit(1)).cast("long").alias("c"))
    ranked = add_global_ranks(
        pooled, ["xq"], weight_col="c", rank_col="r"
    ).select("xq", "c", "r")
    per_type = x.groupBy("event_type", "xq").agg(
        F.count(F.lit(1)).cast("long").alias("ci")
    )
    sums = (
        per_type.join(ranked, "xq")
        .groupBy("event_type")
        .agg(
            F.sum("ci").cast("long").alias("ni"),
            F.sum(
                F.col("ci") * (2 * F.col("r") + F.col("c") - 1)
            ).cast("long").alias("s2"),
        )
    )
    gtot = sums.agg(F.sum("ni").cast("long").alias("n")).crossJoin(
        F.broadcast(
            pooled.agg(
                F.sum(F.col("c") * F.col("c") * F.col("c") - F.col("c"))
                .cast("long")
                .alias("ties_cubed")
            )
        )
    )
    a = sums.select(
        F.col("event_type").alias("type_a"),
        F.col("ni").alias("n_a"),
        F.col("s2").alias("s2_a"),
    )
    b = sums.select(
        F.col("event_type").alias("type_b"),
        F.col("ni").alias("n_b"),
        F.col("s2").alias("s2_b"),
    )
    pairs = a.join(b, F.col("type_a") < F.col("type_b")).crossJoin(
        F.broadcast(gtot)
    )
    nd = F.col("n").cast("double")
    nad = F.col("n_a").cast("double")
    nbd = F.col("n_b").cast("double")
    mean_diff = F.col("s2_a").cast("double") / (2 * nad) - F.col(
        "s2_b"
    ).cast("double") / (2 * nbd)
    var = (
        nd * (nd + 1) / 12
        - F.col("ties_cubed").cast("double") / (12 * (nd - 1))
    ) * (1 / nad + 1 / nbd)
    return pairs.select(
        "type_a", "type_b", "n_a", "n_b",
        (mean_diff / F.sqrt(var)).alias("z_dunn"),
    )


@register(
    "sample_ab_srm_check",
    tags=("sample", "experimentation"),
    oracle="""
    WITH users AS (
      SELECT DISTINCT user_id FROM events),
    assigned AS (
      SELECT user_id,
             CAST(('0x' || substring(md5('exp7_' || CAST(user_id
                    AS VARCHAR)), 1, 15)) AS BIGINT) % 2 AS variant
      FROM users),
    counts AS (
      SELECT CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_control,
             CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_treatment
      FROM assigned)
    SELECT n_control, n_treatment,
           (CAST(n_control AS DOUBLE) - CAST(n_treatment AS DOUBLE))
           * (CAST(n_control AS DOUBLE) - CAST(n_treatment AS DOUBLE))
           / (CAST(n_control AS DOUBLE) + CAST(n_treatment AS DOUBLE))
             AS chi2_srm,
           (CAST(n_control AS DOUBLE) - CAST(n_treatment AS DOUBLE))
           * (CAST(n_control AS DOUBLE) - CAST(n_treatment AS DOUBLE))
           / (CAST(n_control AS DOUBLE) + CAST(n_treatment AS DOUBLE))
             < 10.83 AS srm_ok
    FROM counts
    """,
)
def sample_ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment assignment + Sample-Ratio-Mismatch guardrail:
    users bucket to variants by the engine-portable salted md5 hash
    (deterministic, coordination-free — the assignment IS the function,
    so any executor, any engine, any day agrees), and the 50/50 design
    is audited with the SRM chi-square ``(n₀−n₁)²/N`` against the
    p<0.001 cutoff (10.83) — the standard tripwire for broken
    randomization, the first thing an experimentation platform checks
    before reading any metric. One distinct + one grouped sum; exact
    integer counts.
    """
    from agol_pandas_spark.functions.text import portable_hash60

    ev = Catalog(spark, sf_dir).table("events")
    users = ev.select("user_id").distinct()
    assigned = users.select(
        F.pmod(
            portable_hash60(
                F.concat(F.lit("exp7_"), F.col("user_id").cast("string"))
            ),
            F.lit(2),
        ).alias("variant")
    )
    counts = assigned.agg(
        F.sum((F.col("variant") == 0).cast("int")).cast("long").alias(
            "n_control"
        ),
        F.sum((F.col("variant") == 1).cast("int")).cast("long").alias(
            "n_treatment"
        ),
    )
    d = F.col("n_control").cast("double") - F.col("n_treatment").cast("double")
    n = F.col("n_control").cast("double") + F.col("n_treatment").cast("double")
    chi2 = d * d / n
    return counts.select(
        "n_control", "n_treatment",
        chi2.alias("chi2_srm"),
        (chi2 < 10.83).alias("srm_ok"),
    )


@register(
    "window_max_drawdown_daily",
    tags=("window", "sequence", "finance"),
    oracle="""
    WITH daily AS (
      SELECT event_type,
             CAST(epoch_ms(ts) // 86400000 AS BIGINT) AS day,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS xq
      FROM events GROUP BY 1, 2),
    cum AS (
      SELECT event_type, day,
             CAST(SUM(xq) OVER w AS BIGINT) AS equity
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS UNBOUNDED PRECEDING)),
    peaks AS (
      SELECT event_type, day, equity,
             CAST(MAX(equity) OVER w AS BIGINT) AS peak
      FROM cum
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS UNBOUNDED PRECEDING))
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(MAX(equity) AS BIGINT) AS final_peak_cents,
           CAST(MAX(peak - equity) AS BIGINT) AS max_drawdown_cents,
           MAX(CAST(peak - equity AS DOUBLE) / CAST(peak AS DOUBLE))
             AS max_drawdown_frac
    FROM peaks GROUP BY event_type
    """,
)
def window_max_drawdown_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of the cumulative daily revenue curve per event
    type — the running-peak sequence analytic (finance's risk headline,
    equally the SLO 'worst dip from high-water mark' statistic). Two
    stacked PARTITIONED prefix windows (running sum → running max; no
    global window anywhere), exact integer cents end to end; the
    fractional drawdown is a per-row correctly-rounded division whose
    MAX is order-independent. Mirrors the gaps-and-islands family:
    sequence analytics as window compositions, not loops.
    """
    from pyspark.sql import Window

    ev = Catalog(spark, sf_dir).table("events")
    daily = ev.groupBy(
        "event_type",
        F.expr("CAST(unix_timestamp(ts) div 86400 AS BIGINT)").alias("day"),
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("xq"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = daily.select(
        "event_type", "day", F.sum("xq").over(w).cast("long").alias("equity")
    )
    peaks = cum.select(
        "event_type", "day", "equity",
        F.max("equity").over(w).cast("long").alias("peak"),
    )
    return peaks.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.max("equity").cast("long").alias("final_peak_cents"),
        F.max(F.col("peak") - F.col("equity")).cast("long").alias(
            "max_drawdown_cents"
        ),
        F.max(
            (F.col("peak") - F.col("equity")).cast("double")
            / F.col("peak").cast("double")
        ).alias("max_drawdown_frac"),
    )
