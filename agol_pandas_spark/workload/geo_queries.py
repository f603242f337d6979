"""Oracle-checked spatial queries (``functions/geometry.py``).

No geometry table exists in the testdata, so points are SYNTHESIZED
deterministically from integer keys: centi-degree integers via modular
arithmetic, then ONE IEEE division by 100 — the identical expression in
both engines, so coordinates are bit-equal and every spatial result is
value-hash-checkable without a spatial extension on either side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from agol_pandas_spark.catalog import Catalog
from agol_pandas_spark.functions.geometry import (
    bbox_agg,
    grid_cell,
    in_bbox,
    neighbor_cells,
    parse_point_wkt,
    planar_distance,
    point_wkt,
    z_value,
)
from agol_pandas_spark.workload import register

# centi-degree synthesis: x in [-180, 180), y in [-90, 90), exact 2-decimal
_SQL_XY = """
    SELECT c_custkey, c_mktsegment,
           CAST(((c_custkey * 13) % 36000) - 18000 AS DOUBLE) / 100 AS x,
           CAST(((c_custkey * 7) % 18000) - 9000 AS DOUBLE) / 100 AS y
    FROM customer
"""


def _customer_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = Catalog(spark, sf_dir).table("customer").select("c_custkey", "c_mktsegment")
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        (((F.col("c_custkey") * 13) % 36000 - 18000).cast("double") / 100).alias("x"),
        (((F.col("c_custkey") * 7) % 18000 - 9000).cast("double") / 100).alias("y"),
    )


@register(
    "geo_bbox_envelope_per_segment",
    tags=("geo", "bbox", "wkt"),
    oracle=f"""
    WITH pts AS ({_SQL_XY}),
    inside AS (
      SELECT * FROM pts
      WHERE x >= -60.0 AND x <= 60.0 AND y >= -45.0 AND y <= 45.0)
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_inside,
           MIN(c_custkey) AS min_key, MAX(c_custkey) AS max_key,
           MIN(x) AS xmin, MIN(y) AS ymin, MAX(x) AS xmax, MAX(y) AS ymax
    FROM inside GROUP BY c_mktsegment
    """,
)
def geo_bbox_envelope_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WKT roundtrip + bbox filter + group envelope: points serialize to
    ``POINT (x y)`` text and parse back before filtering, so the checked
    values prove the WKT build/parse is lossless (2-decimal coordinates
    survive %.6f exactly), the envelope predicate, and ``bbox_agg``."""
    pts = _customer_points(spark, sf_dir)
    wkt = pts.select("c_custkey", "c_mktsegment", point_wkt(F.col("x"), F.col("y")).alias("geometry"))
    parsed = wkt.select(
        "c_custkey", "c_mktsegment", parse_point_wkt(F.col("geometry")).alias("p")
    ).select("c_custkey", "c_mktsegment", F.col("p.x").alias("x"), F.col("p.y").alias("y"))
    inside = parsed.filter(in_bbox(F.col("x"), F.col("y"), -60.0, -45.0, 60.0, 45.0))
    return inside.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_inside"),
        F.min("c_custkey").alias("min_key"),
        F.max("c_custkey").alias("max_key"),
        *bbox_agg(F.col("x"), F.col("y")),
    )


@register(
    "geo_nearest_to_origin",
    tags=("geo", "distance", "topk"),
    oracle=f"""
    WITH pts AS ({_SQL_XY})
    SELECT c_custkey, sqrt((x - 10.0) * (x - 10.0) + (y + 5.0) * (y + 5.0)) AS dist
    FROM pts
    ORDER BY dist, c_custkey
    LIMIT 20
    """,
)
def geo_nearest_to_origin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k nearest points to a probe location, distances value-checked:
    planar distance is mul/add/sqrt only — correctly-rounded IEEE on both
    engines — so even the double distances hash-match. Plans as
    TakeOrderedAndProject (scale-safe top-k, no global sort)."""
    pts = _customer_points(spark, sf_dir)
    return (
        pts.select(
            "c_custkey",
            planar_distance(F.col("x"), F.col("y"), F.lit(10.0), F.lit(-5.0)).alias(
                "dist"
            ),
        )
        .orderBy("dist", "c_custkey")
        .limit(20)
    )


@register(
    "geo_grid_density",
    tags=("geo", "grid", "partitioning"),
    oracle=f"""
    WITH pts AS ({_SQL_XY}),
    cells AS (
      SELECT CAST(floor(x / 30.0) AS BIGINT) AS cx,
             CAST(floor(y / 30.0) AS BIGINT) AS cy,
             c_custkey
      FROM pts)
    SELECT cx, cy, CAST(COUNT(*) AS BIGINT) AS n_points,
           MIN(c_custkey) AS min_key
    FROM cells GROUP BY cx, cy
    """,
)
def geo_grid_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial binning on the integer grid key — the partitioning/blocking
    primitive for co-located spatial joins at scale (write partitioned by
    cell; neighbor joins hit own + 8 adjacent cells only)."""
    pts = _customer_points(spark, sf_dir)
    cells = pts.select(
        grid_cell(F.col("x"), F.col("y"), 30.0).alias("c"), "c_custkey"
    ).select(F.col("c.cx").alias("cx"), F.col("c.cy").alias("cy"), "c_custkey")
    return cells.groupBy("cx", "cy").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.min("c_custkey").alias("min_key"),
    )


_SQL_SUPP_XY = """
    SELECT s_suppkey,
           CAST(((s_suppkey * 29) % 36000) - 18000 AS DOUBLE) / 100 AS x,
           CAST(((s_suppkey * 11) % 18000) - 9000 AS DOUBLE) / 100 AS y
    FROM supplier
"""


@register(
    "geo_grid_distance_join",
    tags=("geo", "spatial-join", "grid"),
    oracle=f"""
    WITH c AS ({_SQL_XY}), s AS ({_SQL_SUPP_XY})
    SELECT c.c_custkey, s.s_suppkey,
           sqrt((c.x - s.x) * (c.x - s.x) + (c.y - s.y) * (c.y - s.y)) AS dist
    FROM c, s
    WHERE sqrt((c.x - s.x) * (c.x - s.x) + (c.y - s.y) * (c.y - s.y)) <= 5.0
    """,
)
def geo_grid_distance_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-bucketed spatial distance join: customer points within 5
    degrees of a supplier point. The engine probes each customer's 3x3
    neighbor cells against each supplier's single home cell (equi-join on
    integer cells, then the exact distance predicate) — the oracle
    brute-forces the cross join, so a green hash PROVES the grid plan is
    pair-for-pair equivalent to the exact quadratic join it replaces.

    Scale shape: the cross join never happens — cost is the equi-join's
    hash shuffle on cell ids (9 small rows per probe point), and at 100 TB
    the build side is written partitioned by cell so only probes move.
    """
    supp = Catalog(spark, sf_dir).table("supplier").select("s_suppkey")
    spts = supp.select(
        "s_suppkey",
        (((F.col("s_suppkey") * 29) % 36000 - 18000).cast("double") / 100).alias("x"),
        (((F.col("s_suppkey") * 11) % 18000 - 9000).cast("double") / 100).alias("y"),
    )
    cpts = _customer_points(spark, sf_dir).drop("c_mktsegment")
    probes = cpts.select(
        "c_custkey",
        F.col("x").alias("cx_pt"),
        F.col("y").alias("cy_pt"),
        F.explode(neighbor_cells(F.col("x"), F.col("y"), 5.0)).alias("cell"),
    )
    build = spts.select(
        "s_suppkey",
        F.col("x").alias("sx_pt"),
        F.col("y").alias("sy_pt"),
        grid_cell(F.col("x"), F.col("y"), 5.0).alias("cell"),
    )
    dist = planar_distance(
        F.col("cx_pt"), F.col("cy_pt"), F.col("sx_pt"), F.col("sy_pt")
    )
    return (
        probes.join(build, "cell")
        .filter(dist <= 5.0)
        .select("c_custkey", "s_suppkey", dist.alias("dist"))
    )


_SQL_Z8 = " + ".join(
    f"(((cx >> {b}) & 1) << {2 * b}) + (((cy >> {b}) & 1) << {2 * b + 1})"
    for b in range(8)
)


@register(
    "geo_zorder_chunk_locality",
    tags=("geo", "zorder", "layout"),
    oracle=f"""
    WITH pts AS ({_SQL_XY}),
    cells AS (
      SELECT c_custkey, x, y,
             CAST(floor(x / 5.0) AS BIGINT) + 64 AS cx,
             CAST(floor(y / 5.0) AS BIGINT) + 32 AS cy
      FROM pts),
    z AS (SELECT *, {_SQL_Z8} AS zv FROM cells),
    b AS (SELECT *, ntile(16) OVER (ORDER BY zv, c_custkey) AS bucket FROM z)
    SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_points,
           MIN(x) AS xmin, MIN(y) AS ymin, MAX(x) AS xmax, MAX(y) AS ymax
    FROM b GROUP BY bucket
    """,
)
def geo_zorder_chunk_locality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout clustering (``functions/geometry.py:z_value``):
    customer points sort by their Morton value and split into 16 chunks;
    the checked surface is each chunk's point count and bbox. Because
    z-order interleaves both dimensions, every chunk's bbox is a compact
    tile instead of a full-width stripe — the property that lets min/max
    chunk statistics prune on x AND y at 100 TB (Z-ORDER OPTIMIZE
    semantics, value-checked cross-engine).

    The exact-ntile bucketing runs through the distributed rank operator
    (operators/ranks.py: range-partitioned global row number + the SQL
    NTILE formula — no single-partition window); the production layout
    path is ``df.repartitionByRange(N, zv).sortWithinPartitions(zv)`` —
    the same z clustering with sampled boundaries and zero driver
    involvement, exactly like ``chunking.repartition_by_sorted_range``.
    """
    from agol_pandas_spark.operators.ranks import add_global_ranks
    pts = _customer_points(spark, sf_dir).drop("c_mktsegment")
    cells = pts.select(
        "c_custkey",
        "x",
        "y",
        (F.floor(F.col("x") / 5.0).cast("long") + 64).alias("cx"),
        (F.floor(F.col("y") / 5.0).cast("long") + 32).alias("cy"),
    )
    z = cells.withColumn("zv", z_value(F.col("cx"), F.col("cy"), 8))
    b = add_global_ranks(
        z, ["zv", "c_custkey"], unique=True, ntile=16, ntile_col="bucket"
    )
    return b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.min("x").alias("xmin"),
        F.min("y").alias("ymin"),
        F.max("x").alias("xmax"),
        F.max("y").alias("ymax"),
    )


# convex CCW quadrilateral for the point-in-polygon predicate; literal
# deltas are precomputed in both engines' expressions identically
_POLY = [(-50.0, -30.0), (40.0, -40.0), (60.0, 20.0), (-20.0, 45.0)]


def _sql_poly_pred() -> str:
    n = len(_POLY)
    terms = []
    for i in range(n):
        x1, y1 = _POLY[i]
        x2, y2 = _POLY[(i + 1) % n]
        terms.append(
            f"(({x2 - x1!r}) * (y - ({y1!r})) - ({y2 - y1!r}) * (x - ({x1!r}))) >= 0"
        )
    return " AND ".join(terms)


@register(
    "geo_point_in_polygon",
    tags=("geo", "polygon", "predicate"),
    oracle=f"""
    WITH pts AS ({_SQL_XY})
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_inside,
           MIN(c_custkey) AS min_key, MAX(c_custkey) AS max_key
    FROM pts WHERE {_sql_poly_pred()}
    GROUP BY c_mktsegment
    """,
)
def geo_point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-convex-polygon containment
    (``functions/geometry.py:in_convex_polygon``): edge cross-product
    signs fused into one codegen boolean — no spatial extension on
    either engine, every cross product bit-identical to the SQL oracle.
    The per-segment counts inside a fixed CCW quadrilateral are
    value-checked.
    """
    from agol_pandas_spark.functions.geometry import in_convex_polygon

    pts = _customer_points(spark, sf_dir)
    return (
        pts.filter(in_convex_polygon(F.col("x"), F.col("y"), _POLY))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_inside"),
            F.min("c_custkey").alias("min_key"),
            F.max("c_custkey").alias("max_key"),
        )
    )


# concave (arrow-head) polygon: the reflex vertex at (0, 0) makes the
# convex edge-sign test WRONG here — only crossing parity classifies it
_CONCAVE_POLY = [
    (-60.5, -40.5),
    (60.5, -40.5),
    (60.5, 40.5),
    (0.0, 0.0),
    (-60.5, 40.5),
]


@register(
    "geo_point_in_concave_polygon",
    tags=("geo", "polygon", "raycast", "predicate"),
    oracle=f"""
    WITH pts AS ({_SQL_XY})
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_inside,
           MIN(c_custkey) AS min_key, MAX(c_custkey) AS max_key,
           CAST(SUM(c_custkey) AS BIGINT) AS key_checksum
    FROM pts WHERE {{pred}}
    GROUP BY c_mktsegment
    """.format(pred=__import__("agol_pandas_spark.functions.geometry",
                               fromlist=["sql_raycast_pred"]
                               ).sql_raycast_pred(_CONCAVE_POLY)),
)
def geo_point_in_concave_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-GENERAL-polygon containment (r6,
    ``functions/geometry.py:in_polygon_raycast``): ray-cast crossing
    parity handles the concave arrow-head polygon the convex edge-sign
    test cannot (its reflex vertex makes 'left of every edge' reject
    genuinely-inside points). Cross-multiplied per-edge tests — no
    division, comparison direction fixed per edge from the literal dy
    sign — so the fused codegen boolean is bit-identical to the SQL
    oracle's unrolled arithmetic. Pure map stage over the point scan."""
    from agol_pandas_spark.functions.geometry import in_polygon_raycast

    pts = _customer_points(spark, sf_dir)
    return (
        pts.filter(in_polygon_raycast(F.col("x"), F.col("y"), _CONCAVE_POLY))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_inside"),
            F.min("c_custkey").alias("min_key"),
            F.max("c_custkey").alias("max_key"),
            F.sum("c_custkey").cast("long").alias("key_checksum"),
        )
    )


@register(
    "geo_knn_within_radius",
    tags=("geo", "knn", "spatial-join", "grid"),
    oracle=f"""
    WITH c AS ({_SQL_XY}), s AS ({_SQL_SUPP_XY}),
    cand AS (
      SELECT c.c_custkey, s.s_suppkey,
             sqrt((c.x - s.x) * (c.x - s.x) + (c.y - s.y) * (c.y - s.y)) AS dist
      FROM c, s
      WHERE sqrt((c.x - s.x) * (c.x - s.x) + (c.y - s.y) * (c.y - s.y)) <= 5.0
        AND c.c_custkey % 4 = 0)
    SELECT c_custkey, s_suppkey, dist, rnk FROM (
      SELECT c_custkey, s_suppkey, dist,
             ROW_NUMBER() OVER (PARTITION BY c_custkey
                                ORDER BY dist, s_suppkey) AS rnk
      FROM cand)
    WHERE rnk <= 3
    """,
)
def geo_knn_within_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded spatial kNN join (r6): each probe customer point gets its
    3 nearest supplier points within a 5-degree radius. Grid blocking
    makes the candidate set exact — a 3x3 neighbor-cell equi-join at
    cell size = radius provably contains every point within the radius —
    then a per-probe window ranks by (distance, id). The oracle
    brute-forces the quadratic join, so a green hash proves the grid
    candidates are pair-for-pair complete. Scale shape: equi-join on
    integer cells + a probe-partitioned window; never all-pairs; build
    side bucketable by cell for shuffle-free probes."""
    from pyspark.sql import Window

    supp = Catalog(spark, sf_dir).table("supplier").select("s_suppkey")
    spts = supp.select(
        "s_suppkey",
        (((F.col("s_suppkey") * 29) % 36000 - 18000).cast("double") / 100).alias("x"),
        (((F.col("s_suppkey") * 11) % 18000 - 9000).cast("double") / 100).alias("y"),
    )
    cpts = (
        _customer_points(spark, sf_dir)
        .filter(F.col("c_custkey") % 4 == 0)
        .drop("c_mktsegment")
    )
    probes = cpts.select(
        "c_custkey",
        F.col("x").alias("cx_pt"),
        F.col("y").alias("cy_pt"),
        F.explode(neighbor_cells(F.col("x"), F.col("y"), 5.0)).alias("cell"),
    )
    build = spts.select(
        "s_suppkey",
        F.col("x").alias("sx_pt"),
        F.col("y").alias("sy_pt"),
        grid_cell(F.col("x"), F.col("y"), 5.0).alias("cell"),
    )
    dist = planar_distance(
        F.col("cx_pt"), F.col("cy_pt"), F.col("sx_pt"), F.col("sy_pt")
    )
    cand = (
        probes.join(build, "cell")
        .filter(dist <= 5.0)
        .select("c_custkey", "s_suppkey", dist.alias("dist"))
    )
    w = Window.partitionBy("c_custkey").orderBy(F.col("dist"), F.col("s_suppkey"))
    return cand.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= 3)


@register(
    "geo_esri_features_roundtrip",
    tags=("geo", "sedf", "interop", "json"),
    oracle=f"""
    WITH pts AS ({_SQL_XY})
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_pts,
           CAST(SUM(CAST(round(x * 100) AS BIGINT)) AS BIGINT) AS x_scaled,
           CAST(SUM(CAST(round(y * 100) AS BIGINT)) AS BIGINT) AS y_scaled,
           MIN(x) AS xmin, MAX(y) AS ymax
    FROM pts GROUP BY c_mktsegment
    """,
)
def geo_esri_features_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatially-enabled-DataFrame interop (``operators/spatial.py`` —
    the reference's ``st`` accessor boundary, ``src/agol_pandas.py:
    198-200``): points bind to a :class:`SpatialFrame` and serialize to
    public Esri-JSON features (``{"attributes": ..., "geometry": {x, y,
    spatialReference}}``) entirely JVM-side via ``to_json``, then parse
    BACK with ``from_json`` and aggregate — the oracle on the original
    synthesis proves the feature serialization (what a spatial
    applyEdits posts and a feature-set read returns) is lossless. Both
    directions are distributed column expressions; nothing touches the
    driver."""
    from agol_pandas_spark.operators.spatial import SpatialFrame

    sf = SpatialFrame.from_xy(_customer_points(spark, sf_dir))
    # materialization barrier: Catalyst's OptimizeJsonExprs elides a
    # from_json(to_json(x)) pair entirely (proven by the plan pin,
    # tests/test_plans.py) — checkpoint the feature strings so the JSON
    # actually exists and the parse-back reads real text
    feats = sf.to_esri_features().localCheckpoint(eager=True)
    schema = (
        "attributes struct<c_custkey: bigint, c_mktsegment: string>, "
        "geometry struct<x: double, y: double, "
        "spatialReference: struct<wkid: int>>"
    )
    parsed = feats.select(F.from_json("feature_json", schema).alias("f")).select(
        F.col("f.attributes.c_mktsegment").alias("c_mktsegment"),
        F.col("f.geometry.x").alias("x"),
        F.col("f.geometry.y").alias("y"),
    )
    return parsed.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n_pts"),
        F.sum(F.round(F.col("x") * 100).cast("long")).cast("long").alias("x_scaled"),
        F.sum(F.round(F.col("y") * 100).cast("long")).cast("long").alias("y_scaled"),
        F.min("x").alias("xmin"),
        F.max("y").alias("ymax"),
    )


@register(
    "geo_wire_layer_envelope",
    tags=("geo", "sink", "source", "paged", "connector", "geometry"),
    oracle=f"""
    WITH pts AS ({_SQL_XY})
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_pts,
           MIN(x) AS xmin, MIN(y) AS ymin, MAX(x) AS xmax, MAX(y) AS ymax
    FROM pts WHERE c_custkey % 20 = 0 GROUP BY c_mktsegment
    """,
)
def geo_wire_layer_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial layer end-to-end over the wire: geometry rides OUTSIDE the
    attributes in the public feature JSON, on both directions the
    reference exercised — applyEdits posts (``update_geometry``,
    ``src/agol_pandas.py:451``) and layer reads materializing SHAPE
    (``:246``). Points upload through :class:`HttpEditsSink` with
    ``geometry_fields`` (coordinates leave the attributes and post as
    each feature's ``geometry``), then read back via
    ``HttpPagedClient(geometry=True)`` (``returnGeometry`` surfaces
    ``shape_x``/``shape_y`` columns), and the per-segment envelope must
    match the original synthesis — coordinates crossed JSON twice with
    zero loss, rows landed exactly once. The loopback layer is
    driver-hosted; transport, JSON codecs, and paging are the real
    code paths."""
    from agol_pandas_spark.functions.geometry import bbox_agg as _bbox
    from agol_pandas_spark.sources.http_client import (
        HttpEditsSink,
        HttpPagedClient,
    )
    from agol_pandas_spark.sources.http_mock import serve_layer
    from agol_pandas_spark.sources.paged import (
        RetryPolicy,
        read_paged,
        write_paged,
    )

    pts = _customer_points(spark, sf_dir).where(F.col("c_custkey") % 20 == 0)
    fields = [
        {"name": "objectid", "type": "esriFieldTypeOID"},
        {"name": "c_custkey", "type": "esriFieldTypeInteger"},
        {"name": "c_mktsegment", "type": "esriFieldTypeString"},
    ]
    store: list = []
    srv, _seen = serve_layer(store, fields)
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}"
        policy = RetryPolicy(max_attempts=3, max_backoff=0.01)
        sink = HttpEditsSink(
            url,
            ["c_custkey", "c_mktsegment", "x", "y"],
            key_field="c_custkey",
            geometry_fields=("x", "y"),
        )
        write_paged(pts, sink, page_size=200, policy=policy)
        back = read_paged(
            spark, HttpPagedClient(url, geometry=True), page_size=400, policy=policy
        )
        out = (
            back.groupBy("c_mktsegment")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_pts"),
                *_bbox(F.col("shape_x"), F.col("shape_y")),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        srv.shutdown()
    return out
