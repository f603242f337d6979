"""Geometry column convention + spatial predicates (pure built-ins).

The reference is an ArcGIS tool: it probes spatially-enabled DataFrames
(``hasattr(df, 'st')``, ``src/agol_pandas.py:198-200``) and ships
geometry on append (``update_geometry=False``, ``:451``). This engine's
convention, with no geo library in the runtime:

- **WKT** (``POINT (x y)``) is the interchange format: a plain string
  column named ``geometry`` by convention, built/parsed with JVM-side
  ``format_string``/``regexp_extract`` — codegen-friendly, no UDF.
- **WKB** stays an opaque ``binary`` column with typed metadata next to
  it (same posture as multimodal payloads, ``operators/multimodal.py``):
  Spark has no IEEE-754-from-bytes builtin, so decode belongs to a
  Pandas-UDF codec stage, not the relational layer.
- Coordinates compute as ``(x, y)`` double columns; every predicate here
  is comparison/arithmetic only (one IEEE division at synthesis, ``sqrt``
  for distance — both bit-exact across engines), so spatial queries are
  value-hash-checkable against DuckDB without a spatial extension.

Scale posture: bbox predicates are plain ``AND`` range comparisons on
double columns — they push down to parquet scans (min/max row-group
pruning) like any numeric filter; :func:`grid_cell` gives the integer
partitioning key for spatial co-location (write partitioned/bucketed by
cell, and cell-joins stay shuffle-local) — the same layout discipline as
the IVF/LSH bucketed designs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: conventional column names
GEOMETRY_COL = "geometry"

_POINT_RE = r"^POINT \((-?\d+(?:\.\d+)?) (-?\d+(?:\.\d+)?)\)$"


def point_wkt(x: Column, y: Column, decimals: int = 6) -> Column:
    """``POINT (x y)`` text from coordinate columns. ``decimals`` must
    cover the data's precision for a lossless parse roundtrip (6 ≈ 11 cm
    on Earth's surface)."""
    fmt = f"POINT (%.{decimals}f %.{decimals}f)"
    return F.format_string(fmt, x, y)


def parse_point_wkt(wkt: Column) -> Column:
    """``struct(x, y)`` doubles from ``POINT (x y)`` text; malformed
    input yields nulls (no-match '' → NULL before the cast, so ANSI mode
    cannot throw; matched groups are numeric by construction)."""

    def _coord(group: int) -> Column:
        return F.nullif(F.regexp_extract(wkt, _POINT_RE, group), F.lit("")).cast(
            "double"
        )

    return F.struct(_coord(1).alias("x"), _coord(2).alias("y"))


def in_bbox(
    x: Column, y: Column, xmin: float, ymin: float, xmax: float, ymax: float
) -> Column:
    """Point-in-envelope predicate (borders inclusive) — four range
    comparisons, pushdown-eligible on plain coordinate columns."""
    return (x >= xmin) & (x <= xmax) & (y >= ymin) & (y <= ymax)


def bbox_agg(x: Column, y: Column) -> list[Column]:
    """Group envelope: aggregate expressions for the bounding box of a
    point set (the ``st.bbox`` equivalent)."""
    return [
        F.min(x).alias("xmin"),
        F.min(y).alias("ymin"),
        F.max(x).alias("xmax"),
        F.max(y).alias("ymax"),
    ]


def planar_distance(x1: Column, y1: Column, x2: Column, y2: Column) -> Column:
    """Euclidean distance: two multiplies, one add, one ``sqrt`` — every
    step correctly-rounded IEEE, so distances hash-match cross-engine
    (haversine would not: ``sin``/``cos`` differ across libm builds)."""
    dx = x1 - x2
    dy = y1 - y2
    return F.sqrt(dx * dx + dy * dy)


def grid_cell(x: Column, y: Column, cell_deg: float) -> Column:
    """Integer grid cell ``struct(cx, cy)`` — the spatial partitioning /
    blocking key (floor division, exact integer output). Neighbor search
    = equi-join on own + 8 adjacent cells; at scale, write partitioned by
    cell so those joins never shuffle the big side."""
    return F.struct(
        F.floor(x / F.lit(cell_deg)).cast("long").alias("cx"),
        F.floor(y / F.lit(cell_deg)).cast("long").alias("cy"),
    )


def neighbor_cells(x: Column, y: Column, cell_deg: float) -> Column:
    """The 3x3 block of grid cells around a point — the probe-side
    expansion for a grid-bucketed distance join. With ``cell_deg >= d``,
    every pair within distance ``d`` shares one of these 9 cells with the
    build side's single home cell, so each qualifying pair appears in the
    join EXACTLY once (the build point lives in exactly one cell) — no
    distinct pass needed."""
    cx = F.floor(x / F.lit(cell_deg)).cast("long")
    cy = F.floor(y / F.lit(cell_deg)).cast("long")
    return F.array(
        *[
            F.struct((cx + dx).alias("cx"), (cy + dy).alias("cy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )


def z_value(cx: Column, cy: Column, bits: int = 16) -> Column:
    """Morton / Z-order value: interleaves the low ``bits`` of two
    non-negative cell coordinates (cx bit b -> z bit 2b, cy bit b -> z bit
    2b+1). Sorting by z clusters 2-D neighbors into the same file/chunk —
    the standard multi-dimensional layout optimization (Z-ORDER
    clustering) — so range predicates on EITHER dimension prune most
    chunks instead of one dimension only.

    Pure shift/mask integer math emitted as one parsed SQL expression —
    bit-identical in any engine, so layouts are value-checkable.
    """
    return z_value_n([cx, cy], bits)


def z_value_n(cells: list[Column], bits: int = 16) -> Column:
    """N-dimensional Morton value: bit ``b`` of dimension ``i`` maps to z
    bit ``b·n + i`` — the general interleave behind Z-ORDER OPTIMIZE
    layouts (``Catalog.optimize_zorder``). ``n·bits`` must stay ≤ 62 so
    the value fits a signed long. Same pure shift/mask construction as
    the 2-D case: one parsed SQL expression, bit-identical anywhere."""
    n = len(cells)
    if n < 1:
        raise ValueError("z_value_n needs at least one column")
    if n * bits > 62:
        raise ValueError(f"{n} dims × {bits} bits exceeds a signed long")
    sqls = [c._jc.toString() for c in cells]
    terms = []
    for b in range(bits):
        for i, c_sql in enumerate(sqls):
            terms.append(
                f"shiftleft(shiftright({c_sql}, {b}) & 1, {b * n + i})"
            )
    return F.expr(" + ".join(terms))


def in_convex_polygon(
    x: Column, y: Column, vertices: list[tuple[float, float]]
) -> Column:
    """Point-in-CONVEX-polygon predicate via edge cross-product signs:
    the point is inside (or on the boundary) iff it lies left of every
    edge of the counter-clockwise vertex ring. One fused boolean
    expression of 2·V multiplies per point — pure codegen, no UDF; each
    cross product is two IEEE multiplies and a subtract on identical
    literals, so the predicate is bit-portable to the SQL oracle.
    For general (concave) polygons use a ray-cast parity test instead.
    """
    cond = F.lit(True)
    n = len(vertices)
    for i in range(n):
        x1, y1 = vertices[i]
        x2, y2 = vertices[(i + 1) % n]
        cross = (F.lit(x2 - x1) * (y - F.lit(y1))) - (
            F.lit(y2 - y1) * (x - F.lit(x1))
        )
        cond = cond & (cross >= 0)
    return cond


def in_polygon_raycast(
    x: Column, y: Column, vertices: list[tuple[float, float]]
) -> Column:
    """Point-in-GENERAL-polygon predicate (concave allowed) via ray-cast
    crossing parity: a point is inside iff a horizontal ray to +∞
    crosses an odd number of edges. The per-edge x-test is
    cross-multiplied (no division — the straddle test guarantees
    ``dy != 0``, and the comparison direction is fixed per edge at build
    time from the literal sign of ``dy``), so the whole predicate is a
    fused codegen boolean of adds/multiplies/compares on identical IEEE
    literals — bit-portable to the SQL oracle, like
    :func:`in_convex_polygon`. Horizontal edges never straddle and are
    skipped. Boundary points follow the half-open ``<=`` convention
    consistently in both engines.
    """
    crossings: Column | None = None
    n = len(vertices)
    for i in range(n):
        x1, y1 = vertices[i]
        x2, y2 = vertices[(i + 1) % n]
        dy = y2 - y1
        if dy == 0:
            continue
        straddles = (F.lit(y1) <= y) != (F.lit(y2) <= y)
        lhs = (x - F.lit(x1)) * F.lit(dy)
        rhs = F.lit(x2 - x1) * (y - F.lit(y1))
        xtest = (lhs < rhs) if dy > 0 else (lhs > rhs)
        c = F.when(straddles & xtest, F.lit(1)).otherwise(F.lit(0))
        crossings = c if crossings is None else crossings + c
    if crossings is None:
        return F.lit(False)
    return (crossings % 2) == 1


def sql_raycast_pred(vertices: list[tuple[float, float]]) -> str:
    """The DuckDB twin of :func:`in_polygon_raycast` — the SAME unrolled
    arithmetic on the SAME literals, emitted as SQL over columns
    ``x``/``y``."""
    terms = []
    n = len(vertices)
    for i in range(n):
        x1, y1 = vertices[i]
        x2, y2 = vertices[(i + 1) % n]
        dy = y2 - y1
        if dy == 0:
            continue
        op = "<" if dy > 0 else ">"
        terms.append(
            f"(CASE WHEN (({y1!r} <= y) != ({y2!r} <= y)) AND "
            f"((x - ({x1!r})) * ({dy!r}) {op} ({x2 - x1!r}) * (y - ({y1!r})))"
            " THEN 1 ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ") % 2 = 1"
