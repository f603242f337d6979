"""Spatially-enabled DataFrame bridge — the ``st`` accessor boundary.

The reference's spatial interop has two sides: it probes Spark frames
for the accessor (``hasattr(df, 'st')``) and crosses to pandas through
``df.st.to_pandas_sdf()`` before chunked upload
(``src/agol_pandas.py:198-200``), and hosted-layer reads materialize
``query_results.sdf`` — a pandas frame whose ``SHAPE`` column holds
Esri point geometries (``:246, :431-447``).

:class:`SpatialFrame` is the engine's accessor: a thin binding of a
Spark DataFrame to its point-geometry columns. Every operation stays a
distributed column expression over the WKT/(x, y) convention of
``functions/geometry.py`` — nothing materializes until the explicit
driver-boundary calls:

- :meth:`to_esri_features` — one JSON feature string per row
  (``{"attributes": ..., "geometry": {"x", "y", "spatialReference"}}``,
  the public applyEdits/feature-set shape) built JVM-side with
  ``to_json``; this is what a spatial add posts over the wire.
- :meth:`to_pandas_sdf` — the reference's pandas crossing. The ``SHAPE``
  column always carries Esri-JSON point dicts; when the ``arcgis``
  package is importable the frame is additionally promoted to a real
  spatially-enabled DataFrame (``GeoAccessor.from_xy``). The sandbox has
  no ``arcgis``, so the promotion is import-gated and the dict-shaped
  fallback is the tested contract.

Scale posture: the accessor adds NO execution machinery — predicates
and projections compile to the same pushdown-friendly plans as calling
``functions/geometry.py`` directly; ``to_pandas_sdf`` is a driver
boundary by definition and documented as such (use it for the final
result set, never mid-pipeline).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from agol_pandas_spark.functions.geometry import (
    GEOMETRY_COL,
    bbox_agg,
    grid_cell,
    in_bbox,
    parse_point_wkt,
    planar_distance,
    point_wkt,
)

__all__ = ["SpatialFrame", "WGS84"]

#: default spatial reference (the hosted-layer default)
WGS84 = 4326


class SpatialFrame:
    """A Spark DataFrame bound to point-geometry columns ``x``/``y``.

    Construction never touches data; all accessors return new
    :class:`SpatialFrame`/:class:`DataFrame` plans.
    """

    def __init__(self, df: DataFrame, x: str = "x", y: str = "y", wkid: int = WGS84):
        for c in (x, y):
            if c not in df.columns:
                raise ValueError(f"geometry column {c!r} not in {df.columns}")
        self.df = df
        self.x = x
        self.y = y
        self.wkid = int(wkid)

    # -- constructors ---------------------------------------------------
    @classmethod
    def from_xy(
        cls, df: DataFrame, x: str = "x", y: str = "y", wkid: int = WGS84
    ) -> "SpatialFrame":
        """Bind existing coordinate columns (the ``GeoAccessor.from_xy``
        analog)."""
        return cls(df, x=x, y=y, wkid=wkid)

    @classmethod
    def from_wkt(
        cls,
        df: DataFrame,
        wkt_col: str = GEOMETRY_COL,
        x: str = "x",
        y: str = "y",
        wkid: int = WGS84,
    ) -> "SpatialFrame":
        """Parse a ``POINT (x y)`` text column into coordinate columns
        (malformed text parses to NULL coordinates, never throws)."""
        pt = parse_point_wkt(F.col(wkt_col))
        return cls(
            df.withColumn(x, pt["x"]).withColumn(y, pt["y"]),
            x=x,
            y=y,
            wkid=wkid,
        )

    @classmethod
    def from_pandas_sdf(
        cls,
        spark,
        pdf,
        x: str = "x",
        y: str = "y",
        shape_col: str = "SHAPE",
        wkid: int | None = None,
    ) -> "SpatialFrame":
        """Ingest a pandas spatially-enabled DataFrame — the shape the
        reference's layer reads hand back (``query_results.sdf``,
        ``src/agol_pandas.py:246``): a ``SHAPE`` column of Esri point
        geometries (JSON dicts, or ``arcgis`` Point objects, which are
        dict-like). Coordinates land as ``x``/``y`` double columns; the
        SHAPE column does not cross into Spark (geometry is columns, not
        objects, on the distributed side). ``wkid`` defaults from the
        first non-null shape's spatialReference. Driver boundary by
        definition — the inverse of :meth:`to_pandas_sdf`."""
        import pandas as pd

        if shape_col not in pdf.columns:
            raise ValueError(f"no {shape_col!r} column in {list(pdf.columns)}")
        for c in (x, y):
            if c in pdf.columns:
                raise ValueError(
                    f"coordinate column {c!r} already exists; pick other names"
                )
        def _missing(s) -> bool:
            # pandas marks missing object cells as NaN after merges /
            # reindexes, not None — a bare pd.isna on a dict is False,
            # on a float NaN is True
            return s is None or (not isinstance(s, dict) and pd.isna(s))

        def _coord(s, axis: str):
            if _missing(s):
                return None
            v = s[axis]  # Esri empty points carry explicit None coords
            return None if v is None or pd.isna(v) else float(v)

        import numpy as np

        shapes = list(pdf[shape_col])
        pdf = pdf.drop(columns=[shape_col]).copy()
        # float64-typed from the start (None -> NaN): an all-missing
        # column must not leave Spark's schema inference with untyped
        # None objects; NaN is rewritten to SQL NULL below
        pdf[x] = np.array([_coord(s, "x") for s in shapes], dtype="float64")
        pdf[y] = np.array([_coord(s, "y") for s in shapes], dtype="float64")
        if wkid is None:
            first = next((s for s in shapes if not _missing(s)), None)
            wkid = (
                int(first.get("spatialReference", {}).get("wkid", WGS84))
                if first is not None
                else WGS84
            )
        df = spark.createDataFrame(pdf)
        for c in (x, y):
            # pandas None floats arrive as NaN through non-Arrow
            # conversion; the distributed side must see SQL NULL (NaN
            # breaks null-safe joins and comparisons)
            df = df.withColumn(
                c,
                F.when(F.isnan(F.col(c)), F.lit(None)).otherwise(F.col(c)),
            )
        return cls(df, x=x, y=y, wkid=wkid)

    # -- distributed accessors (lazy plans) ------------------------------
    def _attr_cols(self) -> list[str]:
        return [c for c in self.df.columns if c not in (self.x, self.y)]

    def wkt(self, name: str = GEOMETRY_COL, decimals: int = 6) -> DataFrame:
        """Attach the interchange ``POINT (x y)`` text column."""
        return self.df.withColumn(
            name, point_wkt(F.col(self.x), F.col(self.y), decimals=decimals)
        )

    def within_bbox(
        self, xmin: float, ymin: float, xmax: float, ymax: float
    ) -> "SpatialFrame":
        """Rectangle filter — plain range comparisons, parquet-prunable."""
        return SpatialFrame(
            self.df.where(
                in_bbox(F.col(self.x), F.col(self.y), xmin, ymin, xmax, ymax)
            ),
            x=self.x,
            y=self.y,
            wkid=self.wkid,
        )

    def distance_to(
        self, x0: float, y0: float, name: str = "distance"
    ) -> "SpatialFrame":
        """Planar distance to a fixed point as a new column."""
        return SpatialFrame(
            self.df.withColumn(
                name,
                planar_distance(
                    F.col(self.x), F.col(self.y), F.lit(float(x0)), F.lit(float(y0))
                ),
            ),
            x=self.x,
            y=self.y,
            wkid=self.wkid,
        )

    def grid(self, cell_deg: float, name: str = "cell") -> "SpatialFrame":
        """Integer grid-cell key — the spatial co-location/partitioning
        column (write bucketed by it; cell joins stay shuffle-local)."""
        return SpatialFrame(
            self.df.withColumn(name, grid_cell(F.col(self.x), F.col(self.y), cell_deg)),
            x=self.x,
            y=self.y,
            wkid=self.wkid,
        )

    def envelope(self, by: Sequence[str] | None = None) -> DataFrame:
        """Bounding box (xmin/ymin/xmax/ymax), optionally per group."""
        aggs = bbox_agg(F.col(self.x), F.col(self.y))
        return (self.df.groupBy(*by) if by else self.df.groupBy()).agg(*aggs)

    # -- wire / driver boundaries ----------------------------------------
    def esri_geometry(self, name: str = "shape") -> Column:
        """The feature-geometry struct (``x, y, spatialReference.wkid``)
        as a column expression."""
        return F.struct(
            F.col(self.x).cast("double").alias("x"),
            F.col(self.y).cast("double").alias("y"),
            F.struct(F.lit(self.wkid).alias("wkid")).alias("spatialReference"),
        ).alias(name)

    def to_esri_features(self, name: str = "feature_json") -> DataFrame:
        """One JSON feature string per row — the public
        ``{"attributes": ..., "geometry": ...}`` shape applyEdits adds
        and feature sets use. Built entirely JVM-side (``to_json``), so
        serialization is distributed and codegen-friendly."""
        attrs = F.struct(*[F.col(c) for c in self._attr_cols()]).alias("attributes")
        return self.df.select(
            F.to_json(F.struct(attrs, self.esri_geometry("geometry"))).alias(name)
        )

    def to_pandas_sdf(self):
        """Driver boundary: the reference's ``df.st.to_pandas_sdf()``
        (``src/agol_pandas.py:198-200``). Returns a pandas DataFrame with
        a ``SHAPE`` column of Esri-JSON point dicts; when ``arcgis`` is
        importable the frame is promoted in place to a real
        spatially-enabled DataFrame. Collects the WHOLE frame — use it on
        result sets only."""
        import pandas as pd

        pdf = self.df.toPandas()
        # NULL doubles surface as NaN through Arrow/pandas
        pdf["SHAPE"] = [
            None
            if pd.isna(px) or pd.isna(py)
            else {
                "x": float(px),
                "y": float(py),
                "spatialReference": {"wkid": self.wkid},
            }
            for px, py in zip(pdf[self.x], pdf[self.y])
        ]
        try:  # promotion is optional: the dict-shaped SHAPE is the contract
            from arcgis.features import GeoAccessor  # noqa: F401
            from arcgis.geometry import Point

            pdf["SHAPE"] = [None if s is None else Point(s) for s in pdf["SHAPE"]]
            pdf.spatial.set_geometry("SHAPE")
        except ImportError:
            pass
        return pdf
