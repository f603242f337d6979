"""SpatialFrame accessor (operators/spatial.py) — the ``st`` /
spatially-enabled-DataFrame boundary — and geometry over the HTTP
connector wire (returnGeometry reads, applyEdits geometry posts)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from agol_pandas_spark.operators.spatial import WGS84, SpatialFrame
from agol_pandas_spark.sources.http_mock import serve_layer


def _pts(spark):
    rows = [
        (1, "seg_a", -10.25, 4.5),
        (2, "seg_a", 20.0, -3.75),
        (3, "seg_b", 0.5, 0.25),
        (4, "seg_b", 150.0, 80.0),
    ]
    return spark.createDataFrame(rows, "id long, seg string, x double, y double")


class TestSpatialFrame:
    def test_from_xy_validates_columns(self, spark):
        with pytest.raises(ValueError, match="geometry column"):
            SpatialFrame.from_xy(_pts(spark), x="lon")

    def test_wkt_roundtrip(self, spark):
        sf = SpatialFrame.from_xy(_pts(spark))
        back = SpatialFrame.from_wkt(
            sf.wkt().drop("x", "y"), x="px", y="py"
        ).df.orderBy("id")
        got = [(r["px"], r["py"]) for r in back.collect()]
        assert got == [(-10.25, 4.5), (20.0, -3.75), (0.5, 0.25), (150.0, 80.0)]

    def test_within_bbox_and_distance(self, spark):
        sf = SpatialFrame.from_xy(_pts(spark)).within_bbox(-20, -10, 30, 10)
        ids = sorted(r["id"] for r in sf.df.collect())
        assert ids == [1, 2, 3]
        d = sf.distance_to(0.0, 0.0).df.where(F.col("id") == 3).first()["distance"]
        assert d == pytest.approx((0.5**2 + 0.25**2) ** 0.5)

    def test_envelope_per_group(self, spark):
        env = {
            r["seg"]: (r["xmin"], r["ymin"], r["xmax"], r["ymax"])
            for r in SpatialFrame.from_xy(_pts(spark)).envelope(by=["seg"]).collect()
        }
        assert env["seg_a"] == (-10.25, -3.75, 20.0, 4.5)
        assert env["seg_b"] == (0.5, 0.25, 150.0, 80.0)

    def test_to_esri_features_shape(self, spark):
        feats = [
            json.loads(r["feature_json"])
            for r in SpatialFrame.from_xy(_pts(spark)).to_esri_features().collect()
        ]
        by_id = {f["attributes"]["id"]: f for f in feats}
        assert set(by_id[1]) == {"attributes", "geometry"}
        assert by_id[1]["attributes"] == {"id": 1, "seg": "seg_a"}
        assert by_id[1]["geometry"] == {
            "x": -10.25,
            "y": 4.5,
            "spatialReference": {"wkid": WGS84},
        }

    def test_to_pandas_sdf_shape_column(self, spark):
        df = _pts(spark).withColumn(
            "x", F.when(F.col("id") == 4, F.lit(None)).otherwise(F.col("x"))
        )
        pdf = SpatialFrame.from_xy(df).to_pandas_sdf()
        by_id = {int(r.id): r.SHAPE for r in pdf.itertuples()}
        assert by_id[2] == {
            "x": 20.0,
            "y": -3.75,
            "spatialReference": {"wkid": 4326},
        }
        assert by_id[4] is None  # null coordinate -> null SHAPE


_GEO_FIELDS = [
    {"name": "objectid", "type": "esriFieldTypeOID"},
    {"name": "name", "type": "esriFieldTypeString"},
    {"name": "score", "type": "esriFieldTypeDouble"},
]


def _geo_store():
    return [
        {
            "objectid": i,
            "name": f"k{i}",
            "score": float(i),
            "_geometry": {"x": float(i), "y": -float(i), "spatialReference": {"wkid": 4326}},
        }
        for i in range(1, 6)
    ]


class TestHttpGeometry:
    def test_spatial_read_surfaces_shape_columns(self, spark):
        from agol_pandas_spark.sources.http_client import HttpPagedClient
        from agol_pandas_spark.sources.paged import read_paged

        srv, seen = serve_layer(_geo_store(), _GEO_FIELDS)
        try:
            url = f"http://127.0.0.1:{srv.server_address[1]}"
            df = read_paged(spark, HttpPagedClient(url, geometry=True), page_size=2)
            assert df.columns == ["objectid", "name", "score", "shape_x", "shape_y"]
            got = {r["objectid"]: (r["shape_x"], r["shape_y"]) for r in df.collect()}
            assert got == {i: (float(i), -float(i)) for i in range(1, 6)}
            pages = [q for q in seen if "resultOffset" in q]
            assert pages and all(q.get("returnGeometry") == "true" for q in pages)
        finally:
            srv.shutdown()

    def test_spatial_projection_contract(self, spark):
        from agol_pandas_spark.sources.http_client import HttpPagedClient
        from agol_pandas_spark.sources.paged import read_paged

        srv, seen = serve_layer(_geo_store(), _GEO_FIELDS)
        try:
            url = f"http://127.0.0.1:{srv.server_address[1]}"
            client = HttpPagedClient(url, geometry=True)
            # canonical order pushes: only 'name' crosses as outFields
            df = read_paged(
                spark, client, page_size=10, columns=["name", "shape_x", "shape_y"]
            )
            assert df.columns == ["name", "shape_x", "shape_y"]
            assert df.count() == 5
            assert any(q.get("outFields") == "name" for q in seen)
            # attribute-only projection drops the geometry entirely
            df2 = read_paged(spark, client, page_size=10, columns=["name", "score"])
            assert df2.columns == ["name", "score"]
            # non-canonical order is declined but still correct (Spark select)
            df3 = read_paged(
                spark, client, page_size=10, columns=["shape_y", "name"]
            )
            assert df3.columns == ["shape_y", "name"]
            got = {r["name"]: r["shape_y"] for r in df3.collect()}
            assert got["k3"] == -3.0
        finally:
            srv.shutdown()

    def test_edits_sink_posts_geometry(self):
        from agol_pandas_spark.sources.http_client import HttpEditsSink

        store = _geo_store()
        srv, seen = serve_layer(store, _GEO_FIELDS)
        try:
            url = f"http://127.0.0.1:{srv.server_address[1]}"
            sink = HttpEditsSink(
                url,
                ["name", "score", "px", "py"],
                key_field="name",
                geometry_fields=("px", "py"),
            )
            # k2 exists (geometry update), fresh is a spatial add
            sink.upload_batch([("k2", 20.0, 7.5, -7.5), ("fresh", 9.0, 1.0, 2.0)], "b0")
            by_name = {r["name"]: r for r in store}
            assert by_name["k2"]["score"] == 20.0
            assert by_name["k2"]["_geometry"]["x"] == 7.5
            assert by_name["fresh"]["_geometry"] == {
                "x": 1.0,
                "y": 2.0,
                "spatialReference": {"wkid": 4326},
            }
            post = next(q for q in seen if q.get("op") == "applyEdits")
            add = json.loads(post["adds"])[0]
            assert "geometry" in add and "px" not in add["attributes"]
        finally:
            srv.shutdown()

    def test_geometry_fields_validation(self):
        from agol_pandas_spark.sources.http_client import HttpEditsSink

        with pytest.raises(ValueError, match="geometry field"):
            HttpEditsSink("http://x", ["a"], geometry_fields=("px", "py"))
        with pytest.raises(ValueError, match="key_field cannot"):
            HttpEditsSink(
                "http://x", ["k", "px", "py"], key_field="px",
                geometry_fields=("px", "py"),
            )

    def test_wire_roundtrip_write_then_read(self, spark):
        """Spatial end-to-end: distributed geometry upload, spatial read,
        values identical."""
        from agol_pandas_spark.sources.http_client import (
            HttpEditsSink,
            HttpPagedClient,
        )
        from agol_pandas_spark.sources.paged import (
            RetryPolicy,
            read_paged,
            write_paged,
        )

        store: list = []
        srv, _ = serve_layer(store, _GEO_FIELDS)
        try:
            url = f"http://127.0.0.1:{srv.server_address[1]}"
            df = spark.range(1, 21).select(
                F.concat(F.lit("p"), F.col("id")).alias("name"),
                (F.col("id") * 1.5).alias("score"),
                (F.col("id") * 0.25).alias("px"),
                (F.col("id") * -0.5).alias("py"),
            )
            sink = HttpEditsSink(
                url, ["name", "score", "px", "py"],
                key_field="name", geometry_fields=("px", "py"),
            )
            write_paged(df, sink, page_size=6, policy=RetryPolicy(max_attempts=2))
            back = read_paged(
                spark, HttpPagedClient(url, geometry=True), page_size=7
            )
            got = {
                r["name"]: (r["score"], r["shape_x"], r["shape_y"])
                for r in back.collect()
            }
            assert len(got) == 20
            assert got["p8"] == (12.0, 2.0, -4.0)
        finally:
            srv.shutdown()


class TestEditsSinkProperties:
    """Property check: any interleaving of upsert batches — including
    at-least-once replays — converges the remote store to the last-write
    state of each key, with no duplicates and no key ever lost. Pure
    driver-side (no Spark): the sink transport and the mock layer are
    exercised end to end."""

    def test_random_batches_with_replays_converge(self):
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        from agol_pandas_spark.errors import DuplicateKeyError
        from agol_pandas_spark.sources.http_client import HttpEditsSink

        keys = st.integers(min_value=0, max_value=14)
        batch = st.lists(
            st.tuples(keys, st.floats(allow_nan=False, allow_infinity=False,
                                      width=32)),
            min_size=1,
            max_size=8,
        )
        plans = st.lists(
            st.tuples(batch, st.booleans()),  # (batch, replay it?)
            min_size=1,
            max_size=6,
        )

        @given(plan=plans)
        @settings(
            max_examples=15,
            deadline=None,
            suppress_health_check=[HealthCheck.too_slow],
        )
        def run(plan):
            store: list = []
            srv, _ = serve_layer(store, _GEO_FIELDS)
            try:
                url = f"http://127.0.0.1:{srv.server_address[1]}"
                sink = HttpEditsSink(url, ["name", "score"], key_field="name")
                expect: dict[str, float] = {}
                for i, (b, replay) in enumerate(plan):
                    rows = [(f"k{k}", float(v)) for k, v in b]
                    if len({r[0] for r in rows}) != len(rows):
                        # intra-batch duplicate key: the unique-key
                        # contract refuses the whole batch up front
                        # (found BY this property test — two same-key
                        # rows both classified as adds and duplicated)
                        with pytest.raises(DuplicateKeyError):
                            sink.upload_batch(rows, f"b{i}")
                        continue
                    sink.upload_batch(rows, f"b{i}")
                    if replay:  # at-least-once redelivery of the batch
                        sink.upload_batch(rows, f"b{i}")
                    for name, score in rows:
                        expect[name] = score
                got = {r["name"]: r["score"] for r in store}
                assert got == expect          # converged, nothing lost
                assert len(store) == len(expect)  # and nothing duplicated
            finally:
                srv.shutdown()

        run()


def test_edits_sink_rejects_null_upsert_key():
    """A NULL key can't address an upsert and would render as a bogus
    literal in the lookup IN list — refused up front."""
    from agol_pandas_spark.errors import MissingKeyError
    from agol_pandas_spark.sources.http_client import HttpEditsSink
    from agol_pandas_spark.sources.http_mock import serve_layer

    store: list = []
    srv, _ = serve_layer(store, _GEO_FIELDS)
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}"
        sink = HttpEditsSink(url, ["name", "score"], key_field="name")
        with pytest.raises(MissingKeyError, match="NULL"):
            sink.upload_batch([("ok", 1.0), (None, 2.0)], "b0")
        assert store == []  # nothing posted
    finally:
        srv.shutdown()


def test_from_pandas_sdf_roundtrip(spark):
    """to_pandas_sdf -> from_pandas_sdf must round-trip coordinates,
    attributes, wkid, and null shapes."""
    df = _pts(spark).withColumn(
        "x", F.when(F.col("id") == 4, F.lit(None)).otherwise(F.col("x"))
    )
    pdf = SpatialFrame.from_xy(df, wkid=3857).to_pandas_sdf()
    back = SpatialFrame.from_pandas_sdf(
        spark, pdf.drop(columns=["x", "y"]), wkid=None
    )
    assert back.wkid == 3857  # inferred from the SHAPE dicts
    rows = {r["id"]: (r["x"], r["y"]) for r in back.df.collect()}
    assert rows[2] == (20.0, -3.75)
    assert rows[4] == (None, None)  # null shape -> null coordinates
    with pytest.raises(ValueError, match="no 'SHAPE'"):
        SpatialFrame.from_pandas_sdf(spark, pdf.drop(columns=["SHAPE"]))
    with pytest.raises(ValueError, match="already exists"):
        SpatialFrame.from_pandas_sdf(spark, pdf)  # x/y still present


def test_from_pandas_sdf_real_world_missing_shapes(spark):
    """Code-review findings: pandas marks missing object cells as NaN
    (not None) after merges; Esri empty points carry explicit None
    coordinates; an all-missing SHAPE column must still infer float64
    coordinates."""
    import numpy as np
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "id": [1, 2, 3],
            "SHAPE": [
                {"x": 1.0, "y": 2.0, "spatialReference": {"wkid": 4326}},
                np.nan,                       # pandas missing marker
                {"x": None, "y": None},       # Esri empty point
            ],
        }
    )
    sf = SpatialFrame.from_pandas_sdf(spark, pdf)
    rows = {r["id"]: (r["x"], r["y"]) for r in sf.df.collect()}
    assert rows == {1: (1.0, 2.0), 2: (None, None), 3: (None, None)}

    all_null = pd.DataFrame({"id": [1, 2], "SHAPE": [None, np.nan]})
    sf2 = SpatialFrame.from_pandas_sdf(spark, all_null)
    assert [tuple(r) for r in sf2.df.orderBy("id").collect()] == [
        (1, None, None), (2, None, None),
    ]
    assert dict(sf2.df.dtypes)["x"] == "double"


def test_retry_policy_does_not_retry_validation_errors():
    """Deterministic engine errors (duplicate/NULL keys...) must surface
    immediately — not replay through max_attempts backoff sleeps."""
    from agol_pandas_spark.errors import DuplicateKeyError
    from agol_pandas_spark.sources.paged import RetryPolicy

    calls = {"n": 0}

    def always_invalid():
        calls["n"] += 1
        raise DuplicateKeyError("dup")

    policy = RetryPolicy(max_attempts=5, max_backoff=0.01)
    with pytest.raises(DuplicateKeyError):
        policy.run(always_invalid)
    assert calls["n"] == 1  # no retries

    # transient (non-engine) errors still retry
    flaky = {"n": 0}

    def transient_then_ok():
        flaky["n"] += 1
        if flaky["n"] < 3:
            raise RuntimeError("transient")
        return "ok"

    assert policy.run(transient_then_ok) == "ok"
    assert flaky["n"] == 3
