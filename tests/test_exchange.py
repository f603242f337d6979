"""Exchange-surface tests: Arrow-batch transforms stay on executors and
preserve values exactly."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from pyspark.sql import functions as F

from agol_pandas_spark.exchange import grouped_apply, map_arrow_batches, map_batches


def test_map_arrow_batches_zero_copy_kernel(spark):
    df = spark.range(1000).select(F.col("id"), (F.col("id") * 2).alias("v"))

    def double_v(batches):
        for b in batches:
            yield pa.RecordBatch.from_arrays(
                [b.column(0), pc.multiply(b.column(1), 2)], names=["id", "v"]
            )

    out = map_arrow_batches(df, double_v, "id long, v long")
    rows = {r.id: r.v for r in out.collect()}
    assert rows == {i: i * 4 for i in range(1000)}


def test_map_batches_pandas(spark):
    df = spark.range(100).select(F.col("id"))

    def add_one(pdfs):
        for pdf in pdfs:
            pdf["id"] = pdf["id"] + 1
            yield pdf

    out = map_batches(df, add_one, "id long")
    assert sorted(r.id for r in out.collect()) == list(range(1, 101))
