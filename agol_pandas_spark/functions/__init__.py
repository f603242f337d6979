"""Scalar / columnar function layer.

Everything here is built from ``pyspark.sql.functions`` (JVM-side,
whole-stage-codegen friendly); Python executes only at plan-build time.
"""

from agol_pandas_spark.functions.names import (
    normalize_service_name,
    normalize_service_name_col,
)
from agol_pandas_spark.functions.timestamps import timestamps_to_utc
from agol_pandas_spark.functions.vectors import (
    cosine_similarity,
    dot_product,
    l2_norm,
)

__all__ = [
    "normalize_service_name",
    "normalize_service_name_col",
    "timestamps_to_utc",
    "cosine_similarity",
    "dot_product",
    "l2_norm",
]
