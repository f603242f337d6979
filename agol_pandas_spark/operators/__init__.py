"""Engine operators: merge modes, chunking, dedup, similarity, text ops."""

from agol_pandas_spark.operators.merge import (
    WriteMode,
    merge,
    validate_unique_key,
    write_table,
)
from agol_pandas_spark.operators.chunking import (
    partition_lineage,
    repartition_by_sorted_range,
    with_chunk_id,
)

__all__ = [
    "WriteMode",
    "merge",
    "validate_unique_key",
    "write_table",
    "with_chunk_id",
    "repartition_by_sorted_range",
    "partition_lineage",
]
