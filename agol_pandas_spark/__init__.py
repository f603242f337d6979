"""agol_pandas_spark — a PySpark-native analytics engine.

A ground-up re-expression of the capabilities of the reference library
``GeoCodable/agol_pandas`` (a pandas↔ArcGIS-Online bulk read/write client,
``src/agol_pandas.py``) as an idiomatic, distributed PySpark engine:

- the reference's read path (full-table scan into pandas,
  ``src/agol_pandas.py:218-251``) becomes a lazy catalog-backed Parquet scan
  with Catalyst predicate pushdown and column pruning;
- its write modes (append/overwrite/upsert/update/insert,
  ``src/agol_pandas.py:314-475``) become join-rewrite merge plans executed
  shuffle-side, never on the driver;
- its sort-and-chunk batching (``src/agol_pandas.py:159-216``) becomes
  range partitioning / window bucketing;
- and the engine adds the LLM-data-pipeline operator layer (dedup,
  similarity search, text analysis, multimodal columns) the reference
  lacks, each designed for 100 TB scale.

Nothing here is a port: every operator is declared through the DataFrame
API so Catalyst/Tungsten pick the physical strategy.
"""

from agol_pandas_spark.catalog import Catalog
from agol_pandas_spark.operators.merge import WriteMode, merge, snapshot_diff, write_table
from agol_pandas_spark.session import get_spark

# reference-compatible facade (1:1 names with src/agol_pandas.py's public
# surface) lives in agol_pandas_spark.api
from agol_pandas_spark import api  # noqa: E402  (import order: facade needs core)

__version__ = "0.1.0"

__all__ = [
    "Catalog",
    "WriteMode",
    "api",
    "get_spark",
    "merge",
    "snapshot_diff",
    "write_table",
    "__version__",
]
