"""Sources & sinks: format readers and the mode-dispatching writer."""

from agol_pandas_spark.sources.readers import read_csv_inferred, read_json, read_parquet
from agol_pandas_spark.sources.writers import save_dataframe

__all__ = ["read_parquet", "read_csv_inferred", "read_json", "save_dataframe"]
