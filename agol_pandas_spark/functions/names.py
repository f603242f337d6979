"""Service/table name normalization.

Reference semantics (``src/agol_pandas.py:121-157``): trim; prefix ``_`` if
the name starts with a digit; replace every non-word char with ``_``;
collapse runs of ``_``; lowercase; truncate to 128 chars. Provided twice:

- :func:`normalize_service_name` — plain Python, used by the catalog to
  name tables (a driver-side concern, exactly as in the reference);
- :func:`normalize_service_name_col` — the same rules as a Column
  expression built from JVM string functions, so normalizing a *column of
  names* is codegen'd and distributed, never a Python UDF.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_service_name(name: str, max_len: int = 128) -> str:
    """Normalize a single name (reference ``src/agol_pandas.py:139-153``)."""
    if name is None:
        raise ValueError("name must not be None")
    out = name.strip()
    if re.match(r"^\d", out):
        out = "_" + out
    out = re.sub(r"[^\w]", "_", out)
    out = re.sub(r"_+", "_", out)
    out = out.lower()
    return out[:max_len]


def normalize_service_name_col(col: Column | str, max_len: int = 128) -> Column:
    """Column-expression flavor of the same rules (all JVM built-ins)."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.trim(c)
    c = F.when(c.rlike(r"^\d"), F.concat(F.lit("_"), c)).otherwise(c)
    c = F.regexp_replace(c, r"[^\w]", "_")
    c = F.regexp_replace(c, r"_+", "_")
    c = F.lower(c)
    return F.substring(c, 1, max_len)


def backticked(column_name: str) -> str:
    """Quote a column name for parsed-name contexts (``F.col``,
    ``groupBy(str)``): dots would otherwise resolve as struct-field
    access and backticks terminate the quote early. Spark's escape for a
    literal backtick is doubling it."""
    return "`" + column_name.replace("`", "``") + "`"
