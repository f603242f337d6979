"""Timestamp normalization to UTC.

The reference scans every column for datetime dtype and forces it to UTC —
naive columns are *localized* (assumed UTC), aware columns are *converted*
(``src/agol_pandas.py:86-119``). In this engine the session time zone is
pinned to UTC (see ``session.py``), so Spark ``TimestampType`` values are
already UTC instants; what remains is (a) columns carrying a known
non-UTC source zone and (b) string columns with explicit offsets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def timestamps_to_utc(df: DataFrame, source_zones: dict[str, str] | None = None) -> DataFrame:
    """Normalize all timestamp columns of ``df`` to UTC instants.

    ``source_zones`` maps column name → IANA zone for naive columns whose
    wall-clock values were recorded in a non-UTC zone (the reference's
    ``tz_localize`` case, ``src/agol_pandas.py:106-107``); unlisted
    timestamp columns are assumed UTC already (session TZ invariant).
    ``TimestampNTZType`` columns are cast to instants under the same rule.
    """
    source_zones = source_zones or {}
    out = df
    for field in df.schema.fields:
        name = field.name
        if isinstance(field.dataType, T.TimestampNTZType):
            zone = source_zones.get(name, "UTC")
            out = out.withColumn(name, F.to_utc_timestamp(F.col(name).cast("timestamp"), zone))
        elif isinstance(field.dataType, T.TimestampType) and name in source_zones:
            out = out.withColumn(name, F.to_utc_timestamp(name, source_zones[name]))
    return out


def parse_offset_string_to_utc(col: Column | str) -> Column:
    """Parse ISO-8601 strings with explicit offsets into UTC timestamps
    (covers the reference's tz-aware ``tz_convert`` branch,
    ``src/agol_pandas.py:112-113``). With session TZ = UTC,
    ``to_timestamp`` honors the embedded offset and yields the UTC instant.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.to_timestamp(c)
