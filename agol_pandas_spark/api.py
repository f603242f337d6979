"""Reference-compatible API facade.

One function here per public entry point of ``GeoCodable/agol_pandas``
(``src/agol_pandas.py``), so a user of the reference can switch by
renaming imports. Differences, by design (SURVEY §2a):

- a :class:`~agol_pandas_spark.catalog.Catalog` replaces the ``gis``
  connection object (tables live in a Parquet namespace, not AGOL);
- errors raise typed exceptions instead of returning ``(str(e), False)``
  (the reference swallowed failures into the payload slot);
- nothing collects to the driver unless the caller explicitly asks for
  pandas (the reference collected the full frame once per chunk,
  ``src/agol_pandas.py:204``).

Each wrapper returns ``(payload, ok)`` tuples to match the reference's
calling convention (``:82-84`` et al.) — the payload is real data, and
``ok=False`` carries the stringified error exactly as the reference did,
for drop-in compatibility. New code should use the underlying operators
directly.
"""

from __future__ import annotations

from typing import Any

import pandas as pd
from pyspark.sql import DataFrame

from agol_pandas_spark.catalog import Catalog
from agol_pandas_spark.functions.names import normalize_service_name as _normalize
from agol_pandas_spark.functions.timestamps import timestamps_to_utc
from agol_pandas_spark.operators.chunking import iter_pandas_chunks
from agol_pandas_spark.operators.merge import (
    WriteMode,
    validate_unique_key,
    write_table,
)
from agol_pandas_spark.sources.writers import write_status


def hosted_table_to_df(catalog: Catalog, name: str) -> tuple[DataFrame | str, bool]:
    """Reference ``agol_hosted_item_to_sdf`` (``src/agol_pandas.py:218-251``):
    read a named table. Returns a *lazy* DataFrame — the full-scan-into-
    pandas behavior of the reference is available via ``.toPandas()``."""
    try:
        return catalog.table(name), True
    except Exception as e:  # reference convention: stringified error payload
        return str(e), False


def df_to_hosted_table(
    catalog: Catalog,
    df: DataFrame,
    name: str,
    mode: str = "append",
    upsert_column: str | None = None,
    chunk_size: int = 100_000,
    **_compat: Any,
) -> tuple[list[dict] | str, bool]:
    """Reference ``df_to_agol_hosted_table`` (``src/agol_pandas.py:314-475``):
    multi-mode write into an existing table.

    ``chunk_size`` is accepted for signature compatibility but ignored:
    chunking was an HTTP-payload workaround (``:315``); here the write is
    one distributed job. The returned payload matches the reference's
    per-chunk result dicts (``:459-461``) with partitions as "chunks".
    """
    try:
        if not catalog.exists(name):
            raise KeyError(f"table {name!r} does not exist (use create_* API)")
        write_table(catalog, df, name, mode=mode, key=upsert_column)
        status = write_status(catalog.table(name), upsert_column)
        return [r.asDict() for r in status.collect()], True
    except Exception as e:
        return str(e), False


def create_table(
    catalog: Catalog,
    table_name: str,
    df: DataFrame,
    key_field_name: str | None = None,
    item_properties: dict | None = None,
    **_compat: Any,
) -> tuple[str, bool]:
    """Reference ``create_table`` (``src/agol_pandas.py:477-544``): create
    a new named table from a DataFrame (errors if it exists), enforcing
    key uniqueness when a key is given (fixing ``:527-529`` where the
    constraint result was ignored).

    The key declaration and ``item_properties`` PERSIST in the
    catalog's properties sidecar — the reference records both
    server-side once (key index ``:253-312``, item_properties
    ``:477,519``); later keyed writes default their ``key=`` from the
    declaration, and ``Catalog.properties`` reads the metadata back."""
    try:
        props = dict(item_properties or {})
        props.setdefault("title", table_name)  # reference :517
        # fail BEFORE the table exists if the metadata can't persist
        # (non-JSON-serializable item_properties) — a post-write failure
        # would return (error, False) while leaving the table created,
        # so every retry dies on TableExistsError
        import json as _json

        _json.dumps(props)
        if key_field_name is not None:
            validate_unique_key(df, key_field_name, "source")
        path = catalog.write(df, table_name, mode="error")
        # replace=True: a stale sidecar orphaned by a crashed drop() of
        # a previous same-named table must not leak its declared key /
        # properties onto this fresh table
        catalog.set_properties(table_name, props, replace=True)
        if key_field_name is not None:
            catalog.set_declared_key(table_name, key_field_name)
        return path, True
    except Exception as e:
        return str(e), False


def create_hosted_table_from_dataframe(
    catalog: Catalog,
    df: DataFrame,
    service_name: str | None = None,
    table_name: str | None = None,
    key_field_name: str | None = None,
    item_properties: dict | None = None,
    **_compat: Any,
) -> tuple[list[dict] | str, bool]:
    """Reference ``create_hosted_table_from_dataframe``
    (``src/agol_pandas.py:546-680``): create-or-merge by name. Mode
    selection mirrors ``:600-604``: upsert when a key is given, append
    otherwise. Fixes the ``:581`` validation bug (reference raised when
    an id WAS supplied). On the CREATE path the key declaration and
    ``item_properties`` persist in the properties sidecar (reference
    ``:643,662`` passes them to publish); the merge path — like the
    reference — leaves existing metadata untouched."""
    try:
        name = service_name or table_name
        if not name:
            raise ValueError("either service_name or table_name is required")
        created = not catalog.exists(name)
        props = dict(item_properties or {})
        props.setdefault("title", name)
        if created:
            import json as _json

            _json.dumps(props)  # fail before creating, not after
        mode = WriteMode.UPSERT if key_field_name else WriteMode.APPEND
        write_table(catalog, df, name, mode=mode, key=key_field_name)
        if created:
            catalog.set_properties(name, props, replace=True)
            if key_field_name is not None:
                catalog.set_declared_key(name, key_field_name)
        status = write_status(catalog.table(name), key_field_name)
        return [r.asDict() for r in status.collect()], True
    except Exception as e:
        return str(e), False


def convert_dts_utc(df: DataFrame) -> tuple[DataFrame, bool]:
    """Reference ``convert_dts_utc`` (``src/agol_pandas.py:86-119``)."""
    try:
        return timestamps_to_utc(df), True
    except Exception as e:
        return str(e), False


def normalize_service_name(service_name: str) -> tuple[str, bool]:
    """Reference ``normalize_service_name`` (``src/agol_pandas.py:121-157``)."""
    try:
        return _normalize(service_name), True
    except Exception as e:
        return str(e), False


def df_to_pandas_chunks(
    df: DataFrame, chunk_size: int = 100_000, keys: list[str] | None = None
):
    """Reference ``df_to_pandas_chunks`` (``src/agol_pandas.py:159-216``):
    ordered pandas chunks on the driver — streamed one partition at a
    time (the reference re-collected the whole frame per chunk, ``:204``)
    and working for keyless input (reference NameError, ``:212-213``)."""
    yield from iter_pandas_chunks(df, chunk_size=chunk_size, keys=keys or ())


def set_unique_key_constraint(
    catalog: Catalog, table_name: str, key_field_name: str
) -> tuple[bool | str, bool]:
    """Reference ``set_unique_key_constraint`` (``src/agol_pandas.py:253-312``).
    Spark has no index DDL; the engine validates the existing table,
    then RECORDS the declaration in the catalog's properties sidecar —
    the analogue of the reference's one-time server-side unique index:
    declared once, every later keyed write defaults its ``key=`` from
    it and validates against it. Returns the reference's (result, ok)
    convention: ``(True, True)`` on success, ``(error_str, False)`` on
    failure."""
    try:
        validate_unique_key(catalog.table(table_name), key_field_name, "target")
        catalog.set_declared_key(table_name, key_field_name)
        return True, True
    except Exception as e:
        return str(e), False


# -- exact-name aliases for drop-in migration --------------------------------
# the reference's function names verbatim (src/agol_pandas.py public
# surface), so existing call sites work unchanged after swapping the
# `gis` handle for a Catalog
agol_hosted_item_to_sdf = hosted_table_to_df
df_to_agol_hosted_table = df_to_hosted_table


def get_temp_file(suffix: str = ".csv") -> tuple[str, bool]:
    """Reference ``get_temp_file`` (``src/agol_pandas.py:70-84``): a temp
    path factory. The engine never stages through temp CSVs (parquet +
    atomic commit), but the utility stays for callers that used it
    directly."""
    import tempfile

    try:
        f = tempfile.NamedTemporaryFile(suffix=suffix, delete=False)
        f.close()
        return f.name, True
    except Exception as e:
        return str(e), False


class LoggingObject:
    """Reference ``LoggingObject`` (``src/agol_pandas.py:8-41``): driver-side
    run/failure bookkeeping with a randomized, ratcheting backoff window.

    The engine itself needs no inter-chunk throttling (local parquet, no
    REST quota), but the object is part of the reference's public surface
    and the policy transfers directly to a future REST DataSource V2
    connector. Faithful semantics, minus the reference's dead
    ``max_reattempts`` (declared but never consumed, ``:11``).
    """

    def __init__(
        self,
        max_backoff: float = 30.0,
        min_backoff: float = 0.0,
        backoff_interval: float = 0.1,
    ):
        self.max_backoff = max_backoff
        self.min_backoff = min_backoff
        self.backoff_interval = backoff_interval
        self.backoff = 0.0
        self.failures = 0
        self.logging_info: list[dict] = []
        self.fail_log: list[dict] = []

    def set_backoff(self) -> None:
        """Ratchet the lower bound up by ``backoff_interval`` per failure
        and draw uniformly from [min, max] (reference ``:20-32``)."""
        import random

        self.min_backoff = min(
            self.max_backoff, self.min_backoff + self.backoff_interval * self.failures
        )
        self.backoff = random.uniform(self.min_backoff, self.max_backoff)

    def record_logging(self, info: dict) -> None:
        self.logging_info.append(info)

    def record_failure(self, info: dict) -> None:
        self.fail_log.append(info)
        self.failures += 1
        self.set_backoff()


#: module singleton, reference ``AP_LOG`` (``src/agol_pandas.py:43``)
AP_LOG = LoggingObject()
