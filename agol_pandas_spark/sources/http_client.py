"""HTTP transport for the paged connector — the reference's actual wire
path, implemented against the public ArcGIS REST *query* contract.

The reference reads a hosted table through ``arcgis``'s
``table.query(return_all_records=True)`` (``src/agol_pandas.py:246``) —
one unbounded request, no pushdown, no projection, no paging control.
:class:`HttpPagedClient` speaks the same documented REST endpoint
directly (``<layer-url>/query`` with ``resultOffset`` /
``resultRecordCount`` / ``returnCountOnly`` / ``where`` / ``outFields``
— all public API parameters) and plugs into :class:`sources.paged.
PagedClient`, which gives it everything the reference lacked: one Spark
task per page, executor-side ratcheting retry, Catalyst filter pushdown
compiled to a server-side ``where``, and column projection via
``outFields``.

Env-gating: the sandbox has no network or credentials, so nothing in
this module is exercised against a live service here. Tests drive it
against an in-process ``http.server`` fake implementing the same JSON
contract (tests/test_paged_source.py) — the transport, paging math,
where-compilation, and schema mapping are all real; only the host is
fake. A live run needs only a reachable layer URL (and optionally a
``token``).

The client is deliberately ``requests``-free: stdlib ``urllib`` keeps
the executor-side dependency surface empty (clients are pickled and
shipped to executors).
"""

from __future__ import annotations

import json
import urllib.parse
import urllib.request
from collections.abc import Sequence

from pyspark.sql import types as T

from agol_pandas_spark.sources.paged import PagedClient, PushedFilter

__all__ = ["HttpPagedClient", "compile_where"]

# public Esri field type → Spark type (the subset the reference's CSV
# staging could round-trip, src/agol_pandas.py:441-447, plus dates)
_ESRI_TYPES: dict[str, T.DataType] = {
    "esriFieldTypeOID": T.LongType(),
    "esriFieldTypeInteger": T.LongType(),
    "esriFieldTypeSmallInteger": T.IntegerType(),
    "esriFieldTypeDouble": T.DoubleType(),
    "esriFieldTypeSingle": T.FloatType(),
    "esriFieldTypeString": T.StringType(),
    "esriFieldTypeDate": T.TimestampType(),
    "esriFieldTypeGUID": T.StringType(),
}


def _sql_literal(v: object) -> str:
    """Render a Python scalar as a SQL-92 literal for the service's
    ``where`` parameter (the dialect ArcGIS layers document)."""
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, bool):
        return "1" if v else "0"
    return str(v)


def compile_where(filters: Sequence[PushedFilter]) -> tuple[str, list[PushedFilter]]:
    """Compile pushed-filter specs to one conjunctive SQL-92 ``where``
    string. Returns (where, applied): specs whose op has no SQL-92
    rendering are left out of both — they stay in the Spark plan."""
    clauses: list[str] = []
    applied: list[PushedFilter] = []
    for f in filters:
        c = f.column
        if f.op in ("=", "<>", ">", ">=", "<", "<="):
            clauses.append(f"{c} {f.op} {_sql_literal(f.value)}")
        elif f.op == "in":
            vals = ", ".join(_sql_literal(v) for v in f.value)
            clauses.append(f"{c} IN ({vals})")
        elif f.op == "isnull":
            clauses.append(f"{c} IS NULL")
        elif f.op == "notnull":
            clauses.append(f"{c} IS NOT NULL")
        elif f.op in ("startswith", "endswith", "contains"):
            # a % or _ inside the user value would act as a LIKE wildcard
            # on the server — and since applied filters are REMOVED from
            # the Spark plan (no recheck), that would silently return
            # wrong rows. SQL-92 ESCAPE support varies by service, so
            # decline the pushdown instead: the filter stays a residual
            # and Spark evaluates the literal semantics itself.
            if "%" in str(f.value) or "_" in str(f.value):
                continue
            if f.op == "startswith":
                clauses.append(f"{c} LIKE {_sql_literal(str(f.value) + '%')}")
            elif f.op == "endswith":
                clauses.append(f"{c} LIKE {_sql_literal('%' + str(f.value))}")
            else:
                clauses.append(
                    f"{c} LIKE {_sql_literal('%' + str(f.value) + '%')}"
                )
        else:
            continue
        applied.append(f)
    return " AND ".join(clauses) or "1=1", applied


class HttpPagedClient(PagedClient):
    """Offset-paged reader for an ArcGIS-style REST layer endpoint.

    Parameters mirror the public query API: every request is
    ``GET <layer_url>/query?f=json&...``. Holds only plain config so it
    pickles to executors; each task opens its own connections.
    """

    def __init__(
        self,
        layer_url: str,
        where: str = "1=1",
        out_fields: Sequence[str] | None = None,
        token: str | None = None,
        timeout_sec: float = 30.0,
    ):
        self.layer_url = layer_url.rstrip("/")
        self.where = where
        self.out_fields = list(out_fields) if out_fields is not None else None
        self.token = token
        self.timeout_sec = float(timeout_sec)
        self._schema_cache: T.StructType | None = None

    # -- transport ----------------------------------------------------
    def _get(self, **params: object) -> dict:
        q = {"f": "json", "where": self.where, **params}
        if self.token:
            q["token"] = self.token
        url = f"{self.layer_url}/query?{urllib.parse.urlencode(q)}"
        with urllib.request.urlopen(url, timeout=self.timeout_sec) as r:
            payload = json.loads(r.read().decode("utf-8"))
        if "error" in payload:
            # fail loudly (the reference swallowed errors into
            # ``(str(e), False)`` tuples — SURVEY §2a bug list)
            raise RuntimeError(f"paged service error: {payload['error']}")
        return payload

    # -- PagedClient contract -----------------------------------------
    def schema(self) -> T.StructType:
        if self._schema_cache is None:
            fields = self._get(resultRecordCount=1, outFields=self._out())[
                "fields"
            ]
            self._schema_cache = T.StructType(
                [
                    T.StructField(
                        f["name"],
                        _ESRI_TYPES.get(f["type"], T.StringType()),
                    )
                    for f in fields
                ]
            )
        return self._schema_cache

    def total_count(self) -> int | None:
        return int(self._get(returnCountOnly="true")["count"])

    def fetch_page(self, offset: int, limit: int) -> Sequence[tuple]:
        payload = self._get(
            resultOffset=offset,
            resultRecordCount=limit,
            outFields=self._out(),
        )
        names = [f.name for f in self.schema().fields]
        return [
            tuple(feat["attributes"].get(n) for n in names)
            for feat in payload.get("features", [])
        ]

    def _out(self) -> str:
        return ",".join(self.out_fields) if self.out_fields else "*"

    # -- pushdown / projection ----------------------------------------
    def pushdown(self, filters: Sequence[PushedFilter]):
        where, applied = compile_where(filters)
        if not applied:
            return None
        combined = (
            where if self.where in ("", "1=1") else f"({self.where}) AND {where}"
        )
        return (
            HttpPagedClient(
                self.layer_url,
                where=combined,
                out_fields=self.out_fields,
                token=self.token,
                timeout_sec=self.timeout_sec,
            ),
            applied,
        )

    def project(self, columns: Sequence[str]):
        return HttpPagedClient(
            self.layer_url,
            where=self.where,
            out_fields=columns,
            token=self.token,
            timeout_sec=self.timeout_sec,
        )

    # pickling: drop the schema cache (executors re-fetch lazily)
    def __getstate__(self):
        state = dict(self.__dict__)
        state["_schema_cache"] = None
        return state
