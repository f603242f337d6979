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
import time
import urllib.parse
import urllib.request
from collections.abc import Sequence

from pyspark.sql import types as T

from agol_pandas_spark.errors import EngineError
from agol_pandas_spark.sources.paged import PagedClient, PagedSink, PushedFilter

__all__ = [
    "AuthError",
    "EditsError",
    "HttpEditsSink",
    "HttpPagedClient",
    "ServiceError",
    "TokenProvider",
    "compile_where",
]

# token-rejection codes the public REST contract documents: 498 invalid
# token, 499 token required, 401 unauthorized
_AUTH_ERROR_CODES = frozenset({401, 498, 499})


class AuthError(EngineError, RuntimeError):
    """Authentication failed terminally: the token endpoint rejected the
    credentials, or the service rejected a token that was just refreshed
    (one refresh-and-retry is attempted before giving up).

    Derives from :class:`~agol_pandas_spark.errors.EngineError` so the
    connector's :class:`~agol_pandas_spark.sources.paged.RetryPolicy`
    surfaces it immediately instead of replaying bad credentials through
    ratcheting backoff sleeps (on a live service, enough re-POSTs to
    trip an account lockout); RuntimeError is kept for callers matching
    the transport's generic error class."""


class ServiceError(RuntimeError):
    """A non-auth error REPORTED BY the service as a JSON error body.
    ``code`` carries the documented ArcGIS error code so callers can
    tell a CAPABILITY rejection (400 — invalid/unsupported parameters,
    the code a layer answers for ``outStatistics`` it cannot evaluate)
    from a TRANSIENT server failure (5xx, timeouts surfacing as JSON) —
    the distinction ADVICE r10 flagged: only the former should decline
    a pushdown to the Spark-side fallback; the latter must propagate so
    ``RetryPolicy`` retries it. Derives from RuntimeError, so existing
    ``except RuntimeError`` transport handling is unchanged."""

    def __init__(self, message: str, code: int | None = None):
        super().__init__(message)
        self.code = code


class TokenProvider:
    """Credential-backed token lifecycle for the HTTP transports — the
    slot the reference's ``gis`` handle encapsulated
    (``src/agol_pandas.py:237``: ``arcgis.GIS`` holds the credentials
    and silently re-tokens).

    Speaks the public ``generateToken`` contract: POST
    ``{username, password, client: requestip, f: json}`` →
    ``{"token", "expires": epoch_ms}``. ``get()`` returns the cached
    token while it has more than ``margin_sec`` of life left and
    re-acquires otherwise; ``get(force_refresh=True)`` is the 498-retry
    path (the service is the authority on validity — a token can die
    before its advertised expiry).

    Executor posture: plain picklable config; the cached token ships in
    the pickle when still valid, and each task refreshes independently
    when it is not — tokens are bearer state, not coordination state,
    so N executors holding N distinct live tokens is correct.
    """

    def __init__(
        self,
        token_url: str,
        username: str,
        password: str,
        expiration_minutes: int = 60,
        margin_sec: float = 30.0,
        timeout_sec: float = 30.0,
    ):
        self.token_url = token_url
        self.username = username
        self.password = password
        self.expiration_minutes = int(expiration_minutes)
        self.margin_sec = float(margin_sec)
        self.timeout_sec = float(timeout_sec)
        self._token: str | None = None
        self._expires_at: float = 0.0

    def get(self, force_refresh: bool = False) -> str:
        if (
            not force_refresh
            and self._token is not None
            and time.time() < self._expires_at - self.margin_sec
        ):
            return self._token
        body = urllib.parse.urlencode(
            {
                "f": "json",
                "username": self.username,
                "password": self.password,
                "client": "requestip",
                "expiration": self.expiration_minutes,
            }
        ).encode("utf-8")
        with urllib.request.urlopen(
            self.token_url, data=body, timeout=self.timeout_sec
        ) as r:
            payload = json.loads(r.read().decode("utf-8"))
        if "error" in payload or "token" not in payload:
            raise AuthError(
                f"token acquisition failed: {payload.get('error', payload)}"
            )
        self._token = payload["token"]
        # expires is epoch ms; absent -> trust only the forced-refresh path
        self._expires_at = float(payload.get("expires", 0)) / 1000.0
        return self._token


def _resolve_token(token, force_refresh: bool = False) -> str | None:
    """A transport's ``token`` slot is either a static string (the
    pre-r8 surface, unchanged) or a :class:`TokenProvider`."""
    if token is None or isinstance(token, str):
        return token
    return token.get(force_refresh=force_refresh)


def _authed_request(
    token, url_base: str, params: dict, data: dict | None, timeout_sec: float
) -> dict:
    """One JSON request with the token lifecycle applied: attach the
    current token, and on a 498/499/401 rejection refresh ONCE and
    retry — a second rejection (or any rejection with a static token)
    raises :class:`AuthError`. Non-auth service errors raise loudly as
    before (the reference swallowed them into ``(str(e), False)``)."""
    can_refresh = token is not None and not isinstance(token, str)
    for attempt in (0, 1):
        q = dict(params)
        tok = _resolve_token(token, force_refresh=attempt == 1)
        if tok:
            q["token"] = tok
        url = f"{url_base}?{urllib.parse.urlencode(q)}"
        body = None
        if data is not None:
            body = urllib.parse.urlencode({"f": "json", **data}).encode("utf-8")
        with urllib.request.urlopen(url, data=body, timeout=timeout_sec) as r:
            payload = json.loads(r.read().decode("utf-8"))
        if "error" in payload:
            code = payload["error"].get("code")
            if code in _AUTH_ERROR_CODES:
                if can_refresh and attempt == 0:
                    continue  # refresh-and-retry exactly once
                raise AuthError(
                    f"service rejected the token (code {code}): "
                    f"{payload['error']}"
                )
            raise ServiceError(
                f"paged service error: {payload['error']}", code=code
            )
        return payload
    raise AssertionError("unreachable")  # pragma: no cover

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

    ``token`` is either a static token string or a
    :class:`TokenProvider` (credential-backed lifecycle: lazy
    acquisition, expiry-margin refresh, one forced refresh-and-retry on
    a 498/499/401 rejection — including mid-pagination, since every
    window request goes through the same authed transport).
    """

    def __init__(
        self,
        layer_url: str,
        where: str = "1=1",
        out_fields: Sequence[str] | None = None,
        token: str | None = None,
        timeout_sec: float = 30.0,
        geometry: bool = False,
    ):
        self.layer_url = layer_url.rstrip("/")
        self.where = where
        self.out_fields = list(out_fields) if out_fields is not None else None
        self.token = token
        self.timeout_sec = float(timeout_sec)
        # spatial layers: returnGeometry=true and each feature carries a
        # point geometry OUTSIDE its attributes — surfaced as two double
        # columns ``shape_x``/``shape_y`` (the reference read layers the
        # same way, materializing query_results.sdf's SHAPE column,
        # src/agol_pandas.py:246)
        self.geometry = bool(geometry)
        self._schema_cache: T.StructType | None = None

    # -- transport ----------------------------------------------------
    def _get(self, **params: object) -> dict:
        q = {"f": "json", "where": self.where, **params}
        return _authed_request(
            self.token, f"{self.layer_url}/query", q, None, self.timeout_sec
        )

    # -- PagedClient contract -----------------------------------------
    def schema(self) -> T.StructType:
        if self._schema_cache is None:
            fields = self._get(resultRecordCount=1, outFields=self._out())[
                "fields"
            ]
            if self.out_fields is not None:
                # services answer outFields in LAYER-DEFINITION order, not
                # request order — but the projection contract requires the
                # schema to equal the requested columns VERBATIM (ADVICE
                # r7). Reorder to the request, and fail loudly on a field
                # the service does not know rather than serving a narrower
                # frame than the plan promised.
                by_name = {f["name"]: f for f in fields}
                missing = [n for n in self.out_fields if n not in by_name]
                if missing:
                    raise RuntimeError(
                        f"service did not return requested field(s) "
                        f"{missing}; it knows {sorted(by_name)}"
                    )
                fields = [by_name[n] for n in self.out_fields]
            cols = [
                T.StructField(
                    f["name"],
                    _ESRI_TYPES.get(f["type"], T.StringType()),
                )
                for f in fields
            ]
            if self.geometry:
                cols.append(T.StructField("shape_x", T.DoubleType()))
                cols.append(T.StructField("shape_y", T.DoubleType()))
            self._schema_cache = T.StructType(cols)
        return self._schema_cache

    def total_count(self) -> int | None:
        return int(self._get(returnCountOnly="true")["count"])

    def fetch_page(self, offset: int, limit: int) -> Sequence[tuple]:
        """Fetch ALL rows in the logical window [offset, offset+limit).

        Live services enforce a server-side ``maxRecordCount`` cap: a
        request for ``limit`` rows may legally come back with fewer rows
        plus ``exceededTransferLimit: true``. The page planner
        (``sources/paged.py``) sizes its windows from ``page_size``, so
        trusting one wire call per window would SILENTLY DROP the capped
        remainder of every window. Loop inside the window instead:
        re-request from the high-water mark until the window is full or
        the service signals genuine exhaustion (a short page WITHOUT the
        flag). The reference hit the same cap through ``arcgis``'s
        ``return_all_records=True`` re-query loop
        (``src/agol_pandas.py:246``); here the loop is per-window so
        pages still fetch in parallel across tasks."""
        names = [f.name for f in self.schema().fields]
        if self.geometry:
            names = names[:-2]  # shape_x/shape_y come from the geometry
        out: list[tuple] = []
        while len(out) < limit:
            ask = limit - len(out)
            params: dict = {
                "resultOffset": offset + len(out),
                "resultRecordCount": ask,
                "outFields": self._out(),
            }
            if self.geometry:
                params["returnGeometry"] = "true"
            payload = self._get(**params)
            # defensive truncation (ADVICE r7): a misbehaving service that
            # over-serves a window must never push rows past it — those
            # rows belong to the NEXT planned partition and would duplicate
            feats = list(payload.get("features", []))[:ask]
            if self.geometry:
                out.extend(
                    tuple(feat["attributes"].get(n) for n in names)
                    + (
                        (feat.get("geometry") or {}).get("x"),
                        (feat.get("geometry") or {}).get("y"),
                    )
                    for feat in feats
                )
            else:
                out.extend(
                    tuple(feat["attributes"].get(n) for n in names)
                    for feat in feats
                )
            if len(feats) >= ask:
                break
            if not payload.get("exceededTransferLimit"):
                break  # short page, no flag: window genuinely exhausted
            if not feats:
                # flag set but zero rows served: the service cannot make
                # progress — fail loudly instead of spinning or, worse,
                # returning a silently-truncated window
                raise RuntimeError(
                    "paged service signalled exceededTransferLimit but "
                    f"served 0 rows at offset {offset + len(out)}"
                )
        return out

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
                geometry=self.geometry,
            ),
            applied,
        )

    def aggregate(
        self,
        group_by: Sequence[str],
        stats: Sequence[tuple],
        having: str | None = None,
    ):
        """Server-side grouped statistics via the public
        ``outStatistics`` / ``groupByFieldsForStatistics`` / ``having``
        query parameters — evaluated against this client's ``where``
        view, so a pushed-down filter composes with the aggregation on
        the service. Declines (returns None → Spark-side fallback) when
        a stat type has no outStatistics rendering, when ``having`` is
        requested without a group (ArcGIS defines ``having`` only with
        ``groupByFieldsForStatistics``), and when the service answers a
        CAPABILITY rejection (error code 400 — the code a layer with
        ``supportsStatistics: false`` or without having-support
        returns) — a declined aggregate costs transfer, never
        correctness. A TRANSIENT service failure (5xx-class JSON error,
        network error) PROPAGATES instead of declining (ADVICE r10):
        swallowing it would skip the caller's ``RetryPolicy`` and
        silently force a full transfer for a one-off blip. Auth
        rejections still raise :class:`AuthError` (they would fail the
        fallback identically).

        ``stats`` types: count/sum/min/max/avg plus ``stddev``/``var``
        (SAMPLE forms, n-1 denominator — what both the ArcGIS
        ``outStatistics`` contract and Spark's ``stddev``/``variance``
        compute; NULL for single-row groups). Float caveat: stddev/var
        (and avg) are float results — the service's accumulation order
        is its own, so cross-path parity is approximate in the last
        decimals; the repo-wide quantize-first discipline applies when
        exactness matters (pre-quantize the measure and push sum/count,
        deriving moments client-side)."""
        import json as _json

        supported = {"count", "sum", "min", "max", "avg", "stddev", "var"}
        if not stats or any(t not in supported for t, _, _ in stats):
            return None
        if having and not group_by:
            return None
        out_stats = [
            {
                "statisticType": t,
                # ArcGIS requires onStatisticField even for count; any
                # known field is legal there (count counts rows)
                "onStatisticField": c,
                "outStatisticFieldName": alias,
            }
            for t, c, alias in stats
        ]
        params: dict = {"outStatistics": _json.dumps(out_stats)}
        if group_by:
            params["groupByFieldsForStatistics"] = ",".join(group_by)
        if having:
            params["having"] = having
        try:
            payload = self._get(**params)
        except AuthError:
            raise
        except ServiceError as ex:
            if ex.code == 400:
                # capability rejection: decline → Spark-side fallback
                return None
            # transient: let RetryPolicy retry — never silently pay a
            # full transfer for a blip
            raise
        by_name = {f["name"]: f for f in payload.get("fields", [])}
        names = list(group_by) + [alias for _, _, alias in stats]
        missing = [n for n in names if n not in by_name]
        if missing:
            raise RuntimeError(
                f"outStatistics response lacks field(s) {missing}; "
                f"it carries {sorted(by_name)}"
            )
        schema = T.StructType(
            [
                T.StructField(
                    n, _ESRI_TYPES.get(by_name[n]["type"], T.StringType())
                )
                for n in names
            ]
        )

        def _coerce(v, dt):
            # JSON numbers arrive as int when whole (a Double field
            # holding 5, not 5.0) — createDataFrame is type-strict
            if v is not None and isinstance(dt, (T.DoubleType, T.FloatType)):
                return float(v)
            return v

        rows = [
            tuple(
                _coerce(feat["attributes"].get(n), f.dataType)
                for n, f in zip(names, schema.fields)
            )
            for feat in payload.get("features", [])
        ]
        return schema, rows

    def project(self, columns: Sequence[str]):
        # the shape columns are not service fields: they ride the
        # feature geometry, always trailing the attributes in this
        # client's schema. Accept the projection only when the request
        # matches that shape exactly (attrs..., then both shape cols or
        # neither) — anything else is declined and pruned Spark-side,
        # since the contract requires the projected schema to equal
        # ``columns`` verbatim.
        attrs = [c for c in columns if c not in ("shape_x", "shape_y")]
        want_geom = list(columns[len(attrs) :]) == ["shape_x", "shape_y"]
        if not want_geom and len(attrs) != len(columns):
            return None  # shape cols requested out of order / alone
        if want_geom and not attrs:
            return None  # geometry-only: outFields can't go empty
        return HttpPagedClient(
            self.layer_url,
            where=self.where,
            out_fields=attrs,
            token=self.token,
            timeout_sec=self.timeout_sec,
            geometry=self.geometry and want_geom,
        )

    # pickling: drop the schema cache (executors re-fetch lazily)
    def __getstate__(self):
        state = dict(self.__dict__)
        state["_schema_cache"] = None
        return state


class EditsError(RuntimeError):
    """One or more edits in an applyEdits call failed. Carries the
    per-row result dicts the service returned so the caller can see
    WHICH rows and WHY — the reference swallowed the whole upload into
    an ``(str(e), False)`` tuple (SURVEY §2a bug list)."""

    def __init__(self, message: str, results: list[dict]):
        super().__init__(message)
        self.results = results


def _edit_value(v: object) -> object:
    """Render one attribute value for the applyEdits JSON body. The
    public contract sends dates as epoch milliseconds."""
    import datetime as _dt

    if isinstance(v, _dt.datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=_dt.timezone.utc)
        return int(v.timestamp() * 1000)
    if isinstance(v, _dt.date):
        return int(
            _dt.datetime(v.year, v.month, v.day, tzinfo=_dt.timezone.utc).timestamp()
            * 1000
        )
    return v


class HttpEditsSink(PagedSink):
    """Write transport over a layer's synchronous ``applyEdits``
    endpoint — the wire operation under the reference's edit path
    (``tgt_table.append(..., rollback=True, upsert=...,
    upsert_matching_field=...)``, ``src/agol_pandas.py:445-455``),
    without the CSV-item staging (``content.add`` → ``analyze`` →
    ``publishParameters``) that path needed only because it shipped
    whole files; rows here post directly as JSON edits.

    Modes
    -----
    - ``key_field=None``: every row is an **add** (the reference's
      ``mode='add'``). NOT replay-idempotent — a re-delivered batch
      inserts again. Use only under exactly-once delivery.
    - ``key_field='k'``: **upsert** on ``k`` (the reference's
      ``upsert_matching_field``). Each batch looks up existing keys
      server-side (chunked ``IN`` queries projecting only the key; the
      OID comes back via ``objectIdFieldName``) and splits the batch
      into adds vs OID-addressed updates. Replay-idempotent: a
      re-delivered batch updates instead of duplicating — safe under
      the connector's at-least-once delivery (:class:`PagedSink`).

    Failure semantics: ``rollbackOnFailure=true`` is sent by default
    and ANY per-edit failure raises :class:`EditsError` with the
    service's per-row results — fail loudly, never partially-succeed
    silently.

    Timestamp contract: dates post as epoch MILLISECONDS, and a NAIVE
    datetime is interpreted as UTC — this engine pins
    ``spark.sql.session.timeZone=UTC`` (``Catalog.__init__``), so rows
    coming off engine DataFrames are UTC instants by construction. Rows
    built outside the engine carrying session-local naive timestamps
    must be localized by the caller first (ADVICE r7: the assumption is
    now the documented contract, not an accident).

    ``token`` accepts a static string or a :class:`TokenProvider`
    (refresh-and-retry on 498/499/401, including between the upsert key
    lookups and the applyEdits POST of one batch).

    Executor posture: holds only plain config (picklable); each task
    opens its own connections; one POST per batch plus
    ``ceil(batch/lookup_page_size)`` key-lookup GETs in upsert mode.
    """

    def __init__(
        self,
        layer_url: str,
        field_names: Sequence[str],
        key_field: str | None = None,
        token: str | None = None,
        timeout_sec: float = 30.0,
        rollback_on_failure: bool = True,
        lookup_page_size: int = 100,
        geometry_fields: tuple[str, str] | None = None,
        wkid: int = 4326,
    ):
        self.layer_url = layer_url.rstrip("/")
        self.field_names = list(field_names)
        self.key_field = key_field
        if key_field is not None and key_field not in self.field_names:
            raise ValueError(
                f"key_field {key_field!r} not among field_names {self.field_names}"
            )
        self.token = token
        self.timeout_sec = float(timeout_sec)
        self.rollback_on_failure = bool(rollback_on_failure)
        # a real service rejects unbounded IN lists; chunk the lookups
        self.lookup_page_size = int(lookup_page_size)
        # spatial layers: name the two row columns holding the point
        # coordinates — they leave the attributes and post as the
        # feature's ``geometry`` (the reference shipped geometry on
        # append, update_geometry, src/agol_pandas.py:451)
        if geometry_fields is not None:
            gx, gy = geometry_fields
            for g in (gx, gy):
                if g not in self.field_names:
                    raise ValueError(
                        f"geometry field {g!r} not among field_names "
                        f"{self.field_names}"
                    )
            if key_field in (gx, gy):
                raise ValueError("key_field cannot be a geometry field")
            geometry_fields = (gx, gy)
        self.geometry_fields = geometry_fields
        self.wkid = int(wkid)

    # -- transport ----------------------------------------------------
    def _request(self, op: str, data: dict | None, params: dict) -> dict:
        q = {"f": "json", **params}
        return _authed_request(
            self.token, f"{self.layer_url}/{op}", q, data, self.timeout_sec
        )

    # -- upsert key lookup --------------------------------------------
    def _lookup_oids(self, keys: Sequence[object]) -> tuple[str, dict]:
        """Map existing key values -> server OIDs, in IN-list chunks of
        ``lookup_page_size``. Returns (oid_field_name, {key: oid})."""
        oid_field = None
        oid_by_key: dict = {}
        uniq = list(dict.fromkeys(keys))
        for i in range(0, len(uniq), self.lookup_page_size):
            chunk = uniq[i : i + self.lookup_page_size]
            in_list = ", ".join(_sql_literal(k) for k in chunk)
            payload = self._request(
                "query",
                None,
                {
                    "where": f"{self.key_field} IN ({in_list})",
                    "outFields": self.key_field,
                    "returnIdsOnly": "false",
                },
            )
            oid_field = payload.get("objectIdFieldName", oid_field)
            if oid_field is None:
                raise RuntimeError(
                    "service did not report objectIdFieldName; cannot "
                    "address updates"
                )
            for feat in payload.get("features", []):
                a = feat["attributes"]
                # explicit None checks: 0 is a legal OID and must not
                # fall through a truthiness test
                oid = a.get(oid_field)
                if oid is None:
                    oid = feat.get("objectId")
                if oid is None:
                    raise RuntimeError(
                        f"key lookup returned a feature without its OID "
                        f"({oid_field}): {a!r}"
                    )
                oid_by_key[a[self.key_field]] = oid
        return oid_field or "OBJECTID", oid_by_key

    # -- PagedSink contract -------------------------------------------
    def upload_batch(self, rows: Sequence[tuple], batch_id: str | None = None) -> None:
        if not rows:
            return
        attrs = [
            {n: _edit_value(v) for n, v in zip(self.field_names, r)} for r in rows
        ]
        geoms: list[dict | None] = [None] * len(attrs)
        if self.geometry_fields is not None:
            gx, gy = self.geometry_fields
            geoms = [
                {
                    "x": a.pop(gx),
                    "y": a.pop(gy),
                    "spatialReference": {"wkid": self.wkid},
                }
                for a in attrs
            ]

        def _feat(a: dict, g: dict | None) -> dict:
            return {"attributes": a} if g is None else {"attributes": a, "geometry": g}

        adds = [_feat(a, g) for a, g in zip(attrs, geoms)]
        updates: list[dict] = []
        if self.key_field is not None:
            keys = [a[self.key_field] for a in attrs]
            if any(k is None for k in keys):
                # a NULL key can't address an upsert (and would render as
                # a bogus literal in the lookup IN list) — same contract
                # as the merge engine's key validation
                from agol_pandas_spark.errors import MissingKeyError

                raise MissingKeyError(
                    f"upsert batch {batch_id!r} contains a NULL "
                    f"{self.key_field!r} key"
                )
            if len(set(keys)) != len(keys):
                # the unique-key contract (K1): two rows with one key in
                # a single batch would both classify as adds against the
                # current remote state and land as duplicates — refuse
                # up front, exactly like the merge engine's pre-merge
                # validation (the reference silently ignored this,
                # SURVEY §2a bug list)
                from agol_pandas_spark.errors import DuplicateKeyError

                dupes = sorted({k for k in keys if keys.count(k) > 1})[:5]
                raise DuplicateKeyError(
                    f"upsert batch {batch_id!r} repeats key(s) "
                    f"{dupes} in {self.key_field!r}"
                )
            oid_field, oid_by_key = self._lookup_oids(keys)
            adds, updates = [], []
            for a, g in zip(attrs, geoms):
                oid = oid_by_key.get(a[self.key_field])
                if oid is None:
                    adds.append(_feat(a, g))
                else:
                    updates.append(_feat({**a, oid_field: oid}, g))
        form: dict = {
            "rollbackOnFailure": "true" if self.rollback_on_failure else "false",
            "useGlobalIds": "false",
        }
        if adds:
            form["adds"] = json.dumps(adds)
        if updates:
            form["updates"] = json.dumps(updates)
        payload = self._request("applyEdits", form, {})
        results = list(payload.get("addResults", [])) + list(
            payload.get("updateResults", [])
        )
        failed = [r for r in results if not r.get("success")]
        if failed:
            first = failed[0].get("error", {})
            raise EditsError(
                f"applyEdits failed for {len(failed)}/{len(results)} edits "
                f"(batch {batch_id!r}, rollbackOnFailure="
                f"{self.rollback_on_failure}): first error: {first}",
                results,
            )
        if len(results) != len(attrs):
            raise EditsError(
                f"applyEdits acknowledged {len(results)} edits for "
                f"{len(attrs)} rows (batch {batch_id!r})",
                results,
            )
