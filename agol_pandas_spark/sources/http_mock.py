"""Loopback ArcGIS-style layer mock — /query GET and /applyEdits POST
speaking the same JSON contract the HTTP transport targets
(sources/http_client.py). Lives in the package (not tests/) for the same
reason as paged_mock.py: workload queries and the datasource's Python
worker both import it by module path. It doubles as the executable
specification of the service behaviors the engine must survive:
maxRecordCount transfer caps with ``exceededTransferLimit``, and the
applyEdits all-or-nothing ``rollbackOnFailure`` quirk.
"""

from __future__ import annotations

__all__ = ["serve_layer"]


def _parse_literal(tok: str):
    """One SQL-92 literal: ``'str'`` ('' escapes), int, or float."""
    tok = tok.strip()
    if tok.startswith("'") and tok.endswith("'") and len(tok) >= 2:
        return tok[1:-1].replace("''", "'")
    try:
        return int(tok)
    except ValueError:
        return float(tok)


def _split_top_level(s: str, sep: str) -> list[str]:
    """Split on ``sep`` outside single-quoted strings AND outside
    parentheses — compile_where parenthesizes a combined pre-existing
    where (``(a AND b) AND c``), which must stay one clause here."""
    out, buf, i, in_str, depth = [], [], 0, False, 0
    while i < len(s):
        ch = s[i]
        if ch == "'":
            in_str = not in_str
            buf.append(ch)
            i += 1
        elif not in_str and ch == "(":
            depth += 1
            buf.append(ch)
            i += 1
        elif not in_str and ch == ")":
            depth -= 1
            buf.append(ch)
            i += 1
        elif not in_str and depth == 0 and s[i : i + len(sep)] == sep:
            out.append("".join(buf))
            buf = []
            i += len(sep)
        else:
            buf.append(ch)
            i += 1
    out.append("".join(buf))
    return out


def _like_to_fnmatch(raw: str) -> str:
    """SQL LIKE pattern → fnmatch pattern: ONLY ``%`` is a wildcard;
    fnmatch's own metacharacters (``? * [``) in the literal are escaped
    so e.g. ``LIKE '%a?b%'`` matches the literal ``a?b``, never ``aXb``
    (pushed filters are REMOVED from the Spark plan — a lax match here
    would silently return wrong rows). ``_`` needs no handling: the
    client declines pushdown for values containing it."""
    out = []
    for ch in raw:
        if ch == "%":
            out.append("*")
        elif ch in "?*[":
            out.append(f"[{ch}]")
        else:
            out.append(ch)
    return "".join(out)


def _compile_where(where: str):
    """Compile the conjunction subset compile_where can emit — =, <>,
    <, <=, >, >=, IN, IS [NOT] NULL, LIKE (%-wildcards) — into a
    row-predicate closure with a real parser. Replaces the mock's
    previous eval() (ADVICE r7: even with empty __builtins__,
    evaluating attacker-supplied expressions from a loopback socket is
    the wrong primitive). Parsing happens ONCE per request, never per
    row, and IN lists become hash sets — the mock's per-request cost is
    O(rows), so a scale soak through it measures the ENGINE, not the
    parser. Unknown syntax raises, so a contract drift fails tests
    loudly instead of matching wrongly."""
    import fnmatch
    import re as _re

    if where.strip() in ("", "1=1"):
        return lambda row: True
    preds = []
    for clause in _split_top_level(where, " AND "):
        clause = clause.strip()
        if clause.startswith("(") and clause.endswith(")"):
            # compile_where parenthesizes the combined pre-existing where
            preds.append(_compile_where(clause[1:-1]))
            continue
        if clause == "1=1":
            continue
        m = _re.fullmatch(r"(\w+) IN \((.*)\)", clause, _re.DOTALL)
        if m:
            col, lst = m.groups()
            vals = {_parse_literal(t) for t in _split_top_level(lst, ",")}
            preds.append(lambda row, c=col, v=vals: row.get(c) in v)
            continue
        m = _re.fullmatch(r"(\w+) IS (NOT )?NULL", clause)
        if m:
            col, neg = m.groups()
            want_null = not neg
            preds.append(
                lambda row, c=col, wn=want_null: (row.get(c) is None) == wn
            )
            continue
        m = _re.fullmatch(r"(\w+) LIKE ('(?:[^']|'')*')", clause, _re.DOTALL)
        if m:
            col, pat = m.groups()
            want = _like_to_fnmatch(_parse_literal(pat))
            preds.append(
                lambda row, c=col, w=want: row.get(c) is not None
                and fnmatch.fnmatchcase(str(row.get(c)), w)
            )
            continue
        m = _re.fullmatch(
            r"(\w+) (=|<>|<=|>=|<|>) ('(?:[^']|'')*'|[-\d.eE+]+)",
            clause,
            _re.DOTALL,
        )
        if m:
            col, op, lit = m.groups()
            w = _parse_literal(lit)
            import operator as _op

            fn = {
                "=": _op.eq, "<>": _op.ne, "<": _op.lt,
                "<=": _op.le, ">": _op.gt, ">=": _op.ge,
            }[op]
            # SQL three-valued logic: NULL compares to nothing
            preds.append(
                lambda row, c=col, f=fn, w=w: row.get(c) is not None
                and f(row.get(c), w)
            )
            continue
        raise ValueError(f"mock where parser: unsupported clause {clause!r}")
    return lambda row: all(p(row) for p in preds)


def _run_statistics(q: dict, data: list[dict]) -> dict:
    """Evaluate an ``outStatistics`` request (the public ArcGIS grouped-
    statistics contract) over the where-filtered rows: ``outStatistics``
    is a JSON list of {statisticType, onStatisticField,
    outStatisticFieldName}; ``groupByFieldsForStatistics`` is a comma-
    separated group key (absent = one global group); ``having`` is a
    post-aggregation predicate over the stat aliases (legal only WITH a
    group, per the public contract). Returns the response body: one
    feature per group, fields typed Integer for count and all-integer
    sum/min/max, Double otherwise (stddev/var — SAMPLE forms, NULL for
    single-value groups — are always Double). Unknown statistic types
    and a groupless ``having`` answer error 400 like a live service —
    the client must DECLINE those client-side, never silently
    mis-aggregate."""
    import json as _json

    specs = _json.loads(q["outStatistics"])
    group_cols = [
        g for g in q.get("groupByFieldsForStatistics", "").split(",") if g
    ]
    supported = {"count", "sum", "min", "max", "avg", "stddev", "var"}
    for s in specs:
        if s.get("statisticType") not in supported:
            return {
                "error": {
                    "code": 400,
                    "message": "Unable to complete operation",
                    "details": [
                        f"unsupported statisticType "
                        f"{s.get('statisticType')!r}"
                    ],
                }
            }
    if q.get("having") and not group_cols:
        return {
            "error": {
                "code": 400,
                "message": "Unable to complete operation",
                "details": [
                    "'having' requires groupByFieldsForStatistics"
                ],
            }
        }
    groups: dict[tuple, list[dict]] = {}
    for r in data:
        groups.setdefault(tuple(r.get(g) for g in group_cols), []).append(r)

    def _gtype(g: str) -> str:
        for r in data:
            v = r.get(g)
            if isinstance(v, bool) or v is None:
                continue
            if isinstance(v, int):
                return "esriFieldTypeInteger"
            if isinstance(v, float):
                return "esriFieldTypeDouble"
            break
        return "esriFieldTypeString"

    feats, out_fields = [], [
        {"name": g, "type": _gtype(g)} for g in group_cols
    ]
    field_types: dict[str, str] = {}
    for key, members in sorted(
        groups.items(), key=lambda kv: tuple(str(x) for x in kv[0])
    ):
        attrs = dict(zip(group_cols, key))
        for s in specs:
            typ, col = s["statisticType"], s.get("onStatisticField")
            alias = s["outStatisticFieldName"]
            vals = [
                r.get(col) for r in members if r.get(col) is not None
            ]
            if typ == "count":
                v = len(members)
            elif not vals:
                v = None  # SQL aggregate over all-NULL group
            elif typ == "sum":
                v = sum(vals)
            elif typ == "min":
                v = min(vals)
            elif typ == "max":
                v = max(vals)
            elif typ in ("stddev", "var"):
                # SAMPLE forms (n-1), NULL for single-value groups —
                # the public contract and SQL STDDEV_SAMP/VAR_SAMP
                if len(vals) < 2:
                    v = None
                else:
                    mean = sum(vals) / len(vals)
                    var = sum((x - mean) ** 2 for x in vals) / (
                        len(vals) - 1
                    )
                    v = var if typ == "var" else var ** 0.5
            else:  # avg
                v = sum(vals) / len(vals)
            attrs[alias] = v
            is_int = typ == "count" or (
                typ in ("sum", "min", "max")
                and isinstance(v, int)
                and field_types.get(alias) != "esriFieldTypeDouble"
            )
            field_types[alias] = (
                "esriFieldTypeInteger" if is_int else "esriFieldTypeDouble"
            )
        feats.append({"attributes": attrs})
    if q.get("having"):
        having_pred = _compile_where(q["having"])
        feats = [f for f in feats if having_pred(f["attributes"])]
    out_fields += [
        {"name": s["outStatisticFieldName"],
         "type": field_types.get(
             s["outStatisticFieldName"], "esriFieldTypeDouble")}
        for s in specs
    ]
    return {"fields": out_fields, "features": feats}


def serve_layer(rows, fields, max_record_count=None, poison=None, auth=None):
    """Minimal in-process ArcGIS-style layer: /query GET (where —
    the compile_where conjunction subset via a real parser,
    returnCountOnly, resultOffset/resultRecordCount, outFields) and
    /applyEdits POST (adds with server-assigned OIDs, OID-addressed
    updates, rollbackOnFailure). Records every received query dict for
    assertions; ``rows`` is the mutable store. Binds 127.0.0.1 on an
    OS-assigned port; test-only, never a production listener.

    ``max_record_count`` emulates the live-service transfer cap: pages
    are truncated to it and, when matching rows remain past the served
    page, the response carries ``exceededTransferLimit: true`` — the
    documented behavior of real hosted layers.

    ``poison``: optional predicate over an edit's attribute dict; a
    matching edit fails server-side. With rollbackOnFailure the whole
    call is rolled back and EVERY edit reports success=false (the live
    rollback quirk the reference leaned on via ``rollback=True``).

    ``auth``: optional ``{"username", "password", "ttl_requests": N}``
    dict enabling the token lifecycle: layer operations then require a
    token minted by POST ``/generateToken`` (correct credentials →
    ``{"token", "expires"}``; wrong → error 400), and every token dies
    after serving N layer requests, after which the service answers
    error 498 ``Invalid token`` — DETERMINISTIC expiry (request-counted,
    not clocked) so tests can force mid-pagination and mid-applyEdits
    refresh exactly."""
    import http.server
    import json as _json
    import threading
    import time as _time
    import urllib.parse as up

    seen: list[dict] = []
    oid_field = next(
        (f["name"] for f in fields if f["type"] == "esriFieldTypeOID"),
        "OBJECTID",
    )
    edit_lock = threading.Lock()
    token_budget: dict[str, int] = {}  # token -> remaining layer requests
    token_seq = [0]


    class H(http.server.BaseHTTPRequestHandler):
        def _send(self, body: dict) -> None:
            payload = _json.dumps(body).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def _token_rejection(self, q: dict) -> dict | None:
            """The auth gate for layer operations: None = authorized;
            otherwise the error body to send. Decrements the token's
            request budget — the deterministic expiry clock."""
            if auth is None:
                return None
            tok = q.get("token")
            if tok is None:
                return {"error": {"code": 499, "message": "Token required"}}
            # locked read-modify-write: the server is threaded, and the
            # request-counted expiry is only deterministic if concurrent
            # handlers cannot both spend the same budget unit
            with edit_lock:
                remaining = token_budget.get(tok, 0)
                if remaining <= 0:
                    return {
                        "error": {"code": 498, "message": "Invalid token"}
                    }
                token_budget[tok] = remaining - 1
            return None

        def do_GET(self):
            parsed = up.urlparse(self.path)
            q = {k: v[0] for k, v in up.parse_qs(parsed.query).items()}
            seen.append(q)
            rejection = self._token_rejection(q)
            if rejection is not None:
                self._send(rejection)
                return
            where = q.get("where", "1=1")
            pred = _compile_where(where)  # parse once per request
            data = [r for r in rows if pred(r)]
            if "outStatistics" in q:
                # server-side statistics (the public outStatistics
                # contract): grouped count/sum/min/max/avg over the
                # where-filtered rows — one response, zero data pages
                self._send(_run_statistics(q, data))
                return
            out = q.get("outFields", "*")
            known = [f["name"] for f in fields]
            names = (
                known
                if out == "*"
                # real services answer with the fields they KNOW (and in
                # layer-definition order); an unknown outFields entry is
                # simply absent from the response — the client's schema()
                # contract check is what surfaces it
                else [n for n in known if n in out.split(",")]
            )
            flds = [f for f in fields if f["name"] in names]
            if q.get("returnCountOnly") == "true":
                body = {"count": len(data)}
            else:
                off = int(q.get("resultOffset", 0))
                lim = int(q.get("resultRecordCount", len(data)))
                if max_record_count is not None:
                    lim = min(lim, max_record_count)
                page = data[off : off + lim]
                # real responses always name the OID field (even under
                # outFields projection) — the upsert lookup needs it
                feats = []
                want_geom = q.get("returnGeometry") == "true"
                for r in page:
                    a = {n: r[n] for n in names if n != "_geometry"}
                    a.setdefault(oid_field, r.get(oid_field))
                    feat = {"attributes": a}
                    if want_geom and r.get("_geometry") is not None:
                        feat["geometry"] = r["_geometry"]
                    feats.append(feat)
                body = {
                    "objectIdFieldName": oid_field,
                    "fields": flds,
                    "features": feats,
                }
                if (
                    max_record_count is not None
                    and page
                    and off + len(page) < len(data)
                ):
                    body["exceededTransferLimit"] = True
            self._send(body)

        def do_POST(self):
            parsed = up.urlparse(self.path)
            n = int(self.headers.get("Content-Length", 0))
            form = {
                k: v[0]
                for k, v in up.parse_qs(self.rfile.read(n).decode()).items()
            }
            if parsed.path.endswith("/generateToken"):
                seen.append({"op": "generateToken", "username": form.get("username")})
                if auth is None or (
                    form.get("username"),
                    form.get("password"),
                ) != (auth["username"], auth["password"]):
                    self._send(
                        {
                            "error": {
                                "code": 400,
                                "message": "Unable to generate token",
                                "details": ["Invalid username or password."],
                            }
                        }
                    )
                    return
                with edit_lock:
                    token_seq[0] += 1
                    tok = f"tok_{token_seq[0]}"
                    token_budget[tok] = int(auth.get("ttl_requests", 1 << 30))
                self._send(
                    {
                        "token": tok,
                        "expires": int((_time.time() + 3600) * 1000),
                    }
                )
                return
            if not parsed.path.endswith("/applyEdits"):
                self._send({"error": {"code": 400, "description": "bad op"}})
                return
            q = {k: v[0] for k, v in up.parse_qs(parsed.query).items()}
            seen.append({"op": "applyEdits", **form})
            rejection = self._token_rejection(q)
            if rejection is not None:
                self._send(rejection)
                return
            adds = _json.loads(form.get("adds", "[]"))
            updates = _json.loads(form.get("updates", "[]"))
            rollback = form.get("rollbackOnFailure", "true") == "true"
            with edit_lock:
                next_oid = max((r.get(oid_field) or 0 for r in rows), default=0) + 1
                staged_adds, staged_updates = [], []
                add_results, update_results = [], []
                any_failed = False
                for feat in adds:
                    a = dict(feat["attributes"])
                    if poison is not None and poison(a):
                        add_results.append(
                            {
                                "success": False,
                                "error": {"code": 1000, "description": "poisoned add"},
                            }
                        )
                        any_failed = True
                        continue
                    a[oid_field] = next_oid
                    if feat.get("geometry") is not None:
                        a["_geometry"] = feat["geometry"]
                    staged_adds.append(a)
                    add_results.append({"objectId": next_oid, "success": True})
                    next_oid += 1
                by_oid = {r.get(oid_field): r for r in rows}
                for feat in updates:
                    a = dict(feat["attributes"])
                    tgt = by_oid.get(a.get(oid_field))
                    if tgt is None or (poison is not None and poison(a)):
                        update_results.append(
                            {
                                "success": False,
                                "error": {
                                    "code": 1000,
                                    "description": "poisoned or missing update",
                                },
                            }
                        )
                        any_failed = True
                        continue
                    if feat.get("geometry") is not None:
                        a["_geometry"] = feat["geometry"]
                    staged_updates.append((tgt, a))
                    update_results.append(
                        {"objectId": a.get(oid_field), "success": True}
                    )
                if any_failed and rollback:
                    # live rollback quirk: nothing lands, EVERY edit is
                    # reported failed (not just the offending one)
                    for res in add_results + update_results:
                        res["success"] = False
                        res.pop("objectId", None)
                        res.setdefault(
                            "error",
                            {"code": 1003, "description": "rolled back"},
                        )
                else:
                    rows.extend(staged_adds)
                    for tgt, a in staged_updates:
                        tgt.update({k: v for k, v in a.items() if k != oid_field})
            self._send(
                {"addResults": add_results, "updateResults": update_results}
            )

        def log_message(self, *a):  # quiet
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, seen
