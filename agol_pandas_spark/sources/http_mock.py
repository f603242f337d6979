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


def serve_layer(rows, fields, max_record_count=None, poison=None):
    """Minimal in-process ArcGIS-style layer: /query GET (where —
    numeric SQL-92 conjunctions plus single IN lists, returnCountOnly,
    resultOffset/resultRecordCount, outFields) and /applyEdits POST
    (adds with server-assigned OIDs, OID-addressed updates,
    rollbackOnFailure). Records every received query dict for
    assertions; ``rows`` is the mutable store.

    ``max_record_count`` emulates the live-service transfer cap: pages
    are truncated to it and, when matching rows remain past the served
    page, the response carries ``exceededTransferLimit: true`` — the
    documented behavior of real hosted layers.

    ``poison``: optional predicate over an edit's attribute dict; a
    matching edit fails server-side. With rollbackOnFailure the whole
    call is rolled back and EVERY edit reports success=false (the live
    rollback quirk the reference leaned on via ``rollback=True``)."""
    import http.server
    import json as _json
    import re as _re
    import threading
    import urllib.parse as up

    seen: list[dict] = []
    oid_field = next(
        (f["name"] for f in fields if f["type"] == "esriFieldTypeOID"),
        "OBJECTID",
    )
    edit_lock = threading.Lock()

    def matches(row: dict, where: str) -> bool:
        if where in ("", "1=1"):
            return True
        m = _re.fullmatch(r"(\w+) IN \((.*)\)", where)
        if m:  # upsert key lookups: exact membership, not substring
            col, lst = m.groups()
            return row.get(col) in list(eval(f"[{lst}]", {"__builtins__": {}}))
        # numeric-conjunction subset, enough for the pushed predicates
        py = (
            where.replace(" AND ", " and ")
            .replace("<>", "!=")
            .replace(" IS NOT NULL", " is not None")
            .replace(" IS NULL", " is None")
        )
        return bool(eval(py, {"__builtins__": {}}, dict(row)))  # noqa: S307

    class H(http.server.BaseHTTPRequestHandler):
        def _send(self, body: dict) -> None:
            payload = _json.dumps(body).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def do_GET(self):
            parsed = up.urlparse(self.path)
            q = {k: v[0] for k, v in up.parse_qs(parsed.query).items()}
            seen.append(q)
            where = q.get("where", "1=1")
            data = [r for r in rows if matches(r, where)]
            out = q.get("outFields", "*")
            names = (
                [f["name"] for f in fields]
                if out == "*"
                else out.split(",")
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
            if not parsed.path.endswith("/applyEdits"):
                self._send({"error": {"code": 400, "description": "bad op"}})
                return
            n = int(self.headers.get("Content-Length", 0))
            form = {
                k: v[0]
                for k, v in up.parse_qs(self.rfile.read(n).decode()).items()
            }
            seen.append({"op": "applyEdits", **form})
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
