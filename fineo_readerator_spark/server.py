"""HTTP read-serving facade: the reference's Avatica server + REST proxy
re-expressed over a TenantSession.

Reference surface being re-expressed (SURVEY.md §3 E1/E2):
- `readerator/server/.../FineoServer.java:49-70` — one org per server
  instance; connection api key must match (`TenantValidator.java:25-35`).
- `readerator/proxy/.../JdbcHandler.java:34-50` — stateless REST: takes an
  `x-api-key` header + SQL string, returns rows as a list of maps.
- `FineoJdbcMeta.java:143-176` — statement `maxRowCount` limit; writes
  rejected (read-only).

Design: the HTTP layer is a thin stdlib `http.server` front; ALL semantics
(tenant views, read-only guard, limits) live in `api.TenantSession`, so the
server adds no query logic of its own.  On a real deployment the Spark
driver hosts this endpoint while executors do the work — the HTTP thread
only triggers `collect()` on the (limited) result, exactly like the
reference's Avatica frame streaming.  The default row cap bounds
driver-side materialization the same way Avatica paging does.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

from fineo_readerator_spark.api import ReadOnlyViolation, TenantSession

API_KEY_HEADER = "x-api-key"
DEFAULT_MAX_ROWS = 10_000


class TenantValidationError(Exception):
    """Presented api key does not match the tenant this server hosts
    (`TenantValidator.validateConnection`)."""


def _json_value(v):
    """JSON-safe cell: binary -> latin-1 string, nested rows via asDict."""
    if isinstance(v, (bytes, bytearray)):
        return v.decode("latin-1")
    if hasattr(v, "asDict"):
        return {k: _json_value(x) for k, x in v.asDict().items()}
    if isinstance(v, dict):
        return {k: _json_value(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_json_value(x) for x in v]
    return v if (v is None or isinstance(v, (bool, int, float, str))) else str(v)


class ReadServer:
    """One-org read server (the reference's deployment unit).

    ``api_key`` plays COMPANY_KEY_PROPERTY: every request must present it in
    the ``x-api-key`` header.  ``POST /query`` with ``{"sql": ...,
    "max_rows": n?}`` returns ``{"columns": [...], "rows": [{...}]}``.
    """

    def __init__(self, tenant: TenantSession, api_key: str, max_rows: int = DEFAULT_MAX_ROWS):
        self.tenant = tenant
        self.api_key = api_key
        self.max_rows = max_rows
        self._httpd: Optional[ThreadingHTTPServer] = None
        self._thread: Optional[threading.Thread] = None

    # -- request handling (transport-independent, testable directly) ------
    def handle(self, api_key: Optional[str], body: dict) -> tuple[int, dict]:
        """(status, payload) for one read request."""
        if api_key != self.api_key:
            return 403, {"error": "tenant validation failed: bad api key"}
        sql = body.get("sql")
        if not isinstance(sql, str) or not sql.strip():
            return 400, {"error": "missing 'sql'"}
        limit = min(int(body.get("max_rows", self.max_rows)), self.max_rows)
        try:
            df = self.tenant.sql(sql, max_rows=limit)
            rows = df.collect()
        except ReadOnlyViolation as e:
            return 400, {"error": str(e)}
        except Exception as e:  # analysis errors -> client problem, not 500
            return 400, {"error": f"{type(e).__name__}: {e}"}
        return 200, {
            "columns": df.columns,
            "rows": [{c: _json_value(r[c]) for c in df.columns} for r in rows],
        }

    # -- http transport ----------------------------------------------------
    def start(self, host: str = "127.0.0.1", port: int = 0) -> int:
        """Serve on a background thread; returns the bound port."""
        server = self

        class Handler(BaseHTTPRequestHandler):
            def do_POST(self) -> None:  # noqa: N802 (stdlib naming)
                if self.path != "/query":
                    self._reply(404, {"error": "not found"})
                    return
                try:
                    n = int(self.headers.get("content-length", 0))
                    body = json.loads(self.rfile.read(n) or b"{}")
                except (ValueError, json.JSONDecodeError):
                    self._reply(400, {"error": "invalid JSON body"})
                    return
                status, payload = server.handle(self.headers.get(API_KEY_HEADER), body)
                self._reply(status, payload)

            def _reply(self, status: int, payload: dict) -> None:
                data = json.dumps(payload).encode()
                self.send_response(status)
                self.send_header("content-type", "application/json")
                self.send_header("content-length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def log_message(self, *a) -> None:  # quiet test output
                pass

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        self._thread.start()
        return self._httpd.server_address[1]

    def stop(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None
