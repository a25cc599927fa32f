"""HTTP broker facade: the reference's actual wire surface.

The deployed solution exposes exactly one query API — the Pinot broker's
``POST /query/sql`` behind an ALB whose health check probes that same path
(lib/apache-pinot-solution-stack.ts:725-726, README.md:38-41).  This module
serves that contract over the engine:

- ``POST /query/sql`` with body ``{"sql": "..."}`` -> the Pinot broker
  response envelope (engine.query_broker_response: resultTable +
  columnDataTypes + rows + stats; structured ``exceptions`` on failure —
  the endpoint never 500s on a bad query, matching the broker).
- ``GET /query/sql`` -> 200 (the ALB health-check probe is a bare GET with
  no SQL; Pinot answers it healthy).
- ``GET /health`` -> ``OK`` (broker liveness probe **[P1.2]**).

Design notes:
- stdlib ``ThreadingHTTPServer`` on a daemon thread — queries execute on
  the calling handler thread through the engine's SparkSession (Spark
  sessions are thread-safe for concurrent actions; each request is one
  collect, the broker gather stage).  No extra dependency, works in any
  sandbox.
- This is a driver-side gather endpoint like Pinot's broker: results must
  fit the driver.  BI-scale result sets belong on the Thrift/Connect
  endpoints (bi.py); this surface is for the reference's dashboard-query
  shape (small aggregates).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

DEFAULT_PORT = 8099  # Pinot broker port


class BrokerServer:
    """In-process HTTP broker bound to an Engine.  ``start()``/``stop()``."""

    def __init__(self, engine, port: int = DEFAULT_PORT, host: str = "127.0.0.1"):
        self.engine = engine
        self.host = host
        self.port = port
        self._httpd: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    def start(self) -> "BrokerServer":
        engine = self.engine

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):  # quiet test output
                pass

            def _send(self, code: int, payload: bytes, ctype="application/json"):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

            def do_GET(self):
                if self.path in ("/health", "/query/sql"):
                    # ALB health check probes GET /query/sql (stack
                    # ts:725-726); a liveness probe carries no SQL
                    self._send(200, b"OK", "text/plain")
                else:
                    self._send(404, b"not found", "text/plain")

            def do_POST(self):
                if self.path != "/query/sql":
                    self._send(404, b"not found", "text/plain")
                    return
                try:
                    n = int(self.headers.get("Content-Length", "0"))
                    body = json.loads(self.rfile.read(n) or b"{}")
                    if not isinstance(body, dict):
                        raise ValueError(
                            f"request body must be a JSON object, got {type(body).__name__}"
                        )
                    sql = body["sql"]
                    # Pinot's request envelope carries options out-of-band:
                    # {"sql": ..., "queryOptions": "k1=v1;k2=v2"} **[P1.2]**
                    # — normalize onto the SET-prefix form the engine parses
                    opts = body.get("queryOptions")
                    if opts:
                        if not isinstance(opts, str):
                            raise ValueError("queryOptions must be a string")
                        prefix = "".join(
                            f"SET {pair.strip()}; "
                            for pair in opts.split(";")
                            if pair.strip()
                        )
                        sql = prefix + sql
                except (ValueError, KeyError, TypeError) as e:
                    # malformed request envelope -> Pinot JSON_PARSING 100
                    resp = {
                        "numRowsResultSet": 0,
                        "timeUsedMs": 0,
                        "exceptions": [
                            {"errorCode": 100, "message": f"bad request: {e}"}
                        ],
                    }
                    self._send(200, json.dumps(resp).encode())
                    return
                # query_broker_response returns the error envelope itself
                # on analysis/execution failure — never raises through
                resp = engine.query_broker_response(sql)
                self._send(200, json.dumps(resp).encode())

        self._httpd = ThreadingHTTPServer((self.host, self.port), Handler)
        self.port = self._httpd.server_address[1]  # resolve port=0
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, name="broker-http", daemon=True
        )
        self._thread.start()
        return self

    def url(self) -> str:
        return f"http://{self.host}:{self.port}/query/sql"

    def stop(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None
        if self._thread is not None:
            self._thread.join(timeout=10)
            self._thread = None


def start_broker(engine, port: int = DEFAULT_PORT, host: str = "127.0.0.1") -> BrokerServer:
    """Start the /query/sql endpoint over ``engine``; returns the server."""
    return BrokerServer(engine, port=port, host=host).start()
