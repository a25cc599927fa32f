"""HTTP controller facade: the reference's provisioning wire surface.

The reference provisions its table from the bastion host with
``pinot-admin.sh AddTable -schemaFile kinesisTable.json -tableConfigFile
kinesisTableConfigFile.json -controllerHost <ALB> -controllerPort 80 -exec``
(bastionUserData.sh:36) — which is exactly two controller REST calls,
``POST /schemas`` then ``POST /tables``.  This module serves that contract
over the engine, so the reference's provisioning flow (and the Pinot
console's table pages) round-trip against it:

- ``POST /schemas``               -> Engine.add_schema (register by schemaName)
- ``POST /tables``                -> AddTable: resolve the schema, build the
  record source from the config's ``streamConfigs`` (kinesis/kafka/file —
  sources.source_from_stream_configs), start consuming; OFFLINE configs
  route to Engine.add_offline_table
- ``GET /tables``                 -> {"tables": [...]}
- ``GET /tables/{name}``          -> the registered config(s) by type
- ``DELETE /tables/{name}[?type=REALTIME|OFFLINE]`` -> Engine.drop_table
- ``GET /segments/{name}``        -> Engine.table_detail (segment map)
- ``GET /tables/{name}/size``     -> Pinot's table-size report **[P1.2]**
  (reported == estimated here: file sizes come from the FS listing, there
  are no unreachable servers to estimate around)
- ``POST /tables/{name}/rebalance`` -> Engine.rebalance (documented NO_OP:
  storage/compute are separated, wrapped in Pinot's job envelope)
- ``GET /version``                -> component->version map **[P1.2]**
- ``GET /health``                 -> ``OK`` (controller liveness **[P1.2]**)

Error contract: provisioning errors return HTTP 400 with
``{"code": 400, "error": msg}`` (Pinot's controller error shape); unknown
tables 404.  Same stdlib ``ThreadingHTTPServer`` design as broker_http —
no dependencies, daemon thread, works in any sandbox.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import urlparse, parse_qs

DEFAULT_PORT = 9000  # Pinot controller port


class ControllerServer:
    """In-process HTTP controller bound to an Engine.  ``start()``/``stop()``."""

    def __init__(self, engine, port: int = DEFAULT_PORT, host: str = "127.0.0.1"):
        self.engine = engine
        self.host = host
        self.port = port
        # raw config JSON by (name, type) for GET /tables/{name} round-trips
        # (tables added directly on the Engine fall back to a thin stub)
        self._raw_configs: dict[tuple[str, str], dict] = {}
        self._httpd: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    # -- request handling -------------------------------------------------

    def _add_table(self, conf: dict) -> dict:
        engine = self.engine
        name = conf.get("tableName")
        if not name:
            raise ValueError("table config lacks tableName")
        schema_name = conf.get("segmentsConfig", {}).get("schemaName") or name
        schema = engine.schemas.get(schema_name)
        if schema is None:
            raise ValueError(
                f"no schema registered for {schema_name!r} — POST /schemas first"
            )
        ttype = str(conf.get("tableType", "REALTIME")).upper()
        if conf.get("isDimTable"):
            raise ValueError(
                "dimension tables are batch-loaded — use Engine.add_dim_table "
                "with the dimension frame (no stream/segment source in a "
                "table config to provision from)"
            )
        if ttype == "OFFLINE":
            out = engine.add_offline_table(schema, conf)
            self._raw_configs[(name, "OFFLINE")] = conf
            return out
        from .sources import source_from_stream_configs

        stream = conf.get("tableIndexConfig", {}).get("streamConfigs", {})
        source = source_from_stream_configs(stream)
        pipeline = engine.add_table(schema, conf, source)
        self._raw_configs[(name, "REALTIME")] = conf
        return {
            "table": name,
            "type": "REALTIME",
            "consuming": bool(pipeline._query is not None and pipeline._query.isActive),
        }

    def start(self) -> "ControllerServer":
        engine = self.engine
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):  # quiet test output
                pass

            def _send(self, code: int, payload, ctype="application/json"):
                body = (
                    payload
                    if isinstance(payload, bytes)
                    else json.dumps(payload).encode()
                )
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _body(self) -> dict:
                n = int(self.headers.get("Content-Length", "0"))
                body = json.loads(self.rfile.read(n) or b"{}")
                if not isinstance(body, dict):
                    raise ValueError(
                        f"request body must be a JSON object, got {type(body).__name__}"
                    )
                return body

            def do_GET(self):
                url = urlparse(self.path)
                parts = [p for p in url.path.split("/") if p]
                if url.path == "/periodictask/run":
                    # Pinot serves this as GET; POST accepted as well
                    return self.do_POST()
                if url.path == "/health":
                    self._send(200, b"OK", "text/plain")
                elif url.path == "/version":
                    # Pinot returns a component->version map; the analog
                    # reports the engine plus the Spark runtime it rides on
                    self._send(
                        200,
                        {
                            "pinot-controller-analog": "1.2.0",
                            "spark": engine.spark.version,
                        },
                    )
                elif (
                    len(parts) == 3 and parts[0] == "tables" and parts[2] == "size"
                ):
                    name = parts[1]
                    if name not in engine.list_tables():
                        self._send(
                            404, {"code": 404, "error": f"table {name!r} not found"}
                        )
                        return
                    detail = engine.table_detail(name)
                    total = detail.get("total_bytes", 0)
                    # reported == estimated: sizes come straight from the FS
                    # listing — there is no partial-server view to estimate
                    self._send(
                        200,
                        {
                            "tableName": name,
                            "reportedSizeInBytes": total,
                            "estimatedSizeInBytes": total,
                            "numSegments": detail.get("num_files", 0),
                        },
                    )
                elif url.path == "/tables":
                    self._send(200, {"tables": engine.list_tables()})
                elif (
                    len(parts) == 3 and parts[0] == "tables" and parts[2] == "schema"
                ):
                    # Pinot GET /tables/{name}/schema **[P1.2]** — the
                    # console's other schema read path (schema looked up by
                    # the table's raw name, Pinot's name-matching rule)
                    name = parts[1]
                    raw = engine.schemas.get(name)
                    if name not in engine.list_tables() or raw is None:
                        self._send(
                            404,
                            {"code": 404,
                             "error": f"schema for table {name!r} not found"},
                        )
                    else:
                        self._send(200, raw)
                elif (
                    len(parts) == 3
                    and parts[0] == "tables"
                    and parts[2] == "pauseStatus"
                ):
                    # Pinot GET /tables/{t}/pauseStatus **[P1.2]**
                    name = parts[1]
                    try:
                        self._send(200, engine.pause_status(name))
                    except KeyError:
                        self._send(
                            404,
                            {"code": 404, "error": f"table {name!r} not found"},
                        )
                    except ValueError as e:
                        self._send(400, {"code": 400, "error": str(e)})
                elif len(parts) == 2 and parts[0] == "tables":
                    name = parts[1]
                    out = {}
                    cfg = engine.configs.get(name)
                    if cfg is not None and not cfg.is_dim_table:
                        out["REALTIME"] = outer._raw_configs.get(
                            (name, "REALTIME"),
                            {"tableName": name, "tableType": "REALTIME"},
                        )
                    if cfg is not None and cfg.is_dim_table:
                        out["OFFLINE"] = {
                            "tableName": name,
                            "tableType": "OFFLINE",
                            "isDimTable": True,
                        }
                    if name in engine.offline_configs:
                        out["OFFLINE"] = outer._raw_configs.get(
                            (name, "OFFLINE"),
                            {"tableName": name, "tableType": "OFFLINE"},
                        )
                    if not out:
                        self._send(404, {"code": 404, "error": f"table {name!r} not found"})
                    else:
                        self._send(200, out)
                elif len(parts) == 2 and parts[0] == "schemas":
                    raw = engine.schemas.get(parts[1])
                    if raw is None:
                        self._send(
                            404,
                            {"code": 404, "error": f"schema {parts[1]!r} not found"},
                        )
                    else:
                        self._send(200, raw)
                elif url.path == "/schemas":
                    self._send(200, sorted(engine.schemas))
                elif len(parts) == 2 and parts[0] == "segments":
                    if parts[1] not in engine.list_tables():
                        self._send(
                            404, {"code": 404, "error": f"table {parts[1]!r} not found"}
                        )
                    else:
                        self._send(200, engine.table_detail(parts[1]))
                else:
                    self._send(404, b"not found", "text/plain")

            def do_POST(self):
                from .engine import TableAlreadyExistsError

                url = urlparse(self.path)
                try:
                    if url.path == "/periodictask/run":
                        # Pinot controller API **[P1.2]** (GET in Pinot; POST
                        # accepted too): run a maintenance task now.  Task
                        # names map onto the engine's maintenance analogs.
                        qs = parse_qs(url.query)
                        task = (qs.get("taskname") or [""])[0]
                        table = (qs.get("tableName") or [None])[0]
                        if table is None:
                            raise ValueError("tableName query parameter required")
                        try:
                            if table not in engine.list_tables():
                                # uniform across tasknames: Pinot 404s
                                raise KeyError(table)
                            if task == "RetentionManager":
                                # Engine.run_retention covers BOTH sides —
                                # realtime partitions AND offline segments
                                # + their star-tree cell logs
                                self._send(200, {"table": table,
                                                 "dropped": engine.run_retention(table)})
                            elif task == "RealtimeToOfflineSegmentsTask":
                                self._send(200, engine.realtime_to_offline(table))
                            elif task == "MergeRollupTask":
                                self._send(200, engine.compact(table))
                            elif task == "UpsertCompactionTask":
                                self._send(200, engine.upsert_compact(table))
                            else:
                                raise ValueError(
                                    f"unknown taskname {task!r} (supported: "
                                    "RetentionManager, RealtimeToOfflineSegmentsTask, "
                                    "MergeRollupTask, UpsertCompactionTask)"
                                )
                        except KeyError as e:
                            # table-lookup misses only — provisioning
                            # KeyErrors below must stay 400s, not read as
                            # "table not found"
                            self._send(
                                404, {"code": 404, "error": f"table {e} not found"}
                            )
                        return
                    parts = [p for p in url.path.split("/") if p]
                    if (
                        len(parts) == 3
                        and parts[0] == "tables"
                        and parts[2] == "rebalance"
                    ):
                        # Pinot: POST /tables/{name}/rebalance?type=... ->
                        # job envelope.  The engine's rebalance is a
                        # documented NO_OP (storage/compute separated).
                        name = parts[1]
                        if name not in engine.list_tables():
                            self._send(
                                404,
                                {"code": 404, "error": f"table {name!r} not found"},
                            )
                            return
                        out = engine.rebalance(name)
                        self._send(
                            200,
                            {
                                "jobId": f"{name}-rebalance",
                                "status": out["status"],
                                "description": out["reason"],
                            },
                        )
                        return
                    if len(parts) == 3 and parts[0] == "tables" and parts[2] in (
                        "pauseConsumption",
                        "resumeConsumption",
                    ):
                        # Pinot POST /tables/{t}/pauseConsumption /
                        # resumeConsumption **[P1.2]**: stop/restart the
                        # stream around the exactly-once checkpoint; the
                        # response is Pinot's PauseStatus envelope (the
                        # same shape GET /tables/{t}/pauseStatus serves)
                        name = parts[1]
                        try:
                            if parts[2] == "pauseConsumption":
                                engine.pause_consumption(name)
                            else:
                                engine.resume_consumption(name)
                            self._send(200, engine.pause_status(name))
                        except KeyError:
                            self._send(
                                404,
                                {"code": 404,
                                 "error": f"table {name!r} not found"},
                            )
                        except ValueError as e:
                            self._send(400, {"code": 400, "error": str(e)})
                        return
                    if url.path in ("/v2/segments", "/segments"):
                        # Pinot batch segment push **[P1.2]** (POST
                        # /v2/segments?tableName=...): the analog carries
                        # the records as {"rows": [...]} instead of a
                        # binary segment tarball (documented divergence in
                        # Engine.upload_segment_json); decode rides the
                        # same schema path as realtime ingest.
                        qs = parse_qs(url.query)
                        body = self._body()
                        table = (qs.get("tableName") or [None])[0] or body.get(
                            "tableName"
                        )
                        if not table:
                            raise ValueError("tableName required (query or body)")
                        if table not in engine.offline_configs:
                            self._send(
                                404,
                                {
                                    "code": 404,
                                    "error": f"OFFLINE table {table!r} not found",
                                },
                            )
                            return
                        self._send(
                            200, engine.upload_segment_json(table, body.get("rows"))
                        )
                        return
                    body = self._body()
                    if url.path == "/schemas":
                        self._send(200, engine.add_schema(body))
                    elif url.path == "/tables":
                        self._send(200, outer._add_table(body))
                    else:
                        self._send(404, b"not found", "text/plain")
                except TableAlreadyExistsError as e:
                    # an AddTable retry must not clobber the live pipeline;
                    # Pinot's controller answers 409 Conflict
                    self._send(409, {"code": 409, "error": str(e)})
                except Exception as e:  # Pinot controller 400 error shape
                    # includes KeyError from malformed provisioning bodies —
                    # a missing dict key is a bad request, not a 404
                    self._send(400, {"code": 400, "error": str(e)})

            def do_PUT(self):
                url = urlparse(self.path)
                parts = [p for p in url.path.split("/") if p]
                if len(parts) == 2 and parts[0] == "schemas":
                    # Pinot PUT /schemas/{name} **[P1.2]**: backward-
                    # compatible schema update; the reload leg is the
                    # documented stop -> re-AddTable flow (which reads the
                    # schema registered HERE, so the wire loop is closed)
                    try:
                        body = self._body()
                        declared = body.get("schemaName")
                        if declared is not None and declared != parts[1]:
                            raise ValueError(
                                f"schemaName {declared!r} does not match "
                                f"path schema {parts[1]!r}"
                            )
                        body["schemaName"] = parts[1]
                        self._send(200, engine.update_schema(body))
                    except KeyError as e:
                        self._send(
                            404, {"code": 404, "error": f"schema {e} not found"}
                        )
                    except Exception as e:
                        self._send(400, {"code": 400, "error": str(e)})
                else:
                    self._send(404, b"not found", "text/plain")

            def do_DELETE(self):
                url = urlparse(self.path)
                parts = [p for p in url.path.split("/") if p]
                if len(parts) == 2 and parts[0] == "schemas":
                    try:
                        self._send(200, engine.delete_schema(parts[1]))
                    except KeyError:
                        self._send(
                            404,
                            {"code": 404, "error": f"schema {parts[1]!r} not found"},
                        )
                    except ValueError as e:
                        # in use by a table — Pinot answers 409 Conflict
                        self._send(409, {"code": 409, "error": str(e)})
                elif len(parts) == 2 and parts[0] == "tables":
                    ttype = (parse_qs(url.query).get("type") or [None])[0]
                    try:
                        out = engine.drop_table(parts[1], ttype)
                        for t in out["dropped"]:
                            outer._raw_configs.pop((parts[1], t), None)
                        self._send(200, out)
                    except KeyError:
                        self._send(
                            404, {"code": 404, "error": f"table {parts[1]!r} not found"}
                        )
                    except ValueError as e:
                        self._send(400, {"code": 400, "error": str(e)})
                elif len(parts) == 2 and parts[0] == "segments":
                    # Pinot DELETE /segments/{table}[?type=] **[P1.2]**:
                    # remove every segment, keep the table serving (empty)
                    ttype = (parse_qs(url.query).get("type") or [None])[0]
                    try:
                        self._send(200, engine.delete_segments(parts[1], ttype))
                    except KeyError:
                        self._send(
                            404,
                            {"code": 404,
                             "error": f"table {parts[1]!r} not found"},
                        )
                    except ValueError as e:
                        self._send(400, {"code": 400, "error": str(e)})
                else:
                    self._send(404, b"not found", "text/plain")

        self._httpd = ThreadingHTTPServer((self.host, self.port), Handler)
        self.port = self._httpd.server_address[1]  # resolve port=0
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, name="controller-http", daemon=True
        )
        self._thread.start()
        return self

    def url(self) -> str:
        return f"http://{self.host}:{self.port}"

    def stop(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None
        if self._thread is not None:
            self._thread.join(timeout=10)
            self._thread = None


def start_controller(engine, port: int = DEFAULT_PORT, host: str = "127.0.0.1") -> ControllerServer:
    """Start the controller REST endpoints over ``engine``."""
    return ControllerServer(engine, port=port, host=host).start()
