"""REST front end — a thin HTTP wrapper over the client/table API,
mirroring the reference's ``rest/`` package URL model (RowSpec.java:36:
row / column / timestamp-range / maxVersions encoded in the path &
query; RowResource.java GET:83 / PUT:244 / DELETE; ScannerResource).

Semantics are exactly the engine's Get/Scan/Put/Delete — this module
only translates HTTP.  Divergence (documented): scanners are stateless
one-shot GETs rather than stateful server-side cursors (Spark has no
scanner leases to manage; the reference's lease machinery is
infrastructure, SURVEY §2.1).

Routes:
  GET    /                                    list tables
  GET    /<table>/<row>[?v=N]                 point get (all columns)
  GET    /<table>/<row>/<fam>:<qual>[?v=N&ts_min=&ts_max=]
  PUT    /<table>/<row>/<fam>:<qual>[?ts=]    body = value
  DELETE /<table>/<row>                        whole-row delete
  DELETE /<table>/<row>/<fam>:<qual>[?ts=&exact=1]
  GET    /<table>/scanner?start=&stop=&limit=&v=
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, unquote, urlparse

from hbase_snapshot_spark.client import Get, Scan
from hbase_snapshot_spark.table import Delete, Put, TableStore


def _cells_json(df, limit=None):
    rows = df.orderBy("row", "family", "qualifier").limit(limit or 10000).collect()
    return [
        {
            "row": r.row, "family": r.family, "qualifier": r.qualifier,
            "ts": r.ts, "value": r.value,
        }
        for r in rows
    ]


class _Handler(BaseHTTPRequestHandler):
    store: TableStore = None  # injected by serve()

    def log_message(self, *args):  # quiet
        pass

    def _send(self, code: int, payload) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _parts(self):
        u = urlparse(self.path)
        parts = [unquote(p) for p in u.path.strip("/").split("/") if p != ""]
        q = {k: v[0] for k, v in parse_qs(u.query).items()}
        return parts, q

    def do_GET(self):  # noqa: N802
        parts, q = self._parts()
        try:
            if not parts:
                return self._send(200, {"tables": self.store.list_tables()})
            table = self.store.table(parts[0])
            maxv = int(q["v"]) if "v" in q else 1
            if len(parts) >= 2 and parts[1] == "scanner":
                flt = None
                if "prefix" in q:
                    # scannerOpenWithPrefix → PrefixFilter
                    # (thrift/ThriftServer.java:658-663)
                    from hbase_snapshot_spark.filters import PrefixFilter

                    flt = PrefixFilter(q["prefix"])
                scan = Scan(
                    start_row=q.get("start"), stop_row=q.get("stop"),
                    max_versions=maxv, filter=flt,
                )
                limit = int(q.get("limit", 1000))
                return self._send(
                    200, {"cells": _cells_json(table.client().scan(scan), limit)}
                )
            row = parts[1]
            g = Get(row, max_versions=maxv)
            if len(parts) >= 3:
                fam, _, qual = parts[2].partition(":")
                g.columns = {fam: [qual]}
            if "ts_min" in q or "ts_max" in q:
                g.time_range = (
                    int(q.get("ts_min", 0)),
                    int(q.get("ts_max", (1 << 62))),
                )
            cells = _cells_json(table.client().get(g))
            if not cells:
                return self._send(404, {"error": "not found"})
            return self._send(200, {"cells": cells})
        except Exception as ex:  # noqa: BLE001
            return self._send(400, {"error": str(ex)})

    def do_PUT(self):  # noqa: N802
        parts, q = self._parts()
        try:
            if len(parts) < 3:
                return self._send(400, {"error": "PUT /<table>/<row>/<fam>:<qual>"})
            table = self.store.table(parts[0])
            fam, _, qual = parts[2].partition(":")
            n = int(self.headers.get("Content-Length", 0))
            value = self.rfile.read(n).decode()
            ts = int(q["ts"]) if "ts" in q else None
            v = table.mutate([Put(parts[1]).add(fam, qual, value, ts=ts)])
            return self._send(200, {"committed_version": v})
        except Exception as ex:  # noqa: BLE001
            return self._send(400, {"error": str(ex)})

    def do_DELETE(self):  # noqa: N802
        parts, q = self._parts()
        try:
            if len(parts) < 2:
                return self._send(400, {"error": "DELETE /<table>/<row>[/fam:qual]"})
            table = self.store.table(parts[0])
            d = Delete(parts[1])
            if len(parts) >= 3:
                fam, _, qual = parts[2].partition(":")
                ts = int(q["ts"]) if "ts" in q else None
                if q.get("exact"):
                    d.delete_column(fam, qual, ts=ts)
                else:
                    d.delete_columns(fam, qual, ts=ts)
            v = table.mutate([d])
            return self._send(200, {"committed_version": v})
        except Exception as ex:  # noqa: BLE001
            return self._send(400, {"error": str(ex)})


def serve(store: TableStore, port: int = 0):
    """Start the REST server (daemon thread); returns (server, port).
    ``port=0`` picks an ephemeral port."""
    handler = type("Handler", (_Handler,), {"store": store})
    srv = ThreadingHTTPServer(("127.0.0.1", port), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, srv.server_address[1]
