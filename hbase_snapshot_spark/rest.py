"""REST front end — a thin HTTP wrapper over the client/table API,
mirroring the reference's ``rest/`` package URL model (RowSpec.java:36:
row / column / timestamp-range / maxVersions encoded in the path &
query; RowResource.java GET:83 / PUT:244 / DELETE; ScannerResource).

Semantics are exactly the engine's Get/Scan/Put/Delete — this module
only translates HTTP.  Binary table values are base64-encoded in JSON
(the reference REST encodes cell bytes in base64 too,
rest/model/CellModel).  Responses that hit the row cap carry
``"truncated": true`` plus a ``next_start`` cursor so a caller can
page; the stateful scanner routes mirror ScannerResource.java
(POST creates a server-side cursor id, GET pages it, DELETE closes,
204 when exhausted).

Routes:
  GET    /                                    list tables
  GET    /<table>/<row>[?v=N]                 point get (all columns)
  GET    /<table>/<row>/<fam>:<qual>[?v=N&ts_min=&ts_max=]
  PUT    /<table>/<row>/<fam>:<qual>[?ts=]    body = value
  DELETE /<table>/<row>                        whole-row delete
  DELETE /<table>/<row>/<fam>:<qual>[?ts=&exact=1]
  GET    /<table>/scanner?start=&stop=&limit=&v=   (one-shot)
  POST   /<table>/scanner?start=&stop=&prefix=&v=  → {"scanner_id": id}
  GET    /<table>/scanner/<id>?n=BATCH             next cells (204 = done)
  DELETE /<table>/scanner/<id>                     close
"""

from __future__ import annotations

import base64
import itertools
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, unquote, urlparse

from hbase_snapshot_spark.client import Get, Scan
from hbase_snapshot_spark.table import Delete, Put, TableStore


def _jsonable(v):
    if isinstance(v, (bytes, bytearray)):
        return base64.b64encode(bytes(v)).decode("ascii")
    return v


def _cell_dict(r) -> dict:
    return {
        "row": _jsonable(r.row), "family": _jsonable(r.family),
        "qualifier": _jsonable(r.qualifier),
        "ts": r.ts, "value": _jsonable(r.value),
    }


def _cells_json(df, limit=None):
    """Collect up to ``limit`` cells (cap 10000) in key order.  Returns
    (cells, truncated, next_start): when the cap is hit, ``truncated``
    flags the cut and ``next_start`` is the first UNRETURNED row key —
    rows are never split across pages (resume at next_start neither
    skips nor duplicates), except a single row wider than the cap, which
    is returned partially with next_start pointing at itself."""
    cap = min(limit or 10000, 10000)
    rows = (
        df.orderBy(
            "row", "family", "qualifier", df["ts"].desc(), df["seq"].desc()
        ).limit(cap + 1).collect()
    )
    truncated = len(rows) > cap
    next_start = None
    if truncated:
        boundary = rows[cap].row
        rows = [r for r in rows[:cap] if r.row != boundary] or rows[:cap]
        next_start = _jsonable(boundary)
    return [_cell_dict(r) for r in rows], truncated, next_start


def _make_scan(q: dict, maxv: int, binary: bool = False) -> Scan:
    """Scanner spec from URL params — the RowSpec/ScannerModel surface:
    start/stop/limit/v/ts_min/ts_max plus filter params (prefix,
    rowregex, valuesubstr, colprefix — the filters
    rest/TestScannersWithFilters exercises), AND-composed.

    Binary tables: start/stop are base64-encoded (matching the base64
    ``next_start`` cursor the truncation response returns, so a cursor
    can be passed straight back); string filter params are rejected."""
    from hbase_snapshot_spark.filters import (
        ColumnPrefixFilter,
        CompareOp,
        FilterList,
        PrefixFilter,
        RegexStringComparator,
        RowFilter,
        SubstringComparator,
        ValueFilter,
    )

    if binary:
        unsupported = {"prefix", "rowregex", "valuesubstr", "colprefix"} & set(q)
        if unsupported:
            raise ValueError(
                f"string filter params {sorted(unsupported)} are not "
                "supported on binary tables"
            )
        tr = None
        if "ts_min" in q or "ts_max" in q:
            tr = (int(q.get("ts_min", 0)), int(q.get("ts_max", 1 << 62)))
        dec = lambda k: base64.b64decode(q[k]) if k in q else None  # noqa: E731
        return Scan(
            start_row=dec("start"), stop_row=dec("stop"),
            max_versions=maxv, time_range=tr,
        )

    flts = []
    if "prefix" in q:
        # scannerOpenWithPrefix → PrefixFilter
        # (thrift/ThriftServer.java:658-663)
        flts.append(PrefixFilter(q["prefix"]))
    if "rowregex" in q:
        flts.append(RowFilter(CompareOp.EQUAL, RegexStringComparator(q["rowregex"])))
    if "valuesubstr" in q:
        flts.append(ValueFilter(CompareOp.EQUAL, SubstringComparator(q["valuesubstr"])))
    if "colprefix" in q:
        flts.append(ColumnPrefixFilter(q["colprefix"]))
    flt = None
    if len(flts) == 1:
        flt = flts[0]
    elif flts:
        flt = FilterList(FilterList.MUST_PASS_ALL, flts)
    tr = None
    if "ts_min" in q or "ts_max" in q:
        # RowSpec.java:36 — [min, max) time range in the URL
        tr = (int(q.get("ts_min", 0)), int(q.get("ts_max", 1 << 62)))
    return Scan(
        start_row=q.get("start"), stop_row=q.get("stop"),
        max_versions=maxv, filter=flt, time_range=tr,
    )


class _Scanner:
    """Server-side cursor over a scan — ScannerResource.java semantics
    (an id'd scanner paged by repeated GETs).  Backed by toLocalIterator
    so only one partition's results are resident driver-side at a time —
    the stream stays distributed until fetched."""

    def __init__(self, df):
        self._it = df.orderBy(
            "row", "family", "qualifier", df["ts"].desc(), df["seq"].desc()
        ).toLocalIterator()
        # ThreadingHTTPServer handles each request on its own worker
        # thread; toLocalIterator is not thread-safe, so concurrent GETs
        # paging the same scanner id must serialize (the reference's
        # scanner lease machinery provides the same exclusion).
        self._lock = threading.Lock()

    def next(self, n: int) -> list[dict]:
        with self._lock:
            return [_cell_dict(r) for r in itertools.islice(self._it, n)]


class _Handler(BaseHTTPRequestHandler):
    store: TableStore = None     # injected by serve()
    scanners: dict = None        # id -> _Scanner; injected by serve()
    _scanner_seq: itertools.count = None
    _scanners_lock: threading.Lock = None  # guards id alloc + registry

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
                if len(parts) >= 3:
                    # stateful scanner page: GET /<table>/scanner/<id>?n=
                    with self._scanners_lock:
                        sc = self.scanners.get(parts[2])
                    if sc is None:
                        return self._send(404, {"error": "unknown scanner"})
                    cells = sc.next(int(q.get("n", 100)))
                    if not cells:
                        # exhausted — 204 No Content (ScannerResource)
                        self.send_response(204)
                        self.send_header("Content-Length", "0")
                        self.end_headers()
                        return None
                    return self._send(200, {"cells": cells})
                scan = _make_scan(q, maxv, binary=table.manifest()["binary"])
                limit = int(q.get("limit", 1000))
                cells, truncated, next_start = _cells_json(
                    table.client().scan(scan), limit
                )
                payload = {"cells": cells, "truncated": truncated}
                if truncated:
                    payload["next_start"] = next_start
                return self._send(200, payload)
            binary = table.manifest()["binary"]
            row = parts[1].encode() if binary else parts[1]
            g = Get(row, max_versions=maxv)
            if len(parts) >= 3:
                fam, _, qual = parts[2].partition(":")
                g.columns = {fam: [qual.encode() if binary else qual]}
            if "ts_min" in q or "ts_max" in q:
                g.time_range = (
                    int(q.get("ts_min", 0)),
                    int(q.get("ts_max", (1 << 62))),
                )
            cells, truncated, next_start = _cells_json(table.client().get(g))
            if not cells:
                return self._send(404, {"error": "not found"})
            payload = {"cells": cells, "truncated": truncated}
            if truncated:
                payload["next_start"] = next_start
            return self._send(200, payload)
        except Exception as ex:  # noqa: BLE001
            return self._send(400, {"error": str(ex)})

    def do_POST(self):  # noqa: N802
        """POST /<table>/scanner — open a stateful scanner, return its id
        (ScannerResource.java: POST returns the scanner Location)."""
        parts, q = self._parts()
        try:
            if len(parts) != 2 or parts[1] != "scanner":
                return self._send(400, {"error": "POST /<table>/scanner"})
            table = self.store.table(parts[0])
            maxv = int(q["v"]) if "v" in q else 1
            df = table.client().scan(
                _make_scan(q, maxv, binary=table.manifest()["binary"])
            )
            sc = _Scanner(df)
            with self._scanners_lock:
                sid = str(next(self._scanner_seq))
                self.scanners[sid] = sc
            return self._send(201, {"scanner_id": sid})
        except Exception as ex:  # noqa: BLE001
            return self._send(400, {"error": str(ex)})

    def do_PUT(self):  # noqa: N802
        parts, q = self._parts()
        try:
            if len(parts) < 3:
                return self._send(400, {"error": "PUT /<table>/<row>/<fam>:<qual>"})
            table = self.store.table(parts[0])
            binary = table.manifest()["binary"]
            fam, _, qual = parts[2].partition(":")
            n = int(self.headers.get("Content-Length", 0))
            raw = self.rfile.read(n)
            # binary tables keep the body verbatim (cells are bytes; GET
            # returns them base64-encoded, like rest/model/CellModel)
            value = raw if binary else raw.decode()
            row = parts[1].encode() if binary else parts[1]
            qual = qual.encode() if binary else qual
            ts = int(q["ts"]) if "ts" in q else None
            v = table.mutate([Put(row).add(fam, qual, value, ts=ts)])
            return self._send(200, {"committed_version": v})
        except Exception as ex:  # noqa: BLE001
            return self._send(400, {"error": str(ex)})

    def do_DELETE(self):  # noqa: N802
        parts, q = self._parts()
        try:
            if len(parts) == 3 and parts[1] == "scanner":
                # DELETE /<table>/scanner/<id> — close (ScannerResource)
                with self._scanners_lock:
                    closed = self.scanners.pop(parts[2], None)
                if closed is None:
                    return self._send(404, {"error": "unknown scanner"})
                return self._send(200, {"closed": True})
            if len(parts) < 2:
                return self._send(400, {"error": "DELETE /<table>/<row>[/fam:qual]"})
            table = self.store.table(parts[0])
            binary = table.manifest()["binary"]
            d = Delete(parts[1].encode() if binary else parts[1])
            if len(parts) >= 3:
                fam, _, qual = parts[2].partition(":")
                qual = qual.encode() if binary else qual
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
    handler = type(
        "Handler",
        (_Handler,),
        {"store": store, "scanners": {}, "_scanner_seq": itertools.count(1),
         "_scanners_lock": threading.Lock()},
    )
    srv = ThreadingHTTPServer(("127.0.0.1", port), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, srv.server_address[1]
