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

WIRE FORMATS (rest_wire.py): cell-bearing responses content-negotiate
via Accept — ``application/x-protobuf`` returns the reference's
CellSet protobuf message byte-for-byte (CellSetMessage.proto /
CellMessage.proto), ``text/xml`` the JAXB CellSet document; the table
list, ``/version`` and ``/<table>/schema`` likewise (TableList /
Version / TableSchema messages).  PUT accepts a CellSet body and POST
/<table>/scanner a ScannerModel body in either format (Content-Type
negotiated), exactly like RowResource.update / ScannerResource.

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

from hbase_snapshot_spark import rest_wire
from hbase_snapshot_spark.client import Get, Scan
from hbase_snapshot_spark.model import NoSuchColumnFamilyError
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


def _collect_cells(df, limit=None):
    """Collect up to ``limit`` cells (cap 10000) in key order.  Returns
    (raw_rows, truncated, next_start): when the cap is hit, ``truncated``
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
    return rows, truncated, next_start


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


def _scanner_from_xml(doc: bytes) -> dict:
    """ScannerModel XML → the decode_scanner dict shape: base64 byte[]
    attributes startRow/endRow, int attributes batch/startTime/endTime/
    maxVersions, base64 <column> children."""
    import xml.etree.ElementTree as ET

    root = ET.fromstring(doc)
    if root.tag != "Scanner":
        raise ValueError(f"expected <Scanner>, got <{root.tag}>")
    spec: dict = {"columns": []}
    if root.get("startRow"):
        spec["startRow"] = base64.b64decode(root.get("startRow"))
    if root.get("endRow"):
        spec["endRow"] = base64.b64decode(root.get("endRow"))
    for k in ("batch", "startTime", "endTime", "maxVersions"):
        if root.get(k) is not None:
            spec[k] = int(root.get(k))
    for c in root.findall("column"):
        spec["columns"].append(base64.b64decode(c.text or ""))
    f = root.find("filter")
    if f is not None and f.text:
        spec["filter"] = f.text  # the FilterModel JSON string
    return spec


def filter_from_model(model, binary: bool = False):
    """ScannerModel ``filter`` JSON → engine filter.

    The reference serializes filters as a FilterModel JSON document
    (rest/model/ScannerModel.java:319-327 buildFilter; the union-ish
    field bag at :160-170) — e.g.
    ``{"type": "PrefixFilter", "value": "<base64>"}`` or
    ``{"type": "RowFilter", "op": "EQUAL",
       "comparator": {"type": "RegexStringComparator", "value": "x"}}``.
    All 12 FilterType branches of FilterModel.build (:253-310) map onto
    filters.py; byte-carrying values (base64 in the model) decode to
    str on string tables and stay bytes on binary tables."""
    from hbase_snapshot_spark import filters as flt

    if isinstance(model, (str, bytes)):
        model = json.loads(model)

    def key(b64: str):
        raw = base64.b64decode(b64)
        return raw if binary else raw.decode()

    def comparator(m: dict):
        # WritableByteArrayComparableModel.build (ScannerModel.java:135-155)
        ctype, value = m["type"], m["value"]
        if ctype == "BinaryComparator":
            return flt.BinaryComparator(key(value))
        if ctype == "BinaryPrefixComparator":
            return flt.BinaryPrefixComparator(key(value))
        if ctype == "RegexStringComparator":
            return flt.RegexStringComparator(value)
        if ctype == "SubstringComparator":
            return flt.SubstringComparator(value)
        raise ValueError(f"unhandled comparator type: {ctype}")

    ftype = model.get("type")
    if ftype == "ColumnCountGetFilter":
        return flt.ColumnCountGetFilter(int(model["limit"]))
    if ftype == "FilterList":
        return flt.FilterList(
            model["op"], [filter_from_model(m, binary)
                          for m in model.get("filters", [])]
        )
    if ftype == "FirstKeyOnlyFilter":
        return flt.FirstKeyOnlyFilter()
    if ftype == "InclusiveStopFilter":
        return flt.InclusiveStopFilter(key(model["value"]))
    if ftype == "PageFilter":
        return flt.PageFilter(int(model["value"]))
    if ftype == "PrefixFilter":
        return flt.PrefixFilter(key(model["value"]))
    if ftype == "QualifierFilter":
        return flt.QualifierFilter(model["op"], comparator(model["comparator"]))
    if ftype == "RowFilter":
        return flt.RowFilter(model["op"], comparator(model["comparator"]))
    if ftype == "ValueFilter":
        return flt.ValueFilter(model["op"], comparator(model["comparator"]))
    if ftype == "SingleColumnValueFilter":
        qual = model.get("qualifier")
        return flt.SingleColumnValueFilter(
            base64.b64decode(model["family"]).decode(),
            key(qual) if qual is not None else None,
            model["op"],
            comparator(model["comparator"]),
            # absent fields keep the reference constructor defaults
            # (FilterModel only serializes them when true, and build()
            # only overrides when present — ScannerModel.java:289-296)
            filter_if_missing=bool(model.get("ifMissing", False)),
            latest_version_only=bool(model.get("latestVersion", True)),
        )
    if ftype == "SkipFilter":
        return flt.SkipFilter(filter_from_model(model["filters"][0], binary))
    if ftype == "WhileMatchFilter":
        return flt.WhileMatchFilter(
            filter_from_model(model["filters"][0], binary)
        )
    raise ValueError(f"unhandled filter type: {ftype}")


def _scan_from_model(spec: dict, binary: bool) -> Scan:
    """ScannerModel dict → engine Scan: byte[] rows/columns decode to
    str on string tables; 'fam' selects the family, 'fam:qual' the
    column (ScannerModel.fromScan/toScan column convention); a
    ``filter`` JSON string builds the corresponding engine filter."""

    def key(v):
        return bytes(v) if binary else bytes(v).decode()

    families, columns = [], {}
    for col in spec.get("columns", []):
        fam_b, sep, qual_b = bytes(col).partition(b":")
        fam = fam_b.decode()
        if not sep:
            if fam not in families:
                families.append(fam)
        else:
            columns.setdefault(fam, []).append(
                qual_b if binary else qual_b.decode()
            )
    for fam in columns:
        if fam not in families:
            families.append(fam)
    tr = None
    if spec.get("startTime") is not None or spec.get("endTime") is not None:
        tr = (spec.get("startTime", 0), spec.get("endTime", 1 << 62))
    return Scan(
        start_row=key(spec["startRow"]) if spec.get("startRow") else None,
        stop_row=key(spec["endRow"]) if spec.get("endRow") else None,
        families=families or None,
        columns=columns or None,
        max_versions=spec.get("maxVersions", 1),
        time_range=tr,
        filter=(filter_from_model(spec["filter"], binary)
                if spec.get("filter") else None),
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

    def next(self, n: int) -> list:
        with self._lock:
            return list(itertools.islice(self._it, n))


class _Handler(BaseHTTPRequestHandler):
    store: TableStore = None     # injected by serve()
    # leased scanner registry (client.ScannerLeases — Leases.java:281):
    # idle cursors reclaimed after the lease period; injected by serve()
    scanners = None

    def log_message(self, *args):  # quiet
        pass

    def _send(self, code: int, payload) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _send_raw(self, code: int, body: bytes, ctype: str,
                  extra: dict | None = None) -> None:
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        for k, v in (extra or {}).items():
            self.send_header(k, v)
        self.end_headers()
        self.wfile.write(body)

    def _accept(self) -> str:
        """Content negotiation via Accept (rest/ResourceBase: JSON, XML,
        protobuf representations of the same models)."""
        a = self.headers.get("Accept", "") or ""
        if "protobuf" in a:
            return "pb"
        if "xml" in a:
            return "xml"
        return "json"

    def _body_format(self) -> str:
        ct = self.headers.get("Content-Type", "") or ""
        if "protobuf" in ct:
            return "pb"
        if "xml" in ct:
            return "xml"
        return "raw"

    def _send_cells(self, raw_rows, truncated=False, next_start=None) -> None:
        """Cell-bearing response in the negotiated representation.
        JSON keeps this engine's flat-cell shape (with truncated /
        next_start); XML and protobuf are the reference's CellSet
        models byte-for-byte, with the pagination cursor carried in the
        X-Next-Start header."""
        fmt = self._accept()
        if fmt == "json":
            payload = {"cells": [_cell_dict(r) for r in raw_rows],
                       "truncated": truncated}
            if truncated:
                payload["next_start"] = next_start
            return self._send(200, payload)
        model = rest_wire.group_cells(raw_rows)
        extra = {"X-Next-Start": str(next_start)} if truncated else None
        if fmt == "pb":
            return self._send_raw(
                200, rest_wire.encode_cell_set(model),
                "application/x-protobuf", extra,
            )
        return self._send_raw(
            200, rest_wire.cell_set_to_xml(model), "text/xml", extra
        )

    def _parts(self):
        u = urlparse(self.path)
        parts = [unquote(p) for p in u.path.strip("/").split("/") if p != ""]
        q = {k: v[0] for k, v in parse_qs(u.query).items()}
        return parts, q

    def do_GET(self):  # noqa: N802
        parts, q = self._parts()
        try:
            if not parts:
                names = self.store.list_tables()
                fmt = self._accept()
                if fmt == "pb":
                    return self._send_raw(
                        200, rest_wire.encode_table_list(names),
                        "application/x-protobuf",
                    )
                if fmt == "xml":
                    return self._send_raw(
                        200, rest_wire.table_list_to_xml(names), "text/xml"
                    )
                return self._send(200, {"tables": names})
            if parts == ["version"]:
                # rest/VersionResource — engine build info in the
                # VersionModel field layout
                import platform

                import pyspark

                info = {
                    "restVersion": "0.0.3",
                    "jvmVersion": platform.python_version(),
                    "osVersion": f"{platform.system()} {platform.release()}",
                    "serverVersion": f"pyspark/{pyspark.__version__}",
                    "jerseyVersion": "http.server",
                }
                if self._accept() == "pb":
                    return self._send_raw(
                        200, rest_wire.encode_version(info),
                        "application/x-protobuf",
                    )
                return self._send(200, info)
            table = self.store.table(parts[0])
            if len(parts) == 2 and parts[1] == "schema":
                # rest/SchemaResource — TableSchemaModel
                desc = table.descriptor
                schema = {
                    "name": desc.name,
                    "attrs": {"IS_META": "false", "IS_ROOT": "false",
                              "READONLY": str(desc.readonly).lower()},
                    "columns": [
                        {"name": f.name, "attrs": {},
                         "ttl": f.ttl, "maxVersions": f.max_versions,
                         "compression": f.compression}
                        for f in desc.families.values()
                    ],
                    "readOnly": desc.readonly,
                }
                if self._accept() == "pb":
                    return self._send_raw(
                        200, rest_wire.encode_table_schema(schema),
                        "application/x-protobuf",
                    )
                return self._send(200, schema)
            maxv = int(q["v"]) if "v" in q else 1
            if len(parts) >= 2 and parts[1] == "scanner":
                if len(parts) >= 3:
                    # stateful scanner page: GET /<table>/scanner/<id>?n=
                    sc = (self.scanners.get(int(parts[2]))
                          if parts[2].isdigit() else None)
                    if sc is None:  # unknown or lease-expired
                        return self._send(404, {"error": "unknown scanner"})
                    try:
                        rows = sc.next(int(q.get("n", 100)))
                    finally:
                        # re-arm after the page completes, even on error
                        # (Leases renewLease) — clears get()'s busy mark
                        self.scanners.renew(int(parts[2]))
                    if not rows:
                        # exhausted — 204 No Content (ScannerResource)
                        self.send_response(204)
                        self.send_header("Content-Length", "0")
                        self.end_headers()
                        return None
                    return self._send_cells(rows)
                scan = _make_scan(q, maxv, binary=table.manifest()["binary"])
                limit = int(q.get("limit", 1000))
                rows, truncated, next_start = _collect_cells(
                    table.client().scan(scan), limit
                )
                return self._send_cells(rows, truncated, next_start)
            binary = table.manifest()["binary"]
            row = parts[1].encode() if binary else parts[1]
            g = Get(row, max_versions=maxv)
            if len(parts) >= 3:
                fam, sep, qual = parts[2].partition(":")
                if sep and qual:
                    g.columns = {fam: [qual.encode() if binary else qual]}
                else:
                    # RowResultGenerator.java:54-58 — a bare family (or
                    # 'fam:' with an empty qualifier) addresses the
                    # WHOLE family, not the empty-qualifier column
                    g.families = [fam]
            if "ts_min" in q or "ts_max" in q:
                g.time_range = (
                    int(q.get("ts_min", 0)),
                    int(q.get("ts_max", (1 << 62))),
                )
            rows, truncated, next_start = _collect_cells(table.client().get(g))
            if not rows:
                return self._send(404, {"error": "not found"})
            return self._send_cells(rows, truncated, next_start)
        except NoSuchColumnFamilyError:
            # TestRowResource.testNoSuchCF: a GET naming an undeclared
            # family is 404 (the generator comes up empty), not a 400
            return self._send(404, {"error": "no such column family"})
        except Exception as ex:  # noqa: BLE001
            return self._send(400, {"error": str(ex)})

    def do_POST(self):  # noqa: N802
        """POST /<table>/scanner — open a stateful scanner, return its id
        (ScannerResource.java: POST returns the scanner Location)."""
        parts, q = self._parts()
        try:
            if len(parts) >= 2 and parts[1] != "scanner":
                # RowResource treats POST and PUT on a row as the same
                # update (TestRowResource.testNoSuchCF POSTs a value)
                return self.do_PUT()
            if len(parts) != 2:
                return self._send(400, {"error": "POST /<table>/scanner"})
            table = self.store.table(parts[0])
            binary = table.manifest()["binary"]
            bodyfmt = self._body_format()
            n = int(self.headers.get("Content-Length", 0))
            if bodyfmt != "raw" and n:
                # ScannerResource: the body is a ScannerModel (protobuf
                # or XML) — startRow/endRow/columns/time range/versions
                raw = self.rfile.read(n)
                spec = (
                    rest_wire.decode_scanner(raw)
                    if bodyfmt == "pb"
                    else _scanner_from_xml(raw)
                )
                scan = _scan_from_model(spec, binary)
            else:
                if n:
                    self.rfile.read(n)  # drain unused raw body
                maxv = int(q["v"]) if "v" in q else 1
                scan = _make_scan(q, maxv, binary=binary)
            df = table.client().scan(scan)
            sid = self.scanners.open(_Scanner(df))
            return self._send_raw(
                201,
                json.dumps({"scanner_id": str(sid)}).encode(),
                "application/json",
                {"Location": f"/{parts[0]}/scanner/{sid}"},
            )
        except Exception as ex:  # noqa: BLE001
            return self._send(400, {"error": str(ex)})

    def do_PUT(self):  # noqa: N802
        parts, q = self._parts()
        try:
            bodyfmt = self._body_format()
            if bodyfmt != "raw" and len(parts) >= 2:
                # RowResource.update:244 — the body is a CellSet model
                # (protobuf or XML); row keys come from the body, column
                # = 'family:qualifier', cell timestamps honored
                table = self.store.table(parts[0])
                binary = table.manifest()["binary"]
                n = int(self.headers.get("Content-Length", 0))
                raw = self.rfile.read(n)
                model = (
                    rest_wire.decode_cell_set(raw)
                    if bodyfmt == "pb"
                    else rest_wire.xml_to_cell_set(raw)
                )
                puts = []
                for key, cells in model:
                    p = Put(bytes(key) if binary else key.decode())
                    for column, ts, data in cells:
                        fam_b, _, qual_b = bytes(column).partition(b":")
                        p.add(
                            fam_b.decode(),
                            qual_b if binary else qual_b.decode(),
                            bytes(data) if binary else data.decode(),
                            # None = field absent in the body (server
                            # assigns 'now'); an explicit ts — 0 included
                            # — is honored as-is (RowResource.update:244)
                            ts=ts,
                        )
                    puts.append(p)
                v = table.mutate(puts)
                return self._send(200, {"committed_version": v})
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
                closed = (self.scanners.close(int(parts[2]))
                          if parts[2].isdigit() else None)
                if closed is None:  # unknown or lease-expired
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


def serve(store: TableStore, port: int = 0,
          lease_seconds: float | None = 60.0, now_fn=None):
    """Start the REST server (daemon thread); returns (server, port).
    ``port=0`` picks an ephemeral port.  ``lease_seconds`` bounds how
    long an idle stateful scanner survives (Leases.java:281 semantics;
    None = never expires).  ``now_fn`` injects the lease clock for
    expiry tests."""
    from hbase_snapshot_spark.client import ScannerLeases

    handler = type(
        "Handler",
        (_Handler,),
        {"store": store,
         "scanners": ScannerLeases(lease_seconds, now_fn=now_fn)},
    )
    srv = ThreadingHTTPServer(("127.0.0.1", port), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, srv.server_address[1]
