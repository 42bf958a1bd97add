"""Avro binary wire encoding for the hbase.genavro protocol — a
spec-driven datum codec + call/response framing + dispatcher over the
method-surface layer in ``avro_api.py``, with no avro dependency.

Datum encoding follows the Avro spec exactly: int/long = zigzag
varint; bytes/string = long length + bytes; boolean = 1 byte; double =
8-byte little-endian IEEE; enum = int symbol index; record = fields in
declaration order; array = count-prefixed blocks ending in a 0 count;
union = long branch index + value; null = empty.  Record field order
and union branch order transcribe ``hbase.genavro``
(avro/hbase.genavro:34-271), so a client using the real Avro runtime
with that protocol decodes these bytes verbatim.

Framing is the post-handshake Avro RPC call format (spec "Message
Framing" aside): request = metadata map + message name + parameters
record; response = metadata map + error flag + (response datum |
error union).  The connection-establishment handshake exchanges
schema hashes and is transport plumbing — the in-process dispatcher
and tests speak the framed call format directly.
"""

from __future__ import annotations

import struct

from hbase_snapshot_spark import avro_api as api

# ------------------------------------------------------------ primitives


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63) if n < 0 else n << 1


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def write_long(buf: bytearray, n: int) -> None:
    z = _zigzag(n)
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.append(b | 0x80)
        else:
            buf.append(b)
            return


def read_long(data: bytes, pos: int) -> tuple[int, int]:
    shift = n = 0
    while True:
        b = data[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return _unzigzag(n), pos
        shift += 7


# ------------------------------------------------- spec-driven datum codec
# spec: ("null",)|("boolean",)|("int",)|("long",)|("double",)
#     | ("bytes",)|("string",)|("enum", [symbols])
#     | ("record", [(field_name, spec), ...])
#     | ("array", elem_spec) | ("union", [spec, ...])


def encode_datum(buf: bytearray, spec, v) -> None:
    k = spec[0]
    if k == "null":
        return
    if k == "boolean":
        buf.append(1 if v else 0)
    elif k in ("int", "long"):
        write_long(buf, int(v or 0))
    elif k == "double":
        buf += struct.pack("<d", v or 0.0)
    elif k in ("bytes", "string"):
        b = v if isinstance(v, (bytes, bytearray, memoryview)) else str(
            v if v is not None else ""
        ).encode()
        write_long(buf, len(b))
        buf += bytes(b)
    elif k == "enum":
        buf_sym = v if v in spec[1] else spec[1][-1]
        write_long(buf, spec[1].index(buf_sym))
    elif k == "record":
        for name, fspec in spec[1]:
            fv = v.get(name) if isinstance(v, dict) else getattr(v, name, None)
            encode_datum(buf, fspec, fv)
    elif k == "array":
        items = list(v or [])
        if items:
            write_long(buf, len(items))
            for it in items:
                encode_datum(buf, spec[1], it)
        write_long(buf, 0)
    elif k == "union":
        # pick the first non-null branch when v is not None, else null
        branches = spec[1]
        if v is None:
            idx = next(i for i, b in enumerate(branches) if b[0] == "null")
        else:
            idx = next(i for i, b in enumerate(branches) if b[0] != "null")
        write_long(buf, idx)
        encode_datum(buf, branches[idx], v)
    else:
        raise ValueError(f"unknown spec {spec}")


def decode_datum(data: bytes, pos: int, spec):
    k = spec[0]
    if k == "null":
        return None, pos
    if k == "boolean":
        return data[pos] != 0, pos + 1
    if k in ("int", "long"):
        return read_long(data, pos)
    if k == "double":
        return struct.unpack_from("<d", data, pos)[0], pos + 8
    if k in ("bytes", "string"):
        n, pos = read_long(data, pos)
        raw = data[pos : pos + n]
        if k == "string":
            return raw.decode(), pos + n
        return bytes(raw), pos + n
    if k == "enum":
        i, pos = read_long(data, pos)
        return spec[1][i], pos
    if k == "record":
        out = {}
        for name, fspec in spec[1]:
            out[name], pos = decode_datum(data, pos, fspec)
        return out, pos
    if k == "array":
        out = []
        while True:
            n, pos = read_long(data, pos)
            if n == 0:
                return out, pos
            if n < 0:  # block with byte-size prefix
                _, pos = read_long(data, pos)
                n = -n
            for _ in range(n):
                v, pos = decode_datum(data, pos, spec[1])
                out.append(v)
    if k == "union":
        i, pos = read_long(data, pos)
        return decode_datum(data, pos, spec[1][i])
    raise ValueError(f"unknown spec {spec}")


def _u(*branches):
    return ("union", list(branches))


_NULL = ("null",)

# ------------------------------------------------------------ IDL records
# Field order transcribes hbase.genavro.

ATIMERANGE = ("record", [("minStamp", ("long",)), ("maxStamp", ("long",))])
ACOLUMN = ("record", [
    ("family", ("bytes",)), ("qualifier", _u(("bytes",), _NULL)),
])
AGET = ("record", [
    ("row", ("bytes",)),
    ("columns", _u(("array", ACOLUMN), _NULL)),
    ("timestamp", _u(("long",), _NULL)),
    ("timerange", _u(ATIMERANGE, _NULL)),
    ("maxVersions", _u(("int",), _NULL)),
])
ARESULTENTRY = ("record", [
    ("family", ("bytes",)), ("qualifier", ("bytes",)),
    ("value", ("bytes",)), ("timestamp", ("long",)),
])
ARESULT = ("record", [
    ("row", ("bytes",)), ("entries", ("array", ARESULTENTRY)),
])
ACOLUMNVALUE = ("record", [
    ("family", ("bytes",)), ("qualifier", ("bytes",)),
    ("value", ("bytes",)), ("timestamp", _u(("long",), _NULL)),
])
APUT = ("record", [
    ("row", ("bytes",)), ("columnValues", ("array", ACOLUMNVALUE)),
])
ADELETE = ("record", [
    ("row", ("bytes",)), ("columns", _u(("array", ACOLUMN), _NULL)),
])
ASCAN = ("record", [
    ("startRow", _u(("bytes",), _NULL)),
    ("stopRow", _u(("bytes",), _NULL)),
    ("columns", _u(("array", ACOLUMN), _NULL)),
    ("timestamp", _u(("long",), _NULL)),
    ("timerange", _u(ATIMERANGE, _NULL)),
    ("maxVersions", _u(("int",), _NULL)),
])
ACOMPRESSION = ("enum", ["LZO", "GZ", "NONE"])
AFAMILYDESCRIPTOR = ("record", [
    ("name", ("bytes",)),
    ("compression", _u(ACOMPRESSION, _NULL)),
    ("maxVersions", _u(("int",), _NULL)),
    ("blocksize", _u(("int",), _NULL)),
    ("inMemory", _u(("boolean",), _NULL)),
    ("timeToLive", _u(("int",), _NULL)),
    ("blockCacheEnabled", _u(("boolean",), _NULL)),
])
ATABLEDESCRIPTOR = ("record", [
    ("name", ("bytes",)),
    ("families", _u(("array", AFAMILYDESCRIPTOR), _NULL)),
    ("maxFileSize", _u(("long",), _NULL)),
    ("memStoreFlushSize", _u(("long",), _NULL)),
    ("rootRegion", _u(("boolean",), _NULL)),
    ("metaRegion", _u(("boolean",), _NULL)),
    ("metaTable", _u(("boolean",), _NULL)),
    ("readOnly", _u(("boolean",), _NULL)),
    ("deferredLogFlush", _u(("boolean",), _NULL)),
])
ACLUSTERSTATUS = ("record", [
    ("averageLoad", ("double",)),
    ("deadServerNames", ("array", ("string",))),
    ("deadServers", ("int",)),
    ("hbaseVersion", ("string",)),
    ("regionsCount", ("int",)),
    ("requestsCount", ("int",)),
    ("serverInfos", ("array", ("record", []))),
    ("servers", ("int",)),
])
_ERR = ("record", [("message", ("string",))])


# ---------------------------------------------------------------- messages
# name -> (params [(name, spec)], response_spec, [error_class_names])

_IO = ["AIOError"]
METHODS: dict = {
    "getHBaseVersion": ([], ("string",), _IO),
    "getClusterStatus": ([], ACLUSTERSTATUS, _IO),
    "listTables": ([], ("array", ATABLEDESCRIPTOR), _IO),
    "describeTable": ([("table", ("bytes",))], ATABLEDESCRIPTOR, _IO),
    "isTableEnabled": ([("table", ("bytes",))], ("boolean",), _IO),
    "tableExists": ([("table", ("bytes",))], ("boolean",), _IO),
    "describeFamily": (
        [("table", ("bytes",)), ("family", ("bytes",))],
        AFAMILYDESCRIPTOR, _IO),
    "createTable": ([("table", ATABLEDESCRIPTOR)], _NULL,
                    ["AIOError", "AIllegalArgument", "ATableExists",
                     "AMasterNotRunning"]),  # hbase.genavro:247
    "deleteTable": ([("table", ("bytes",))], _NULL, _IO),
    "modifyTable": (
        [("table", ("bytes",)), ("tableDescriptor", ATABLEDESCRIPTOR)],
        _NULL, _IO),
    "enableTable": ([("table", ("bytes",))], _NULL, _IO),
    "disableTable": ([("table", ("bytes",))], _NULL, _IO),
    "flush": ([("table", ("bytes",))], _NULL, _IO),
    "split": ([("table", ("bytes",))], _NULL, _IO),
    "addFamily": (
        [("table", ("bytes",)), ("family", AFAMILYDESCRIPTOR)], _NULL, _IO),
    "deleteFamily": (
        [("table", ("bytes",)), ("family", ("bytes",))], _NULL, _IO),
    "modifyFamily": (
        [("table", ("bytes",)), ("familyName", ("bytes",)),
         ("familyDescriptor", AFAMILYDESCRIPTOR)], _NULL, _IO),
    "get": ([("table", ("bytes",)), ("get", AGET)], ARESULT, _IO),
    "exists": ([("table", ("bytes",)), ("get", AGET)], ("boolean",), _IO),
    "put": ([("table", ("bytes",)), ("put", APUT)], _NULL, _IO),
    "delete": ([("table", ("bytes",)), ("delete", ADELETE)], _NULL, _IO),
    "incrementColumnValue": (
        [("table", ("bytes",)), ("row", ("bytes",)), ("family", ("bytes",)),
         ("qualifier", ("bytes",)), ("amount", ("long",)),
         ("writeToWAL", ("boolean",))], ("long",), _IO),
    "scannerOpen": ([("table", ("bytes",)), ("scan", ASCAN)], ("int",), _IO),
    "scannerClose": ([("scannerId", ("int",))], _NULL,
                     ["AIOError", "AIllegalArgument"]),
    "scannerGetRows": (
        [("scannerId", ("int",)), ("numberOfRows", ("int",))],
        ("array", ARESULT), ["AIOError", "AIllegalArgument"]),
}

_META = ("record", [])  # request/response metadata: empty map on the wire


def _write_meta(buf: bytearray) -> None:
    write_long(buf, 0)  # empty map<bytes>


def _read_meta(data: bytes, pos: int) -> int:
    n, pos = read_long(data, pos)
    while n != 0:
        if n < 0:
            size, pos = read_long(data, pos)
            pos += size
            n, pos = read_long(data, pos)
            continue
        for _ in range(n):
            klen, pos = read_long(data, pos)
            pos += klen
            vlen, pos = read_long(data, pos)
            pos += vlen
        n, pos = read_long(data, pos)
    return pos


def encode_call(name: str, params: dict) -> bytes:
    buf = bytearray()
    _write_meta(buf)
    encode_datum(buf, ("string",), name)
    spec = METHODS[name]
    for pname, pspec in spec[0]:
        encode_datum(buf, pspec, params.get(pname))
    return bytes(buf)


def decode_response(name: str, data: bytes):
    """→ response datum; raises api.AIOError (etc.) on an error frame."""
    pos = _read_meta(data, 0)
    is_error = data[pos] != 0
    pos += 1
    _params, res_spec, errors = METHODS[name]
    if not is_error:
        v, _ = decode_datum(data, pos, res_spec)
        return v
    # error union: the system "string" branch FIRST (avro spec — every
    # message's effective error schema is ["string"] + declared errors),
    # then the declared errors in order
    idx, pos = read_long(data, pos)
    if idx == 0:
        v, _ = decode_datum(data, pos, ("string",))
        raise RuntimeError(v)
    v, _ = decode_datum(data, pos, _ERR)
    raise getattr(api, errors[idx - 1])(v["message"])


def serve_avro(store, port: int = 0):
    """HTTP transport for the framed avro calls — the reference
    AvroServer runs over Avro's HttpServer (AvroServer.java main):
    POST / with the framed request body returns the framed response.
    Returns (server, port)."""
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    dispatcher = AvroBinaryDispatcher(api.AvroServer(store))

    class H(BaseHTTPRequestHandler):
        def log_message(self, *args):
            pass

        def do_POST(self):  # noqa: N802
            n = int(self.headers.get("Content-Length", 0))
            body = dispatcher.handle(self.rfile.read(n))
            self.send_response(200)
            self.send_header("Content-Type", "avro/binary")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    srv = ThreadingHTTPServer(("127.0.0.1", port), H)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, srv.server_address[1]


class AvroBinaryDispatcher:
    """Serves framed avro calls against an ``avro_api.AvroServer``."""

    def __init__(self, handler: api.AvroServer):
        self.handler = handler

    def handle(self, request: bytes) -> bytes:
        pos = _read_meta(request, 0)
        name, pos = decode_datum(request, pos, ("string",))
        out = bytearray()
        _write_meta(out)
        if name not in METHODS:
            out.append(1)
            write_long(out, 0)  # system "string" error branch (index 0)
            encode_datum(out, ("string",), f"unknown message {name}")
            return bytes(out)
        params_spec, res_spec, errors = METHODS[name]
        args = []
        for _pname, pspec in params_spec:
            v, pos = decode_datum(request, pos, pspec)
            args.append(v)
        args = [self._hydrate(name, i, v) for i, v in enumerate(args)]
        try:
            result = getattr(self.handler, name)(*args)
        except tuple(getattr(api, e) for e in errors) as ex:
            out.append(1)
            idx = next(i for i, e in enumerate(errors)
                       if isinstance(ex, getattr(api, e)))
            write_long(out, idx + 1)  # after the system string branch
            encode_datum(out, _ERR, {"message": str(ex)})
            return bytes(out)
        if name == "getClusterStatus":
            result = {
                "deadServerNames": [], "requestsCount": 0, "serverInfos": [],
                **(result or {}),
            }
        out.append(0)
        encode_datum(out, res_spec, result)
        return bytes(out)

    @staticmethod
    def _hydrate(method: str, arg_idx: int, v):
        """decoded dicts → the api layer's dataclasses; bytes table/row
        keys → str (the engine's string-table convention)."""

        def txt(b):
            return b.decode() if isinstance(b, (bytes, bytearray)) else b

        def col(d):
            return api.AColumn(family=txt(d["family"]),
                               qualifier=txt(d.get("qualifier")))

        def trange(d):
            return api.ATimeRange(**d) if d else None

        if v is None:
            return None
        if method in ("get", "exists") and arg_idx == 1:
            return api.AGet(
                row=txt(v["row"]),
                columns=[col(c) for c in v["columns"]] if v.get("columns") else None,
                timestamp=v.get("timestamp"),
                timerange=trange(v.get("timerange")),
                maxVersions=v.get("maxVersions"),
            )
        if method == "put" and arg_idx == 1:
            return api.APut(
                row=txt(v["row"]),
                columnValues=[api.AColumnValue(
                    family=txt(c["family"]), qualifier=txt(c["qualifier"]),
                    value=txt(c["value"]), timestamp=c.get("timestamp"),
                ) for c in v.get("columnValues", [])],
            )
        if method == "delete" and arg_idx == 1:
            return api.ADelete(
                row=txt(v["row"]),
                columns=[col(c) for c in v["columns"]] if v.get("columns") else None,
            )
        if method == "scannerOpen" and arg_idx == 1:
            return api.AScan(
                startRow=txt(v.get("startRow")),
                stopRow=txt(v.get("stopRow")),
                columns=[col(c) for c in v["columns"]] if v.get("columns") else None,
                timestamp=v.get("timestamp"),
                timerange=trange(v.get("timerange")),
                maxVersions=v.get("maxVersions"),
            )
        if method == "createTable" and arg_idx == 0:
            return api.ATableDescriptor(
                name=txt(v["name"]),
                families=[api.AFamilyDescriptor(
                    name=txt(f["name"]),
                    compression=f.get("compression"),
                    maxVersions=f.get("maxVersions"),
                    timeToLive=f.get("timeToLive"),
                ) for f in v.get("families") or []],
            )
        if method == "modifyTable" and arg_idx == 1:
            return AvroBinaryDispatcher._hydrate("createTable", 0, v)
        if method in ("addFamily", "modifyFamily") and arg_idx == (
            1 if method == "addFamily" else 2
        ):
            return api.AFamilyDescriptor(
                name=txt(v["name"]),
                compression=v.get("compression"),
                maxVersions=v.get("maxVersions"),
                timeToLive=v.get("timeToLive"),
            )
        return txt(v)
