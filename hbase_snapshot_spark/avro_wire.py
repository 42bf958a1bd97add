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
    elif k == "fixed":
        b = bytes(v or b"\x00" * spec[1])
        assert len(b) == spec[1], f"fixed({spec[1]}) got {len(b)} bytes"
        buf += b
    elif k == "map":
        items = list((v or {}).items())
        if items:
            write_long(buf, len(items))
            for mk, mv in items:
                encode_datum(buf, ("string",), mk)
                encode_datum(buf, spec[1], mv)
        write_long(buf, 0)
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
    if k == "fixed":
        return bytes(data[pos : pos + spec[1]]), pos + spec[1]
    if k == "map":
        out = {}
        while True:
            n, pos = read_long(data, pos)
            if n == 0:
                return out, pos
            if n < 0:  # block with byte-size prefix
                _, pos = read_long(data, pos)
                n = -n
            for _ in range(n):
                mk, pos = decode_datum(data, pos, ("string",))
                out[mk], pos = decode_datum(data, pos, spec[1])
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
ASERVERADDRESS = ("record", [
    ("hostname", ("string",)), ("inetSocketAddress", ("string",)),
    ("port", ("int",)),
])
AREGIONLOAD = ("record", [
    ("memStoreSizeMB", ("int",)), ("name", ("bytes",)),
    ("storefileIndexSizeMB", ("int",)), ("storefiles", ("int",)),
    ("storefileSizeMB", ("int",)), ("stores", ("int",)),
])
ASERVERLOAD = ("record", [
    ("load", ("int",)), ("maxHeapMB", ("int",)),
    ("memStoreSizeInMB", ("int",)), ("numberOfRegions", ("int",)),
    ("numberOfRequests", ("int",)), ("regionsLoad", ("array", AREGIONLOAD)),
    ("storefileIndexSizeInMB", ("int",)), ("storefiles", ("int",)),
    ("storefileSizeInMB", ("int",)), ("usedHeapMB", ("int",)),
])
ASERVERINFO = ("record", [
    ("infoPort", ("int",)), ("load", ASERVERLOAD),
    ("serverAddress", ASERVERADDRESS), ("serverName", ("string",)),
    ("startCode", ("long",)),
])
ACLUSTERSTATUS = ("record", [
    ("averageLoad", ("double",)),
    ("deadServerNames", ("array", ("string",))),
    ("deadServers", ("int",)),
    ("hbaseVersion", ("string",)),
    ("regionsCount", ("int",)),
    ("requestsCount", ("int",)),
    ("serverInfos", ("array", ASERVERINFO)),
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


# ------------------------------------------------------ protocol JSON + hash
# The server's protocol text, emitted from the SAME spec tuples the
# codec encodes with — so the schema a client resolves against is by
# construction the schema these bytes follow.  Record/enum names
# transcribe hbase.genavro so a stock client's named-type resolution
# lines up.

_TYPE_NAMES = [
    (ASERVERADDRESS, "AServerAddress"), (AREGIONLOAD, "ARegionLoad"),
    (ASERVERLOAD, "AServerLoad"), (ASERVERINFO, "AServerInfo"),
    (ACLUSTERSTATUS, "AClusterStatus"),
    (ACOMPRESSION, "ACompressionAlgorithm"),
    (AFAMILYDESCRIPTOR, "AFamilyDescriptor"),
    (ATABLEDESCRIPTOR, "ATableDescriptor"),
    (ACOLUMN, "AColumn"), (ATIMERANGE, "ATimeRange"), (AGET, "AGet"),
    (ARESULTENTRY, "AResultEntry"), (ARESULT, "AResult"),
    (ACOLUMNVALUE, "AColumnValue"), (APUT, "APut"), (ADELETE, "ADelete"),
    (ASCAN, "AScan"),
]
_ERROR_NAMES = ["AIOError", "AIllegalArgument", "ATableExists",
                "AMasterNotRunning"]


def _spec_json(spec, defined: set):
    name = next((n for s, n in _TYPE_NAMES if s is spec), None)
    if name is not None:
        if name in defined:
            return name
        defined.add(name)
        if spec[0] == "enum":
            return {"type": "enum", "name": name, "symbols": spec[1]}
        return {
            "type": "record", "name": name,
            "fields": [{"name": f, "type": _spec_json(fs, defined)}
                       for f, fs in spec[1]],
        }
    k = spec[0]
    if k in ("null", "boolean", "int", "long", "double", "bytes", "string"):
        return k
    if k == "array":
        return {"type": "array", "items": _spec_json(spec[1], defined)}
    if k == "union":
        return [_spec_json(b, defined) for b in spec[1]]
    if k == "map":
        return {"type": "map", "values": _spec_json(spec[1], defined)}
    raise ValueError(f"cannot emit JSON for spec {spec}")


def protocol_json() -> str:
    """The canonical Avro protocol text this server speaks (the
    ``serverProtocol`` of the handshake).  Deterministic: same spec
    tuples → same text → same MD5."""
    import json

    defined: set = set()
    types = [_spec_json(s, defined) for s, _n in _TYPE_NAMES]
    types += [
        {"type": "error", "name": n,
         "fields": [{"name": "message", "type": "string"}]}
        for n in _ERROR_NAMES
    ]
    messages = {}
    for mname, (params, res, errors) in METHODS.items():
        msg = {
            "request": [{"name": p, "type": _spec_json(ps, defined)}
                        for p, ps in params],
            "response": "null" if res == _NULL else _spec_json(res, defined),
        }
        if errors:
            msg["errors"] = list(errors)
        messages[mname] = msg
    return json.dumps({
        "protocol": "HBase",
        "namespace": "org.apache.hadoop.hbase.avro.generated",
        "types": types,
        "messages": messages,
    }, separators=(",", ":"))


def _md5(text: str) -> bytes:
    import hashlib

    return hashlib.md5(text.encode()).digest()


PROTOCOL_JSON = protocol_json()
SERVER_HASH = _md5(PROTOCOL_JSON)


# -------------------------------------------------------------- handshake
# org.apache.avro.ipc HandshakeRequest/HandshakeResponse (Avro spec
# "Handshake"): over a STATELESS transport (the reference AvroServer
# runs on Avro's HttpServer) every request is prefixed with a
# handshake request and every response with a handshake response.

HANDSHAKE_REQUEST = ("record", [
    ("clientHash", ("fixed", 16)),
    ("clientProtocol", _u(_NULL, ("string",))),
    ("serverHash", ("fixed", 16)),
    ("meta", _u(_NULL, ("map", ("bytes",)))),
])
HANDSHAKE_RESPONSE = ("record", [
    ("match", ("enum", ["BOTH", "CLIENT", "NONE"])),
    ("serverProtocol", _u(_NULL, ("string",))),
    ("serverHash", _u(_NULL, ("fixed", 16))),
    ("meta", _u(_NULL, ("map", ("bytes",)))),
])


class HandshakeServer:
    """Server-side handshake state: client protocol hashes accepted so
    far (the reference caches them the same way, Responder.protocols).

    match rules (spec): the server knows the client's protocol (by hash
    or because the request carries the text) → BOTH when the client's
    idea of the server hash is current, else CLIENT (response carries
    serverProtocol + serverHash).  Unknown client hash and no protocol
    text → NONE: the call is NOT processed, the client must re-submit
    with ``clientProtocol`` set."""

    def __init__(self):
        self._known: set = set()

    def respond(self, request: bytes) -> tuple[dict, int, bool]:
        """→ (handshake_response, call_start_pos, proceed)"""
        req, pos = decode_datum(request, 0, HANDSHAKE_REQUEST)
        client_hash = req["clientHash"]
        if req["clientProtocol"] is not None:
            self._known.add(_md5(req["clientProtocol"]))
            self._known.add(client_hash)
        knows_client = (client_hash == SERVER_HASH
                        or client_hash in self._known)
        if not knows_client:
            match = "NONE"
        elif req["serverHash"] == SERVER_HASH:
            match = "BOTH"
        else:
            match = "CLIENT"
        resp = {
            "match": match,
            "serverProtocol": None if match == "BOTH" else PROTOCOL_JSON,
            "serverHash": None if match == "BOTH" else SERVER_HASH,
            "meta": None,
        }
        return resp, pos, match != "NONE"


def encode_http_request(
    name: str, params: dict, *,
    client_hash: bytes | None = None,
    client_protocol: str | None = None,
    server_hash: bytes | None = None,
) -> bytes:
    """Client side of the stateless transport: handshake request +
    framed call.  Defaults assume the client speaks this module's
    protocol and knows the server hash (the warm path)."""
    buf = bytearray()
    encode_datum(buf, HANDSHAKE_REQUEST, {
        "clientHash": client_hash if client_hash is not None else SERVER_HASH,
        "clientProtocol": client_protocol,
        "serverHash": server_hash if server_hash is not None else SERVER_HASH,
        "meta": None,
    })
    buf += encode_call(name, params)
    return bytes(buf)


def decode_http_response(name: str, body: bytes):
    """→ (handshake_response, result | None).  result is None when
    match=NONE (re-submit with ``client_protocol`` set); errors raise
    exactly like :func:`decode_response`."""
    hs, pos = decode_datum(body, 0, HANDSHAKE_RESPONSE)
    if hs["match"] == "NONE":
        return hs, None
    return hs, decode_response(name, body[pos:])


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
    AvroServer runs over Avro's HttpServer (AvroServer.java main), a
    STATELESS transport: every POST body carries a handshake request
    before the framed call, every response a handshake response before
    the framed result (Avro spec "Handshake").  A stock client
    connecting cold (unknown hash, no protocol text) gets match=NONE
    plus this server's protocol text and re-submits.
    Returns (server, port)."""
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    dispatcher = AvroBinaryDispatcher(api.AvroServer(store))
    handshakes = HandshakeServer()

    class H(BaseHTTPRequestHandler):
        def log_message(self, *args):
            pass

        def do_POST(self):  # noqa: N802
            n = int(self.headers.get("Content-Length", 0))
            request = self.rfile.read(n)
            try:
                hs, pos, proceed = handshakes.respond(request)
                body = bytearray()
                encode_datum(body, HANDSHAKE_RESPONSE, hs)
                if proceed:
                    body += dispatcher.handle(request[pos:])
            except Exception as ex:  # noqa: BLE001
                # a malformed/truncated handshake must get an HTTP
                # answer, not a dropped connection
                msg = f"bad avro request: {ex}".encode()
                self.send_response(400)
                self.send_header("Content-Type", "text/plain")
                self.send_header("Content-Length", str(len(msg)))
                self.end_headers()
                self.wfile.write(msg)
                return
            body = bytes(body)
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
        except Exception as ex:  # noqa: BLE001
            # undeclared engine errors (NoSuchColumnFamilyError, ...)
            # must still produce a FRAMED reply, never kill the
            # connection: the reference AvroServer wraps IOExceptions
            # into the declared AIOError; anything truly unexpected
            # takes the avro-spec system "string" branch
            out.append(1)
            if "AIOError" in errors:
                write_long(out, errors.index("AIOError") + 1)
                encode_datum(out, _ERR, {"message": str(ex)})
            else:
                write_long(out, 0)
                encode_datum(out, ("string",), str(ex))
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
