"""Thrift binary wire protocol for the Hbase.thrift service — a
table-driven TBinaryProtocol codec + dispatcher over the method-surface
layer in ``thrift_api.py``, with no thrift dependency.

Wire format (TBinaryProtocol, strict): message = i32 (0x80010000 |
type) + string name + i32 seqid, then the args struct; every struct is
a sequence of (byte ttype, i16 field-id, value) triples ending in STOP.
All integers big-endian; strings are i32-length-prefixed bytes.  Struct
field ids and method signatures transcribe Hbase.thrift
(src/main/resources/.../Hbase.thrift:59-135 structs, :241+ service) —
a client generated from that IDL speaks to this dispatcher byte-for-
byte.

``ThriftBinaryDispatcher.handle(request)-> response`` serves one
encoded call (in-process or from any transport); ``serve_thrift``
wraps it in a threaded TCP server speaking buffered (unframed)
TBinaryProtocol like the reference's ThriftServer default.
"""

from __future__ import annotations

import socket
import socketserver
import struct
import threading

from hbase_snapshot_spark import thrift_api as api

# TType ids (thrift protocol constants)
STOP, BOOL, BYTE, DOUBLE, I16, I32, I64, STRING, STRUCT, MAP, SET, LIST = (
    0, 2, 3, 4, 6, 8, 10, 11, 12, 13, 14, 15
)
VERSION_1 = 0x80010000
CALL, REPLY, EXCEPTION = 1, 2, 3


# ------------------------------------------------------------- primitives


class Reader:
    def __init__(self, read):
        self._read = read  # fn(n) -> exactly n bytes

    def read(self, n: int) -> bytes:
        b = self._read(n)
        if len(b) != n:
            raise EOFError("short read")
        return b

    def i8(self) -> int:
        return struct.unpack("!b", self.read(1))[0]

    def i16(self) -> int:
        return struct.unpack("!h", self.read(2))[0]

    def i32(self) -> int:
        return struct.unpack("!i", self.read(4))[0]

    def i64(self) -> int:
        return struct.unpack("!q", self.read(8))[0]

    def double(self) -> float:
        return struct.unpack("!d", self.read(8))[0]

    def binary(self) -> bytes:
        return self.read(self.i32())


class Writer:
    def __init__(self):
        self.buf = bytearray()

    def i8(self, v):
        self.buf += struct.pack("!b", v)

    def i16(self, v):
        self.buf += struct.pack("!h", v)

    def i32(self, v):
        # message-version words exceed the signed range; wrap to i32
        if v > 0x7FFFFFFF:
            v -= 1 << 32
        self.buf += struct.pack("!i", v)

    def i64(self, v):
        self.buf += struct.pack("!q", v)

    def double(self, v):
        self.buf += struct.pack("!d", v)

    def binary(self, v):
        if isinstance(v, str):
            v = v.encode()
        self.i32(len(v))
        self.buf += bytes(v)


# ------------------------------------------------- type-spec driven codec
# spec: ("bool"|"byte"|"i32"|"i64"|"double"|"string",)
#     | ("struct", fields) where fields = {id: (attr_name, spec)}
#     | ("list", elem_spec) | ("map", key_spec, val_spec)

_TTYPE = {"bool": BOOL, "byte": BYTE, "double": DOUBLE, "i16": I16,
          "i32": I32, "i64": I64, "string": STRING, "struct": STRUCT,
          "map": MAP, "set": SET, "list": LIST}


def _write_value(w: Writer, spec, v) -> None:
    k = spec[0]
    if k == "bool":
        w.i8(1 if v else 0)
    elif k == "byte":
        w.i8(v or 0)
    elif k == "i32":
        w.i32(v or 0)
    elif k == "i64":
        w.i64(v or 0)
    elif k == "double":
        w.double(v or 0.0)
    elif k == "string":
        w.binary(v if v is not None else b"")
    elif k == "struct":
        _write_struct(w, spec[1], v)
    elif k == "list":
        items = list(v or [])
        w.i8(_TTYPE[spec[1][0]])
        w.i32(len(items))
        for it in items:
            _write_value(w, spec[1], it)
    elif k == "map":
        items = dict(v or {})
        w.i8(_TTYPE[spec[1][0]])
        w.i8(_TTYPE[spec[2][0]])
        w.i32(len(items))
        for mk, mv in items.items():
            _write_value(w, spec[1], mk)
            _write_value(w, spec[2], mv)
    else:
        raise ValueError(f"unknown spec {spec}")


def _write_struct(w: Writer, fields: dict, obj) -> None:
    for fid, (name, spec) in fields.items():
        v = obj.get(name) if isinstance(obj, dict) else getattr(obj, name, None)
        if v is None:
            continue
        w.i8(_TTYPE[spec[0]])
        w.i16(fid)
        _write_value(w, spec, v)
    w.i8(STOP)


def _skip(r: Reader, ttype: int) -> None:
    if ttype in (BOOL, BYTE):
        r.read(1)
    elif ttype == I16:
        r.read(2)
    elif ttype == I32:
        r.read(4)
    elif ttype in (I64, DOUBLE):
        r.read(8)
    elif ttype == STRING:
        r.binary()
    elif ttype == STRUCT:
        while True:
            ft = r.i8()
            if ft == STOP:
                return
            r.i16()
            _skip(r, ft)
    elif ttype in (LIST, SET):
        et = r.i8()
        for _ in range(r.i32()):
            _skip(r, et)
    elif ttype == MAP:
        kt, vt = r.i8(), r.i8()
        for _ in range(r.i32()):
            _skip(r, kt)
            _skip(r, vt)
    else:
        raise ValueError(f"cannot skip ttype {ttype}")


def _read_value(r: Reader, spec):
    k = spec[0]
    if k == "bool":
        return r.i8() != 0
    if k == "byte":
        return r.i8()
    if k == "i32":
        return r.i32()
    if k == "i64":
        return r.i64()
    if k == "double":
        return r.double()
    if k == "string":
        b = r.binary()
        try:
            return b.decode()
        except UnicodeDecodeError:
            return b
    if k == "struct":
        return _read_struct(r, spec[1])
    if k == "list":
        et = r.i8()
        n = r.i32()
        if et != _TTYPE[spec[1][0]]:
            for _ in range(n):
                _skip(r, et)
            return []
        return [_read_value(r, spec[1]) for _ in range(n)]
    if k == "map":
        kt, vt = r.i8(), r.i8()
        n = r.i32()
        out = {}
        for _ in range(n):
            mk = _read_value(r, spec[1])
            mv = _read_value(r, spec[2])
            out[mk] = mv
        return out
    raise ValueError(f"unknown spec {spec}")


def _read_struct(r: Reader, fields: dict) -> dict:
    out = {}
    while True:
        ft = r.i8()
        if ft == STOP:
            return out
        fid = r.i16()
        if fid in fields and _TTYPE[fields[fid][1][0]] == ft:
            out[fields[fid][0]] = _read_value(r, fields[fid][1])
        else:
            _skip(r, ft)


# ------------------------------------------------------------ IDL structs
# Field ids transcribe Hbase.thrift:59-135.

TCELL = ("struct", {1: ("value", ("string",)), 2: ("timestamp", ("i64",))})
COLUMN_DESCRIPTOR = ("struct", {
    1: ("name", ("string",)),
    2: ("maxVersions", ("i32",)),
    3: ("compression", ("string",)),
    4: ("inMemory", ("bool",)),
    5: ("bloomFilterType", ("string",)),
    6: ("bloomFilterVectorSize", ("i32",)),
    7: ("bloomFilterNbHashes", ("i32",)),
    8: ("blockCacheEnabled", ("bool",)),
    9: ("timeToLive", ("i32",)),
})
TREGION_INFO = ("struct", {
    1: ("startKey", ("string",)),
    2: ("endKey", ("string",)),
    3: ("id", ("i64",)),
    4: ("name", ("string",)),
    5: ("version", ("byte",)),
})
MUTATION = ("struct", {
    1: ("isDelete", ("bool",)),
    2: ("column", ("string",)),
    3: ("value", ("string",)),
})
BATCH_MUTATION = ("struct", {
    1: ("row", ("string",)),
    2: ("mutations", ("list", MUTATION)),
})
TROW_RESULT = ("struct", {
    1: ("row", ("string",)),
    2: ("columns", ("map", ("string",), TCELL)),
})
EXC = ("struct", {1: ("message", ("string",))})

# TApplicationException (thrift runtime struct)
_APP_EXC = ("struct", {1: ("message", ("string",)), 2: ("type", ("i32",))})


# ---------------------------------------------------------------- methods
# name -> (args [(fid, name, spec)], success_spec|None,
#          throws {exc_class_name: (fid, thrift_name)})

_IO = {"IOError_": (1, "io")}
_IO_IA = {"IOError_": (1, "io"), "IllegalArgument": (2, "ia")}
_CREATE = {"IOError_": (1, "io"), "IllegalArgument": (2, "ia"),
           "AlreadyExists": (3, "exist")}  # Hbase.thrift:227

METHODS: dict = {
    "enableTable": ([(1, "tableName", ("string",))], None, _IO),
    "disableTable": ([(1, "tableName", ("string",))], None, _IO),
    "isTableEnabled": ([(1, "tableName", ("string",))], ("bool",), _IO),
    "compact": ([(1, "tableNameOrRegionName", ("string",))], None, _IO),
    "majorCompact": ([(1, "tableNameOrRegionName", ("string",))], None, _IO),
    "getTableNames": ([], ("list", ("string",)), _IO),
    "getColumnDescriptors": (
        [(1, "tableName", ("string",))],
        ("map", ("string",), COLUMN_DESCRIPTOR), _IO),
    "getTableRegions": (
        [(1, "tableName", ("string",))], ("list", TREGION_INFO), _IO),
    "createTable": (
        [(1, "tableName", ("string",)),
         (2, "columnFamilies", ("list", COLUMN_DESCRIPTOR))], None, _CREATE),
    "deleteTable": ([(1, "tableName", ("string",))], None, _IO),
    "get": (
        [(1, "tableName", ("string",)), (2, "row", ("string",)),
         (3, "column", ("string",))], ("list", TCELL), _IO),
    "getVer": (
        [(1, "tableName", ("string",)), (2, "row", ("string",)),
         (3, "column", ("string",)), (4, "numVersions", ("i32",))],
        ("list", TCELL), _IO),
    "getVerTs": (
        [(1, "tableName", ("string",)), (2, "row", ("string",)),
         (3, "column", ("string",)), (4, "timestamp", ("i64",)),
         (5, "numVersions", ("i32",))], ("list", TCELL), _IO),
    "getRow": (
        [(1, "tableName", ("string",)), (2, "row", ("string",))],
        ("list", TROW_RESULT), _IO),
    "getRowWithColumns": (
        [(1, "tableName", ("string",)), (2, "row", ("string",)),
         (3, "columns", ("list", ("string",)))], ("list", TROW_RESULT), _IO),
    "getRowTs": (
        [(1, "tableName", ("string",)), (2, "row", ("string",)),
         (3, "timestamp", ("i64",))], ("list", TROW_RESULT), _IO),
    "getRowWithColumnsTs": (
        [(1, "tableName", ("string",)), (2, "row", ("string",)),
         (3, "columns", ("list", ("string",))), (4, "timestamp", ("i64",))],
        ("list", TROW_RESULT), _IO),
    "mutateRow": (
        [(1, "tableName", ("string",)), (2, "row", ("string",)),
         (3, "mutations", ("list", MUTATION))], None, _IO_IA),
    "mutateRowTs": (
        [(1, "tableName", ("string",)), (2, "row", ("string",)),
         (3, "mutations", ("list", MUTATION)), (4, "timestamp", ("i64",))],
        None, _IO_IA),
    "mutateRows": (
        [(1, "tableName", ("string",)),
         (2, "rowBatches", ("list", BATCH_MUTATION))], None, _IO_IA),
    "mutateRowsTs": (
        [(1, "tableName", ("string",)),
         (2, "rowBatches", ("list", BATCH_MUTATION)),
         (3, "timestamp", ("i64",))], None, _IO_IA),
    "atomicIncrement": (
        [(1, "tableName", ("string",)), (2, "row", ("string",)),
         (3, "column", ("string",)), (4, "value", ("i64",))],
        ("i64",), _IO_IA),
    "deleteAll": (
        [(1, "tableName", ("string",)), (2, "row", ("string",)),
         (3, "column", ("string",))], None, _IO),
    "deleteAllTs": (
        [(1, "tableName", ("string",)), (2, "row", ("string",)),
         (3, "column", ("string",)), (4, "timestamp", ("i64",))], None, _IO),
    "deleteAllRow": (
        [(1, "tableName", ("string",)), (2, "row", ("string",))], None, _IO),
    "deleteAllRowTs": (
        [(1, "tableName", ("string",)), (2, "row", ("string",)),
         (3, "timestamp", ("i64",))], None, _IO),
    "scannerOpen": (
        [(1, "tableName", ("string",)), (2, "startRow", ("string",)),
         (3, "columns", ("list", ("string",)))], ("i32",), _IO),
    "scannerOpenWithStop": (
        [(1, "tableName", ("string",)), (2, "startRow", ("string",)),
         (3, "stopRow", ("string",)), (4, "columns", ("list", ("string",)))],
        ("i32",), _IO),
    "scannerOpenWithPrefix": (
        [(1, "tableName", ("string",)), (2, "startAndPrefix", ("string",)),
         (3, "columns", ("list", ("string",)))], ("i32",), _IO),
    "scannerOpenTs": (
        [(1, "tableName", ("string",)), (2, "startRow", ("string",)),
         (3, "columns", ("list", ("string",))), (4, "timestamp", ("i64",))],
        ("i32",), _IO),
    "scannerOpenWithStopTs": (
        [(1, "tableName", ("string",)), (2, "startRow", ("string",)),
         (3, "stopRow", ("string",)), (4, "columns", ("list", ("string",))),
         (5, "timestamp", ("i64",))], ("i32",), _IO),
    "scannerGet": ([(1, "id", ("i32",))], ("list", TROW_RESULT), _IO_IA),
    "scannerGetList": (
        [(1, "id", ("i32",)), (2, "nbRows", ("i32",))],
        ("list", TROW_RESULT), _IO_IA),
    "scannerClose": ([(1, "id", ("i32",))], None, _IO_IA),
}


# ------------------------------------------------------------- messages


def encode_call(name: str, seqid: int, args: dict) -> bytes:
    """Client-side: encode a method CALL (used by tests and any
    in-process client)."""
    w = Writer()
    w.i32(VERSION_1 | CALL)
    w.binary(name)
    w.i32(seqid)
    arg_spec, _res, _throws = METHODS[name]
    fields = {fid: (n, spec) for fid, n, spec in arg_spec}
    _write_struct(w, fields, args)
    return bytes(w.buf)


def decode_reply(name: str, data: bytes):
    """Client-side: decode a REPLY; raises api.IOError_ on a declared
    exception, RuntimeError on TApplicationException."""
    r = Reader(_bytes_reader(data))
    ver = r.i32()
    mtype = ver & 0xFF
    rname = r.binary().decode()
    r.i32()  # seqid
    if mtype == EXCEPTION:
        exc = _read_struct(r, _APP_EXC[1])
        raise RuntimeError(f"TApplicationException: {exc.get('message')}")
    _args, res_spec, throws = METHODS[name]
    fields = {}
    if res_spec is not None:
        fields[0] = ("success", res_spec)
    for _cls, (fid, tname) in throws.items():
        fields[fid] = (tname, EXC)
    out = _read_struct(r, fields)
    for cls_name, (fid, tname) in throws.items():
        if tname in out:
            raise getattr(api, cls_name)(out[tname].get("message", ""))
    assert rname == name, (rname, name)
    return out.get("success")


def _bytes_reader(data: bytes):
    pos = [0]

    def read(n):
        b = data[pos[0] : pos[0] + n]
        pos[0] += n
        return b

    return read


class ThriftBinaryDispatcher:
    """Serves encoded TBinaryProtocol calls against a
    ``thrift_api.ThriftServer`` handler instance."""

    def __init__(self, handler: api.ThriftServer):
        self.handler = handler

    def handle(self, request: bytes) -> bytes:
        r = Reader(_bytes_reader(request))
        ver = r.i32()
        if ver & 0xFFFF0000 != VERSION_1:
            raise ValueError("only strict TBinaryProtocol is supported")
        name = r.binary().decode()
        seqid = r.i32()
        w = Writer()
        if name not in METHODS:
            w.i32(VERSION_1 | EXCEPTION)
            w.binary(name)
            w.i32(seqid)
            _write_struct(w, _APP_EXC[1],
                          {"message": f"Invalid method name: '{name}'",
                           "type": 1})
            return bytes(w.buf)
        arg_spec, res_spec, throws = METHODS[name]
        fields = {fid: (n, spec) for fid, n, spec in arg_spec}
        args = _read_struct(r, fields)
        ordered = [args.get(n) for _fid, n, _s in arg_spec]
        # thrift structs arrive as dicts; the api layer takes its own
        # dataclasses for Mutation/BatchMutation/ColumnDescriptor
        w.i32(VERSION_1 | REPLY)
        w.binary(name)
        w.i32(seqid)
        try:
            ordered = [self._hydrate(name, i, v)
                       for i, v in enumerate(ordered)]
            result = getattr(self.handler, name)(*ordered)
        except (api.IOError_, api.IllegalArgument, api.AlreadyExists) as ex:
            # encode at the field id the IDL declares for this exception
            # class on this method; an undeclared class degrades to the
            # universally-declared IOError at field 1
            fid, tname = throws.get(type(ex).__name__,
                                    throws.get("IOError_", (1, "io")))
            _write_struct(w, {fid: (tname, EXC)}, {tname: {"message": str(ex)}})
            return bytes(w.buf)
        except Exception as ex:  # noqa: BLE001
            # any other handler/hydration failure must still produce a
            # framed reply — a raw propagate would kill the connection
            # thread with the REPLY header half-buffered.  Thrift's
            # processors answer TApplicationException INTERNAL_ERROR (6).
            w2 = Writer()
            w2.i32(VERSION_1 | EXCEPTION)
            w2.binary(name)
            w2.i32(seqid)
            _write_struct(w2, _APP_EXC[1],
                          {"message": f"Internal error processing {name}: "
                                      f"{ex}", "type": 6})
            return bytes(w2.buf)
        if name == "getColumnDescriptors":
            # the api layer returns {name: {maxVersions, ttl, ...}};
            # rebuild the ColumnDescriptor wire shape
            result = {
                cname: {
                    "name": cname,
                    "maxVersions": d.get("maxVersions"),
                    "timeToLive": d.get("ttl"),
                    "compression": "NONE",
                }
                for cname, d in result.items()
            }
        out_fields = {}
        out_obj = {}
        if res_spec is not None:
            out_fields[0] = ("success", res_spec)
            out_obj["success"] = result
        _write_struct(w, out_fields, out_obj)
        return bytes(w.buf)

    @staticmethod
    def _hydrate(method: str, arg_idx: int, v):
        """dict args → api dataclasses where the handler expects them."""
        if v is None:
            return None
        if method == "createTable" and arg_idx == 1:
            out = []
            for x in v:
                if isinstance(x, dict):
                    keep = {k: x[k] for k in
                            ("name", "maxVersions", "timeToLive",
                             "replicationScope") if k in x}
                    out.append(api.ColumnDescriptor(**keep))
                else:
                    out.append(x)
            return out
        if method in ("mutateRow", "mutateRowTs") and arg_idx == 2:
            return [api.Mutation(**x) if isinstance(x, dict) else x for x in v]
        if method in ("mutateRows", "mutateRowsTs") and arg_idx == 1:
            return [
                api.BatchMutation(
                    row=x["row"],
                    mutations=[api.Mutation(**m) if isinstance(m, dict) else m
                               for m in x.get("mutations", [])],
                ) if isinstance(x, dict) else x
                for x in v
            ]
        return v


def serve_thrift(store, port: int = 0):
    """Threaded TCP server speaking buffered (unframed) TBinaryProtocol,
    like the reference ThriftServer's default transport stack.  Returns
    (server, port)."""
    dispatcher = ThriftBinaryDispatcher(api.ThriftServer(store))

    class H(socketserver.BaseRequestHandler):
        def handle(self):
            f = self.request.makefile("rwb")
            reader = Reader(lambda n: f.read(n))
            while True:
                try:
                    resp = _handle_stream(dispatcher, reader)
                except EOFError:
                    return
                f.write(resp)
                f.flush()

    class Srv(socketserver.ThreadingTCPServer):
        allow_reuse_address = True
        daemon_threads = True

    srv = Srv(("127.0.0.1", port), H)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, srv.server_address[1]


def _handle_stream(dispatcher: ThriftBinaryDispatcher, r: Reader) -> bytes:
    """Read ONE call off a stream reader, re-encode it as bytes, and
    dispatch (unframed transport: the message is self-delimiting)."""
    ver = r.i32()
    name_b = r.binary()
    seqid = r.i32()
    name = name_b.decode()
    if name not in METHODS:
        w = Writer()
        w.i32(VERSION_1 | EXCEPTION)
        w.binary(name)
        w.i32(seqid)
        _write_struct(w, _APP_EXC[1],
                      {"message": f"Invalid method name: '{name}'", "type": 1})
        # drain the unknown args struct
        _skip(r, STRUCT)
        return bytes(w.buf)
    arg_spec, _res, _throws = METHODS[name]
    fields = {fid: (n, spec) for fid, n, spec in arg_spec}
    args = _read_struct(r, fields)
    w = Writer()
    w.i32(ver)
    w.binary(name_b)
    w.i32(seqid)
    _write_struct(w, fields, args)
    return dispatcher.handle(bytes(w.buf))


def client_call(sock_addr: tuple, name: str, seqid: int = 0, **args):
    """Minimal blocking client for tests: one call over a fresh
    TBinaryProtocol TCP connection (or reuse a socket by passing it)."""
    if isinstance(sock_addr, socket.socket):
        s = sock_addr
        own = False
    else:
        s = socket.create_connection(sock_addr)
        own = True
    try:
        s.sendall(encode_call(name, seqid, args))
        # the reply is self-delimiting: buffer socket chunks until it
        # decodes cleanly (EOFError = still truncated)
        buf = b""
        while True:
            chunk = s.recv(65536)
            if not chunk:
                return decode_reply(name, buf)
            buf += chunk
            try:
                return decode_reply(name, buf)
            except (EOFError, IndexError, struct.error):
                continue
    finally:
        if own:
            s.close()
