"""Avro binary wire tests — zigzag/datum golden vectors, codec
roundtrips for the genavro records, and framed-call dispatcher e2e
against AvroServer."""

import pytest

from hbase_snapshot_spark import avro_wire as aw
from hbase_snapshot_spark.avro_api import (
    AvroServer,
    AColumnValue,
    AFamilyDescriptor,
    AGet,
    APut,
    ATableDescriptor,
)
from hbase_snapshot_spark.table import TableStore


# ------------------------------------------------------- golden vectors


def test_zigzag_golden():
    buf = bytearray()
    aw.write_long(buf, 0)
    aw.write_long(buf, -1)
    aw.write_long(buf, 1)
    aw.write_long(buf, -64)
    aw.write_long(buf, 64)
    # avro spec examples: 0→00, -1→01, 1→02, -64→7f, 64→80 01
    assert bytes(buf) == bytes.fromhex("00" "01" "02" "7f" "8001")


def test_record_golden_bytes():
    # AResultEntry{family=b"f", qualifier=b"q", value=b"v", ts=100}:
    # bytes = len+raw (01-prefixed zigzag lens), long 100 → zigzag 200
    buf = bytearray()
    aw.encode_datum(buf, aw.ARESULTENTRY, {
        "family": b"f", "qualifier": b"q", "value": b"v", "timestamp": 100,
    })
    assert bytes(buf) == bytes.fromhex("02" "66" "02" "71" "02" "76" "c801")


def test_union_and_array_golden():
    # AColumn{family=b"f", qualifier=None}: bytes "f", union branch 1
    # (null) → 02 66 02
    buf = bytearray()
    aw.encode_datum(buf, aw.ACOLUMN, {"family": b"f", "qualifier": None})
    assert bytes(buf) == bytes.fromhex("02" "66" "02")
    # array of two longs [3, 4]: count 2, items, end 0
    buf = bytearray()
    aw.encode_datum(buf, ("array", ("long",)), [3, 4])
    assert bytes(buf) == bytes.fromhex("04" "06" "08" "00")


# ---------------------------------------------------------- roundtrips


def test_datum_roundtrips():
    cases = [
        (aw.AGET, {"row": b"r1", "columns": [{"family": b"f",
                                              "qualifier": b"q"}],
                   "timestamp": None,
                   "timerange": {"minStamp": 1, "maxStamp": 5},
                   "maxVersions": 3}),
        (aw.ASCAN, {"startRow": b"a", "stopRow": None, "columns": None,
                    "timestamp": -7, "timerange": None, "maxVersions": None}),
        (aw.ATABLEDESCRIPTOR, {
            "name": b"t", "families": [
                {"name": b"f", "compression": "NONE", "maxVersions": 3,
                 "blocksize": None, "inMemory": False, "timeToLive": 777,
                 "blockCacheEnabled": None}],
            "maxFileSize": 1 << 40, "memStoreFlushSize": None,
            "rootRegion": None, "metaRegion": None, "metaTable": None,
            "readOnly": False, "deferredLogFlush": None}),
    ]
    for spec, v in cases:
        buf = bytearray()
        aw.encode_datum(buf, spec, v)
        got, pos = aw.decode_datum(bytes(buf), 0, spec)
        assert pos == len(buf)
        assert got == v


# ------------------------------------------------------ dispatcher e2e


@pytest.fixture()
def disp(spark, tmp_path):
    store = TableStore(spark, str(tmp_path / "tables"))
    server = AvroServer(store)
    server.createTable(ATableDescriptor(
        name="t", families=[AFamilyDescriptor(name="f", maxVersions=3)]))
    server.put("t", APut(row="r1", columnValues=[
        AColumnValue(family="f", qualifier="q", value="v1", timestamp=100)]))
    return aw.AvroBinaryDispatcher(server)


def _call(disp, name, **params):
    return aw.decode_response(name, disp.handle(aw.encode_call(name, params)))


def test_wire_get_put_roundtrip(disp):
    res = _call(disp, "get", table=b"t", get={
        "row": b"r1", "columns": None, "timestamp": None,
        "timerange": None, "maxVersions": None})
    assert res["row"] == b"r1"
    assert res["entries"] == [{"family": b"f", "qualifier": b"q",
                               "value": b"v1", "timestamp": 100}]

    assert _call(disp, "put", table=b"t", put={
        "row": b"r2", "columnValues": [
            {"family": b"f", "qualifier": b"q", "value": b"v2",
             "timestamp": 200}]}) is None
    assert _call(disp, "exists", table=b"t", get={
        "row": b"r2", "columns": None, "timestamp": None,
        "timerange": None, "maxVersions": None}) is True


def test_wire_scanner(disp):
    sid = _call(disp, "scannerOpen", table=b"t", scan={
        "startRow": None, "stopRow": None, "columns": None,
        "timestamp": None, "timerange": None, "maxVersions": None})
    rows = _call(disp, "scannerGetRows", scannerId=sid, numberOfRows=10)
    assert [r["row"] for r in rows] == [b"r1"]
    assert _call(disp, "scannerClose", scannerId=sid) is None


def test_wire_admin_and_errors(disp):
    tables = _call(disp, "listTables")
    assert [t["name"] for t in tables] == [b"t"]
    desc = _call(disp, "describeTable", table=b"t")
    assert desc["families"][0]["maxVersions"] == 3
    assert _call(disp, "isTableEnabled", table=b"t") is True
    assert _call(disp, "getClusterStatus")["regionsCount"] == 1
    v = _call(disp, "incrementColumnValue", table=b"t", row=b"c",
              family=b"f", qualifier=b"n", amount=5, writeToWAL=True)
    assert v == 5

    from hbase_snapshot_spark.avro_api import AIOError, ATableExists
    with pytest.raises(AIOError, match="nope"):
        _call(disp, "describeTable", table=b"nope")
    dup_table = {
        "name": b"t", "families": None, "maxFileSize": None,
        "memStoreFlushSize": None, "rootRegion": None,
        "metaRegion": None, "metaTable": None, "readOnly": None,
        "deferredLogFlush": None}
    with pytest.raises(ATableExists):
        _call(disp, "createTable", table=dup_table)
    # pin the 4-branch error union of hbase.genavro:247 (string,
    # AIOError, AIllegalArgument, ATableExists, AMasterNotRunning):
    # ATableExists is union index 3 → zigzag varint 0x06 after the
    # error flag byte
    resp = disp.handle(aw.encode_call("createTable", {"table": dup_table}))
    meta_end = aw._read_meta(resp, 0)
    assert resp[meta_end] == 1 and resp[meta_end + 1] == 0x06
    with pytest.raises(RuntimeError, match="unknown message"):
        aw.decode_response("get", disp.handle(
            aw.encode_call("get", {"table": b"t", "get": {
                "row": b"r", "columns": None, "timestamp": None,
                "timerange": None, "maxVersions": None}}).replace(
                b"\x06get", b"\x06zzz", 1)))


def test_http_transport(spark, tmp_path):
    import urllib.request

    store = TableStore(spark, str(tmp_path / "tables-http"))
    server = AvroServer(store)
    server.createTable(ATableDescriptor(
        name="t", families=[AFamilyDescriptor(name="f")]))
    server.put("t", APut(row="r1", columnValues=[
        AColumnValue(family="f", qualifier="q", value="v1", timestamp=100)]))
    srv, port = aw.serve_avro(store)

    def post(data):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/", method="POST", data=data,
            headers={"Content-Type": "avro/binary"},
        )
        with urllib.request.urlopen(req) as resp:
            return resp.read()

    get_params = {"table": b"t", "get": {
        "row": b"r1", "columns": None, "timestamp": None,
        "timerange": None, "maxVersions": None}}
    try:
        # warm path: client speaks this protocol and knows the server
        # hash → match=BOTH, no protocol text echoed
        hs, res = aw.decode_http_response(
            "get", post(aw.encode_http_request("get", get_params)))
        assert hs["match"] == "BOTH" and hs["serverProtocol"] is None
        assert res["entries"][0]["value"] == b"v1"

        # cold stock-client path (Avro spec "Handshake"): unknown
        # client hash, no protocol text → match=NONE, no result, the
        # server supplies its protocol text + hash
        hs, res = aw.decode_http_response("get", post(
            aw.encode_http_request(
                "get", get_params,
                client_hash=b"\x00" * 16, server_hash=b"\x00" * 16)))
        assert hs["match"] == "NONE" and res is None
        assert hs["serverProtocol"] == aw.PROTOCOL_JSON
        assert hs["serverHash"] == aw.SERVER_HASH

        # re-submit WITH the client protocol text (a structurally
        # equal protocol whose text hashes differently) but still a
        # STALE server hash → CLIENT (call runs, server protocol
        # echoed so the client can refresh), and the hash is cached
        client_proto = aw.PROTOCOL_JSON + " "
        client_hash = __import__("hashlib").md5(
            client_proto.encode()).digest()
        hs, res = aw.decode_http_response("get", post(
            aw.encode_http_request(
                "get", get_params, client_hash=client_hash,
                client_protocol=client_proto,
                server_hash=b"\x00" * 16)))
        assert hs["match"] == "CLIENT"
        assert hs["serverHash"] == aw.SERVER_HASH
        assert res["entries"][0]["value"] == b"v1"

        # ...so the NEXT request can go hash-only → BOTH
        hs, res = aw.decode_http_response("get", post(
            aw.encode_http_request(
                "get", get_params, client_hash=client_hash,
                server_hash=aw.SERVER_HASH)))
        assert hs["match"] == "BOTH"
        assert res["entries"][0]["value"] == b"v1"

        # malformed/truncated handshake → HTTP 400, not a dropped
        # connection (ADVICE r6)
        import urllib.error
        for junk in (b"", b"\xff", b"\x01\x02\x03garbage"):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/", method="POST", data=junk,
                headers={"Content-Type": "avro/binary"},
            )
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(req)
            assert ei.value.code == 400
        # and the server still answers a good request afterwards
        hs, res = aw.decode_http_response(
            "get", post(aw.encode_http_request("get", get_params)))
        assert res["entries"][0]["value"] == b"v1"
    finally:
        srv.shutdown()


def test_protocol_json_shape():
    """The emitted protocol text is valid JSON naming every message and
    the genavro record/error types, and its hash is stable."""
    import json

    p = json.loads(aw.PROTOCOL_JSON)
    assert p["protocol"] == "HBase"
    assert p["namespace"] == "org.apache.hadoop.hbase.avro.generated"
    assert set(p["messages"]) == set(aw.METHODS)
    type_names = {t["name"] for t in p["types"]}
    assert {"AResult", "AGet", "APut", "ADelete", "AScan",
            "ATableDescriptor", "AFamilyDescriptor", "AClusterStatus",
            "AServerInfo", "ACompressionAlgorithm", "AIOError",
            "AIllegalArgument", "ATableExists",
            "AMasterNotRunning"} <= type_names
    # createTable declares the full error set (hbase.genavro:247)
    assert p["messages"]["createTable"]["errors"] == [
        "AIOError", "AIllegalArgument", "ATableExists", "AMasterNotRunning"]
    assert aw.SERVER_HASH == __import__("hashlib").md5(
        aw.PROTOCOL_JSON.encode()).digest()
    assert aw.protocol_json() == aw.PROTOCOL_JSON  # deterministic


def test_handshake_map_fixed_codec_roundtrip():
    """fixed(16) and map<bytes> datum round-trips (handshake schema)."""
    buf = bytearray()
    aw.encode_datum(buf, aw.HANDSHAKE_REQUEST, {
        "clientHash": b"\x01" * 16,
        "clientProtocol": "proto-text",
        "serverHash": b"\x02" * 16,
        "meta": {"k1": b"v1", "k2": b"v2"},
    })
    out, pos = aw.decode_datum(bytes(buf), 0, aw.HANDSHAKE_REQUEST)
    assert pos == len(buf)
    assert out["clientHash"] == b"\x01" * 16
    assert out["clientProtocol"] == "proto-text"
    assert out["serverHash"] == b"\x02" * 16
    assert out["meta"] == {"k1": b"v1", "k2": b"v2"}


def test_unknown_family_framed_as_aioerror(spark, tmp_path):
    """an undeclared-family put must come back as a FRAMED AIOError
    (the declared branch), never kill the transport."""
    store = TableStore(spark, str(tmp_path / "tables-badfam"))
    server = AvroServer(store)
    server.createTable(ATableDescriptor(
        name="t", families=[AFamilyDescriptor(name="f")]))
    from hbase_snapshot_spark.avro_api import AIOError

    disp = aw.AvroBinaryDispatcher(server)
    req = aw.encode_call("put", {"table": b"t", "put": {
        "row": b"r1", "columnValues": [{
            "family": b"nosuch", "qualifier": b"q", "value": b"v",
            "timestamp": None}]}})
    with pytest.raises(AIOError):
        aw.decode_response("put", disp.handle(req))
