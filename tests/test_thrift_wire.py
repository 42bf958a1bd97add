"""Thrift TBinaryProtocol wire tests — hand-computed golden vectors
(proving byte-compatibility with the strict binary protocol + the
Hbase.thrift field ids), dispatcher round-trips, exception encoding,
and a TCP end-to-end over the threaded server."""

import pytest

from hbase_snapshot_spark import thrift_api as api
from hbase_snapshot_spark import thrift_wire as tw
from hbase_snapshot_spark.table import TableStore
from hbase_snapshot_spark.thrift_api import ColumnDescriptor, Mutation, ThriftServer


@pytest.fixture()
def store(spark, tmp_path):
    return TableStore(spark, str(tmp_path / "tables"))


@pytest.fixture()
def disp(store):
    h = ThriftServer(store)
    h.createTable("t", [ColumnDescriptor("f")])
    h.mutateRowTs("t", "r1", [Mutation(column="f:q", value="v1")], 100)
    return tw.ThriftBinaryDispatcher(h)


# ------------------------------------------------------- golden vectors


def test_encode_call_golden_bytes():
    # CALL isTableEnabled(tableName="t"), seqid=7 — strict protocol:
    # i32 0x80010001, str "isTableEnabled", i32 7, then the args struct
    # (field 1, STRING "t") and STOP
    got = tw.encode_call("isTableEnabled", 7, {"tableName": "t"})
    expect = (
        bytes.fromhex("80010001")
        + bytes.fromhex("0000000e") + b"isTableEnabled"
        + bytes.fromhex("00000007")
        + bytes.fromhex("0b" "0001" "00000001") + b"t"
        + bytes.fromhex("00")
    )
    assert got == expect


def test_reply_golden_bytes(disp):
    # REPLY isTableEnabled → success (field 0, BOOL true) + STOP
    resp = disp.handle(tw.encode_call("isTableEnabled", 7, {"tableName": "t"}))
    expect = (
        bytes.fromhex("80010002")
        + bytes.fromhex("0000000e") + b"isTableEnabled"
        + bytes.fromhex("00000007")
        + bytes.fromhex("02" "0000" "01")
        + bytes.fromhex("00")
    )
    assert resp == expect
    assert tw.decode_reply("isTableEnabled", resp) is True


# ------------------------------------------------------ dispatcher e2e


def test_get_and_mutate_roundtrip(disp):
    cells = tw.decode_reply(
        "get", disp.handle(tw.encode_call(
            "get", 1, {"tableName": "t", "row": "r1", "column": "f:q"}))
    )
    assert cells == [{"value": "v1", "timestamp": 100}]

    tw.decode_reply("mutateRowTs", disp.handle(tw.encode_call(
        "mutateRowTs", 2,
        {"tableName": "t", "row": "r2",
         "mutations": [{"column": "f:q", "value": "v2", "isDelete": False}],
         "timestamp": 200},
    )))
    rows = tw.decode_reply("getRow", disp.handle(tw.encode_call(
        "getRow", 3, {"tableName": "t", "row": "r2"})))
    assert rows == [{"row": "r2",
                     "columns": {"f:q": {"value": "v2", "timestamp": 200}}}]


def test_scanner_over_wire(disp):
    sid = tw.decode_reply("scannerOpen", disp.handle(tw.encode_call(
        "scannerOpen", 4, {"tableName": "t", "startRow": "", "columns": []})))
    rows = tw.decode_reply("scannerGetList", disp.handle(tw.encode_call(
        "scannerGetList", 5, {"id": sid, "nbRows": 10})))
    assert [r["row"] for r in rows] == ["r1"]
    tw.decode_reply("scannerClose", disp.handle(tw.encode_call(
        "scannerClose", 6, {"id": sid})))


def test_declared_exception_encoding(disp):
    resp = disp.handle(tw.encode_call("getRow", 9,
                                      {"tableName": "nope", "row": "r"}))
    with pytest.raises(Exception, match="nope"):
        tw.decode_reply("getRow", resp)


def test_illegal_argument_at_field_2(disp):
    # scannerGet on an unknown id throws IllegalArgument at field 2
    # (Hbase.thrift:660) — not IOError at field 1
    resp = disp.handle(tw.encode_call("scannerGet", 3, {"id": 999}))
    # field header after the REPLY envelope: STRUCT(0x0c) fid=2
    body = resp[4 + 4 + len(b"scannerGet") + 4:]
    assert body[:3] == bytes.fromhex("0c" "0002")
    with pytest.raises(api.IllegalArgument, match="not open"):
        tw.decode_reply("scannerGet", resp)


def test_already_exists_at_field_3(disp):
    # createTable on an existing table → AlreadyExists at field 3
    # (Hbase.thrift:227)
    resp = disp.handle(tw.encode_call(
        "createTable", 4,
        {"tableName": "t", "columnFamilies": [{"name": "f"}]}))
    body = resp[4 + 4 + len(b"createTable") + 4:]
    assert body[:3] == bytes.fromhex("0c" "0003")
    with pytest.raises(api.AlreadyExists):
        tw.decode_reply("createTable", resp)


def test_internal_error_is_application_exception(disp):
    # a handler fault outside the declared throws must come back as a
    # framed TApplicationException (type 6), not a dead connection —
    # mutateRow with the mutations list absent TypeErrors in the handler
    resp = disp.handle(tw.encode_call("mutateRow", 5,
                                      {"tableName": "t", "row": "r"}))
    assert resp[:4] == bytes.fromhex("80010003")  # EXCEPTION mtype
    with pytest.raises(RuntimeError, match="Internal error"):
        tw.decode_reply("mutateRow", resp)


def test_unknown_method_is_application_exception(disp):
    bad = tw.encode_call("isTableEnabled", 1, {"tableName": "t"}).replace(
        b"isTableEnabled", b"zzTableEnabled")
    resp = disp.handle(bad)
    with pytest.raises(RuntimeError, match="Invalid method name"):
        tw.decode_reply("isTableEnabled",
                        resp.replace(b"zzTableEnabled", b"isTableEnabled"))


def test_table_admin_over_wire(disp):
    names = tw.decode_reply("getTableNames",
                            disp.handle(tw.encode_call("getTableNames", 1, {})))
    assert names == ["t"]
    descs = tw.decode_reply("getColumnDescriptors", disp.handle(
        tw.encode_call("getColumnDescriptors", 2, {"tableName": "t"})))
    assert descs["f:"]["maxVersions"] == 3
    assert descs["f:"]["timeToLive"] > 0
    new = tw.decode_reply("createTable", disp.handle(tw.encode_call(
        "createTable", 3,
        {"tableName": "t2",
         "columnFamilies": [{"name": "g", "maxVersions": 5}]})))
    assert new is None
    inc = tw.decode_reply("atomicIncrement", disp.handle(tw.encode_call(
        "atomicIncrement", 4,
        {"tableName": "t2", "row": "c", "column": "g:n", "value": 7})))
    assert inc == 7


# ------------------------------------------------------------- TCP e2e


def test_tcp_server_roundtrip(store):
    h = ThriftServer(store)
    h.createTable("t", [ColumnDescriptor("f")])
    h.mutateRowTs("t", "r1", [Mutation(column="f:q", value="v1")], 100)
    srv, port = tw.serve_thrift(store)
    try:
        assert tw.client_call(("127.0.0.1", port), "getTableNames") == ["t"]
        cells = tw.client_call(
            ("127.0.0.1", port), "get",
            tableName="t", row="r1", column="f:q",
        )
        assert cells == [{"value": "v1", "timestamp": 100}]
        with pytest.raises(Exception, match="nope"):
            tw.client_call(("127.0.0.1", port), "getRow",
                           tableName="nope", row="r")
    finally:
        srv.shutdown()


def test_concurrent_scanner_paging(store):
    # two threads page ONE scanner id concurrently (the situation the
    # threaded TCP transport creates); every row must arrive exactly
    # once — RowCursor serializes the iterator + pushback slot
    import threading

    h = ThriftServer(store)
    h.createTable("t", [ColumnDescriptor("f")])
    for i in range(40):
        h.mutateRowTs("t", f"r{i:03d}",
                      [Mutation(column="f:q", value=f"v{i}")], 100)
    disp = tw.ThriftBinaryDispatcher(h)
    sid = tw.decode_reply("scannerOpen", disp.handle(tw.encode_call(
        "scannerOpen", 1, {"tableName": "t", "startRow": "", "columns": []})))

    got, errs = [], []

    def pager():
        try:
            while True:
                rows = tw.decode_reply("scannerGetList", disp.handle(
                    tw.encode_call("scannerGetList", 2,
                                   {"id": sid, "nbRows": 3})))
                if not rows:
                    return
                got.extend(r["row"] for r in rows)
        except Exception as ex:  # noqa: BLE001
            errs.append(ex)

    threads = [threading.Thread(target=pager) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    assert sorted(got) == [f"r{i:03d}" for i in range(40)]
    assert len(got) == len(set(got))
