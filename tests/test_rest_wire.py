"""REST wire-format tests — protobuf GOLDEN VECTORS (hand-computed
bytes proving byte-compatibility with the reference's .proto field
layout), codec roundtrips, XML shapes, and HTTP end-to-end content
negotiation through the running server."""

import base64
import json
import urllib.request
import xml.etree.ElementTree as ET

import pytest

from hbase_snapshot_spark import rest_wire as w
from hbase_snapshot_spark.model import FamilyDescriptor, TableDescriptor
from hbase_snapshot_spark.rest import serve
from hbase_snapshot_spark.table import Put, TableStore


# ------------------------------------------------------- golden vectors


def test_cell_set_golden_bytes():
    # CellSet{rows=[Row{key="r1", values=[Cell{column="f:q",
    # timestamp=1000, data="v"}]}]} — wire bytes computed by hand from
    # CellSetMessage.proto / CellMessage.proto field numbers
    rows = [(b"r1", [(b"f:q", 1000, b"v")])]
    expect = bytes.fromhex(
        "0a11"              # CellSet.rows (field 1, len 17)
        "0a027231"          # Row.key (field 1) = "r1"
        "120b"              # Row.values (field 2, len 11)
        "1203663a71"        # Cell.column (field 2) = "f:q"
        "18e807"            # Cell.timestamp (field 3) = 1000
        "220176"            # Cell.data (field 4) = "v"
    )
    assert w.encode_cell_set(rows) == expect
    assert w.decode_cell_set(expect) == rows


def test_table_list_golden_bytes():
    # TableList{name=["a","bc"]} — repeated field 1 strings
    expect = bytes.fromhex("0a0161" "0a026263")
    assert w.encode_table_list(["a", "bc"]) == expect
    assert w.decode_table_list(expect) == ["a", "bc"]


def test_scanner_golden_bytes():
    # Scanner{startRow="a", maxVersions=3} — fields 1 and 7
    expect = bytes.fromhex("0a0161" "3803")
    assert w.encode_scanner({"startRow": b"a", "maxVersions": 3}) == expect
    got = w.decode_scanner(expect)
    assert got["startRow"] == b"a" and got["maxVersions"] == 3


# ------------------------------------------------------------ roundtrips


def test_cell_set_roundtrip_multi():
    rows = [
        (b"row-a", [(b"f:q1", 10, b"v1"), (b"f:q2", -5, b"")]),
        (b"\x00\xffbin", [(b"g:", 1 << 50, b"\x01\x02\x03")]),
    ]
    assert w.decode_cell_set(w.encode_cell_set(rows)) == rows
    assert w.xml_to_cell_set(w.cell_set_to_xml(rows)) == rows


def test_cell_set_ts_presence():
    # optional Cell.timestamp: an explicit 0 and an absent field are
    # different wire states (RowResource honors ts=0; absent = server
    # assigns) — both codecs must preserve the distinction
    rows = [(b"r", [(b"f:a", 0, b"x"), (b"f:b", None, b"y")])]
    assert w.decode_cell_set(w.encode_cell_set(rows)) == rows
    assert w.xml_to_cell_set(w.cell_set_to_xml(rows)) == rows
    # absent field 3 really is absent on the wire (proto3-style varint 0
    # would be bytes 0x18 0x00)
    assert b"\x18" not in w.encode_cell_set(
        [(b"r", [(b"f:b", None, b"y")])])


def test_scanner_roundtrip_full():
    spec = {
        "startRow": b"a", "endRow": b"z",
        "columns": [b"f", b"g:q"],
        "batch": 100, "startTime": 5, "endTime": 1 << 40,
        "maxVersions": 7, "filter": "PrefixFilter",
    }
    assert w.decode_scanner(w.encode_scanner(spec)) == spec


def test_table_schema_roundtrip():
    schema = {
        "name": "t1",
        "attrs": {"READONLY": "false"},
        "columns": [
            {"name": "f", "attrs": {}, "ttl": 2147483647,
             "maxVersions": 3, "compression": "NONE"},
        ],
        "readOnly": False,
    }
    got = w.decode_table_schema(w.encode_table_schema(schema))
    assert got["name"] == "t1"
    assert got["attrs"] == {"READONLY": "false"}
    assert got["columns"][0]["maxVersions"] == 3
    assert got["columns"][0]["ttl"] == 2147483647
    assert got["readOnly"] is False


def test_version_roundtrip():
    info = {"restVersion": "0.0.3", "serverVersion": "pyspark/4.1.2"}
    assert w.decode_version(w.encode_version(info)) == info


def test_xml_table_list():
    doc = w.table_list_to_xml(["t1", "t2"])
    root = ET.fromstring(doc)
    assert root.tag == "TableList"
    assert w.xml_to_table_list(doc) == ["t1", "t2"]


# ----------------------------------------------------------- HTTP e2e


@pytest.fixture(scope="module")
def rest(spark, tmp_path_factory):
    store = TableStore(spark, str(tmp_path_factory.mktemp("restw") / "tables"))
    t = store.create_table(
        TableDescriptor("t").add_family(FamilyDescriptor("f"))
    )
    t.mutate([
        Put("r1").add("f", "a", "v1", ts=100).add("f", "b", "v2", ts=100),
        Put("r2").add("f", "a", "v3", ts=100),
    ])
    srv, port = serve(store)
    yield f"http://127.0.0.1:{port}"
    srv.shutdown()


def _req(url, method="GET", data=None, headers=None):
    req = urllib.request.Request(url, method=method, data=data,
                                 headers=headers or {})
    with urllib.request.urlopen(req) as resp:
        return resp.status, resp.read(), dict(resp.headers)


def test_http_get_protobuf(rest):
    code, body, hdrs = _req(
        f"{rest}/t/r1", headers={"Accept": "application/x-protobuf"}
    )
    assert code == 200
    assert hdrs["Content-Type"] == "application/x-protobuf"
    rows = w.decode_cell_set(body)
    assert rows == [(b"r1", [(b"f:a", 100, b"v1"), (b"f:b", 100, b"v2")])]


def test_http_get_xml(rest):
    code, body, hdrs = _req(f"{rest}/t/r1", headers={"Accept": "text/xml"})
    assert code == 200 and hdrs["Content-Type"] == "text/xml"
    rows = w.xml_to_cell_set(body)
    assert rows[0][0] == b"r1"
    assert (b"f:a", 100, b"v1") in rows[0][1]


def test_http_json_unchanged(rest):
    code, body, hdrs = _req(f"{rest}/t/r1")
    assert hdrs["Content-Type"] == "application/json"
    cells = json.loads(body)["cells"]
    assert {c["qualifier"] for c in cells} == {"a", "b"}


def test_http_table_list_formats(rest):
    _, body, _ = _req(f"{rest}/", headers={"Accept": "application/x-protobuf"})
    assert w.decode_table_list(body) == ["t"]
    _, body, _ = _req(f"{rest}/", headers={"Accept": "application/xml"})
    assert w.xml_to_table_list(body) == ["t"]


def test_http_version_and_schema(rest):
    _, body, _ = _req(f"{rest}/version",
                      headers={"Accept": "application/x-protobuf"})
    assert "pyspark" in w.decode_version(body)["serverVersion"]
    _, body, _ = _req(f"{rest}/t/schema",
                      headers={"Accept": "application/x-protobuf"})
    schema = w.decode_table_schema(body)
    assert schema["name"] == "t"
    assert schema["columns"][0]["name"] == "f"
    assert schema["columns"][0]["maxVersions"] == 3


def test_http_put_cellset_protobuf(rest):
    rows = [(b"r9", [(b"f:x", 500, b"pb-put")])]
    code, body, _ = _req(
        f"{rest}/t/r9", method="PUT", data=w.encode_cell_set(rows),
        headers={"Content-Type": "application/x-protobuf"},
    )
    assert code == 200
    _, body, _ = _req(f"{rest}/t/r9",
                      headers={"Accept": "application/x-protobuf"})
    assert w.decode_cell_set(body) == rows


def test_http_put_explicit_ts_zero(rest):
    # an explicit timestamp 0 in the PUT body is honored (RowResource
    # behavior), not reinterpreted as server-assigned "now"
    rows = [(b"r7", [(b"f:z", 0, b"at-zero")])]
    code, _, _ = _req(
        f"{rest}/t/r7", method="PUT", data=w.encode_cell_set(rows),
        headers={"Content-Type": "application/x-protobuf"},
    )
    assert code == 200
    _, body, _ = _req(f"{rest}/t/r7",
                      headers={"Accept": "application/x-protobuf"})
    assert w.decode_cell_set(body) == rows


def test_http_put_cellset_xml(rest):
    rows = [(b"r8", [(b"f:y", 600, b"xml-put")])]
    code, _, _ = _req(
        f"{rest}/t/r8", method="PUT", data=w.cell_set_to_xml(rows),
        headers={"Content-Type": "text/xml"},
    )
    assert code == 200
    _, body, _ = _req(f"{rest}/t/r8", headers={"Accept": "text/xml"})
    assert w.xml_to_cell_set(body) == rows


def test_http_scanner_protobuf_body(rest):
    spec = {"startRow": b"r1", "endRow": b"r2", "maxVersions": 1}
    code, body, hdrs = _req(
        f"{rest}/t/scanner", method="POST", data=w.encode_scanner(spec),
        headers={"Content-Type": "application/x-protobuf"},
    )
    assert code == 201
    sid = json.loads(body)["scanner_id"]
    assert hdrs["Location"].endswith(f"/scanner/{sid}")
    code, body, _ = _req(f"{rest}/t/scanner/{sid}?n=100",
                         headers={"Accept": "application/x-protobuf"})
    assert code == 200
    rows = w.decode_cell_set(body)
    assert [k for k, _ in rows] == [b"r1"]  # endRow exclusive
    # exhausted → 204
    req = urllib.request.Request(f"{rest}/t/scanner/{sid}?n=100")
    with urllib.request.urlopen(req) as resp:
        assert resp.status == 204
    _req(f"{rest}/t/scanner/{sid}", method="DELETE")


def test_http_scanner_xml_body_with_columns(rest):
    doc = (
        '<Scanner startRow="%s" maxVersions="1">'
        "<column>%s</column></Scanner>"
        % (base64.b64encode(b"r1").decode(),
           base64.b64encode(b"f:a").decode())
    ).encode()
    code, body, _ = _req(
        f"{rest}/t/scanner", method="POST", data=doc,
        headers={"Content-Type": "text/xml"},
    )
    assert code == 201
    sid = json.loads(body)["scanner_id"]
    code, body, _ = _req(f"{rest}/t/scanner/{sid}?n=100",
                         headers={"Accept": "application/x-protobuf"})
    rows = w.decode_cell_set(body)
    flat = [(k, c) for k, cells in rows for c in cells]
    assert all(c[0] == b"f:a" for _, c in flat)  # column projection held
    assert {k for k, _ in flat} == {b"r1", b"r2"}


def test_http_scanner_filter_string_pb(rest):
    # a reference REST client serializes filters as FilterModel JSON in
    # ScannerModel field 8 (ScannerModel.java buildFilter:319) — posting
    # one must scan like the equivalent structured-param scanner
    fjson = json.dumps({"type": "PrefixFilter",
                        "value": base64.b64encode(b"r1").decode()})
    code, body, _ = _req(
        f"{rest}/t/scanner", method="POST",
        data=w.encode_scanner({"filter": fjson, "maxVersions": 1}),
        headers={"Content-Type": "application/x-protobuf"},
    )
    assert code == 201
    sid = json.loads(body)["scanner_id"]
    _, body, _ = _req(f"{rest}/t/scanner/{sid}?n=100",
                      headers={"Accept": "application/x-protobuf"})
    rows = w.decode_cell_set(body)
    assert [k for k, _ in rows] == [b"r1"]
    _req(f"{rest}/t/scanner/{sid}", method="DELETE")
    # structured-param twin returns the same cells
    _, body2, _ = _req(f"{rest}/t/scanner?prefix=r1")
    assert len(rows[0][1]) == len(json.loads(body2)["cells"])


def test_http_scanner_filter_string_xml(rest):
    # FilterList JSON inside the <filter> element of the XML ScannerModel
    fjson = json.dumps({
        "type": "FilterList", "op": "MUST_PASS_ALL",
        "filters": [
            {"type": "ValueFilter", "op": "EQUAL",
             "comparator": {"type": "SubstringComparator", "value": "v1"}},
        ],
    })
    doc = f"<Scanner maxVersions=\"1\"><filter>{fjson.replace('<', '&lt;')}</filter></Scanner>".encode()
    code, body, _ = _req(
        f"{rest}/t/scanner", method="POST", data=doc,
        headers={"Content-Type": "text/xml"},
    )
    assert code == 201
    sid = json.loads(body)["scanner_id"]
    _, body, _ = _req(f"{rest}/t/scanner/{sid}?n=100",
                      headers={"Accept": "application/x-protobuf"})
    rows = w.decode_cell_set(body)
    assert rows == [(b"r1", [(b"f:a", 100, b"v1")])]
    _req(f"{rest}/t/scanner/{sid}", method="DELETE")


def test_filter_from_model_types():
    from hbase_snapshot_spark import filters as flt
    from hbase_snapshot_spark.rest import filter_from_model

    b64 = lambda b: base64.b64encode(b).decode()  # noqa: E731
    f = filter_from_model(json.dumps({
        "type": "SingleColumnValueFilter", "family": b64(b"f"),
        "qualifier": b64(b"q"), "op": "GREATER_OR_EQUAL",
        "comparator": {"type": "BinaryComparator", "value": b64(b"x")},
        "ifMissing": True,
    }))
    assert isinstance(f, flt.SingleColumnValueFilter)
    assert f.family == "f" and f.qualifier == "q"
    assert f.filter_if_missing is True
    # absent latestVersion keeps the reference constructor default (true)
    assert f.latest_version_only is True

    f = filter_from_model({"type": "SkipFilter", "filters": [
        {"type": "QualifierFilter", "op": "NOT_EQUAL",
         "comparator": {"type": "BinaryPrefixComparator",
                        "value": b64(b"a")}}]})
    assert isinstance(f, flt.SkipFilter)
    assert isinstance(f.inner, flt.QualifierFilter)

    f = filter_from_model({"type": "PageFilter", "value": "7"})
    assert isinstance(f, flt.PageFilter) and f.page_size == 7
    f = filter_from_model({"type": "InclusiveStopFilter",
                           "value": b64(b"zz")}, binary=True)
    assert isinstance(f, flt.InclusiveStopFilter) and f.stop_row == b"zz"
    f = filter_from_model({"type": "FirstKeyOnlyFilter"})
    assert isinstance(f, flt.FirstKeyOnlyFilter)
    f = filter_from_model({"type": "ColumnCountGetFilter", "limit": 2})
    assert isinstance(f, flt.ColumnCountGetFilter)

    with pytest.raises(ValueError, match="unhandled filter type"):
        filter_from_model({"type": "NopeFilter"})
