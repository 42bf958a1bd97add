"""REST front-end tests — mirrors rest/TestScannersWithFilters-style
coverage at the HTTP boundary."""

import json
import urllib.request

import pytest

from hbase_snapshot_spark.model import FamilyDescriptor, TableDescriptor
from hbase_snapshot_spark.rest import serve
from hbase_snapshot_spark.table import TableStore


@pytest.fixture(scope="module")
def rest(spark, tmp_path_factory):
    store = TableStore(spark, str(tmp_path_factory.mktemp("rest") / "tables"))
    store.create_table(TableDescriptor("t").add_family(FamilyDescriptor("f")))
    srv, port = serve(store)
    yield f"http://127.0.0.1:{port}"
    srv.shutdown()


def _req(url, method="GET", data=None):
    req = urllib.request.Request(url, method=method, data=data)
    try:
        with urllib.request.urlopen(req) as resp:
            raw = resp.read()
            return resp.status, json.loads(raw) if raw else None
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_rest_crud_roundtrip(rest):
    code, body = _req(f"{rest}/t/r1/f:name?ts=100", "PUT", b"alice")
    assert code == 200 and body["committed_version"] >= 1
    _req(f"{rest}/t/r1/f:city?ts=100", "PUT", b"oslo")

    code, body = _req(f"{rest}/t/r1")
    assert code == 200
    got = {(c["qualifier"], c["value"]) for c in body["cells"]}
    assert got == {("name", "alice"), ("city", "oslo")}

    code, body = _req(f"{rest}/t/r1/f:name")
    assert [c["value"] for c in body["cells"]] == ["alice"]

    code, body = _req(f"{rest}/t/r1/f:name?ts=200", "PUT", b"alice2")
    code, body = _req(f"{rest}/t/r1/f:name?v=2")
    assert [c["value"] for c in body["cells"]] == ["alice2", "alice"]

    code, body = _req(f"{rest}/t/r1/f:name?ts=250", "DELETE")
    assert code == 200
    code, body = _req(f"{rest}/t/r1/f:name")
    assert code == 404

    code, body = _req(f"{rest}/t/scanner?start=r0&stop=r9")
    assert code == 200
    assert {c["qualifier"] for c in body["cells"]} == {"city"}


def test_rest_list_tables(rest):
    code, body = _req(f"{rest}/")
    assert code == 200 and body["tables"] == ["t"]


def test_rest_errors(rest):
    code, body = _req(f"{rest}/nope/r1")
    assert code == 400
    code, body = _req(f"{rest}/t/doesnotexist")
    assert code == 404


def test_rest_scanner_prefix(rest):
    _req(f"{rest}/t/ax1/f:q?ts=10", "PUT", b"1")
    _req(f"{rest}/t/ax2/f:q?ts=10", "PUT", b"2")
    _req(f"{rest}/t/bz1/f:q?ts=10", "PUT", b"3")
    code, body = _req(f"{rest}/t/scanner?prefix=ax")
    assert code == 200
    assert {c["row"] for c in body["cells"]} == {"ax1", "ax2"}


def test_rest_stateful_scanner(rest):
    # ScannerResource.java semantics: POST opens an id'd cursor, GET
    # pages it, 204 when exhausted, DELETE closes
    for i in range(5):
        _req(f"{rest}/t/sc{i}/f:q?ts=10", "PUT", str(i).encode())
    code, body = _req(f"{rest}/t/scanner?prefix=sc", "POST")
    assert code == 201
    sid = body["scanner_id"]
    got = []
    while True:
        code, body = _req(f"{rest}/t/scanner/{sid}?n=2")
        if code == 204:
            break
        got.extend(c["row"] for c in body["cells"])
    assert got == [f"sc{i}" for i in range(5)]
    code, _ = _req(f"{rest}/t/scanner/{sid}", "DELETE")
    assert code == 200
    code, _ = _req(f"{rest}/t/scanner/{sid}?n=2")
    assert code == 404


def test_rest_scan_truncation_flag(rest):
    # hitting the limit sets truncated + a next_start cursor (rows are
    # never split across pages), so incomplete data never looks complete
    for i in range(12):
        _req(f"{rest}/t/tr{i:02d}/f:q?ts=10", "PUT", b"x")
    code, body = _req(f"{rest}/t/scanner?prefix=tr&limit=5")
    assert code == 200 and body["truncated"] is True
    assert body["next_start"] == "tr05"
    assert len(body["cells"]) == 5
    code, body = _req(f"{rest}/t/scanner?start=tr05&limit=100")
    assert body["truncated"] is False
    assert {c["row"] for c in body["cells"]} >= {f"tr{i:02d}" for i in range(5, 12)}


def test_rest_binary_table_base64(spark, tmp_path_factory):
    import base64

    from hbase_snapshot_spark.model import FamilyDescriptor, TableDescriptor

    store = TableStore(spark, str(tmp_path_factory.mktemp("restb") / "tables"))
    store.create_table(
        TableDescriptor("b").add_family(FamilyDescriptor("f")), binary=True
    )
    srv, port = serve(store)
    try:
        url = f"http://127.0.0.1:{port}"
        payload = b"\x00\xff\x10binary"
        code, _ = _req(f"{url}/b/r1/f:q?ts=10", "PUT", payload)
        assert code == 200
        code, body = _req(f"{url}/b/r1/f:q")
        assert code == 200
        cell = body["cells"][0]
        assert base64.b64decode(cell["value"]) == payload
        assert base64.b64decode(cell["row"]) == b"r1"
        code, _ = _req(f"{url}/b/r1/f:q?ts=20", "DELETE")
        assert code == 200
        code, _ = _req(f"{url}/b/r1/f:q")
        assert code == 404
    finally:
        srv.shutdown()


def test_rest_scanner_time_range(rest):
    # RowSpec URL model: [ts_min, ts_max) bounds the scan
    _req(f"{rest}/t/tsr/f:q?ts=100", "PUT", b"old")
    _req(f"{rest}/t/tsr/f:q?ts=200", "PUT", b"new")
    code, body = _req(f"{rest}/t/scanner?start=tsr&stop=tsrz&ts_min=150&ts_max=250&v=99")
    assert code == 200
    assert [(c["ts"], c["value"]) for c in body["cells"]] == [(200, "new")]
    code, body = _req(f"{rest}/t/scanner?start=tsr&stop=tsrz&ts_max=150&v=99")
    assert [(c["ts"], c["value"]) for c in body["cells"]] == [(100, "old")]


def test_rest_scanner_filters(rest):
    # rest/TestScannersWithFilters.java-style coverage: filter params
    # AND-compose on the scanner URL
    for i, val in [(0, "apple pie"), (1, "apple tart"), (2, "plum pie")]:
        _req(f"{rest}/t/fl{i}/f:name?ts=10", "PUT", val.encode())
    code, body = _req(f"{rest}/t/scanner?prefix=fl&valuesubstr=apple")
    assert code == 200
    assert {c["row"] for c in body["cells"]} == {"fl0", "fl1"}
    code, body = _req(f"{rest}/t/scanner?rowregex=^fl[02]$&valuesubstr=pie")
    assert {c["row"] for c in body["cells"]} == {"fl0", "fl2"}
    code, body = _req(f"{rest}/t/scanner?prefix=fl&colprefix=na")
    assert {c["qualifier"] for c in body["cells"]} == {"name"}


def test_rest_binary_scanner_base64_range(spark, tmp_path_factory):
    # binary tables: scanner start/stop are base64 (same encoding as the
    # truncation next_start cursor, so a cursor round-trips); string
    # filter params are rejected
    import base64

    from hbase_snapshot_spark.model import FamilyDescriptor, TableDescriptor

    store = TableStore(spark, str(tmp_path_factory.mktemp("restbs") / "tables"))
    t = store.create_table(
        TableDescriptor("b").add_family(FamilyDescriptor("f")), binary=True
    )
    srv, port = serve(store)
    try:
        url = f"http://127.0.0.1:{port}"
        from hbase_snapshot_spark.table import Put

        t.mutate([Put(b"r%d" % i).add("f", b"q", b"v%d" % i, ts=10)
                  for i in range(6)])
        b64 = lambda b: base64.b64encode(b).decode()  # noqa: E731
        code, body = _req(
            f"{url}/b/scanner?start={b64(b'r1')}&stop={b64(b'r4')}"
        )
        assert code == 200
        rows = [base64.b64decode(c["row"]) for c in body["cells"]]
        assert rows == [b"r1", b"r2", b"r3"]
        # truncation cursor round-trips through the same base64 contract
        code, body = _req(f"{url}/b/scanner?limit=2")
        assert body["truncated"] is True
        code, body2 = _req(f"{url}/b/scanner?start={body['next_start']}&limit=100")
        assert base64.b64decode(body2["cells"][0]["row"]) == b"r2"
        # string filters rejected
        code, _ = _req(f"{url}/b/scanner?prefix=r")
        assert code == 400
    finally:
        srv.shutdown()


def test_rest_scanner_lease_expiry(spark, tmp_path_factory):
    """ScannerResource + Leases.java:281: an idle stateful scanner
    expires after the lease period → 404 on the next page, and the
    server registry drops the cursor.  Clock-injected — zero sleeps."""
    from tests.test_thrift import FakeClock

    clock = FakeClock()
    store = TableStore(spark, str(tmp_path_factory.mktemp("restl") / "tables"))
    t = store.create_table(TableDescriptor("t").add_family(FamilyDescriptor("f")))
    from hbase_snapshot_spark.table import Put

    t.mutate([Put(f"r{i}").add("f", "q", str(i)) for i in range(4)], now=100)
    srv, port = serve(store, lease_seconds=60.0, now_fn=clock)
    url = f"http://127.0.0.1:{port}"
    try:
        code, body = _req(f"{url}/t/scanner?start=r0", "POST")
        assert code == 201
        sid = body["scanner_id"]
        code, body = _req(f"{url}/t/scanner/{sid}?n=1")
        assert code == 200 and len(body["cells"]) == 1
        clock.advance(61.0)
        code, body = _req(f"{url}/t/scanner/{sid}?n=1")
        assert code == 404
        # an expired scanner cannot be DELETEd either (already reclaimed)
        code, _ = _req(f"{url}/t/scanner/{sid}", "DELETE")
        assert code == 404
    finally:
        srv.shutdown()


# ------------------------------- rest/TestRowResource.java port


def test_rest_no_such_cf(rest):
    """testNoSuchCF:315 — POST a value to a good family path (POST on a
    row == PUT, RowResource.update), then: GET good family 200, GET an
    undeclared family 404 (RowResultGenerator catches
    NoSuchColumnFamilyException → empty → 404), good path still 200."""
    code, _ = _req(f"{rest}/t/cfrow/f:q?ts=10", "POST", b"testvalue1")
    assert code == 200
    code, _ = _req(f"{rest}/t/cfrow/f")
    assert code == 200
    code, body = _req(f"{rest}/t/cfrow/BAD")
    assert code == 404
    code, _ = _req(f"{rest}/t/cfrow/f")
    assert code == 200


def test_rest_bare_family_gets_whole_family(rest):
    """RowResultGenerator:54-58 — a path column with no qualifier (or a
    trailing colon) addresses the WHOLE family."""
    _req(f"{rest}/t/famrow/f:a?ts=10", "PUT", b"va")
    _req(f"{rest}/t/famrow/f:b?ts=10", "PUT", b"vb")
    code, body = _req(f"{rest}/t/famrow/f")
    assert code == 200
    assert {c["qualifier"] for c in body["cells"]} == {"a", "b"}
    code, body = _req(f"{rest}/t/famrow/f:")
    assert code == 200
    assert {c["qualifier"] for c in body["cells"]} == {"a", "b"}
