"""Case-for-case port of rest/TestScannersWithFilters.java:968 — the
REST-level filter corpus: every scan goes through the HTTP boundary as
a ScannerModel XML body whose <filter> element carries the reference's
FilterModel JSON string, exercising rest.py's scanner resource,
filter_from_model, and the filter algebra together.

Mapping notes:
- the reference PUTs the ScannerModel; this server creates scanners on
  POST /<table>/scanner (same resource, Location header honored).
- verifyScan / verifyScanNoEarlyOut collapse to one helper (no paging
  shortcut difference at this layer); verifyScanFull asserts the exact
  (row, family, qualifier, value) sequence in KeyValue order like the
  reference.
- setUp():120-188's data build (two row groups x two families, the
  second-qualifier deletes, the second-row deletes) is reproduced
  verbatim with explicit timestamps.
"""

import base64
import json
import urllib.request

import pytest

from hbase_snapshot_spark.model import FamilyDescriptor, TableDescriptor
from hbase_snapshot_spark.rest import serve
from hbase_snapshot_spark.table import Delete, Put, TableStore

ROWS_ONE = [f"testRowOne-{i}" for i in range(4)]
ROWS_TWO = [f"testRowTwo-{i}" for i in range(4)]
FAMILIES = ["testFamilyOne", "testFamilyTwo"]
QUALS_ONE = [f"testQualifierOne-{i}" for i in range(4)]
QUALS_TWO = [f"testQualifierTwo-{i}" for i in range(4)]
VALUES = ["testValueOne", "testValueTwo"]

NUM_ROWS = 6       # 8 inserted - 2 fully deleted
COLS_PER_ROW = 6   # 2 families x 4 qualifiers - 2 deleted

# rows that survive setup, per group
LIVE_ONE = [ROWS_ONE[0], ROWS_ONE[2], ROWS_ONE[3]]
LIVE_TWO = [ROWS_TWO[0], ROWS_TWO[2], ROWS_TWO[3]]
LIVE_QUALS_ONE = [QUALS_ONE[0], QUALS_ONE[2], QUALS_ONE[3]]
LIVE_QUALS_TWO = [QUALS_TWO[0], QUALS_TWO[2], QUALS_TWO[3]]


@pytest.fixture(scope="module")
def rest(spark, tmp_path_factory):
    store = TableStore(spark, str(tmp_path_factory.mktemp("restf") / "tables"))
    t = store.create_table(
        TableDescriptor("testScannersWithFilters")
        .add_family(FamilyDescriptor(FAMILIES[0]))
        .add_family(FamilyDescriptor(FAMILIES[1]))
    )
    # Insert first half (:127-140)
    puts = [Put(r) for r in ROWS_ONE]
    for p in puts:
        for q in QUALS_ONE:
            p.add(FAMILIES[0], q, VALUES[0])
    puts2 = [Put(r) for r in ROWS_TWO]
    for p in puts2:
        for q in QUALS_TWO:
            p.add(FAMILIES[1], q, VALUES[1])
    t.mutate(puts + puts2, now=100)
    # Insert second half — reverse families (:142-156)
    puts = [Put(r) for r in ROWS_ONE]
    for p in puts:
        for q in QUALS_ONE:
            p.add(FAMILIES[1], q, VALUES[0])
    puts2 = [Put(r) for r in ROWS_TWO]
    for p in puts2:
        for q in QUALS_TWO:
            p.add(FAMILIES[0], q, VALUES[1])
    t.mutate(puts + puts2, now=200)
    # Delete the second qualifier from all rows and families (:158-170)
    dels = []
    for r in ROWS_ONE:
        dels.append(Delete(r).delete_columns(FAMILIES[0], QUALS_ONE[1])
                    .delete_columns(FAMILIES[1], QUALS_ONE[1]))
    for r in ROWS_TWO:
        dels.append(Delete(r).delete_columns(FAMILIES[0], QUALS_TWO[1])
                    .delete_columns(FAMILIES[1], QUALS_TWO[1]))
    t.mutate(dels, now=300)
    # Delete the second rows from both groups, one column at a time (:172-186)
    dels = []
    for q in QUALS_ONE:
        dels.append(Delete(ROWS_ONE[1]).delete_columns(FAMILIES[0], q)
                    .delete_columns(FAMILIES[1], q))
    for q in QUALS_TWO:
        dels.append(Delete(ROWS_TWO[1]).delete_columns(FAMILIES[0], q)
                    .delete_columns(FAMILIES[1], q))
    t.mutate(dels, now=400)

    srv, port = serve(store)
    yield f"http://127.0.0.1:{port}/testScannersWithFilters"
    srv.shutdown()


def _b64(s: str) -> str:
    return base64.b64encode(s.encode()).decode()


def _scan(rest, *, flt=None, start=None, stop=None, families=None):
    """ScannerModel round trip: POST the XML (filter as the FilterModel
    JSON string), page the scanner dry, DELETE it.  Returns the cell
    list in KeyValue order."""
    attrs = ""
    if start:
        attrs += f' startRow="{_b64(start)}"'
    if stop:
        attrs += f' endRow="{_b64(stop)}"'
    body = f"<Scanner{attrs}>"
    for fam in families or []:
        body += f"<column>{_b64(fam)}</column>"
    if flt is not None:
        body += f"<filter>{json.dumps(flt)}</filter>"
    body += "</Scanner>"

    req = urllib.request.Request(
        f"{rest}/scanner", method="POST", data=body.encode(),
        headers={"Content-Type": "text/xml"},
    )
    with urllib.request.urlopen(req) as resp:
        assert resp.status == 201
        location = resp.headers["Location"]
        sid = json.loads(resp.read())["scanner_id"]
    assert location.endswith(f"/scanner/{sid}")

    cells = []
    while True:
        with urllib.request.urlopen(f"{rest}/scanner/{sid}?n=1000") as resp:
            if resp.status == 204:  # exhausted (ScannerResource)
                break
            page = json.loads(resp.read())["cells"]
        if not page:
            break
        cells.extend(page)
    req = urllib.request.Request(f"{rest}/scanner/{sid}", method="DELETE")
    with urllib.request.urlopen(req) as resp:
        assert resp.status == 200
    return cells


def verify_scan(rest, expected_rows, expected_keys, **kw):
    """verifyScan:196 / verifyScanNoEarlyOut:282 — row count + per-row
    key count."""
    cells = _scan(rest, **kw)
    per_row = {}
    for c in cells:
        per_row.setdefault(c["row"], []).append(c)
    assert len(per_row) == expected_rows, sorted(per_row)
    for row, cs in per_row.items():
        assert len(cs) == expected_keys, (row, len(cs))


def verify_scan_full(rest, kvs, **kw):
    """verifyScanFull:231 — exact KeyValue sequence."""
    cells = _scan(rest, **kw)
    got = [(c["row"], c["family"], c["qualifier"], c["value"]) for c in cells]
    assert got == kvs


def _kvs(rows, quals, value, families=FAMILIES):
    """The expected-KV generator the reference writes out longhand:
    per row, families ascending, live qualifiers ascending."""
    return [
        (r, f, q, value) for r in rows for f in families for q in quals
    ]


def _comp(ctype, value, b64=True):
    return {"type": ctype, "value": _b64(value) if b64 else value}


def test_no_filter(rest):
    """doTestNoFilter:323."""
    verify_scan(rest, NUM_ROWS, COLS_PER_ROW)
    verify_scan(rest, NUM_ROWS, COLS_PER_ROW // 2, families=[FAMILIES[0]])


def test_prefix_filter(rest):
    """doTestPrefixFilter:339."""
    verify_scan(rest, NUM_ROWS // 2, COLS_PER_ROW,
                flt={"type": "PrefixFilter", "value": _b64("testRowOne")})


def test_page_filter(rest):
    """doTestPageFilter:348 — page sizes 6/4/2/1 with full-KV checks."""
    expected = (_kvs([ROWS_ONE[0]], LIVE_QUALS_ONE, VALUES[0])
                + _kvs([ROWS_ONE[2]], LIVE_QUALS_ONE, VALUES[0])
                + _kvs([ROWS_ONE[3]], LIVE_QUALS_ONE, VALUES[0])
                + _kvs([ROWS_TWO[0]], LIVE_QUALS_TWO, VALUES[1])
                + _kvs([ROWS_TWO[2]], LIVE_QUALS_TWO, VALUES[1])
                + _kvs([ROWS_TWO[3]], LIVE_QUALS_TWO, VALUES[1]))
    for n_rows in (6, 4, 2, 1):
        flt = {"type": "PageFilter", "value": n_rows}
        verify_scan(rest, n_rows, COLS_PER_ROW, flt=flt)
        verify_scan_full(rest, expected[: n_rows * 6], flt=flt)


def test_inclusive_stop_filter(rest):
    """doTestInclusiveStopFilter:430."""
    # start/stop row alone: stop exclusive → 2 of the 3 live group-one rows
    verify_scan(rest, NUM_ROWS // 2 - 1, COLS_PER_ROW,
                start="testRowOne-0", stop="testRowOne-3")
    verify_scan(rest, NUM_ROWS // 2, COLS_PER_ROW, start="testRowOne-0",
                flt={"type": "InclusiveStopFilter", "value": _b64("testRowOne-3")})
    verify_scan(rest, NUM_ROWS // 2 - 1, COLS_PER_ROW,
                start="testRowTwo-0", stop="testRowTwo-3")
    verify_scan(rest, NUM_ROWS // 2, COLS_PER_ROW, start="testRowTwo-0",
                flt={"type": "InclusiveStopFilter", "value": _b64("testRowTwo-3")})


def test_qualifier_filter(rest):
    """doTestQualifierFilter:463."""
    def qf(op, comp):
        return {"type": "QualifierFilter", "op": op, "comparator": comp}

    bc = _comp("BinaryComparator", "testQualifierOne-2")
    verify_scan(rest, NUM_ROWS // 2, 2, flt=qf("EQUAL", bc))
    verify_scan(rest, NUM_ROWS // 2, 2, flt=qf("LESS", bc))
    verify_scan(rest, NUM_ROWS // 2, 4, flt=qf("LESS_OR_EQUAL", bc))
    # remaining ops restricted to the first row group (:501-530)
    verify_scan(rest, NUM_ROWS // 2, 4, flt=qf("NOT_EQUAL", bc),
                stop="testRowTwo")
    verify_scan(rest, NUM_ROWS // 2, 4, flt=qf("GREATER_OR_EQUAL", bc),
                stop="testRowTwo")
    verify_scan(rest, NUM_ROWS // 2, 2, flt=qf("GREATER", bc),
                stop="testRowTwo")
    # NOT_EQUAL across all rows: group one loses qual -2, group two keeps all
    expected = []
    for r in LIVE_ONE:
        expected += _kvs([r], [QUALS_ONE[0], QUALS_ONE[3]], VALUES[0])
    for r in LIVE_TWO:
        expected += _kvs([r], LIVE_QUALS_TWO, VALUES[1])
    verify_scan_full(rest, expected, flt=qf("NOT_EQUAL", bc))
    # regex: filter out "test*-2" in both groups (:595-640)
    rc = _comp("RegexStringComparator", "test.+-2", b64=False)
    expected = []
    for r in LIVE_ONE:
        expected += _kvs([r], [QUALS_ONE[0], QUALS_ONE[3]], VALUES[0])
    for r in LIVE_TWO:
        expected += _kvs([r], [QUALS_TWO[0], QUALS_TWO[3]], VALUES[1])
    verify_scan_full(rest, expected, flt=qf("NOT_EQUAL", rc))


def test_row_filter(rest):
    """doTestRowFilter:643."""
    def rf(op, comp):
        return {"type": "RowFilter", "op": op, "comparator": comp}

    bc = _comp("BinaryComparator", "testRowOne-2")
    verify_scan(rest, 1, COLS_PER_ROW, flt=rf("EQUAL", bc))
    verify_scan(rest, 2, COLS_PER_ROW,
                flt=rf("EQUAL", _comp("RegexStringComparator", "testRow.+-2",
                                      b64=False)))
    verify_scan(rest, 1, COLS_PER_ROW, flt=rf("LESS", bc))
    verify_scan(rest, 2, COLS_PER_ROW, flt=rf("LESS_OR_EQUAL", bc))
    verify_scan(rest, NUM_ROWS - 1, COLS_PER_ROW, flt=rf("NOT_EQUAL", bc))
    verify_scan(rest, NUM_ROWS - 1, COLS_PER_ROW, flt=rf("GREATER_OR_EQUAL", bc))
    verify_scan(rest, NUM_ROWS - 2, COLS_PER_ROW, flt=rf("GREATER", bc))
    # full-KV: all rows but testRowOne-2 (:715-760)
    expected = []
    for r in [ROWS_ONE[0], ROWS_ONE[3]]:
        expected += _kvs([r], LIVE_QUALS_ONE, VALUES[0])
    for r in LIVE_TWO:
        expected += _kvs([r], LIVE_QUALS_TWO, VALUES[1])
    verify_scan_full(rest, expected, flt=rf("NOT_EQUAL", bc))
    # regex EQUAL ".+-2": exactly the two -2 rows (:737-760)
    expected = (_kvs([ROWS_ONE[2]], LIVE_QUALS_ONE, VALUES[0])
                + _kvs([ROWS_TWO[2]], LIVE_QUALS_TWO, VALUES[1]))
    verify_scan_full(rest, expected,
                     flt=rf("EQUAL", _comp("RegexStringComparator", ".+-2",
                                           b64=False)))


def test_value_filter(rest):
    """doTestValueFilter:762."""
    def vf(op, comp):
        return {"type": "ValueFilter", "op": op, "comparator": comp}

    one = _comp("BinaryComparator", "testValueOne")
    two = _comp("BinaryComparator", "testValueTwo")
    verify_scan(rest, NUM_ROWS // 2, COLS_PER_ROW, flt=vf("EQUAL", one))
    verify_scan(rest, NUM_ROWS // 2, COLS_PER_ROW, flt=vf("EQUAL", two))
    verify_scan(rest, NUM_ROWS, COLS_PER_ROW,
                flt=vf("EQUAL", _comp("RegexStringComparator",
                                      "testValue((One)|(Two))", b64=False)))
    verify_scan(rest, NUM_ROWS // 2, COLS_PER_ROW, flt=vf("LESS", two))
    verify_scan(rest, NUM_ROWS, COLS_PER_ROW, flt=vf("LESS_OR_EQUAL", two))
    verify_scan(rest, NUM_ROWS // 2, COLS_PER_ROW, flt=vf("LESS_OR_EQUAL", one))
    verify_scan(rest, NUM_ROWS // 2, COLS_PER_ROW, flt=vf("NOT_EQUAL", one))
    verify_scan(rest, NUM_ROWS, COLS_PER_ROW, flt=vf("GREATER_OR_EQUAL", one))
    verify_scan(rest, NUM_ROWS // 2, COLS_PER_ROW, flt=vf("GREATER", one))
    # full-KV: NOT_EQUAL testValueOne → all group-two keys (:846-880)
    expected = []
    for r in LIVE_TWO:
        expected += _kvs([r], LIVE_QUALS_TWO, VALUES[1])
    verify_scan_full(rest, expected, flt=vf("NOT_EQUAL", one))


def test_skip_filter(rest):
    """doTestSkipFilter:884 — skip rows containing any qualifier equal
    to testQualifierOne-2 → only group-two rows survive."""
    flt = {"type": "SkipFilter", "filters": [{
        "type": "QualifierFilter", "op": "NOT_EQUAL",
        "comparator": _comp("BinaryComparator", "testQualifierOne-2"),
    }]}
    expected = []
    for r in LIVE_TWO:
        expected += _kvs([r], LIVE_QUALS_TWO, VALUES[1])
    verify_scan_full(rest, expected, flt=flt)


def test_filter_list(rest):
    """doTestFilterList:921."""
    flt = {"type": "FilterList", "op": "MUST_PASS_ALL", "filters": [
        {"type": "RowFilter", "op": "EQUAL",
         "comparator": _comp("RegexStringComparator", ".+-2", b64=False)},
        {"type": "QualifierFilter", "op": "EQUAL",
         "comparator": _comp("RegexStringComparator", ".+-2", b64=False)},
        {"type": "ValueFilter", "op": "EQUAL",
         "comparator": _comp("SubstringComparator", "One", b64=False)},
    ]}
    verify_scan_full(
        rest, [(ROWS_ONE[2], FAMILIES[0], QUALS_ONE[2], VALUES[0])],
        flt=flt, families=[FAMILIES[0]],
    )
    flt = {"type": "FilterList", "op": "MUST_PASS_ONE", "filters": [
        {"type": "RowFilter", "op": "EQUAL",
         "comparator": _comp("RegexStringComparator", ".+Two.+", b64=False)},
        {"type": "QualifierFilter", "op": "EQUAL",
         "comparator": _comp("RegexStringComparator", ".+-2", b64=False)},
        {"type": "ValueFilter", "op": "EQUAL",
         "comparator": _comp("SubstringComparator", "One", b64=False)},
    ]}
    verify_scan(rest, NUM_ROWS, COLS_PER_ROW, flt=flt)


def test_first_key_only_filter(rest):
    """doTestFirstKeyOnlyFilter:946."""
    expected = [
        (ROWS_ONE[0], FAMILIES[0], QUALS_ONE[0], VALUES[0]),
        (ROWS_ONE[2], FAMILIES[0], QUALS_ONE[0], VALUES[0]),
        (ROWS_ONE[3], FAMILIES[0], QUALS_ONE[0], VALUES[0]),
        (ROWS_TWO[0], FAMILIES[0], QUALS_TWO[0], VALUES[1]),
        (ROWS_TWO[2], FAMILIES[0], QUALS_TWO[0], VALUES[1]),
        (ROWS_TWO[3], FAMILIES[0], QUALS_TWO[0], VALUES[1]),
    ]
    verify_scan_full(rest, expected, flt={"type": "FirstKeyOnlyFilter"})
