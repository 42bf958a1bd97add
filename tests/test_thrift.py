"""Thrift API surface tests — mirrors TestThriftServer.java's cases
(doTestTableCreateDrop, doTestTableMutations,
doTestTableTimestampsAndColumns, doTestTableScanners) against the
method-surface parity layer."""

import pytest

from hbase_snapshot_spark.table import Put, TableStore
from hbase_snapshot_spark.thrift_api import (
    BatchMutation,
    ColumnDescriptor,
    IllegalArgument,
    IOError_,
    Mutation,
    ThriftServer,
)


@pytest.fixture()
def handler(spark, tmp_path):
    store = TableStore(spark, str(tmp_path / "thrift"))
    return ThriftServer(store)


def _loaded(handler):
    handler.createTable("tableA", [ColumnDescriptor("columnA", maxVersions=3),
                                   ColumnDescriptor("columnB:")])
    handler.mutateRowsTs("tableA", [
        BatchMutation("rowA", [Mutation("columnA:a", "valueA"),
                               Mutation("columnB:b", "valueB")]),
        BatchMutation("rowB", [Mutation("columnA:a", "valueC")]),
    ], timestamp=100)
    return handler


def test_table_create_drop(handler):
    # TestThriftServer.doTestTableCreateDrop
    handler.createTable("tableA", ["columnA", "columnB:"])
    assert handler.getTableNames() == ["tableA"]
    descs = handler.getColumnDescriptors("tableA")
    assert set(descs) == {"columnA:", "columnB:"}
    # deleteTable requires the table disabled first
    # (master/TableDelete.java:35,49 TableNotDisabledException)
    with pytest.raises(IOError_, match="TableNotDisabled"):
        handler.deleteTable("tableA")
    handler.disableTable("tableA")
    handler.deleteTable("tableA")
    assert handler.getTableNames() == []
    with pytest.raises(IOError_):
        handler.getRow("tableA", "rowA")


def test_table_mutations(handler):
    # TestThriftServer.doTestTableMutations
    h = _loaded(handler)
    rows = h.getRow("tableA", "rowA")
    assert len(rows) == 1
    assert rows[0].columns["columnA:a"].value == "valueA"
    assert rows[0].columns["columnB:b"].value == "valueB"

    # overwrite + delete in one mutateRow
    h.mutateRowTs("tableA", "rowA", [
        Mutation("columnA:a", "valueA2"),
        Mutation("columnB:b", isDelete=True),
    ], timestamp=200)
    rows = h.getRow("tableA", "rowA")
    assert rows[0].columns["columnA:a"].value == "valueA2"
    assert "columnB:b" not in rows[0].columns

    h.deleteAllRow("tableA", "rowB")
    assert h.getRow("tableA", "rowB") == []


def test_get_versions_and_ts(handler):
    # TestThriftServer.doTestTableTimestampsAndColumns
    h = _loaded(handler)
    h.mutateRowTs("tableA", "rowA", [Mutation("columnA:a", "v2")], timestamp=200)
    h.mutateRowTs("tableA", "rowA", [Mutation("columnA:a", "v3")], timestamp=300)

    assert [c.value for c in h.get("tableA", "rowA", "columnA:a")] == ["v3"]
    got = h.getVer("tableA", "rowA", "columnA:a", 2)
    assert [(c.value, c.timestamp) for c in got] == [("v3", 300), ("v2", 200)]
    # getVerTs: versions with ts < 200 (exclusive upper bound, matching
    # ThriftServer.java:339 setTimeRange(Long.MIN_VALUE, timestamp) —
    # the boundary cell at ts=200 is NOT returned)
    got = h.getVerTs("tableA", "rowA", "columnA:a", 200, 10)
    assert [(c.value, c.timestamp) for c in got] == [("valueA", 100)]
    got = h.getVerTs("tableA", "rowA", "columnA:a", 201, 10)
    assert [(c.value, c.timestamp) for c in got] == [("v2", 200), ("valueA", 100)]
    # getRowTs: the row strictly before ts=101
    rows = h.getRowTs("tableA", "rowA", 101)
    assert rows[0].columns["columnA:a"].value == "valueA"
    assert h.getRowTs("tableA", "rowA", 100) == []
    # column projection
    rows = h.getRowWithColumns("tableA", "rowA", ["columnB:"])
    assert set(rows[0].columns) == {"columnB:b"}

    h.deleteAllTs("tableA", "rowA", "columnA:a", 200)
    assert [c.value for c in h.get("tableA", "rowA", "columnA:a")] == ["v3"]


def test_atomic_increment(handler):
    handler.createTable("tableA", ["columnA"])
    assert handler.atomicIncrement("tableA", "rowI", "columnA:cnt", 5) == 5
    assert handler.atomicIncrement("tableA", "rowI", "columnA:cnt", -2) == 3


def test_table_scanners(handler):
    # TestThriftServer.doTestTableScanners + scannerOpenWithPrefix
    h = _loaded(handler)
    h.mutateRows("tableA", [
        BatchMutation(f"rowC{i}", [Mutation("columnA:a", str(i))])
        for i in range(5)
    ])

    sid = h.scannerOpen("tableA", "rowA", ["columnA:"])
    first = h.scannerGet(sid)
    assert first[0].row == "rowA" and set(first[0].columns) == {"columnA:a"}
    rest = h.scannerGetList(sid, 100)
    assert [r.row for r in rest] == ["rowB", "rowC0", "rowC1", "rowC2",
                                     "rowC3", "rowC4"]
    assert h.scannerGet(sid) == []
    h.scannerClose(sid)
    with pytest.raises(IllegalArgument):
        h.scannerGet(sid)

    sid = h.scannerOpenWithStop("tableA", "rowC0", "rowC3", None)
    assert [r.row for r in h.scannerGetList(sid, 100)] == ["rowC0", "rowC1", "rowC2"]
    h.scannerClose(sid)

    sid = h.scannerOpenWithPrefix("tableA", "rowC", None)
    assert [r.row for r in h.scannerGetList(sid, 100)] == [
        f"rowC{i}" for i in range(5)
    ]
    h.scannerClose(sid)

    # Ts variant: exclusive upper bound (ThriftServer.java:686) — the
    # base load is at ts=100, so timestamp=100 sees nothing and 101 all
    sid = h.scannerOpenTs("tableA", "", None, 100)
    assert h.scannerGetList(sid, 100) == []
    h.scannerClose(sid)
    sid = h.scannerOpenTs("tableA", "", None, 101)
    assert [r.row for r in h.scannerGetList(sid, 100)] == ["rowA", "rowB"]
    h.scannerClose(sid)


def test_admin_enable_disable_compact_regions(handler):
    h = _loaded(handler)
    assert h.isTableEnabled("tableA")
    h.disableTable("tableA")
    assert not h.isTableEnabled("tableA")
    with pytest.raises(IOError_):
        h.getRow("tableA", "rowA")
    h.enableTable("tableA")
    assert h.getRow("tableA", "rowA")

    h.compact("tableA")
    h.majorCompact("tableA")
    assert h.getRow("tableA", "rowA")  # data intact through compactions
    regions = h.getTableRegions("tableA")
    assert len(regions) == 1 and regions[0]["startKey"] == ""


def test_delete_all_row_ts(handler):
    h = _loaded(handler)
    h.mutateRowTs("tableA", "rowA", [Mutation("columnA:a", "late")], timestamp=500)
    h.deleteAllRowTs("tableA", "rowA", 200)  # wipes ts<=200, keeps 500
    rows = h.getRow("tableA", "rowA")
    assert [c.value for c in rows[0].columns.values()] == ["late"]


class FakeClock:
    """Injectable monotonic clock for lease-expiry tests — no sleeps."""

    def __init__(self):
        self.t = 1000.0

    def __call__(self):
        return self.t

    def advance(self, dt):
        self.t += dt


def test_scanner_lease_expiry(spark, tmp_path):
    """Leases.java:281 — an idle scanner's lease lapses and the cursor
    is reclaimed; an active scanner's lease renews on every access.
    Clock-injected: the test drives time, zero sleeps."""
    clock = FakeClock()
    store = TableStore(spark, str(tmp_path / "thrift-lease"))
    h = ThriftServer(store, lease_seconds=60.0, now_fn=clock)
    _loaded(h)

    # idle past the lease → IllegalArgument on next access, and the
    # registry no longer holds the cursor (bounded server memory)
    sid = h.scannerOpen("tableA", "", ["columnA:"])
    clock.advance(61.0)
    with pytest.raises(IllegalArgument):
        h.scannerGet(sid)
    assert len(h._scanners) == 0

    # each access renews: three touches each 45s apart (inside the
    # lease) keep the scanner alive 135s — past two full periods
    sid = h.scannerOpen("tableA", "", ["columnA:"])
    rows = []
    for _ in range(3):
        clock.advance(45.0)
        rows.extend(h.scannerGet(sid))
    assert [r.row for r in rows][:2] == ["rowA", "rowB"]
    h.scannerClose(sid)
    # close on an expired scanner also raises (and does not KeyError)
    sid = h.scannerOpen("tableA", "", ["columnA:"])
    clock.advance(61.0)
    with pytest.raises(IllegalArgument):
        h.scannerClose(sid)


def test_scanner_lease_busy_page_not_reaped():
    """HRegionServer.next removes the lease while serving and re-adds
    it on return (Leases.java renewLease): a page that takes LONGER
    than the lease period must not be reaped by a concurrent registry
    operation.  get() marks the entry busy; renew() clears it."""
    from hbase_snapshot_spark.client import ScannerLeases

    clock = FakeClock()
    leases = ScannerLeases(lease_seconds=60.0, now_fn=clock)
    sid = leases.open(object())

    cur = leases.get(sid)  # page begins — entry now busy
    assert cur is not None
    clock.advance(300.0)  # the page is 5× slower than the lease
    leases.open(object())  # concurrent registry op triggers a reap
    # the busy scanner survived the reap
    leases.renew(sid)  # page completes — lease re-armed, busy cleared
    assert leases.get(sid) is cur
    leases.renew(sid)

    # once idle again, normal expiry applies
    clock.advance(61.0)
    assert leases.get(sid) is None
    assert len(leases) == 0


def test_scanner_leases_concurrent():
    """ScannerLeases under concurrent open/get+renew/close from many
    threads: ids stay unique, no scanner leaks past its lease, renewal
    keeps a hot scanner alive."""
    import threading

    from hbase_snapshot_spark.client import ScannerLeases

    clock = FakeClock()
    leases = ScannerLeases(lease_seconds=60.0, now_fn=clock)
    errors = []
    ids = []
    lock = threading.Lock()

    def worker(n):
        try:
            local = []
            for i in range(50):
                sid = leases.open(object())
                local.append(sid)
                assert leases.get(sid) is not None
                leases.renew(sid)  # page complete — clear busy mark
                if i % 2 == 0:
                    assert leases.close(sid) is not None
            with lock:
                ids.extend(local)
        except Exception as ex:  # noqa: BLE001
            errors.append(ex)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    assert len(ids) == len(set(ids)) == 400  # unique ids across threads
    # the ~200 unclosed scanners all expire after the lease lapses
    clock.advance(61.0)
    leases.get(ids[-1])  # any access reaps
    assert len(leases) == 0


def test_wide_row_cursor_paging(spark, tmp_path):
    """regionserver/TestWideScanner.java (adapted): wide rows (300
    columns) through the RowCursor paging layer — every page carries
    WHOLE rows (the engine's documented batching divergence: rows are
    never split), rows arrive in key order, and all cells of each wide
    row are present and column-ordered."""
    store = TableStore(spark, str(tmp_path / "wide"))
    h = ThriftServer(store)
    h.createTable("wide", [ColumnDescriptor("f:")])
    n_cols, n_rows = 300, 3
    t = store.table("wide")
    t.mutate([
        Put(f"row{r}").add("f", f"q{i:04d}", f"{r}-{i}")
        for r in range(n_rows) for i in range(n_cols)
    ], now=50)

    sid = h.scannerOpen("wide", "", ["f:"])
    pages = []
    while True:
        page = h.scannerGetList(sid, 2)
        if not page:
            break
        pages.append(page)
    h.scannerClose(sid)

    rows = [r for p in pages for r in p]
    assert [r.row for r in rows] == [f"row{r}" for r in range(n_rows)]
    for r_i, r in enumerate(rows):
        assert len(r.columns) == n_cols
        # column map keys are family:qualifier, sorted by qualifier
        quals = sorted(r.columns)
        assert quals[0] == "f:q0000" and quals[-1] == f"f:q{n_cols-1:04d}"
        assert r.columns["f:q0123"].value == f"{r_i}-123"


def test_unknown_family_maps_to_declared_ioerror(handler):
    """a mutation naming an undeclared family surfaces as the DECLARED
    IOError (ThriftServer wraps NoSuchColumnFamilyException), never an
    application-level fault."""
    h = _loaded(handler)
    with pytest.raises(IOError_):
        h.mutateRow("tableA", "rowA", [Mutation("noSuchFam:q", "v")])
    with pytest.raises(IOError_):
        h.deleteAll("tableA", "rowA", "noSuchFam:q")
    with pytest.raises(IOError_):
        h.atomicIncrement("tableA", "rowA", "noSuchFam:cnt", 1)
