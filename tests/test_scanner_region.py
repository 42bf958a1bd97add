"""Port of the remaining region-scanner behavior corpus:

- regionserver/TestScanner.java — testStopRow:101, testFilters:177,
  testRaceBetweenClientAndTimeout:205 (HBASE-2503), and the
  flush-during-scan pair testScanAndSyncFlush:451 /
  testScanAndRealConcurrentFlush:475.
- TestScanMultipleVersions.java — the HBASE-613 regression (gets and
  scans across two multi-version rows living in two different
  key-range shards).

Mapping notes:
- ``addContent(r, family)`` (HBaseTestCase) fills every 3-char row over
  a character range with value == row key; scaled here to 'a'..'f'
  (216 rows, one mutate batch = one segment).
- ``region.flushcache()`` mid-scan maps to ``compact(major=True)``
  swapping the manifest under the open iterator (every mutate is
  already a durable segment in this engine).
- ``UnknownScannerException`` after a close maps to the wire layers'
  IllegalArgument reply (thrift scannerGet on a closed id).
"""

import itertools
import threading

import pytest

from hbase_snapshot_spark.client import Get, Scan
from hbase_snapshot_spark.filters import (
    InclusiveStopFilter,
    PrefixFilter,
    WhileMatchFilter,
)
from hbase_snapshot_spark.model import FamilyDescriptor, TableDescriptor
from hbase_snapshot_spark.table import Put, TableStore

FAMILY = "catfam"
CHARS = "abcdef"
ALL_ROWS = ["".join(t) for t in itertools.product(CHARS, repeat=3)]


@pytest.fixture(scope="module")
def content_table(spark, tmp_path_factory):
    """the addContent corpus: every 3-char row over 'a'..'f', value ==
    row key, single family, one segment."""
    store = TableStore(spark, str(tmp_path_factory.mktemp("scanreg")))
    desc = TableDescriptor("TestScanner")
    desc.add_family(FamilyDescriptor(FAMILY))
    t = store.create_table(desc)
    t.mutate([Put(r).add(FAMILY, "", r) for r in ALL_ROWS], now=50)
    return t


def _rows(cells):
    return sorted({c.row for c in cells})


# --------------------------------------------------- TestScanner.testStopRow:101


def test_stop_row(content_table):
    t = content_table
    # one-row slice first: [abc, abd) holds exactly row 'abc'
    got = _rows(t.client().scan(
        Scan(start_row="abc", stop_row="abd", families=[FAMILY])).collect())
    assert got == ["abc"]

    # the more involved slice: [bbb, ccc)
    got = _rows(t.client().scan(
        Scan(start_row="bbb", stop_row="ccc", families=[FAMILY])).collect())
    expected = [r for r in ALL_ROWS if "bbb" <= r < "ccc"]
    assert got == expected
    assert got[0] == "bbb"          # first returned row IS the start row
    assert got[-1] < "ccc"          # stop row is exclusive
    assert len(got) > 10            # the reference's sanity floor


# ---------------------------------------------------- TestScanner.testFilters:177


def test_filters_prefix(content_table):
    """rowPrefixFilter: every returned row starts with the prefix —
    and (stronger than the reference) the result is exactly the
    prefix-range slice."""
    t = content_table
    got = _rows(t.client().scan(
        Scan(families=[FAMILY], filter=PrefixFilter("ab"))).collect())
    assert got == [r for r in ALL_ROWS if r.startswith("ab")]


def test_filters_while_match_inclusive_stop(content_table):
    """rowInclusiveStopFilter: WhileMatch(InclusiveStop(stop)) returns
    every row <= stop and nothing after."""
    t = content_table
    stop = "bbc"
    got = _rows(t.client().scan(
        Scan(families=[FAMILY],
             filter=WhileMatchFilter(InclusiveStopFilter(stop)))).collect())
    assert got == [r for r in ALL_ROWS if r <= stop]


# ----------------------- TestScanner.testRaceBetweenClientAndTimeout:205 (HBASE-2503)


def test_scanner_get_after_close_raises(spark, tmp_path):
    """next() on a closed scanner must raise the wire error (the
    UnknownScannerException analogue), not NPE/KeyError."""
    from hbase_snapshot_spark.thrift_api import IllegalArgument, ThriftServer

    store = TableStore(spark, str(tmp_path / "race"))
    desc = TableDescriptor("tableA")
    desc.add_family(FamilyDescriptor("columnA"))
    t = store.create_table(desc)
    t.mutate([Put("rowA").add("columnA", "q", "v")], now=10)

    h = ThriftServer(store)
    sid = h.scannerOpen("tableA", "", ["columnA:"])
    assert h.scannerGet(sid)        # first page is served
    h.scannerClose(sid)
    with pytest.raises(IllegalArgument):
        h.scannerGet(sid)
    # closing twice is also the error, not a crash
    with pytest.raises(IllegalArgument):
        h.scannerClose(sid)


# ------------- TestScanner.testScanAndSyncFlush:451 / RealConcurrentFlush:475


def test_scan_and_concurrent_flush(content_table):
    """a full scan's row count is stable when a major compaction swaps
    the storefile set mid-iteration (sync variant: compact between
    pages; 'real concurrent' variant: compact racing the iteration
    from another thread)."""
    t = content_table

    # sync variant: compact between two paging steps
    it = t.client().scanner(Scan(families=[FAMILY]))
    seen = []
    for cell in it:
        seen.append(cell.row)
        if len(seen) == 10:
            t.compact(major=True)
    assert sorted(set(seen)) == ALL_ROWS

    # concurrent variant: compaction thread races the iteration
    err = []

    def compactor():
        try:
            t.compact(major=True)
        except Exception as ex:  # noqa: BLE001
            err.append(ex)

    it = t.client().scanner(Scan(families=[FAMILY]))
    th = threading.Thread(target=compactor)
    seen = []
    for cell in it:
        seen.append(cell.row)
        if len(seen) == 5:
            th.start()
    th.join(timeout=120)
    assert not err
    assert sorted(set(seen)) == ALL_ROWS


# ------------------------------------- TestScanMultipleVersions (HBASE-613)


def test_scan_multiple_versions(spark, tmp_path):
    rows = ["row_0200", "row_0800"]     # land in different range shards
    timestamps = [100, 1000]
    store = TableStore(spark, str(tmp_path / "hbase613"))
    desc = TableDescriptor("TestScanMultipleVersions")
    desc.add_family(FamilyDescriptor("info", max_versions=3))
    t = store.create_table(desc)
    for r in rows:
        t.mutate([Put(r).add("info", "", str(ts), ts=ts)
                  for ts in timestamps], now=5)

    c = t.client()
    # point gets pinned to each exact version: setTimeStamp(ts) == [ts, ts+1)
    for r in rows:
        for ts in timestamps:
            cells = c.get(Get(r, families=["info"],
                              time_range=(ts, ts + 1))).collect()
            assert len(cells) == 1 and cells[0].ts == ts

    def n_rows(**scan_kw):
        return len(_rows(c.scan(Scan(families=["info"], **scan_kw)).collect()))

    assert n_rows() == 2                                  # case 1: LATEST
    assert n_rows(time_range=(1000, 2 ** 62)) == 2        # case 2: > newest
    assert n_rows(time_range=(1000, 1001)) == 2           # case 3: == newest
    assert n_rows(time_range=(100, 1000)) == 2            # case 4: between
    assert n_rows(time_range=(100, 101)) == 2             # case 5: == oldest
