"""Case-for-case port of the reference's scan-kernel corpus:
regionserver/TestStoreScanner.java (the StoreScanner semantics
matrix over hand-built KeyValue fixtures),
regionserver/TestMinorCompactingStoreScanner.java (minor compaction
retains EVERYTHING — tombstones and the puts they mask), and the
client-level client/TestTimestampsFilter.java +
client/TestGetRowVersions.java.

KeyValueScanFixture = tests/cells.py; multiple fixture "files" map to
seq ranges (higher seq = newer file/memstore), exactly the information
the reference encodes by scanner order."""

import pytest

from hbase_snapshot_spark import ResolveSpec, resolve
from hbase_snapshot_spark.client import Get, Scan, Table
from hbase_snapshot_spark.filters import TimestampsFilter
from hbase_snapshot_spark.model import FamilyDescriptor, TableDescriptor
from hbase_snapshot_spark.table import Delete, Put, TableStore
from tests.cells import (
    cells_df,
    delete,
    delete_column,
    delete_family,
    put,
    visible_set,
)

DC = "dont-care"


def vs(df):
    return visible_set(df)


# ------------------------------------------------------ testScanTimeRange:60


def test_scan_time_range(spark):
    df = cells_df(spark, [put("R1", "cf", "a", t, DC) for t in (1, 2, 3, 4, 5)])
    col = {"cf": ["a"]}
    assert len(vs(resolve(df, max_versions=None, columns=col,
                          time_range=(0, 6)))) == 5
    got = vs(resolve(df, max_versions=None, columns=col, time_range=(1, 3)))
    assert {c[3] for c in got} == {1, 2}
    got = vs(resolve(df, max_versions=None, columns=col, time_range=(5, 10)))
    assert {c[3] for c in got} == {5}
    # TimeRange and maxVersions interact: full range, newest 3
    got = vs(resolve(df, max_versions=3, columns=col, time_range=(0, 10)))
    assert {c[3] for c in got} == {5, 4, 3}


# -------------------------------------------------- testScanSameTimestamp:114


def test_scan_same_timestamp(spark):
    """two puts at the same (row, col, ts) → ONE result (same-key
    rewrite collapses to the newest seq)."""
    df = cells_df(spark, [
        put("R1", "cf", "a", 1, "old", seq=0),
        put("R1", "cf", "a", 1, "new", seq=1),
    ])
    got = vs(resolve(df, max_versions=None, columns={"cf": ["a"]}))
    assert got == {("R1", "cf", "a", 1, "new")}


# ----------------------------------------------------- testWontNextToNext:145


def test_wont_next_to_next(spark):
    df = cells_df(spark, [
        put("R1", "cf", "a", 2, "r1a2"),
        put("R1", "cf", "a", 1, "r1a1"),
        put("R2", "cf", "a", 1, "r2a1"),
    ])
    got = vs(resolve(df, max_versions=1, columns={"cf": ["a"]}))
    assert got == {("R1", "cf", "a", 2, "r1a2"), ("R2", "cf", "a", 1, "r2a1")}


# ------------------------------------------ testDeleteVersionSameTimestamp:179


def test_delete_version_same_timestamp(spark):
    df = cells_df(spark, [
        put("R1", "cf", "a", 1, DC),
        delete("R1", "cf", "a", 1),
    ])
    assert vs(resolve(df, max_versions=1, columns={"cf": ["a"]})) == set()


# ---------------------------------------------- testDeletedRowThenGoodRow:199


def test_deleted_row_then_good_row(spark):
    df = cells_df(spark, [
        put("R1", "cf", "a", 1, DC),
        delete("R1", "cf", "a", 1),
        put("R2", "cf", "a", 20, "good"),
    ])
    got = vs(resolve(df, max_versions=1, columns={"cf": ["a"]}))
    assert got == {("R2", "cf", "a", 20, "good")}


# -------------------------------------- testDeleteVersionMaskingMultiplePuts:222


def test_delete_version_masking_multiple_puts(spark):
    """the delete at ts=now masks BOTH puts at that ts (the newer-file
    one included); default 1 version returns the newest survivor."""
    now = 1000
    df = cells_df(spark, [
        # "memstore" file — newest seqs
        put("R1", "cf", "a", now, DC, seq=100),
        delete("R1", "cf", "a", now, seq=101),
        # older store file
        put("R1", "cf", "a", now - 500, DC, seq=1),
        put("R1", "cf", "a", now - 100, "newest-surviving", seq=2),
        put("R1", "cf", "a", now, DC, seq=3),
    ])
    got = vs(resolve(df, max_versions=1, columns={"cf": ["a"]}))
    assert got == {("R1", "cf", "a", now - 100, "newest-surviving")}


# ------------------------- testDeleteVersionsMixedAndMultipleVersionReturn:246


def test_delete_versions_mixed_and_multiple_version_return(spark):
    now = 1000
    df = cells_df(spark, [
        put("R1", "cf", "a", now, DC, seq=100),
        delete("R1", "cf", "a", now, seq=101),
        put("R1", "cf", "a", now - 500, "v-old", seq=1),
        put("R1", "cf", "a", now + 500, "v-new", seq=2),
        put("R1", "cf", "a", now, DC, seq=3),
        put("R2", "cf", "z", now, "r2", seq=4),
    ])
    got = vs(resolve(df, max_versions=2, columns={"cf": ["a", "z"]}))
    assert got == {
        ("R1", "cf", "a", now + 500, "v-new"),
        ("R1", "cf", "a", now - 500, "v-old"),
        ("R2", "cf", "z", now, "r2"),
    }


# ------------------------------------------------ testWildCardOneVersionScan:271


def test_wildcard_one_version_scan(spark):
    df = cells_df(spark, [
        put("R1", "cf", "a", 2, "a2"),
        put("R1", "cf", "b", 1, "b1"),
        delete_column("R1", "cf", "a", 1),
    ])
    got = vs(resolve(df, max_versions=1))
    assert got == {("R1", "cf", "a", 2, "a2"), ("R1", "cf", "b", 1, "b1")}


# -------------------------------------------- testWildCardScannerUnderDeletes:288


def test_wildcard_scanner_under_deletes(spark):
    df = cells_df(spark, [
        put("R1", "cf", "a", 2, "inc-a2"),
        delete_column("R1", "cf", "a", 1),          # orphaned
        put("R1", "cf", "b", 2, "inc-b2"),
        put("R1", "cf", "b", 1, "inc-b1"),
        delete("R1", "cf", "c", 10),
        put("R1", "cf", "c", 10, DC),               # masked exactly
        put("R1", "cf", "c", 9, "inc-c9"),
        put("R1", "cf", "d", 11, "inc-d11"),
        delete_column("R1", "cf", "d", 10),
        put("R1", "cf", "d", 9, DC),                # masked (<= 10)
        put("R1", "cf", "d", 8, DC),                # masked (<= 10)
    ])
    got = vs(resolve(df, max_versions=2))
    assert got == {
        ("R1", "cf", "a", 2, "inc-a2"),
        ("R1", "cf", "b", 2, "inc-b2"),
        ("R1", "cf", "b", 1, "inc-b1"),
        ("R1", "cf", "c", 9, "inc-c9"),
        ("R1", "cf", "d", 11, "inc-d11"),
    }


# --------------------------------------------------------- testDeleteFamily:321


def test_delete_family_masks_row(spark):
    df = cells_df(spark, [
        delete_family("R1", "cf", 100),
        *[put("R1", "cf", q, 11, DC) for q in "bcdefghi"],
        delete_column("R1", "cf", "e", 11),
        delete("R1", "cf", "g", 11),
        put("R2", "cf", "a", 11, "r2-survives"),
    ])
    got = vs(resolve(df, max_versions=None))
    assert got == {("R2", "cf", "a", 11, "r2-survives")}


# --------------------------------------------------------- testDeleteColumn:350


def test_delete_column_stacked_tombstones(spark):
    df = cells_df(spark, [
        delete_column("R1", "cf", "a", 10),
        delete("R1", "cf", "a", 9),
        put("R1", "cf", "a", 8, DC),
        put("R1", "cf", "b", 5, "b5"),
    ])
    got = vs(resolve(df, max_versions=1))
    assert got == {("R1", "cf", "b", 5, "b5")}


# ----------------------------------------------------------- testSkipColumn:380


def test_skip_column(spark):
    df = cells_df(spark, [
        *[put("R1", "cf", q, 11, q) for q in "abcdefghi"],
        put("R2", "cf", "a", 11, "r2a"),
    ])
    got = vs(resolve(df, max_versions=1, columns={"cf": ["a", "d"]}))
    assert got == {
        ("R1", "cf", "a", 11, "a"),
        ("R1", "cf", "d", 11, "d"),
        ("R2", "cf", "a", 11, "r2a"),
    }


# ------------------------------------------------------ testWildCardTtlScan:405


def test_wildcard_ttl_scan(spark):
    """family TTL expires old versions before delete tracking; scaled
    2x from the reference's 500ms TTL to whole seconds (family TTL is
    second-granular like HColumnDescriptor's)."""
    now = 10_000_000
    df = cells_df(spark, [
        put("R1", "cf", "a", now - 2000, DC),       # expired
        put("R1", "cf", "b", now - 20, "r1b"),
        put("R1", "cf", "c", now - 400, "r1c"),
        put("R1", "cf", "d", now - 20000, DC),      # expired
        put("R2", "cf", "a", now, "r2a"),
        put("R2", "cf", "b", now - 20, "r2b"),
        put("R2", "cf", "c", now - 400, "r2c"),
        put("R2", "cf", "c", now - 2000, DC),       # expired anyway
    ])
    got = vs(resolve(df, max_versions=1, family_ttl={"cf": 1}, now=now))
    assert got == {
        ("R1", "cf", "b", now - 20, "r1b"),
        ("R1", "cf", "c", now - 400, "r1c"),
        ("R2", "cf", "a", now, "r2a"),
        ("R2", "cf", "b", now - 20, "r2b"),
        ("R2", "cf", "c", now - 400, "r2c"),
    }


# --------------------- TestMinorCompactingStoreScanner.java:34,74 (engine level)


@pytest.fixture()
def store(spark, tmp_path):
    return TableStore(spark, str(tmp_path / "tables"))


def _raw_cells(t):
    return {
        (c.row, c.family, c.qualifier, c.ts, c.type)
        for c in t.cells().collect()
    }


def test_minor_compaction_retains_deletes_and_masked_puts(spark, store):
    """testDeleteFamiliy:34 — minor compaction is a pure merge: the
    DeleteFamily/DeleteColumn/Delete markers AND the puts they mask all
    survive into the compacted segment; only a MAJOR compaction purges.
    The resolved read over the compacted table masks identically."""
    t = store.create_table(
        TableDescriptor("minor").add_family(FamilyDescriptor("cf")))
    rows = [
        delete_family("R1", "cf", 100, seq=1),
        *[put("R1", "cf", q, 11, DC, seq=2 + i) for i, q in enumerate("bcdefghi")],
        delete_column("R1", "cf", "e", 11, seq=20),
        delete("R1", "cf", "g", 11, seq=21),
        put("R2", "cf", "a", 11, "r2", seq=22),
    ]
    t.append_cells(cells_df(spark, rows))
    before = _raw_cells(t)
    assert len(before) == 12
    t.compact(major=False)
    assert _raw_cells(t) == before  # byte-for-byte cell retention
    got = vs(resolve(t.cells(), max_versions=None))
    assert got == {("R2", "cf", "a", 11, "r2")}
    # major compaction purges the masked row entirely
    t.compact(major=True)
    assert {c[0] for c in _raw_cells(t)} == {"R2"}


def test_minor_compaction_retains_delete_version(spark, store):
    """testDeleteVersion:74 — the exact-version tombstone and the put
    it masks both survive a minor compaction."""
    t = store.create_table(
        TableDescriptor("minor2").add_family(FamilyDescriptor("cf")))
    rows = [
        put("R1", "cf", "a", 15, "v15", seq=1),
        delete("R1", "cf", "a", 10, seq=2),
        put("R1", "cf", "a", 10, DC, seq=3),
    ]
    t.append_cells(cells_df(spark, rows))
    t.compact(major=False)
    assert len(_raw_cells(t)) == 3
    got = vs(resolve(t.cells(), max_versions=None))
    assert got == {("R1", "cf", "a", 15, "v15")}


# ------------------------------- client/TestTimestampsFilter.java:92,172


def _ts_table(store, deletes=()):
    t = store.create_table(
        TableDescriptor("tsflt").add_family(
            FamilyDescriptor("cf", max_versions=10)))
    p = Put("row")
    for ts in (1, 2, 3, 4, 5):
        p.add("cf", "col", f"v{ts}", ts=ts)
    t.mutate([p], now=100)
    for ts in deletes:
        t.mutate([Delete("row").delete_column("cf", "col", ts=ts)], now=200)
    return t


def test_timestamps_filter(store):
    """testTimestampsFilter:92 — get/scan with an explicit version list
    returns exactly those versions."""
    t = _ts_table(store)
    for df in (
        t.client().get(Get("row", max_versions=None,
                           filter=TimestampsFilter([1, 2, 5]))),
        t.client().scan(Scan(max_versions=None,
                             filter=TimestampsFilter([1, 2, 5]))),
    ):
        got = {(c.ts, c.value) for c in df.collect()}
        assert got == {(1, "v1"), (2, "v2"), (5, "v5")}


def test_timestamps_filter_with_version_deletes(store):
    """testWithVersionDeletes:172 — a deleted version disappears from
    the requested list."""
    t = _ts_table(store, deletes=(4,))
    df = t.client().scan(Scan(max_versions=None,
                              filter=TimestampsFilter([2, 3, 4])))
    got = {(c.ts, c.value) for c in df.collect()}
    assert got == {(2, "v2"), (3, "v3")}


# ------------------------------------- client/TestGetRowVersions.java:60


def test_get_row_multiple_versions(store):
    """two puts of the same column across a 'restart' (separate
    batches/segments): both versions visible, values keyed by ts."""
    t = store.create_table(
        TableDescriptor("rowver").add_family(
            FamilyDescriptor("info", max_versions=3)))
    t.mutate([Put("row").add("info", "value", "value1", ts=1000)], now=10)
    # "restart" = new segment
    t.mutate([Put("row").add("info", "value", "value2", ts=2000)], now=11)

    cells = t.client().get(Get("row", max_versions=None)).collect()
    got = {(c.ts, c.value) for c in cells}
    assert got == {(1000, "value1"), (2000, "value2")}
    # maxVersions=1 → only the newest
    cells = t.client().get(Get("row", max_versions=1)).collect()
    assert {(c.ts, c.value) for c in cells} == {(2000, "value2")}


# --------------------- client/TestTimestamp.java + TimestampTestBase.java


def test_timestamps_hadoop_1784_delete_ladder(store):
    """TimestampTestBase.doTestDelete — the HADOOP-1784 contract: puts
    at T0/T1/T2 plus a LATEST_TIMESTAMP put (sentinel replaced with
    server time, value keeps the sentinel bytes), latest-delete
    semantics, exact-version deletes, and a deleteColumns(<=T2) sweep
    leaving only the current value.  Values are the 8-byte timestamp,
    so every read self-identifies its version."""
    from hbase_snapshot_spark.bytes_util import to_bytes, to_long
    from hbase_snapshot_spark.model import LATEST_TIMESTAMP

    T0, T1, T2 = 10, 100, 200
    t = store.create_table(
        TableDescriptor("ts1784").add_family(
            FamilyDescriptor("colfamily1", max_versions=3)), binary=True)
    ROW, F, Q = b"row", "colfamily1", b"contents"

    def put_at(ts, now):
        t.mutate([Put(ROW).add(F, Q, to_bytes(ts), ts=ts)], now=now)

    def versions(maxv=3, tr=None):
        df = t.client().get(Get(ROW, columns={F: [Q]}, max_versions=maxv,
                                time_range=tr))
        cells = sorted(df.collect(), key=lambda c: -c.ts)
        return [to_long(bytes(c.value)) for c in cells]

    put_at(T0, now=1)
    put_at(T1, now=2)
    put_at(T2, now=3)
    put_at(LATEST_TIMESTAMP, now=1000)  # stored at server time 1000

    LAT = LATEST_TIMESTAMP
    assert versions() == [LAT, T2, T1]
    # time-range window below the newest stamp, one fewer version
    assert versions(maxv=2, tr=(0, 1000)) == [T2, T1]

    # delete w/o a timestamp removes the LATEST version
    t.mutate([Delete(ROW).delete_column(F, Q)], now=1001)
    assert versions() == [T2, T1, T0]

    # re-add a latest, then exact-delete T2 out from under it
    put_at(LATEST_TIMESTAMP, now=1002)
    assert versions() == [LAT, T2, T1]
    t.mutate([Delete(ROW).delete_column(F, Q, ts=T2)], now=1003)
    assert versions() == [LAT, T1, T0]

    # readd T2; churn T1 (delete exact + readd); then deleteColumns
    # <= T2 sweeps everything but the current server-time value
    put_at(T2, now=1004)
    t.mutate([Delete(ROW).delete_column(F, Q, ts=T1)], now=1005)
    put_at(T1, now=1006)
    t.mutate([Delete(ROW).delete_columns(F, Q, ts=T2)], now=1007)
    assert versions() == [LAT]  # assertOnlyLatest


def test_timestamp_scanning(store):
    """TimestampTestBase.doTestTimestampScanning — a scan bounded at
    each older stamp still finds the row (a version exists at-or-before
    every stamp), same count as the unbounded scan."""
    from hbase_snapshot_spark.bytes_util import to_bytes
    from hbase_snapshot_spark.model import LATEST_TIMESTAMP

    T0, T1 = 10, 100
    t = store.create_table(
        TableDescriptor("tsscan").add_family(
            FamilyDescriptor("colfamily1", max_versions=3)), binary=True)
    ROW, F, Q = b"row", "colfamily1", b"contents"
    for ts, now in ((T0, 1), (T1, 2), (LATEST_TIMESTAMP, 1000)):
        t.mutate([Put(ROW).add(F, Q, to_bytes(min(ts, 1 << 40)), ts=ts)],
                 now=now)

    def count_at(upper):
        rows = t.client().scan(
            Scan(families=[F], time_range=(0, upper))).collect()
        assert all(c.ts < upper for c in rows)
        return len({c.row for c in rows})

    full = len({c.row for c in t.client().scan(Scan(families=[F])).collect()})
    assert full == 1
    assert count_at(T0 + 1) == full
    assert count_at(T1 + 1) == full
