"""Case-for-case port of the reference's canonical client-behavior
corpus: client/TestFromClientSide.java — the five behavioral pillars
(``testDeletes:1439``, ``testVersionLimits:1245``, ``testNull:923``,
``testVersions:1031``, ``testDuplicateVersions:2873``), worked example
for worked example.

Mapping notes:
- ``TEST_UTIL.flush()`` is a no-op boundary here: every ``mutate``
  batch already commits a durable segment (the memstore/storefile
  distinction has no observable read-side effect in this engine), so
  the post-flush re-asserts of unchanged state are folded into one.
- ``get.setTimeStamp(ts)`` = ``time_range=(ts, ts+1)``
  (Get.setTimeStamp delegates to setTimeRange(ts, ts+1)).
- ``getSingleScanResult`` = the first row (row-order) of the scan.
- testDuplicateVersions' FINAL assert (:3071) is adapted — see the
  inline note and DIVERGENCES.md: the reference test file expects
  version-masked deletes to free version slots in testVersions:1228
  but not in testDuplicateVersions:3071 on structurally identical
  histories; this engine implements the former consistently.
"""

import pytest

from hbase_snapshot_spark.client import Get, Scan
from hbase_snapshot_spark.filters import (
    BinaryComparator,
    CompareOp,
    RowFilter,
    WhileMatchFilter,
)
from hbase_snapshot_spark.model import FamilyDescriptor, TableDescriptor
from hbase_snapshot_spark.table import Delete, Put, TableStore

ROW = "testRow"
Q = "testQualifier"


@pytest.fixture()
def store(spark, tmp_path):
    return TableStore(spark, str(tmp_path / "tables"))


def _mk(store, name, fams, versions=3):
    vs = versions if isinstance(versions, (list, tuple)) else [versions] * len(fams)
    desc = TableDescriptor(name)
    for f, v in zip(fams, vs):
        desc.add_family(FamilyDescriptor(f, max_versions=v))
    return store.create_table(desc)


def get_cells(t, row, *, families=None, columns=None, ts=None, maxv=1):
    tr = (ts, ts + 1) if ts is not None else None
    df = t.client().get(
        Get(row, families=families, columns=columns, time_range=tr, max_versions=maxv)
    )
    return {(r.family, r.qualifier, r.ts, r.value) for r in df.collect()}


def scan_cells(t, start_row=None, *, families=None, columns=None, ts=None, maxv=1):
    """getSingleScanResult: cells of the scan's first row."""
    tr = (ts, ts + 1) if ts is not None else None
    rows = t.client().scan(
        Scan(start_row=start_row, families=families, columns=columns,
             time_range=tr, max_versions=maxv)
    ).collect()
    if not rows:
        return set()
    first = min(r.row for r in rows)
    return {(r.family, r.qualifier, r.ts, r.value) for r in rows if r.row == first}


def check_version(t, row, fam, qual, stamp, value):
    """getVersionAndVerify + scanVersionAndVerify (:2171, :2193)."""
    want = {(fam, qual, stamp, value)}
    assert get_cells(t, row, columns={fam: [qual]}, ts=stamp, maxv=None) == want
    assert scan_cells(t, row, columns={fam: [qual]}, ts=stamp, maxv=None) == want


def check_version_missing(t, row, fam, qual, stamp):
    assert get_cells(t, row, columns={fam: [qual]}, ts=stamp, maxv=None) == set()
    assert scan_cells(t, row, columns={fam: [qual]}, ts=stamp, maxv=None) == set()


def col_set(fam, qual, stamps, values):
    return {(fam, qual, s, v) for s, v in zip(stamps, values)}


# --------------------------------------------------- testVersions:1031


def test_versions(store):
    t = _mk(store, "testVersions", ["f"], versions=10)
    S = [100 + 10 * i for i in range(20)]
    V = [f"value-{i}" for i in range(20)]

    # Insert 4 versions of same column (one Put)
    t.mutate([Put(ROW).add("f", Q, V[1], ts=S[1]).add("f", Q, V[2], ts=S[2])
              .add("f", Q, V[4], ts=S[4]).add("f", Q, V[5], ts=S[5])])

    for i in (1, 2, 4, 5):
        check_version(t, ROW, "f", Q, S[i], V[i])
    for i in (0, 3, 6):
        check_version_missing(t, ROW, "f", Q, S[i])

    # maxVersions in query is respected (:1066-1082); state unchanged
    # across the flush (:1086) so the post-flush re-assert is the same
    want2 = col_set("f", Q, [S[4], S[5]], [V[4], V[5]])
    assert get_cells(t, ROW, columns={"f": [Q]}, maxv=2) == want2
    assert scan_cells(t, ROW, columns={"f": [Q]}, maxv=2) == want2

    # Insert 4 more versions (:1129-1134); all 8 visible at MAX,
    # with and without explicit column projection (:1137-1169)
    t.mutate([Put(ROW).add("f", Q, V[3], ts=S[3]).add("f", Q, V[6], ts=S[6])
              .add("f", Q, V[7], ts=S[7]).add("f", Q, V[8], ts=S[8])])
    want8 = col_set("f", Q, [S[i] for i in range(1, 9)], [V[i] for i in range(1, 9)])
    assert get_cells(t, ROW, columns={"f": [Q]}, maxv=None) == want8
    assert scan_cells(t, ROW, columns={"f": [Q]}, maxv=None) == want8
    assert get_cells(t, ROW, maxv=None) == want8
    assert scan_cells(t, ROW, maxv=None) == want8

    check_version(t, ROW, "f", Q, S[7], V[7])
    check_version_missing(t, ROW, "f", Q, S[0])
    check_version_missing(t, ROW, "f", Q, S[9])

    # 4 more → 12 versions; family maxVersions=10 trims the 2 oldest
    # (:1192-1215)
    t.mutate([Put(ROW).add("f", Q, V[9], ts=S[9]).add("f", Q, V[11], ts=S[11])
              .add("f", Q, V[13], ts=S[13]).add("f", Q, V[15], ts=S[15])])
    keep = [3, 4, 5, 6, 7, 8, 9, 11, 13, 15]
    want10 = col_set("f", Q, [S[i] for i in keep], [V[i] for i in keep])
    assert get_cells(t, ROW, columns={"f": [Q]}, maxv=None) == want10
    assert scan_cells(t, ROW, columns={"f": [Q]}, maxv=None) == want10

    # Delete two versions (memstore + storefile in the reference); the
    # two oldest REAPPEAR — masked versions no longer consume version
    # slots (:1218-1240)
    t.mutate([Delete(ROW).delete_column("f", Q, ts=S[11])
              .delete_column("f", Q, ts=S[7])])
    keep = [1, 2, 3, 4, 5, 6, 8, 9, 13, 15]
    want10 = col_set("f", Q, [S[i] for i in keep], [V[i] for i in keep])
    assert get_cells(t, ROW, columns={"f": [Q]}, maxv=None) == want10
    assert scan_cells(t, ROW, columns={"f": [Q]}, maxv=None) == want10


# ---------------------------------------------- testVersionLimits:1245


def test_version_limits(store):
    t = _mk(store, "testVersionLimits", ["f0", "f1", "f2"], versions=[1, 3, 5])
    S = [100 + 10 * i for i in range(10)]
    V = [f"value-{i}" for i in range(10)]

    # Insert limit + 1 on each family (one Put, :1254-1268)
    p = Put(ROW)
    for i in range(2):
        p.add("f0", Q, V[i], ts=S[i])
    for i in range(4):
        p.add("f1", Q, V[i], ts=S[i])
    for i in range(7):
        p.add("f2", Q, V[i], ts=S[i])
    t.mutate([p])

    # per-family expectations at MAX versions, via addColumn AND
    # addFamily, get AND scan (:1274-1384)
    expect = {
        "f0": col_set("f0", Q, [S[1]], [V[1]]),
        "f1": col_set("f1", Q, S[1:4], V[1:4]),
        "f2": col_set("f2", Q, S[2:7], V[2:7]),
    }
    for fam, want in expect.items():
        assert get_cells(t, ROW, columns={fam: [Q]}, maxv=None) == want
        assert get_cells(t, ROW, families=[fam], maxv=None) == want
        assert scan_cells(t, ROW, columns={fam: [Q]}, maxv=None) == want
        assert scan_cells(t, ROW, families=[fam], maxv=None) == want

    # all families → 9 keys, three projection spellings (:1388-1434)
    all9 = expect["f0"] | expect["f1"] | expect["f2"]
    assert get_cells(t, ROW, maxv=None) == all9
    assert get_cells(t, ROW, families=["f0", "f1", "f2"], maxv=None) == all9
    assert get_cells(t, ROW, columns={"f0": [Q], "f1": [Q], "f2": [Q]},
                     maxv=None) == all9
    assert scan_cells(t, ROW, maxv=None) == all9
    assert scan_cells(t, ROW, families=["f0", "f1", "f2"], maxv=None) == all9
    assert scan_cells(t, ROW, columns={"f0": [Q], "f1": [Q], "f2": [Q]},
                      maxv=None) == all9


# -------------------------------------------------- testDeletes:1439


def test_deletes(store):
    t = _mk(store, "testDeletes", ["f0", "f1", "f2"])  # default maxVersions=3
    ROWS = [f"testRow-{i}" for i in range(6)]
    V = [f"value-{i}" for i in range(5)]
    ts = [1000, 2000, 3000, 4000, 5000]

    t.mutate([Put(ROW).add("f0", Q, V[0], ts=ts[0]).add("f0", Q, V[1], ts=ts[1])])
    # deleteFamily at ts[0] masks only the ts[0] version (:1454-1474)
    t.mutate([Delete(ROW).delete_family("f0", ts=ts[0])])
    want = col_set("f0", Q, [ts[1]], [V[1]])
    assert get_cells(t, ROW, families=["f0"], maxv=None) == want
    assert scan_cells(t, ROW, families=["f0"], maxv=None) == want

    # delete latest version (:1477-1506): 3 more versions on Q and on
    # the null (= empty) qualifier, then deleteColumn with no ts → ts[4]
    t.mutate([Put(ROW).add("f0", Q, V[4], ts=ts[4]).add("f0", Q, V[2], ts=ts[2])
              .add("f0", Q, V[3], ts=ts[3])
              .add("f0", None, V[4], ts=ts[4]).add("f0", None, V[2], ts=ts[2])
              .add("f0", None, V[3], ts=ts[3])])
    t.mutate([Delete(ROW).delete_column("f0", Q)])
    want = col_set("f0", Q, ts[1:4], V[1:4])
    assert get_cells(t, ROW, columns={"f0": [Q]}, maxv=None) == want
    assert scan_cells(t, ROW, columns={"f0": [Q]}, maxv=None) == want

    # HBASE-1847: deleteColumn(null qualifier) latest, then cleanup all
    # null-qualifier versions (:1509-1516)
    t.mutate([Delete(ROW).delete_column("f0", None)])
    t.mutate([Delete(ROW).delete_columns("f0", None)], now=5500)

    # "can't re-put deleted values": ts[0] is masked by the family
    # tombstone, ts[4] by the exact-version tombstone (:1521-1548)
    t.mutate([Put(ROW).add("f0", Q, V[0], ts=ts[0]).add("f0", Q, V[4], ts=ts[4])])
    want = col_set("f0", Q, ts[1:4], V[1:4])
    assert get_cells(t, ROW, families=["f0"], maxv=None) == want
    assert scan_cells(t, ROW, families=["f0"], maxv=None) == want

    # family/columns/column deletes across three rows (:1552-1656)
    for r in ROWS[:3]:
        t.mutate([Put(r).add("f1", Q, V[0], ts=ts[0]).add("f1", Q, V[1], ts=ts[1])
                  .add("f2", Q, V[2], ts=ts[2]).add("f2", Q, V[3], ts=ts[3])])
    assert len(get_cells(t, ROWS[2], families=["f1", "f2"], maxv=None)) == 4

    t.mutate([Delete(ROWS[0]).delete_family("f2")], now=5500)
    t.mutate([Delete(ROWS[1]).delete_columns("f1", Q)], now=5500)
    # TWO latest-deletes of one column in ONE Delete: the 2nd targets
    # the 2nd-newest version (HRegion.delete:1231-1264 occurrence
    # counting) — f1 loses BOTH ts[1] and ts[0]; f2 loses ts[3]
    t.mutate([Delete(ROWS[2]).delete_column("f1", Q).delete_column("f1", Q)
              .delete_column("f2", Q)], now=5500)

    want0 = col_set("f1", Q, ts[0:2], V[0:2])
    assert get_cells(t, ROWS[0], families=["f1", "f2"], maxv=None) == want0
    assert scan_cells(t, ROWS[0], families=["f1", "f2"], maxv=None) == want0

    want1 = col_set("f2", Q, ts[2:4], V[2:4])
    assert get_cells(t, ROWS[1], families=["f1", "f2"], maxv=None) == want1
    assert scan_cells(t, ROWS[1], families=["f1", "f2"], maxv=None) == want1

    want2 = col_set("f2", Q, [ts[2]], [V[2]])
    assert get_cells(t, ROWS[2], families=["f1", "f2"], maxv=None) == want2
    assert scan_cells(t, ROWS[2], families=["f1", "f2"], maxv=None) == want2

    # HBASE-1541: family delete FIRST, then put (server ts newer than
    # the tombstone) — the new put is visible (:1660-1705)
    t.mutate([Delete(ROWS[3]).delete_family("f1")], now=6000)
    t.mutate([Put(ROWS[3]).add("f2", Q, V[0])], now=7000)
    t.mutate([Put(ROWS[4]).add("f1", Q, V[1]).add("f2", Q, V[2])], now=7000)

    got3 = get_cells(t, ROWS[3], families=["f1", "f2"], maxv=None)
    assert {(f, q, v) for f, q, _, v in got3} == {("f2", Q, V[0])}
    got4 = get_cells(t, ROWS[4], families=["f1", "f2"], maxv=None)
    assert {(f, q, v) for f, q, _, v in got4} == {("f1", Q, V[1]), ("f2", Q, V[2])}
    assert scan_cells(t, ROWS[3], families=["f1", "f2"], maxv=None) == got3

    # bulk deleting (:1709-1736)
    t.mutate([Put(f"brow-{i}").add("f0", Q, f"bv-{i}") for i in range(10)],
             now=8000)
    seen = {r.row for r in t.client().scan(
        Scan(start_row="brow-", stop_row="brow-~", families=["f0"]))
        .collect()}
    assert seen == {f"brow-{i}" for i in range(10)}
    t.mutate([Delete(f"brow-{i}").delete_family("f0") for i in range(10)],
             now=8500)
    assert t.client().scan(
        Scan(start_row="brow-", stop_row="brow-~", families=["f0"])
    ).count() == 0


# ------------------------------------------------------ testNull:923


def test_null(store):
    # Null table name / null or missing family must fail (:927-936)
    with pytest.raises(Exception):
        store.create_table(TableDescriptor(None).add_family(FamilyDescriptor("f")))
    with pytest.raises(Exception):
        store.create_table(
            TableDescriptor("testNullFam").add_family(FamilyDescriptor(None))
        )

    t = _mk(store, "testNull", ["f"])
    # Null row must fail (:941-946)
    with pytest.raises(Exception):
        t.mutate([Put(None).add("f", Q, "v")])

    # Null qualifier works and is the SAME column as the empty
    # qualifier (:948-965; KeyValue coerces null → byte[0])
    t.mutate([Put(ROW).add("f", None, "v-null", ts=100)])
    for colspec in ({"f": [None]}, {"f": [""]}):
        assert get_cells(t, ROW, columns=colspec) == {("f", "", 100, "v-null")}
        assert scan_cells(t, ROW, columns=colspec) == {("f", "", 100, "v-null")}
    t.mutate([Delete(ROW).delete_columns("f", None)], now=200)
    assert get_cells(t, ROW) == set()

    # Empty qualifier byte[0] variant (:968-999) — flush boundary is a
    # no-op here, so the pre/post-flush pair folds into one
    t2 = _mk(store, "testNull2", ["f"])
    t2.mutate([Put(ROW).add("f", "", "v-empty", ts=100)])
    for colspec in ({"f": [None]}, {"f": [""]}):
        assert get_cells(t2, ROW, columns=colspec) == {("f", "", 100, "v-empty")}
        assert scan_cells(t2, ROW, columns=colspec) == {("f", "", 100, "v-empty")}
    t2.mutate([Delete(ROW).delete_columns("f", "")], now=200)
    assert get_cells(t2, ROW) == set()

    # Null VALUE is allowed (:1002-1027)
    t2.mutate([Put(ROW).add("f", Q, None, ts=300)])
    assert get_cells(t2, ROW, columns={"f": [Q]}) == {("f", Q, 300, None)}
    assert scan_cells(t2, ROW, columns={"f": [Q]}) == {("f", Q, 300, None)}
    t2.mutate([Delete(ROW).delete_columns("f", Q)], now=400)
    assert get_cells(t2, ROW) == set()


# ------------------------------------------- testDuplicateVersions:2873


def test_duplicate_versions(store):
    t = _mk(store, "testDuplicateVersions", ["f"], versions=10)
    S = [100 + 10 * i for i in range(20)]
    V = [f"value-{i}" for i in range(20)]

    t.mutate([Put(ROW).add("f", Q, V[1], ts=S[1]).add("f", Q, V[2], ts=S[2])
              .add("f", Q, V[4], ts=S[4]).add("f", Q, V[5], ts=S[5])])
    for i in (1, 2, 4, 5):
        check_version(t, ROW, "f", Q, S[i], V[i])
    for i in (0, 3, 6):
        check_version_missing(t, ROW, "f", Q, S[i])
    want2 = col_set("f", Q, [S[4], S[5]], [V[4], V[5]])
    assert get_cells(t, ROW, columns={"f": [Q]}, maxv=2) == want2
    assert scan_cells(t, ROW, columns={"f": [Q]}, maxv=2) == want2

    # Insert 4 more versions AND a same-ts rewrite: VALUES[14] replaces
    # VALUES[4] at STAMPS[4] (:2971-2977); the rewrite consumes ONE
    # version slot, so maxVersions=7 reaches back to STAMPS[2]
    # (:2980-3012)
    t.mutate([Put(ROW).add("f", Q, V[3], ts=S[3]).add("f", Q, V[14], ts=S[4])
              .add("f", Q, V[6], ts=S[6]).add("f", Q, V[7], ts=S[7])
              .add("f", Q, V[8], ts=S[8])])
    vals = {1: V[1], 2: V[2], 3: V[3], 4: V[14], 5: V[5], 6: V[6],
            7: V[7], 8: V[8], 9: V[9], 11: V[11], 13: V[13], 15: V[15]}
    keep7 = [2, 3, 4, 5, 6, 7, 8]
    want7 = {("f", Q, S[i], vals[i]) for i in keep7}
    assert get_cells(t, ROW, columns={"f": [Q]}, maxv=7) == want7
    assert scan_cells(t, ROW, columns={"f": [Q]}, maxv=7) == want7
    assert get_cells(t, ROW, maxv=7) == want7
    assert scan_cells(t, ROW, maxv=7) == want7

    check_version(t, ROW, "f", Q, S[4], V[14])  # rewrite wins (:3017)
    check_version(t, ROW, "f", Q, S[7], V[7])
    check_version_missing(t, ROW, "f", Q, S[0])
    check_version_missing(t, ROW, "f", Q, S[9])

    # 4 more → 12 distinct versions; family cap 10 trims the 2 oldest
    # (:3035-3058)
    t.mutate([Put(ROW).add("f", Q, V[9], ts=S[9]).add("f", Q, V[11], ts=S[11])
              .add("f", Q, V[13], ts=S[13]).add("f", Q, V[15], ts=S[15])])
    keep10 = [3, 4, 5, 6, 7, 8, 9, 11, 13, 15]
    want10 = {("f", Q, S[i], vals[i]) for i in keep10}
    assert get_cells(t, ROW, columns={"f": [Q]}, maxv=None) == want10
    assert scan_cells(t, ROW, columns={"f": [Q]}, maxv=None) == want10

    # Delete STAMPS[11] and STAMPS[7] (:3061-3063).  DIVERGENCE vs the
    # reference's literal expected set (:3071 lists only 8 versions):
    # with masked versions freeing their version slots — the rule the
    # SAME file pins in testVersions:1228-1240 — the two oldest versions
    # reappear, giving 10.  This engine applies that rule uniformly;
    # see DIVERGENCES.md (TestFromClientSide internal inconsistency).
    t.mutate([Delete(ROW).delete_column("f", Q, ts=S[11])
              .delete_column("f", Q, ts=S[7])])
    keep10 = [1, 2, 3, 4, 5, 6, 8, 9, 13, 15]
    want10 = {("f", Q, S[i], vals[i]) for i in keep10}
    assert get_cells(t, ROW, columns={"f": [Q]}, maxv=None) == want10
    assert scan_cells(t, ROW, columns={"f": [Q]}, maxv=None) == want10


# --------------------------------------------------------------------
# Round-5 tier: testGetClosestRowBefore:3485, the multi-region filter
# matrix testFilterAcrossMutlipleRegions:267, wide rows
# testJiraTest867:1806, the version/time-range JIRA testers
# (861/33/1014/1182/52, :1884-2100), and client/TestMultipleTimestamps.java
# in full.  (testMultipleRegionsAndBatchPuts:1756 is an EMPTY @Ignore
# stub in the reference — nothing to port.)
# --------------------------------------------------------------------

STAMPS = [(i + 1) * 1000 for i in range(20)]  # makeStamps:2870 analogue
VALS = [f"value-{i}" for i in range(20)]      # makeNAscii


def get_versions(t, row, fam, qual, tr=None):
    """getNVersions / getVersionRangeAndVerify body: all versions of one
    column in a time range, newest-first (KeyValue ts-desc order)."""
    df = t.client().get(
        Get(row, columns={fam: [qual]}, time_range=tr, max_versions=None)
    )
    return sorted(((r.ts, r.value) for r in df.collect()), key=lambda x: -x[0])


def scan_versions(t, row, fam, qual, tr=None):
    df = t.client().scan(
        Scan(start_row=row, columns={fam: [qual]}, time_range=tr,
             max_versions=None)
    )
    rows = [r for r in df.collect() if r.row == row]
    return sorted(((r.ts, r.value) for r in rows), key=lambda x: -x[0])


def test_get_closest_row_before(store):
    """testGetClosestRowBefore:3485 — null / exact / between / after."""
    t = _mk(store, "testGetClosestRowBefore", ["info", "info2"])
    t.mutate([Put("ro").add("info", "", "\x00"), Put("row").add("info", "", "\x01")])

    def row_or_before(key):
        rows = t.client().get_row_or_before(key, "info").collect()
        return {(r.row, r.value) for r in rows}

    assert row_or_before("rn") == set()                    # before first → null
    assert row_or_before("ro") == {("ro", "\x00")}         # at first → first
    assert row_or_before("rov") == {("ro", "\x00")}        # between → first
    assert row_or_before("row") == {("row", "\x01")}       # at second → second
    assert row_or_before("row\x01") == {("row", "\x01")}   # after → second


def test_filter_across_multiple_regions(store):
    """testFilterAcrossMutlipleRegions:267 — WhileMatch(RowFilter) row
    counts across a region-split boundary.  The split itself is a
    physical no-op here (Spark partitions stand in for regions); the
    observable contract is the filter/row-count matrix, asserted
    against the same 'lqj'-style keys."""
    t = _mk(store, "testFilterAcrossMutlipleRegions", ["family"])
    keys = [a + b + c
            for a in "abcdefghijklmnopqrstuvwxy"
            for b in "abcdefghijklmnopqrstuvwxy"
            for c in "abcdefghijklmnopqrstuvwxy"]
    t.mutate([Put(k).add("family", "", k) for k in keys])
    row_count = len(keys)
    assert t.client().row_count() == row_count

    def count_rows(key, op=CompareOp.LESS, start_row=None):
        flt = WhileMatchFilter(RowFilter(op, BinaryComparator(key)))
        df = t.client().scan(Scan(start_row=start_row, filter=flt))
        return df.select("row").distinct().count()

    end_key = "lqj"  # the reference's observed split point
    end_key_count = sum(1 for k in keys if k < end_key)
    assert count_rows(end_key) == end_key_count
    assert end_key_count < row_count
    # one/two rows past the boundary, one before (:288-300)
    assert count_rows("lqk") == end_key_count + 1
    assert count_rows("lql") == end_key_count + 2
    assert count_rows("lqi") == end_key_count - 1
    # EQUAL 'aaa' under WhileMatch: matches the first row then cuts (:304)
    assert count_rows("aaa", op=CompareOp.EQUAL) == 1
    # GE endKey from table start: first row fails, WhileMatch cuts → 0 (:309)
    assert count_rows(end_key, op=CompareOp.GREATER_OR_EQUAL) == 0
    # GE endKey starting AT endKey: the rest of the table (:313)
    assert count_rows(
        end_key, op=CompareOp.GREATER_OR_EQUAL, start_row=end_key
    ) == row_count - end_key_count


def test_jira_867_wide_rows(store):
    """testJiraTest867:1806 (HBASE-867) — numRows=10 × 2000 qualifiers,
    get + full scan, per-row cardinality and qualifier order."""
    n_rows, n_cols = 10, 2000
    t = _mk(store, "testJiraTest867", ["f"])
    rows = [f"testRow{i:02d}" for i in range(n_rows)]
    quals = [f"testQualifier{j:04d}" for j in range(n_cols)]
    t.mutate([
        Put(r).add("f", q, q) for r in rows for q in quals
    ])
    # Get the last row: every column, value == qualifier
    got = t.client().get(Get(rows[-1])).collect()
    assert len(got) == n_cols
    assert sorted((r.qualifier, r.value) for r in got) == [(q, q) for q in quals]
    # Scan all rows: 10 rows × 2000 cells, KeyValue (row, qual) order
    out = t.client().scan(Scan()).collect()
    assert len(out) == n_rows * n_cols
    per_row = {}
    for r in out:
        per_row.setdefault(r.row, []).append(r.qualifier)
    assert set(per_row) == set(rows)
    for r in rows:
        assert sorted(per_row[r]) == quals


def test_jira_861(store):
    """testJiraTest861 (HBASE-861): exact-timestamp get hits only real
    versions, before and after surrounding inserts."""
    t = _mk(store, "testJiraTest861", ["f"], versions=10)
    S, V = STAMPS, VALS
    t.mutate([Put(ROW).add("f", Q, V[3], ts=S[3]).add("f", Q, V[2], ts=S[2])
              .add("f", Q, V[4], ts=S[4])])
    check_version(t, ROW, "f", Q, S[2], V[2])
    check_version_missing(t, ROW, "f", Q, S[1])
    check_version_missing(t, ROW, "f", Q, S[5])
    # surrounding versions into a second batch (memstore/storefile mix)
    t.mutate([Put(ROW).add("f", Q, V[0], ts=S[0]).add("f", Q, V[6], ts=S[6])])
    for i in (0, 2, 3, 4, 6):
        check_version(t, ROW, "f", Q, S[i], V[i])
    for i in (1, 5):
        check_version_missing(t, ROW, "f", Q, S[i])


def test_jira_33(store):
    """testJiraTest33 (HBASE-33): get/scan all versions between two
    timestamps — [S[a], S[b]+1) returns versions a..b newest-first."""
    t = _mk(store, "testJiraTest33", ["f"], versions=10)
    S, V = STAMPS, VALS
    t.mutate([Put(ROW).add("f", Q, V[i], ts=S[i]) for i in range(6)])
    for a, b in [(0, 5), (0, 2), (4, 5), (2, 3)]:
        want = [(S[i], V[i]) for i in range(b, a - 1, -1)]
        assert get_versions(t, ROW, "f", Q, tr=(S[a], S[b] + 1)) == want
        assert scan_versions(t, ROW, "f", Q, tr=(S[a], S[b] + 1)) == want


def test_jira_1014(store):
    """testJiraTest1014 (HBASE-1014): a manual timestamp round-trips
    exactly — off-by-one gets miss."""
    t = _mk(store, "testJiraTest1014", ["f"], versions=10)
    manual = 12345
    t.mutate([Put(ROW).add("f", Q, "testValue", ts=manual)])
    check_version(t, ROW, "f", Q, manual, "testValue")
    check_version_missing(t, ROW, "f", Q, manual - 1)
    check_version_missing(t, ROW, "f", Q, manual + 1)


def test_jira_1182(store):
    """testJiraTest1182 (HBASE-1182): scan for versions > timestamp
    ([S[a+1], +inf) returns a+1..end)."""
    t = _mk(store, "testJiraTest1182", ["f"], versions=10)
    S, V = STAMPS, VALS
    t.mutate([Put(ROW).add("f", Q, V[i], ts=S[i]) for i in range(6)])
    for a in (0, 2, 4):
        want = [(S[i], V[i]) for i in range(5, a, -1)]
        tr = (S[a + 1], 2**62)
        assert get_versions(t, ROW, "f", Q, tr=tr) == want
        assert scan_versions(t, ROW, "f", Q, tr=tr) == want


def test_jira_52(store):
    """testJiraTest52 (HBASE-52): scanning over ALL versions."""
    t = _mk(store, "testJiraTest52", ["f"], versions=10)
    S, V = STAMPS, VALS
    t.mutate([Put(ROW).add("f", Q, V[i], ts=S[i]) for i in range(6)])
    want = [(S[i], V[i]) for i in range(5, -1, -1)]
    assert get_versions(t, ROW, "f", Q) == want
    assert scan_versions(t, ROW, "f", Q) == want


# ----------------------------- client/TestMultipleTimestamps.java ----

MAXV = 2**31 - 1  # Integer.MAX_VALUE table versions


def _mts_put(t, rows, cols, stamps):
    """TestMultipleTimestamps.put:438 — cross product of rows × cols ×
    timestamps, value 'value-version-<ts>'."""
    puts = []
    for r in rows:
        p = Put(f"row:{r}")
        for c in cols:
            for ts in stamps:
                p.add("event_log", f"column:{c}", f"value-version-{ts}", ts=ts)
        puts.append(p)
    t.mutate(puts)


def _mts_scan(t, rows, cols, stamps, maxv):
    """TestMultipleTimestamps.scan:417 — [row:min, row:(max+1)),
    explicit columns, time range [min(ts), max(ts)+1), maxVersions.
    Returns {row_index: [(col_index, ts), ...]} in KeyValue order."""
    scan = Scan(
        start_row=f"row:{min(rows)}", stop_row=f"row:{max(rows) + 1}",
        columns={"event_log": [f"column:{c}" for c in cols]},
        time_range=(min(stamps), max(stamps) + 1), max_versions=maxv,
    )
    out = {}
    for r in t.client().scan(scan).collect():
        assert r.value == f"value-version-{r.ts}"
        out.setdefault(int(r.row.split(":")[1]), []).append(
            (int(r.qualifier.split(":")[1]), r.ts)
        )
    return {k: sorted(v, key=lambda x: (x[0], -x[1])) for k, v in out.items()}


def _mts_get_nversions(t, r, c, versions):
    df = t.client().get(Get(
        f"row:{r}", columns={"event_log": [f"column:{c}"]},
        time_range=(min(versions), max(versions) + 1), max_versions=None,
    ))
    out = [(row.ts, row.value) for row in df.collect()]
    for ts, v in out:
        assert v == f"value-version-{ts}"
    return sorted((ts for ts, _ in out), reverse=True)


def test_mts_reseeks_one_column(store):
    """testReseeksWithOneColumnMiltipleTimestamp:82."""
    t = _mk(store, "mtsOneCol", ["event_log"], versions=MAXV)
    _mts_put(t, [1, 3, 5, 7], [1, 3, 5], [1, 2, 3, 4, 5])
    got = _mts_scan(t, [3, 5], [3], [3, 4], maxv=2)
    assert got == {3: [(3, 4), (3, 3)], 5: [(3, 4), (3, 3)]}


def test_mts_reseeks_multi_column_one_ts(store):
    """testReseeksWithMultipleColumnOneTimestamp:120."""
    t = _mk(store, "mtsMultiColOneTs", ["event_log"], versions=MAXV)
    _mts_put(t, [1, 3, 5, 7], [1, 3, 5], [1, 2, 3, 4, 5])
    got = _mts_scan(t, [3, 5], [3, 4], [3], maxv=2)
    assert got == {3: [(3, 3)], 5: [(3, 3)]}


def test_mts_reseeks_multi_column_multi_ts(store):
    """testReseeksWithMultipleColumnMultipleTimestamp:156."""
    t = _mk(store, "mtsMultiMulti", ["event_log"], versions=MAXV)
    _mts_put(t, [1, 3, 5, 7], [1, 3, 5], [1, 2, 3, 4, 5])
    got = _mts_scan(t, [5, 7], [3, 4, 5], [2, 3], maxv=2)
    want_row = [(3, 3), (3, 2), (5, 3), (5, 2)]
    assert got == {5: want_row, 7: want_row}


def test_mts_reseeks_multiple_files(store):
    """testReseeksWithMultipleFiles:199 — three put batches = three
    storefiles (each mutate commits a durable segment here, so the
    multi-file merge is exercised for real)."""
    t = _mk(store, "mtsMultiFiles", ["event_log"], versions=MAXV)
    _mts_put(t, [1, 2, 3], [2, 5, 6], [1, 2, 5])
    _mts_put(t, [6, 7], [3, 6], [4, 5])
    _mts_put(t, [2, 3, 5], [1, 2, 3], [4, 8])
    got = _mts_scan(t, [3, 5, 7], [3, 4, 5], [2, 4], maxv=5)
    assert got == {
        3: [(3, 4), (5, 2)],
        5: [(3, 4)],
        6: [(3, 4)],
        7: [(3, 4)],
    }


def test_mts_version_deletes(store):
    """testWithVersionDeletes:255/264 — both flush parameterizations
    collapse to one here (every mutate commits a segment)."""
    t = _mk(store, "mtsVersionDeletes", ["event_log"], versions=MAXV)
    _mts_put(t, [0], [0], [1, 2, 3, 4, 5])
    t.mutate([Delete("row:0").delete_column("event_log", "column:0", ts=4)])
    assert _mts_get_nversions(t, 0, 0, [2, 3, 4, 5]) == [5, 3, 2]


def test_mts_multiple_version_deletes(store):
    """testWithMultipleVersionDeletes:294 — deleteColumns(ts=4) masks
    everything at-or-before 4; [2,4) is empty."""
    t = _mk(store, "mtsMultiVersionDeletes", ["event_log"], versions=MAXV)
    _mts_put(t, [0], [0], [1, 2, 3, 4, 5])
    t.mutate([Delete("row:0").delete_columns("event_log", "column:0", ts=4)])
    assert _mts_get_nversions(t, 0, 0, [2, 3]) == []
    # ts=5 survives the tombstone (only ≤4 masked)
    assert _mts_get_nversions(t, 0, 0, [2, 5]) == [5]


def test_mts_column_deletes(store):
    """testWithColumnDeletes:317 — deleteColumns with no ts masks all
    current versions."""
    t = _mk(store, "mtsColumnDeletes", ["event_log"], versions=MAXV)
    _mts_put(t, [0], [0], [1, 2, 3, 4, 5])
    t.mutate([Delete("row:0").delete_columns("event_log", "column:0")], now=100)
    assert _mts_get_nversions(t, 0, 0, [2, 3]) == []


def test_mts_family_deletes(store):
    """testWithFamilyDeletes:340."""
    t = _mk(store, "mtsFamilyDeletes", ["event_log"], versions=MAXV)
    _mts_put(t, [0], [0], [1, 2, 3, 4, 5])
    t.mutate([Delete("row:0").delete_family("event_log")], now=100)
    assert _mts_get_nversions(t, 0, 0, [2, 3]) == []


# --------------------------------------------------------------------
# Round-5 tier 2: the simple-behavior corpus — testSuperSimple:435,
# testFilters:473, testSimpleMissing:511, testSingleRowMultipleFamily:622
# (in full, flush boundaries folded), testGet_EmptyTable:3087,
# testGet_NonExistentRow:3096, testPut:3118 (null qualifier),
# testRowsPut:3157, testHBase737:3288 (timestamp ordering),
# testListTables:3379.
# --------------------------------------------------------------------


def first_row_cells(t, scan):
    """getSingleScanResult — cells of the scan's first row, or None."""
    rows = t.client().scan(scan).collect()
    if not rows:
        return None
    first = min(r.row for r in rows)
    return {(r.family, r.qualifier, r.value) for r in rows if r.row == first}


def test_super_simple(store):
    """testSuperSimple:435 — scanning a qualifier that exists nowhere
    returns no rows."""
    t = _mk(store, "testSuperSimple", ["f"])
    t.mutate([Put(ROW).add("f", Q, "testValue")], now=100)
    assert first_row_cells(t, Scan(columns={"f": ["testSuperSimple"]})) is None


def test_filters_qualifier_regex(store):
    """testFilters:473 — QualifierFilter(EQUAL, Regex 'col[1-5]') over
    rows each holding one distinct qualifier."""
    from hbase_snapshot_spark.filters import QualifierFilter, RegexStringComparator

    t = _mk(store, "testFilters", ["f"])
    rows = [f"testRow{i}" for i in range(10)]
    quals = [f"col{i}-<d2v1>-<d3v2>" for i in range(10)]
    t.mutate([Put(r).add("f", q, "testValue")
              for r, q in zip(rows, quals)], now=100)
    out = t.client().scan(Scan(
        families=["f"],
        filter=QualifierFilter(CompareOp.EQUAL, RegexStringComparator("col[1-5]")),
    )).collect()
    got = sorted((r.row, r.qualifier) for r in out)
    assert got == [(rows[i], quals[i]) for i in range(1, 6)]


def test_simple_missing(store):
    """testSimpleMissing:511 — empty-table, around-row, and present-row
    get/scan matrix."""
    t = _mk(store, "testSimpleMissing", ["f"])
    R = [f"testRow{i}" for i in range(4)]

    # empty table: every get/scan shape returns nothing
    assert get_cells(t, R[0]) == set()
    assert get_cells(t, R[0], families=["f"]) == set()
    assert get_cells(t, R[0], columns={"f": [Q]}) == set()
    for scan in (Scan(), Scan(start_row=R[0]), Scan(start_row=R[0], stop_row=R[1]),
                 Scan(families=["f"]), Scan(columns={"f": [Q]})):
        assert first_row_cells(t, scan) is None

    # insert ROWS[2] and probe the empty space around it
    t.mutate([Put(R[2]).add("f", Q, "testValue")], now=100)
    assert get_cells(t, R[1]) == set()
    assert get_cells(t, R[0], families=["f"]) == set()
    assert get_cells(t, R[3], columns={"f": [Q]}) == set()
    assert first_row_cells(t, Scan(start_row=R[3])) is None
    assert first_row_cells(t, Scan(start_row=R[0], stop_row=R[2])) is None

    # the row itself via every shape
    want = {("f", Q, "testValue")}
    assert {(f, q, v) for f, q, _, v in get_cells(t, R[2])} == want
    assert {(f, q, v) for f, q, _, v in get_cells(t, R[2], families=["f"])} == want
    assert {(f, q, v) for f, q, _, v in get_cells(t, R[2], columns={"f": [Q]})} == want
    assert first_row_cells(t, Scan()) == want
    assert first_row_cells(t, Scan(start_row=R[0], stop_row=R[3])) == want
    assert first_row_cells(t, Scan(start_row=R[2], stop_row=R[3])) == want


def test_single_row_multiple_family(store):
    """testSingleRowMultipleFamily:622 in full — the single-column,
    multi-column, and delete phases across 10 families (flush
    boundaries folded: each mutate commits a segment, so the
    memstore/storefile re-asserts are the same read)."""
    t = _mk(store, "testSingleRowMultipleFamily", [f"testFamily{i}" for i in range(10)])
    R = [f"testRow{i}" for i in range(3)]
    F = [f"testFamily{i}" for i in range(10)]
    QU = [f"testQualifier{i}" for i in range(10)]
    V = [f"testValue{i}" for i in range(10)]

    def got(row, **kw):
        return {(f, q, v) for f, q, _, v in get_cells(t, row, **kw)}

    def scn(**kw):
        return first_row_cells(t, Scan(**kw))

    # ---- phase 1: one column in one family (:641-668)
    t.mutate([Put(R[0]).add(F[4], QU[0], V[0])], now=100)
    single = {(F[4], QU[0], V[0])}
    # getVerifySingleColumn:2465 — every get shape lands on the one cell
    assert got(R[0]) == single
    assert got(R[0], families=[F[4]]) == single
    assert got(R[0], families=[F[2], F[4], F[6]]) == single
    assert got(R[0], columns={F[4]: [QU[0]]}) == single
    # addColumn(F4, QU1) THEN addFamily(F4): addFamily overwrites the
    # qualifier restriction with the wildcard null set (Scan.java:178,
    # getVerifySingleColumn:2499) — whole family comes back
    assert first_row_cells(
        t, Scan(start_row=R[0]).add_column(F[4], QU[1]).add_family(F[4])
    ) == single
    assert got(R[0], families=[F[3], F[4], F[5], F[6]],
               columns={F[5]: [QU[1]], F[2]: [QU[1]]}) == single
    # scanVerifySingleColumn:2523
    assert scn() == single
    assert scn(start_row=R[0]) == single
    assert scn(start_row=R[0], stop_row=R[1]) == single
    assert scn(stop_row=R[1]) == single
    assert scn(families=[F[4]]) == single
    assert scn(columns={F[4]: [QU[0]]}) == single
    # scanVerifySingleColumn:2565 — addColumn then addFamily widens
    assert first_row_cells(
        t, Scan().add_column(F[4], QU[1]).add_family(F[4])
    ) == single
    # :2573 — columns on neighbor families + wildcard family elsewhere
    assert scn(columns={F[3]: [QU[1]], F[4]: [QU[0]]}, families=[F[5]]) == single
    # getVerifySingleEmpty:2583 / scanVerifySingleEmpty:2614
    assert got(R[0], columns={F[4]: [QU[1]]}) == set()
    assert got(R[0], columns={F[4]: [QU[2]]}) == set()
    assert got(R[0], families=[F[3], F[5]], columns={F[4]: [QU[2]]}) == set()
    assert got(R[1]) == set()
    assert scn(start_row=R[1]) is None
    assert scn(start_row=R[1], stop_row=R[2]) is None
    assert scn(stop_row=R[0]) is None
    assert scn(columns={F[4]: [QU[1]]}, families=[F[3]]) is None

    # ---- phase 2: multiple columns across families (:674-699)
    t.mutate([Put(R[0]).add(F[2], QU[2], V[2]).add(F[2], QU[4], V[4])
              .add(F[4], QU[4], V[4]).add(F[6], QU[6], V[6])
              .add(F[6], QU[7], V[7]).add(F[7], QU[7], V[7])
              .add(F[9], QU[0], V[0])], now=200)
    # singleRowGetTest:2265 / singleRowScanTest:2363
    assert got(R[0], columns={F[4]: [QU[0]]}) == single
    assert got(R[0], columns={F[2]: [QU[2]]}) == {(F[2], QU[2], V[2])}
    assert got(R[0], families=[F[7]]) == {(F[7], QU[7], V[7])}
    both4 = {(F[4], QU[0], V[0]), (F[4], QU[4], V[4])}
    assert got(R[0], families=[F[4]]) == both4
    assert got(R[0], columns={F[4]: [QU[0], QU[4]]}) == both4
    assert got(R[0], families=[F[4], F[7]]) == both4 | {(F[7], QU[7], V[7])}
    many = {(F[2], QU[2], V[2]), (F[2], QU[4], V[4]), (F[4], QU[0], V[0]),
            (F[4], QU[4], V[4]), (F[6], QU[6], V[6]), (F[6], QU[7], V[7]),
            (F[7], QU[7], V[7])}
    assert got(R[0], families=[F[2], F[4], F[6], F[7]]) == many
    assert got(R[0], columns={F[2]: [QU[2], QU[4]], F[4]: [QU[0], QU[4]],
                              F[6]: [QU[6], QU[7]], F[7]: [QU[7], QU[8]]}) == many
    assert got(R[0]) == many | {(F[9], QU[0], V[0])}
    assert got(R[1]) == set()
    assert got(R[0], columns={F[4]: [QU[3]], F[2]: [QU[3]]}) == set()
    assert scn(columns={F[4]: [QU[0]]}) == single
    assert scn(families=[F[4], F[7]]) == both4 | {(F[7], QU[7], V[7])}
    assert scn() == many | {(F[9], QU[0], V[0])}
    assert scn(start_row=R[1]) is None
    assert scn(columns={F[4]: [QU[3]], F[2]: [QU[3]]}) is None

    # ---- phase 3: more data, then the delete ladder (:700-921)
    t.mutate([Put(R[0]).add(F[6], QU[5], V[5]).add(F[6], QU[8], V[8])
              .add(F[6], QU[9], V[9]).add(F[4], QU[3], V[3])], now=300)
    # delete a "storefile" column
    t.mutate([Delete(R[0]).delete_columns(F[6], QU[7])], now=400)
    assert got(R[0], columns={F[6]: [QU[7]]}) == set()
    assert scn(columns={F[6]: [QU[7]]}) is None
    assert got(R[0], columns={F[6]: [QU[6]]}) == {(F[6], QU[6], V[6])}
    assert got(R[0], columns={F[6]: [QU[8]]}) == {(F[6], QU[8], V[8])}
    assert scn(columns={F[6]: [QU[6]]}) == {(F[6], QU[6], V[6])}
    assert scn(columns={F[6]: [QU[8]]}) == {(F[6], QU[8], V[8])}
    # delete a "memstore" column
    t.mutate([Delete(R[0]).delete_columns(F[6], QU[8])], now=500)
    assert got(R[0], columns={F[6]: [QU[8]]}) == set()
    assert scn(columns={F[6]: [QU[8]]}) is None
    assert got(R[0], columns={F[6]: [QU[6]]}) == {(F[6], QU[6], V[6])}
    assert got(R[0], columns={F[6]: [QU[9]]}) == {(F[6], QU[9], V[9])}
    # delete joint family
    t.mutate([Delete(R[0]).delete_family(F[4])], now=600)
    assert got(R[0], columns={F[4]: [QU[4]]}) == set()
    assert got(R[0], columns={F[4]: [QU[3]]}) == set()
    assert got(R[0], families=[F[4]]) == set()
    assert scn(columns={F[4]: [QU[4]]}) is None
    assert scn(columns={F[4]: [QU[3]]}) is None
    assert scn(families=[F[4]]) is None
    # other families still intact (asserted twice in the reference —
    # pre- and post-flush; one read here covers both)
    assert got(R[0], columns={F[2]: [QU[2]]}) == {(F[2], QU[2], V[2])}
    assert got(R[0], columns={F[6]: [QU[9]]}) == {(F[6], QU[9], V[9])}
    assert scn(columns={F[6]: [QU[6]]}) == {(F[6], QU[6], V[6])}
    assert scn(columns={F[6]: [QU[9]]}) == {(F[6], QU[9], V[9])}


def test_get_empty_table_and_nonexistent_row(store):
    """testGet_EmptyTable:3087 + testGet_NonExistentRow:3096."""
    t = _mk(store, "testGetEmptyTable", ["f"])
    assert get_cells(t, ROW) == set()
    t.mutate([Put(ROW).add("f", Q, "testValue")], now=100)
    assert get_cells(t, ROW, families=["f"]) != set()
    assert get_cells(t, "missingrow", families=["f"]) == set()


def test_put_null_qualifier(store):
    """testPut:3118 — a null qualifier is the empty qualifier; the cell
    round-trips and scans under addColumn(family, null)."""
    t = _mk(store, "testPut", ["contents", "smallfam"])
    t.mutate([Put("row1").add("contents", None, "abcd"),
              Put("row2").add("contents", None, "abcd")], now=100)
    out = t.client().scan(Scan(columns={"contents": [None]})).collect()
    assert sorted((r.row, r.qualifier or "", r.value) for r in out) == [
        ("row1", "", "abcd"), ("row2", "", "abcd")
    ]


def test_rows_put_batch(store):
    """testRowsPut:3157 — a 10-Put batch lands as 10 rows."""
    t = _mk(store, "testRowsPut", ["contents", "smallfam"])
    t.mutate([Put(f"row{i}").add("contents", None, "abcd")
              for i in range(10)], now=100)
    out = t.client().scan(Scan(families=["contents"]))
    assert out.select("row").distinct().count() == 10


def test_hbase_737_timestamp_ordering(store):
    """testHBase737:3288 — three sequential single-cell puts get
    strictly increasing server timestamps, visible in KeyValue order."""
    t = _mk(store, "testHBase737", ["fam1", "fam2"])
    t.mutate([Put(ROW).add("fam1", "letters", "abcdefg")])
    t.mutate([Put(ROW).add("fam1", "numbers", "123456")])
    t.mutate([Put(ROW).add("fam2", "letters", "hijklmnop")])
    out = t.client().scan(Scan(families=["fam1", "fam2"], max_versions=1)).collect()
    cells = sorted(((r.family, r.qualifier, r.ts) for r in out))
    assert [(c[0], c[1]) for c in cells] == [
        ("fam1", "letters"), ("fam1", "numbers"), ("fam2", "letters")
    ]
    times = [c[2] for c in cells]
    assert times[0] < times[1] < times[2]


def test_list_tables(store):
    """testListTables:3379 — created tables appear in the admin list."""
    for name in ("testListTables1", "testListTables2", "testListTables3"):
        _mk(store, name, ["f"])
    listed = set(store.list_tables())
    assert {"testListTables1", "testListTables2", "testListTables3"} <= listed


def test_weird_cache_behaviour(store):
    """testWeirdCacheBehaviour:136 — Prefix + SCVF(filterIfMissing)
    matching after overwrite, then latest-version deleteColumn makes
    the SCVF see the OLD value again → zero matches."""
    from hbase_snapshot_spark.filters import (
        FilterList, PrefixFilter, SingleColumnValueFilter,
    )

    fams = ["trans-blob", "trans-type", "trans-date", "trans-tags", "trans-group"]
    t = _mk(store, "testWeirdCacheBehaviour", fams)
    value, value2 = "this is the value", "this is some other value"
    prefixes = ["pref-a", "pref-b", "pref-c"]

    def put_rows(val, now):
        puts = []
        for kp in prefixes:
            for i in range(3):
                puts.append(
                    Put(f"{kp}_{i:02d}")
                    .add("trans-blob", None, "value for blob")
                    .add("trans-type", None, "statement")
                    .add("trans-date", None, "20090921010101999")
                    .add("trans-tags", "qual2", val)
                    .add("trans-group", None, "adhocTransactionGroupId")
                )
        t.mutate(puts, now=now)

    def matching_rows(kp, val):
        flt = FilterList(FilterList.MUST_PASS_ALL, [
            PrefixFilter(kp),
            SingleColumnValueFilter(
                "trans-tags", "qual2", CompareOp.EQUAL, val,
                filter_if_missing=True,
            ),
        ])
        df = t.client().scan(Scan(families=fams, filter=flt))
        return sorted(r.row for r in df.select("row").distinct().collect())

    put_rows(value, now=100)   # first write ("flushCommits" boundary folded)
    put_rows(value2, now=200)  # overwrite with value2
    for kp in prefixes:
        assert len(matching_rows(kp, value2)) == 3
    # deleteColumns helper (:183): per matched row, deleteColumn LATEST
    # of trans-tags:qual2 — removes the value2 version, exposing value
    for kp in prefixes:
        rows = matching_rows(kp, value2)
        assert len(rows) == 3
        t.mutate([Delete(r).delete_column("trans-tags", "qual2") for r in rows],
                 now=300)
    for kp in prefixes:
        assert matching_rows(kp, value2) == []
    # the older value is what the SCVF (latestVersionOnly) sees now
    for kp in prefixes:
        assert len(matching_rows(kp, value)) == 3


def test_misc_htable_stuff(store):
    """testMiscHTableStuff:3408 — scan-copy table A→B preserving
    timestamps, then disable + modifyTable with user metadata on HTD
    and every HCD + enable, verifying the attributes round-trip."""
    a = _mk(store, "testMiscHTableStuffA", ["info"])
    b = _mk(store, "testMiscHTableStuffB", ["info"])
    a.mutate([Put(ROW).add("info", None, "value")], now=100)

    # copy A → B via scan, preserving cell timestamps (put.add(kv))
    rows = a.client().scan(Scan(families=["info"])).collect()
    puts = {}
    for r in rows:
        puts.setdefault(r.row, Put(r.row)).add(r.family, r.qualifier, r.value,
                                               ts=r.ts)
    b.mutate(list(puts.values()))
    got = {(f, q, ts, v) for f, q, ts, v in get_cells(b, ROW, families=["info"])}
    assert got == {("info", "", 100, "value")}

    # disable → modifyTable(desc with user attrs) → enable (:3451-3464)
    a.disable()
    desc = a.descriptor
    desc.set_value("TESTATTR", "somevalue")
    for fam in desc.families.values():
        fam.set_value("TESTATTR", "somevalue")
    a.alter(desc)
    a.enable()

    # attribute changes persisted through the manifest (:3466-3482)
    fresh = store.table("testMiscHTableStuffA").descriptor
    assert fresh.name == "testMiscHTableStuffA"
    assert fresh.get_value("TESTATTR") == "somevalue"
    for fam in fresh.families.values():
        assert fam.get_value("TESTATTR") == "somevalue"


def test_scan_variable_reuse():
    """testScanVariableReuse:3538 (HBASE-2156) + the Scan.java:170-201
    builder override contract: addFamily overrides addColumn for the
    family (wildcard null set); addColumn overrides addFamily
    (restriction set)."""
    s = Scan().add_family("f").add_column("f", ROW)
    assert s.columns == {"f": [ROW]}          # familyMap.get(F).size() == 1
    s = Scan().add_family("f")
    assert s.columns is None and s.families == ["f"]  # wildcard
    # and the widening direction: addColumn then addFamily → wildcard
    s = Scan().add_column("f", ROW).add_family("f")
    assert s.columns is None and s.families == ["f"]
    # override is PER family — other families' restrictions survive,
    # and the effective read set is every familyMap key
    s = Scan().add_column("f", ROW).add_column("g", ROW).add_family("f")
    assert s.columns == {"g": [ROW]}
    assert set(s.to_spec().families) == {"f", "g"}
