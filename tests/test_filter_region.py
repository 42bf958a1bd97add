"""Case-for-case port of filter/TestFilter.java:169-1197 — the filter
corpus "at the HRegion doorstep": the two-group fixture (rows/
qualifiers/values One and Two, families crossed over a flush boundary,
second qualifier and second rows deleted), then every filter exercised
against it with exact row/key counts and full KeyValue-order checks.

Mapping notes:
- ``region.flushcache()`` = segment boundary (separate mutate batch).
- verifyScan / verifyScanNoEarlyOut both reduce to "N rows, K cells
  per row" here — the early-out distinction is a scanner-internal
  optimization with no read-result effect in this engine.
- verifyScanFull compares (row, family, qualifier, value) in full
  KeyValue order (row asc, family asc, qualifier asc).
"""

import pytest

from hbase_snapshot_spark.client import Scan
from hbase_snapshot_spark.filters import (
    BinaryComparator,
    ColumnPaginationFilter,
    CompareOp,
    FilterList,
    FirstKeyOnlyFilter,
    InclusiveStopFilter,
    PageFilter,
    PrefixFilter,
    QualifierFilter,
    RegexStringComparator,
    RowFilter,
    SingleColumnValueFilter,
    SkipFilter,
    SubstringComparator,
    ValueFilter,
    WhileMatchFilter,
)
from hbase_snapshot_spark.model import FamilyDescriptor, TableDescriptor
from hbase_snapshot_spark.table import Delete, Put, TableStore

ROWS_ONE = [f"testRowOne-{i}" for i in range(4)]
ROWS_TWO = [f"testRowTwo-{i}" for i in range(4)]
FAMILIES = ["testFamilyOne", "testFamilyTwo"]
QUALS_ONE = [f"testQualifierOne-{i}" for i in range(4)]
QUALS_TWO = [f"testQualifierTwo-{i}" for i in range(4)]
VALUES = ["testValueOne", "testValueTwo"]

NUM_ROWS = 6       # 8 - the two deleted rows
COLS_PER_ROW = 6   # 2 families x (4 - 1 deleted) qualifiers


def _build(store, name="testfilter"):
    """TestFilter.setUp:90-166 — the exact fixture state."""
    desc = TableDescriptor(name)
    for f in FAMILIES:
        desc.add_family(FamilyDescriptor(f, max_versions=3))
    t = store.create_table(desc)

    # first half: group one rows under family one, group two under two
    t.mutate(
        [Put(r).add(FAMILIES[0], q, VALUES[0])
         for r in ROWS_ONE for q in QUALS_ONE]
        + [Put(r).add(FAMILIES[1], q, VALUES[1])
           for r in ROWS_TWO for q in QUALS_TWO],
        now=100,
    )
    # flush, then second half with families reversed
    t.mutate(
        [Put(r).add(FAMILIES[1], q, VALUES[0])
         for r in ROWS_ONE for q in QUALS_ONE]
        + [Put(r).add(FAMILIES[0], q, VALUES[1])
           for r in ROWS_TWO for q in QUALS_TWO],
        now=101,
    )
    # delete the second qualifier from all rows and families
    t.mutate(
        [Delete(r).delete_columns(FAMILIES[0], QUALS_ONE[1])
         .delete_columns(FAMILIES[1], QUALS_ONE[1]) for r in ROWS_ONE]
        + [Delete(r).delete_columns(FAMILIES[0], QUALS_TWO[1])
           .delete_columns(FAMILIES[1], QUALS_TWO[1]) for r in ROWS_TWO],
        now=102,
    )
    # delete the second rows from both groups, one column at a time
    d1 = Delete(ROWS_ONE[1])
    for q in QUALS_ONE:
        d1.delete_columns(FAMILIES[0], q).delete_columns(FAMILIES[1], q)
    d2 = Delete(ROWS_TWO[1])
    for q in QUALS_TWO:
        d2.delete_columns(FAMILIES[0], q).delete_columns(FAMILIES[1], q)
    t.mutate([d1, d2], now=103)
    return t


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    store = TableStore(spark, str(tmp_path_factory.mktemp("filterreg")))
    return _build(store)


def _collect(t, scan):
    rows = t.client().scan(scan).collect()
    return sorted(rows, key=lambda r: (r.row, r.family, r.qualifier))


def verify_scan(t, scan, expected_rows, expected_keys):
    """verifyScan/verifyScanNoEarlyOut:~1200 — N rows, K cells each."""
    by_row: dict = {}
    for c in _collect(t, scan):
        by_row.setdefault(c.row, []).append(c)
    assert len(by_row) == expected_rows, sorted(by_row)
    for r, cells in by_row.items():
        assert len(cells) == expected_keys, (r, len(cells))


def verify_scan_full(t, scan, kvs):
    """verifyScanFull — exact (row, family, qualifier, value) order."""
    got = [(c.row, c.family, c.qualifier, c.value) for c in _collect(t, scan)]
    assert got == kvs


def row_kvs(row, quals, value, families=FAMILIES):
    return [(row, f, q, value) for f in families for q in quals]


# --------------------------------------------------------- testNoFilter:169


def test_no_filter(table):
    verify_scan(table, Scan(), NUM_ROWS, COLS_PER_ROW)
    verify_scan(table, Scan(families=[FAMILIES[0]]), NUM_ROWS, COLS_PER_ROW // 2)


# ----------------------------------------------------- testPrefixFilter:184


def test_prefix_filter(table):
    verify_scan(table, Scan(filter=PrefixFilter("testRowOne")),
                NUM_ROWS // 2, COLS_PER_ROW)


# ------------------------------------------------------- testPageFilter:193


def test_page_filter(table):
    live_quals_one = [QUALS_ONE[0], QUALS_ONE[2], QUALS_ONE[3]]
    live_quals_two = [QUALS_TWO[0], QUALS_TWO[2], QUALS_TWO[3]]
    all_kvs = (
        row_kvs(ROWS_ONE[0], live_quals_one, VALUES[0])
        + row_kvs(ROWS_ONE[2], live_quals_one, VALUES[0])
        + row_kvs(ROWS_ONE[3], live_quals_one, VALUES[0])
        + row_kvs(ROWS_TWO[0], live_quals_two, VALUES[1])
        + row_kvs(ROWS_TWO[2], live_quals_two, VALUES[1])
        + row_kvs(ROWS_TWO[3], live_quals_two, VALUES[1])
    )
    for pages in (6, 4, 2, 1):
        verify_scan(table, Scan(filter=PageFilter(pages)), pages, COLS_PER_ROW)
        verify_scan_full(table, Scan(filter=PageFilter(pages)),
                         all_kvs[: pages * COLS_PER_ROW])


# -------------------------------- testWhileMatchFilterWith{Row,RowKey,KV}:288


def test_while_match_filter_with_filter_row(table):
    """WhileMatch(PageFilter(4)) stops after the page (HBASE-2258)."""
    verify_scan(table, Scan(filter=WhileMatchFilter(PageFilter(4))),
                4, COLS_PER_ROW)


def test_while_match_filter_with_filter_row_key(table):
    """WhileMatch(PrefixFilter): stops at the first non-matching row."""
    verify_scan(
        table,
        Scan(filter=WhileMatchFilter(PrefixFilter("testRowOne"))),
        NUM_ROWS // 2, COLS_PER_ROW,
    )


def test_while_match_filter_with_filter_key_value(table):
    """WhileMatch(SCVF != any row): the first row fails, nothing emits."""
    f = WhileMatchFilter(SingleColumnValueFilter(
        FAMILIES[0], QUALS_ONE[0], CompareOp.EQUAL, "foo"))
    assert table.client().scan(Scan(filter=f)).count() == 0


# ---------------------------------------------- testInclusiveStopFilter:366


def test_inclusive_stop_filter(table):
    # [start, stop) loses the stop row
    verify_scan(table, Scan(start_row=ROWS_ONE[0], stop_row=ROWS_ONE[3]),
                NUM_ROWS // 2 - 1, COLS_PER_ROW)
    # inclusive stop keeps it
    verify_scan(
        table,
        Scan(start_row=ROWS_ONE[0], filter=InclusiveStopFilter(ROWS_ONE[3])),
        NUM_ROWS // 2, COLS_PER_ROW,
    )
    verify_scan(table, Scan(start_row=ROWS_TWO[0], stop_row=ROWS_TWO[3]),
                NUM_ROWS // 2 - 1, COLS_PER_ROW)
    verify_scan(
        table,
        Scan(start_row=ROWS_TWO[0], filter=InclusiveStopFilter(ROWS_TWO[3])),
        NUM_ROWS // 2, COLS_PER_ROW,
    )


# ------------------------------------------------- testQualifierFilter:400


def test_qualifier_filter(table):
    cases = [
        (CompareOp.EQUAL, BinaryComparator(QUALS_ONE[2]), None, 3, 2),
        (CompareOp.LESS, BinaryComparator(QUALS_ONE[2]), None, 3, 2),
        (CompareOp.LESS_OR_EQUAL, BinaryComparator(QUALS_ONE[2]), None, 3, 4),
        # the NOT_EQUAL / GREATER* cases restrict to group one rows
        (CompareOp.NOT_EQUAL, BinaryComparator(QUALS_ONE[2]), "testRowTwo", 3, 4),
        (CompareOp.GREATER_OR_EQUAL, BinaryComparator(QUALS_ONE[2]),
         "testRowTwo", 3, 4),
        (CompareOp.GREATER, BinaryComparator(QUALS_ONE[2]), "testRowTwo", 3, 2),
    ]
    for op, cmp_, stop, rows, keys in cases:
        s = Scan(stop_row=stop, filter=QualifierFilter(op, cmp_))
        verify_scan(table, s, rows, keys)

    # NOT_EQUAL across all rows: 4 keys in group one, 6 in group two
    s = Scan(filter=QualifierFilter(
        CompareOp.NOT_EQUAL, BinaryComparator(QUALS_ONE[2])))
    kvs = (
        row_kvs(ROWS_ONE[0], [QUALS_ONE[0], QUALS_ONE[3]], VALUES[0])
        + row_kvs(ROWS_ONE[2], [QUALS_ONE[0], QUALS_ONE[3]], VALUES[0])
        + row_kvs(ROWS_ONE[3], [QUALS_ONE[0], QUALS_ONE[3]], VALUES[0])
        + row_kvs(ROWS_TWO[0], [QUALS_TWO[0], QUALS_TWO[2], QUALS_TWO[3]], VALUES[1])
        + row_kvs(ROWS_TWO[2], [QUALS_TWO[0], QUALS_TWO[2], QUALS_TWO[3]], VALUES[1])
        + row_kvs(ROWS_TWO[3], [QUALS_TWO[0], QUALS_TWO[2], QUALS_TWO[3]], VALUES[1])
    )
    verify_scan_full(table, s, kvs)

    # regex NOT_EQUAL "test.+-2": 4 keys per row across both groups
    s = Scan(filter=QualifierFilter(
        CompareOp.NOT_EQUAL, RegexStringComparator("test.+-2")))
    kvs = (
        row_kvs(ROWS_ONE[0], [QUALS_ONE[0], QUALS_ONE[3]], VALUES[0])
        + row_kvs(ROWS_ONE[2], [QUALS_ONE[0], QUALS_ONE[3]], VALUES[0])
        + row_kvs(ROWS_ONE[3], [QUALS_ONE[0], QUALS_ONE[3]], VALUES[0])
        + row_kvs(ROWS_TWO[0], [QUALS_TWO[0], QUALS_TWO[3]], VALUES[1])
        + row_kvs(ROWS_TWO[2], [QUALS_TWO[0], QUALS_TWO[3]], VALUES[1])
        + row_kvs(ROWS_TWO[3], [QUALS_TWO[0], QUALS_TWO[3]], VALUES[1])
    )
    verify_scan_full(table, s, kvs)


# ------------------------------------------------------- testRowFilter:557


def test_row_filter(table):
    cases = [
        (CompareOp.EQUAL, BinaryComparator(ROWS_ONE[2]), 1),
        (CompareOp.EQUAL, RegexStringComparator("testRow.+-2"), 2),
        (CompareOp.LESS, BinaryComparator(ROWS_ONE[2]), 1),
        (CompareOp.LESS_OR_EQUAL, BinaryComparator(ROWS_ONE[2]), 2),
        (CompareOp.NOT_EQUAL, BinaryComparator(ROWS_ONE[2]), NUM_ROWS - 1),
        (CompareOp.GREATER_OR_EQUAL, BinaryComparator(ROWS_ONE[2]), NUM_ROWS - 1),
        (CompareOp.GREATER, BinaryComparator(ROWS_ONE[2]), NUM_ROWS - 2),
        (CompareOp.EQUAL, RegexStringComparator(".+-2"), 2),
    ]
    for op, cmp_, rows in cases:
        verify_scan(table, Scan(filter=RowFilter(op, cmp_)), rows, COLS_PER_ROW)

    live_one = [QUALS_ONE[0], QUALS_ONE[2], QUALS_ONE[3]]
    live_two = [QUALS_TWO[0], QUALS_TWO[2], QUALS_TWO[3]]
    # NOT_EQUAL full KeyValue order
    s = Scan(filter=RowFilter(CompareOp.NOT_EQUAL, BinaryComparator(ROWS_ONE[2])))
    kvs = (
        row_kvs(ROWS_ONE[0], live_one, VALUES[0])
        + row_kvs(ROWS_ONE[3], live_one, VALUES[0])
        + row_kvs(ROWS_TWO[0], live_two, VALUES[1])
        + row_kvs(ROWS_TWO[2], live_two, VALUES[1])
        + row_kvs(ROWS_TWO[3], live_two, VALUES[1])
    )
    verify_scan_full(table, s, kvs)

    # regex EQUAL ".+-2" full order: both -2 rows
    s = Scan(filter=RowFilter(CompareOp.EQUAL, RegexStringComparator(".+-2")))
    kvs = (row_kvs(ROWS_ONE[2], live_one, VALUES[0])
           + row_kvs(ROWS_TWO[2], live_two, VALUES[1]))
    verify_scan_full(table, s, kvs)


# ----------------------------------------------------- testValueFilter:703


def test_value_filter(table):
    cases = [
        (CompareOp.EQUAL, BinaryComparator(VALUES[0]), 3, 6),
        (CompareOp.EQUAL, BinaryComparator(VALUES[1]), 3, 6),
        (CompareOp.EQUAL, RegexStringComparator("testValue((One)|(Two))"), 6, 6),
        (CompareOp.LESS, BinaryComparator(VALUES[1]), 3, 6),
        (CompareOp.LESS_OR_EQUAL, BinaryComparator(VALUES[1]), 6, 6),
        (CompareOp.LESS_OR_EQUAL, BinaryComparator(VALUES[0]), 3, 6),
        (CompareOp.NOT_EQUAL, BinaryComparator(VALUES[0]), 3, 6),
        (CompareOp.GREATER_OR_EQUAL, BinaryComparator(VALUES[0]), 6, 6),
        (CompareOp.GREATER, BinaryComparator(VALUES[0]), 3, 6),
    ]
    for op, cmp_, rows, keys in cases:
        verify_scan(table, Scan(filter=ValueFilter(op, cmp_)), rows, keys)

    # NOT_EQUAL One: all keys of all group-two rows, full order
    live_two = [QUALS_TWO[0], QUALS_TWO[2], QUALS_TWO[3]]
    s = Scan(filter=ValueFilter(CompareOp.NOT_EQUAL, BinaryComparator(VALUES[0])))
    kvs = (row_kvs(ROWS_TWO[0], live_two, VALUES[1])
           + row_kvs(ROWS_TWO[2], live_two, VALUES[1])
           + row_kvs(ROWS_TWO[3], live_two, VALUES[1]))
    verify_scan_full(table, s, kvs)


# ------------------------------------------------------ testSkipFilter:826


def test_skip_filter(table):
    """Skip(Qualifier != Q1[2]): any row CONTAINING Q1[2] is skipped
    whole — only group-two rows survive, with all their keys."""
    live_two = [QUALS_TWO[0], QUALS_TWO[2], QUALS_TWO[3]]
    s = Scan(filter=SkipFilter(QualifierFilter(
        CompareOp.NOT_EQUAL, BinaryComparator(QUALS_ONE[2]))))
    kvs = (row_kvs(ROWS_TWO[0], live_two, VALUES[1])
           + row_kvs(ROWS_TWO[2], live_two, VALUES[1])
           + row_kvs(ROWS_TWO[3], live_two, VALUES[1]))
    verify_scan_full(table, s, kvs)


# ------------------------------------------------------ testFilterList:863


def test_filter_list(table):
    # MUST_PASS_ALL of row/qualifier/value regex+substring: single kv
    f = FilterList(FilterList.MUST_PASS_ALL, [
        RowFilter(CompareOp.EQUAL, RegexStringComparator(".+-2")),
        QualifierFilter(CompareOp.EQUAL, RegexStringComparator(".+-2")),
        ValueFilter(CompareOp.EQUAL, SubstringComparator("One")),
    ])
    s = Scan(families=[FAMILIES[0]], filter=f)
    verify_scan_full(table, s,
                     [(ROWS_ONE[2], FAMILIES[0], QUALS_ONE[2], VALUES[0])])

    # MUST_PASS_ONE: everything passes
    f = FilterList(FilterList.MUST_PASS_ONE, [
        RowFilter(CompareOp.EQUAL, RegexStringComparator(".+Two.+")),
        QualifierFilter(CompareOp.EQUAL, RegexStringComparator(".+-2")),
        ValueFilter(CompareOp.EQUAL, SubstringComparator("One")),
    ])
    verify_scan(table, Scan(filter=f), NUM_ROWS, COLS_PER_ROW)


# ---------------------------------------------- testFirstKeyOnlyFilter:895


def test_first_key_only_filter(table):
    s = Scan(filter=FirstKeyOnlyFilter())
    kvs = [
        (ROWS_ONE[0], FAMILIES[0], QUALS_ONE[0], VALUES[0]),
        (ROWS_ONE[2], FAMILIES[0], QUALS_ONE[0], VALUES[0]),
        (ROWS_ONE[3], FAMILIES[0], QUALS_ONE[0], VALUES[0]),
        (ROWS_TWO[0], FAMILIES[0], QUALS_TWO[0], VALUES[1]),
        (ROWS_TWO[2], FAMILIES[0], QUALS_TWO[0], VALUES[1]),
        (ROWS_TWO[3], FAMILIES[0], QUALS_TWO[0], VALUES[1]),
    ]
    verify_scan_full(table, s, kvs)


# ------------------------------------------ testSingleColumnValueFilter:910


def test_single_column_value_filter(spark, tmp_path):
    """HBASE-1821 + the filterIfMissing matrix (fresh table — this
    method mutates the fixture)."""
    store = TableStore(spark, str(tmp_path / "scvftest"))
    t = _build(store, "scvf")
    # change one group-one column to the group-two value
    t.mutate([Put(ROWS_ONE[2]).add(FAMILIES[0], QUALS_ONE[2], VALUES[1])],
             now=200)

    f = FilterList(FilterList.MUST_PASS_ALL, [
        SingleColumnValueFilter(FAMILIES[0], QUALS_ONE[0],
                                CompareOp.EQUAL, VALUES[0]),
        SingleColumnValueFilter(FAMILIES[0], QUALS_ONE[2],
                                CompareOp.EQUAL, VALUES[1]),
    ])
    s = Scan(start_row=ROWS_ONE[0], stop_row=ROWS_TWO[0],
             families=[FAMILIES[0]], filter=f)
    kvs = [
        (ROWS_ONE[2], FAMILIES[0], QUALS_ONE[0], VALUES[0]),
        (ROWS_ONE[2], FAMILIES[0], QUALS_ONE[2], VALUES[1]),
        (ROWS_ONE[2], FAMILIES[0], QUALS_ONE[3], VALUES[0]),
    ]
    verify_scan(t, s, 1, 3)
    verify_scan_full(t, s, kvs)

    # the filterIfMissing matrix on fresh rowThree-* rows
    rows3 = [f"rowThree-{i}" for i in range(4)]
    t.mutate([
        Put(rows3[0]).add(FAMILIES[0], QUALS_ONE[0], VALUES[0]),
        Put(rows3[1]).add(FAMILIES[0], QUALS_ONE[0], VALUES[1]),
        Put(rows3[2]).add(FAMILIES[0], QUALS_ONE[1], VALUES[0]),
        Put(rows3[3]).add(FAMILIES[0], QUALS_ONE[1], VALUES[1]),
    ], now=210)

    def scan3(scvf):
        return Scan(start_row=rows3[0], stop_row="rowThree-4",
                    families=[FAMILIES[0]], filter=scvf)

    # filterIfMissing=False: rows lacking the column pass → rows 0, 2, 3
    scvf = SingleColumnValueFilter(FAMILIES[0], QUALS_ONE[0],
                                   CompareOp.EQUAL, VALUES[0])
    verify_scan_full(t, scan3(scvf), [
        (rows3[0], FAMILIES[0], QUALS_ONE[0], VALUES[0]),
        (rows3[2], FAMILIES[0], QUALS_ONE[1], VALUES[0]),
        (rows3[3], FAMILIES[0], QUALS_ONE[1], VALUES[1]),
    ])

    # filterIfMissing=True: only row 0
    scvf = SingleColumnValueFilter(FAMILIES[0], QUALS_ONE[0],
                                   CompareOp.EQUAL, VALUES[0],
                                   filter_if_missing=True)
    verify_scan_full(t, scan3(scvf),
                     [(rows3[0], FAMILIES[0], QUALS_ONE[0], VALUES[0])])

    # match V1 against Q1[1] with filterIfMissing=True: only row 3
    scvf = SingleColumnValueFilter(FAMILIES[0], QUALS_ONE[1],
                                   CompareOp.EQUAL, VALUES[1],
                                   filter_if_missing=True)
    verify_scan_full(t, scan3(scvf),
                     [(rows3[3], FAMILIES[0], QUALS_ONE[1], VALUES[1])])


# ------------------------------------------- testColumnPaginationFilter:1108


def test_column_pagination_filter(table):
    # page 1, size 1 (limit 1, offset 0): first column of each row
    kvs1 = [
        (ROWS_ONE[0], FAMILIES[0], QUALS_ONE[0], VALUES[0]),
        (ROWS_ONE[2], FAMILIES[0], QUALS_ONE[0], VALUES[0]),
        (ROWS_ONE[3], FAMILIES[0], QUALS_ONE[0], VALUES[0]),
        (ROWS_TWO[0], FAMILIES[0], QUALS_TWO[0], VALUES[1]),
        (ROWS_TWO[2], FAMILIES[0], QUALS_TWO[0], VALUES[1]),
        (ROWS_TWO[3], FAMILIES[0], QUALS_TWO[0], VALUES[1]),
    ]
    s = Scan(filter=ColumnPaginationFilter(1, 0))
    verify_scan(table, s, NUM_ROWS, 1)
    verify_scan_full(table, s, kvs1)

    # page 3, size 1 (limit 1, offset 2): third live column = F0:Q[3]
    kvs2 = [
        (ROWS_ONE[0], FAMILIES[0], QUALS_ONE[3], VALUES[0]),
        (ROWS_ONE[2], FAMILIES[0], QUALS_ONE[3], VALUES[0]),
        (ROWS_ONE[3], FAMILIES[0], QUALS_ONE[3], VALUES[0]),
        (ROWS_TWO[0], FAMILIES[0], QUALS_TWO[3], VALUES[1]),
        (ROWS_TWO[2], FAMILIES[0], QUALS_TWO[3], VALUES[1]),
        (ROWS_TWO[3], FAMILIES[0], QUALS_TWO[3], VALUES[1]),
    ]
    s = Scan(filter=ColumnPaginationFilter(1, 2))
    verify_scan(table, s, NUM_ROWS, 1)
    verify_scan_full(table, s, kvs2)

    # page 2, size 2 (limit 2, offset 2): columns 3 and 4 per row
    kvs3 = []
    for rows, quals, v in ((ROWS_ONE, QUALS_ONE, VALUES[0]),
                           (ROWS_TWO, QUALS_TWO, VALUES[1])):
        for r in (rows[0], rows[2], rows[3]):
            kvs3.append((r, FAMILIES[0], quals[3], v))
            kvs3.append((r, FAMILIES[1], quals[0], v))
    s = Scan(filter=ColumnPaginationFilter(2, 2))
    verify_scan(table, s, NUM_ROWS, 2)
    verify_scan_full(table, s, kvs3)

    # limit 20, offset 140: past every row's column count → nothing
    s = Scan(filter=ColumnPaginationFilter(20, 140))
    verify_scan(table, s, 0, 0)
    verify_scan_full(table, s, [])
