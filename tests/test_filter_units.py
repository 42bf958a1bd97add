"""Adapted ports of the 9 per-filter unit files
(filter/Test{ColumnPrefixFilter, DependentColumnFilter, PageFilter,
PrefixFilter, InclusiveStopFilter, FilterList, SingleColumnValueFilter,
SingleColumnValueExcludeFilter, ColumnPaginationFilter}.java).

The reference drives most of these through the filterKeyValue /
filterRow / filterAllRemaining hook protocol; this engine compiles
filters to declarative Spark plans, so each hook sequence is ported as
the equivalent SCAN over the same cell fixture — the observable
contract (which cells survive) is what's pinned.  Serialization
(Writable write/readFields) methods have no analogue and are omitted.
"""

import random

import pytest

from hbase_snapshot_spark.client import Scan
from hbase_snapshot_spark.filters import (
    BinaryComparator,
    ColumnPaginationFilter,
    ColumnPrefixFilter,
    CompareOp,
    DependentColumnFilter,
    FilterList,
    InclusiveStopFilter,
    PageFilter,
    PrefixFilter,
    RegexStringComparator,
    SingleColumnValueExcludeFilter,
    SingleColumnValueFilter,
    SubstringComparator,
    WhileMatchFilter,
)
from hbase_snapshot_spark.model import FamilyDescriptor, TableDescriptor
from hbase_snapshot_spark.table import Put, TableStore


@pytest.fixture()
def store(spark, tmp_path):
    return TableStore(spark, str(tmp_path / "tables"))


def _mk(store, name, *fams, versions=3):
    desc = TableDescriptor(name)
    for f in fams:
        desc.add_family(FamilyDescriptor(f, max_versions=versions))
    return store.create_table(desc)


def _cells(t, scan):
    return sorted(
        [(c.row, c.family, c.qualifier, c.ts, c.value)
         for c in t.client().scan(scan).collect()]
    )


# -------------------- TestColumnPrefixFilter.testColumnPrefixFilter:31


def test_column_prefix_filter(store):
    """random word columns, per-prefix expected sets computed alongside
    the inserts (seeded where the reference uses Math.random — the
    assertion is count equality against the independently-built map)."""
    rng = random.Random(1821)

    def words(n, suffix):
        out = set()
        for _ in range(n):
            w = "".join(chr(rng.randrange(26) + 97)
                        for _ in range(rng.randrange(2) + 1))
            out.add(w + suffix)
        return sorted(out)

    rows = words(20, "row")
    columns = words(120, "column")
    t = _mk(store, "colprefix", "Family")
    prefix_counts = {"p": 0, "s": 0}
    puts = []
    for row in rows:
        p = Put(row)
        for col in columns:
            for ts in (1, 2):
                p.add("Family", col, "ValueString", ts=ts)
                for s in prefix_counts:
                    if col.startswith(s):
                        prefix_counts[s] += 1
        puts.append(p)
    t.mutate(puts, now=10)

    for s, want in prefix_counts.items():
        got = t.client().scan(
            Scan(max_versions=None, filter=ColumnPrefixFilter(s))
        ).count()
        assert got == want, (s, got, want)


# ---------------------- TestDependentColumnFilter fixture + testScans:164


STAMPS = [900, 800, 700]  # STAMP_BASE-100, -200, -300
BAD = ["bad1", "bad2", "bad3"]
MATCH = "match"


def _dep_table(store):
    t = _mk(store, "depcol", "familyOne", "familyTwo")
    p0 = (Put("test1")
          .add("familyOne", "qualifier", BAD[0], ts=STAMPS[0])
          .add("familyOne", "qualifier", BAD[1], ts=STAMPS[1])
          .add("familyOne", "qualifier", MATCH, ts=STAMPS[2])
          .add("familyTwo", "qualifier", BAD[0], ts=STAMPS[0])
          .add("familyTwo", "qualifier", BAD[2], ts=STAMPS[2]))
    p1 = (Put("test2")
          .add("familyOne", "qualifier", BAD[0], ts=STAMPS[0])
          .add("familyOne", "qualifier", MATCH, ts=STAMPS[2])
          .add("familyTwo", "qualifier", MATCH, ts=STAMPS[0])
          .add("familyTwo", "qualifier", BAD[2], ts=STAMPS[1]))
    t.mutate([p0, p1], now=1000)
    return t


def _verify(t, scan, expected_rows, expected_cells):
    """TestDependentColumnFilter.verifyScan:137 — here expectedCells is
    the SCAN total, not per-row."""
    cells = _cells(t, scan)
    assert len(cells) == expected_cells, cells
    assert len({c[0] for c in cells}) == expected_rows


def test_dependent_column_filter_scans(store):
    t = _dep_table(store)
    # plain timestamp join against familyOne:qualifier
    _verify(t, Scan(max_versions=None, filter=DependentColumnFilter(
        "familyOne", "qualifier")), 2, 8)
    # drop the filtering cells
    _verify(t, Scan(max_versions=None, filter=DependentColumnFilter(
        "familyOne", "qualifier", True)), 2, 3)
    # with a comparator: only stamps whose reference value == MATCH
    _verify(t, Scan(max_versions=None, filter=DependentColumnFilter(
        "familyOne", "qualifier", False,
        CompareOp.EQUAL, BinaryComparator(MATCH))), 2, 3)
    # comparator + drop
    _verify(t, Scan(max_versions=None, filter=DependentColumnFilter(
        "familyOne", "qualifier", True,
        CompareOp.EQUAL, BinaryComparator(MATCH))), 1, 1)


def test_dependent_column_filter_dropping(store):
    """testFilterDropping:218 over the makeTestVals cell set: the cell
    without a corresponding reference timestamp is dropped; with
    drop=True the reference column itself disappears."""
    t = _mk(store, "depdrop", "familyOne", "familyTwo")
    t.mutate([
        Put("test1")
        .add("familyOne", "qualifier", BAD[0], ts=STAMPS[0])
        .add("familyOne", "qualifier", BAD[1], ts=STAMPS[1])
        .add("familyTwo", "qualifier", BAD[2], ts=STAMPS[1])
        .add("familyTwo", "qualifier", MATCH, ts=STAMPS[0])
        .add("familyTwo", "qualifier", BAD[2], ts=STAMPS[2]),
    ], now=1000)

    got = _cells(t, Scan(max_versions=None,
                         filter=DependentColumnFilter("familyOne", "qualifier")))
    # familyOne stamps {S0, S1}: the familyTwo cell at S2 is dropped
    assert len(got) == 4
    assert ("test1", "familyTwo", "qualifier", STAMPS[2], BAD[2]) not in got

    got = _cells(t, Scan(max_versions=None, filter=DependentColumnFilter(
        "familyTwo", "qualifier", True)))
    # familyTwo stamps cover everything; drop removes familyTwo itself
    assert got == [
        ("test1", "familyOne", "qualifier", STAMPS[1], BAD[1]),
        ("test1", "familyOne", "qualifier", STAMPS[0], BAD[0]),
    ] or got == sorted([
        ("test1", "familyOne", "qualifier", STAMPS[0], BAD[0]),
        ("test1", "familyOne", "qualifier", STAMPS[1], BAD[1]),
    ])


# ------------------------------------- TestPageFilter.testPageSize:25


def test_page_filter_unit(store):
    t = _mk(store, "page", "f")
    t.mutate([Put(f"row-{i}").add("f", "q", str(i)) for i in range(6)],
             now=10)
    rows = {c[0] for c in _cells(t, Scan(filter=PageFilter(3)))}
    assert rows == {"row-0", "row-1", "row-2"}  # exactly the page


# -------------------- TestPrefixFilter.testPrefixOnRow:~45 + WhileMatch


HOST_PREFIX = "org.apache.site-"


def test_prefix_filter_unit(store):
    t = _mk(store, "prefix", "f")
    rows = [HOST_PREFIX + c for c in "abcde"] + ["com.yahoo.www"]
    t.mutate([Put(r).add("f", "q", "v") for r in rows], now=10)

    kept = {c[0] for c in _cells(t, Scan(filter=PrefixFilter(HOST_PREFIX)))}
    assert kept == set(rows[:5])  # yahoo row filtered


def test_prefix_filter_inside_while_match(store):
    """testPrefixOnRowInsideWhileMatchRow — in scan form the WhileMatch
    wrapper additionally TERMINATES at the first row past the prefix
    range (start the scan at the prefix, as real prefix scans do)."""
    t = _mk(store, "prefixwm", "f")
    rows = ([HOST_PREFIX + c for c in "abcde"]
            + ["com.yahoo.www", "org.apache.zzz"])
    t.mutate([Put(r).add("f", "q", "v") for r in rows], now=10)

    kept = {c[0] for c in _cells(t, Scan(
        start_row=HOST_PREFIX,
        filter=WhileMatchFilter(PrefixFilter(HOST_PREFIX))))}
    assert kept == {HOST_PREFIX + c for c in "abcde"}


# ------------------- TestInclusiveStopFilter.testStopRowIdentification


def test_inclusive_stop_filter_unit(store):
    t = _mk(store, "incstop", "f")
    for r in ("good_row", "stop_row", "zzzzzz"):
        t.mutate([Put(r).add("f", "q", "v")], now=10)
    kept = {c[0] for c in _cells(t, Scan(filter=InclusiveStopFilter("stop_row")))}
    assert kept == {"good_row", "stop_row"}  # stop row included, not past


# ------------------------------- TestFilterList.testMPALL / testMPONE


def test_filter_list_mpall_page_and_while_match_prefix(store):
    """testMPALL:90 — PageFilter(2) AND WhileMatch(Prefix('yyy')):
    both 'yyy*' rows pass, 'z' is cut by both."""
    t = _mk(store, "fl-mpall", "f")
    for r in ("yyy", "yyyyyyyyy", "z"):
        t.mutate([Put(r).add("f", "q", "v")], now=10)
    f = FilterList(FilterList.MUST_PASS_ALL, [
        PageFilter(2), WhileMatchFilter(PrefixFilter("yyy"))])
    kept = {c[0] for c in _cells(t, Scan(filter=f))}
    assert kept == {"yyy", "yyyyyyyyy"}


def test_filter_list_mpone_page_or_prefix(store):
    """testMPONE/testOrdering — PageFilter(2) OR Prefix('yyy') as the
    union of each child's kept rows (DIVERGENCES.md: OR over row-level
    filters is the union, the reference's hook-order artifacts are
    not replicated): first-2 rows ∪ prefix rows."""
    t = _mk(store, "fl-mpone", "f")
    for r in ("aaa", "yyy", "z"):
        t.mutate([Put(r).add("f", "q", "v")], now=10)
    f = FilterList(FilterList.MUST_PASS_ONE, [
        PageFilter(2), PrefixFilter("yyy")])
    kept = {c[0] for c in _cells(t, Scan(filter=f))}
    assert kept == {"aaa", "yyy"}  # page ∪ prefix; 'z' fails both


def test_filter_list_mpone_column_pagination_rejected(store):
    """OR over the column-pagination (per-row cell-counting) family
    would degenerate to keep-everything — rejected loudly, as
    documented (DIVERGENCES.md)."""
    t = _mk(store, "fl-mpone-cp", "f")
    t.mutate([Put("yyy").add("f", "q", "v")], now=10)
    f = FilterList(FilterList.MUST_PASS_ONE, [
        ColumnPaginationFilter(1, 0), PrefixFilter("yyy")])
    with pytest.raises(NotImplementedError, match="pagination"):
        t.client().scan(Scan(filter=f)).collect()


# --------------- TestSingleColumnValueFilter.testStop (scan-adapted)


FULLSTRING_1 = "The quick brown fox jumps over the lazy dog."
FULLSTRING_2 = "The slow grey fox trips over the lazy dog."


def test_scvf_basic_comparator(store):
    """basicFilterTests: GE 'ab' keeps ab/abc/abcd rows, drops 'a'."""
    t = _mk(store, "scvf-basic", "test")
    vals = {"r1": "a", "r2": "ab", "r3": "abc", "r4": "abcd"}
    t.mutate([Put(r).add("test", "foo", v) for r, v in vals.items()], now=10)
    f = SingleColumnValueFilter("test", "foo",
                                CompareOp.GREATER_OR_EQUAL, "ab")
    kept = {c[0] for c in _cells(t, Scan(filter=f))}
    assert kept == {"r2", "r3", "r4"}


def test_scvf_latest_version_only(store):
    """basicFilter5: with latestVersionOnly=False an OLDER matching
    version passes the row that the latest version would fail."""
    t = _mk(store, "scvf-latest", "test")
    t.mutate([Put("r1").add("test", "foo", "ab", ts=100)], now=10)
    t.mutate([Put("r1").add("test", "foo", "a", ts=200)], now=11)

    f = SingleColumnValueFilter("test", "foo",
                                CompareOp.GREATER_OR_EQUAL, "ab")
    assert t.client().scan(Scan(filter=f)).count() == 0  # latest 'a' fails

    f = SingleColumnValueFilter("test", "foo",
                                CompareOp.GREATER_OR_EQUAL, "ab",
                                latest_version_only=False)
    assert {c[0] for c in _cells(t, Scan(filter=f))} == {"r1"}


def test_scvf_substring_and_regex(store):
    """substrFilterTests + regexFilterTests: 'quick' substring/regex
    keeps the quick-fox row only."""
    t = _mk(store, "scvf-cmp", "test")
    t.mutate([Put("r1").add("test", "foo", FULLSTRING_1),
              Put("r2").add("test", "foo", FULLSTRING_2)], now=10)
    for cmp_ in (SubstringComparator("quick"),
                 RegexStringComparator(".+quick.+")):
        f = SingleColumnValueFilter("test", "foo", CompareOp.EQUAL, cmp_)
        assert {c[0] for c in _cells(t, Scan(filter=f))} == {"r1"}


# -------------- TestSingleColumnValueExcludeFilter.testFilterKeyValue


def test_scvef_match_and_mismatch(store):
    t = _mk(store, "scvef", "test")
    t.mutate([Put("test").add("test", "foo", "a")
              .add("test", "foo_2", "a")], now=10)

    # match: row kept, the tested column excluded, the other kept
    f = SingleColumnValueExcludeFilter("test", "foo", CompareOp.EQUAL, "a")
    got = _cells(t, Scan(filter=f))
    assert [(c[1], c[2]) for c in got] == [("test", "foo_2")]

    # mismatch: whole row gone (NEXT_ROW for every subsequent cell)
    f = SingleColumnValueExcludeFilter("test", "foo", CompareOp.EQUAL, "ab")
    assert t.client().scan(Scan(filter=f)).count() == 0


# ------------------- TestColumnPaginationFilter (compact scan variant)


def test_column_pagination_unit(store):
    t = _mk(store, "colpage", "f")
    p = Put("row")
    for i in range(5):
        p.add("f", f"q{i}", str(i))
    t.mutate([p], now=10)
    got = _cells(t, Scan(max_versions=None,
                         filter=ColumnPaginationFilter(2, 1)))
    assert [(c[2], c[4]) for c in got] == [("q1", "1"), ("q2", "2")]
    # offset beyond the row's column count → nothing
    assert t.client().scan(
        Scan(max_versions=None, filter=ColumnPaginationFilter(20, 140))
    ).count() == 0
