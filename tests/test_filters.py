"""Filter algebra tests — ports filter/TestFilter.java's seeded-grid
style plus the per-filter test files (TestFilterList, TestPageFilter,
TestColumnPaginationFilter, TestSingleColumnValue(Exclude)Filter,
TestDependentColumnFilter, TestPrefixFilter, TestInclusiveStopFilter,
TestColumnPrefixFilter)."""

import pytest

from pyspark.sql import functions as F

from hbase_snapshot_spark.client import Get, Scan, Table
from hbase_snapshot_spark.filters import (
    BinaryComparator,
    BinaryPrefixComparator,
    ColumnCountGetFilter,
    ColumnPaginationFilter,
    ColumnPrefixFilter,
    CompareOp,
    DependentColumnFilter,
    FilterList,
    FirstKeyOnlyFilter,
    InclusiveStopFilter,
    PageFilter,
    PrefixFilter,
    QualifierFilter,
    RegexStringComparator,
    RowFilter,
    SingleColumnValueExcludeFilter,
    SingleColumnValueFilter,
    SkipFilter,
    SubstringComparator,
    TimestampsFilter,
    ValueFilter,
    WhileMatchFilter,
)
from tests.cells import cells_df, delete_column, put, visible_set


@pytest.fixture(scope="module")
def grid(spark):
    """Two-family grid like TestFilter.java:169 — rows ra..rd, families
    f/g, qualifiers q0..q2, two versions on f:q0."""
    rows = []
    for r in ["ra", "rb", "rc", "rd"]:
        for q in ["q0", "q1", "q2"]:
            rows.append(put(r, "f", q, 10, f"{r}-f-{q}-v10"))
        rows.append(put(r, "f", "q0", 20, f"{r}-f-q0-v20"))
        rows.append(put(r, "g", "q0", 10, f"{r}-g-q0-v10"))
    rows.append(delete_column("rd", "f", "q2", 15))
    return Table(cells_df(spark, rows))


def rows_of(df):
    return {r.row for r in df.select("row").distinct().collect()}


def cells_of(df):
    return {(r.row, r.family, r.qualifier, r.ts) for r in df.collect()}


def test_row_filter_binary(grid):
    out = grid.scan(Scan(filter=RowFilter(CompareOp.GREATER_OR_EQUAL, BinaryComparator("rc"))))
    assert rows_of(out) == {"rc", "rd"}


def test_row_filter_regex(grid):
    out = grid.scan(Scan(filter=RowFilter(CompareOp.EQUAL, RegexStringComparator("r[bd]"))))
    assert rows_of(out) == {"rb", "rd"}


def test_value_filter_substring(grid):
    out = grid.scan(
        Scan(max_versions=None,
             filter=ValueFilter(CompareOp.EQUAL, SubstringComparator("F-Q0")))
    )
    assert {r.qualifier for r in out.collect()} == {"q0"}


def test_value_filter_before_version_count(grid):
    # newest f:q0 version is v20; ValueFilter excluding it must expose v10
    out = grid.scan(
        Scan(max_versions=1,
             columns={"f": ["q0"]},
             filter=ValueFilter(CompareOp.EQUAL, SubstringComparator("v10")))
    )
    got = {(r.row, r.ts) for r in out.collect()}
    assert got == {(r, 10) for r in ["ra", "rb", "rc", "rd"]}


def test_qualifier_filter(grid):
    out = grid.scan(Scan(filter=QualifierFilter(CompareOp.LESS, BinaryComparator("q1"))))
    assert {r.qualifier for r in out.collect()} == {"q0"}


def test_binary_prefix_comparator(grid):
    out = grid.scan(
        Scan(filter=ValueFilter(CompareOp.EQUAL, BinaryPrefixComparator("ra-f")))
    )
    assert rows_of(out) == {"ra"}
    assert {r.family for r in out.collect()} == {"f"}


def test_prefix_filter_and_range_hint(grid):
    f = PrefixFilter("r")
    assert f.compile().range_hint == ("r", "s")
    out = grid.scan(Scan(filter=PrefixFilter("ra")))
    assert rows_of(out) == {"ra"}


def test_inclusive_stop(grid):
    out = grid.scan(Scan(start_row="ra", filter=InclusiveStopFilter("rb")))
    assert rows_of(out) == {"ra", "rb"}


def test_timestamps_filter(grid):
    out = grid.scan(Scan(max_versions=None, filter=TimestampsFilter([20])))
    assert cells_of(out) == {(r, "f", "q0", 20) for r in ["ra", "rb", "rc", "rd"]}


def test_first_key_only(grid):
    out = grid.scan(Scan(filter=FirstKeyOnlyFilter()))
    # first cell in KV order per row: f:q0 newest version (ts 20)
    assert cells_of(out) == {(r, "f", "q0", 20) for r in ["ra", "rb", "rc", "rd"]}


def test_page_filter_global(grid):
    out = grid.scan(Scan(filter=PageFilter(2)))
    assert rows_of(out) == {"ra", "rb"}


def test_column_pagination(grid):
    # stream order per row: f:q0@20, f:q0@10, f:q1@10, f:q2@10, g:q0@10
    out = grid.scan(Scan(max_versions=None, filter=ColumnPaginationFilter(2, 1)))
    got = cells_of(out.filter(F.col("row") == "ra"))
    assert got == {("ra", "f", "q0", 10), ("ra", "f", "q1", 10)}


def test_column_count_get(grid):
    out = grid.get(Get("ra", max_versions=None, filter=ColumnCountGetFilter(3)))
    assert cells_of(out) == {
        ("ra", "f", "q0", 20), ("ra", "f", "q0", 10), ("ra", "f", "q1", 10)
    }


def test_scvf_basic(grid):
    f = SingleColumnValueFilter("f", "q1", CompareOp.EQUAL, "rb-f-q1-v10")
    out = grid.scan(Scan(max_versions=None, filter=f))
    assert rows_of(out) == {"rb"}


def test_scvf_missing_column_passes(grid):
    # rd's f:q2 is deleted ⇒ rows lacking the column pass by default
    f = SingleColumnValueFilter("f", "q2", CompareOp.EQUAL, "nope")
    out = grid.scan(Scan(max_versions=None, filter=f))
    assert rows_of(out) == {"rd"}


def test_scvf_filter_if_missing(grid):
    f = SingleColumnValueFilter(
        "f", "q2", CompareOp.EQUAL, "nope", filter_if_missing=True
    )
    out = grid.scan(Scan(max_versions=None, filter=f))
    assert rows_of(out) == set()


def test_scvf_latest_version_only(grid):
    # f:q0 latest is v20; matching the old version must NOT pass with
    # latest_version_only=True, must pass with False
    f_latest = SingleColumnValueFilter("f", "q0", CompareOp.EQUAL, "ra-f-q0-v10")
    assert rows_of(grid.scan(Scan(filter=f_latest))) == set()
    f_any = SingleColumnValueFilter(
        "f", "q0", CompareOp.EQUAL, "ra-f-q0-v10", latest_version_only=False
    )
    assert rows_of(grid.scan(Scan(filter=f_any))) == {"ra"}


def test_scvf_exclude(grid):
    f = SingleColumnValueExcludeFilter("f", "q1", CompareOp.EQUAL, "rb-f-q1-v10")
    out = grid.scan(Scan(max_versions=None, filter=f))
    assert rows_of(out) == {"rb"}
    assert ("rb", "f", "q1", 10) not in cells_of(out)


def test_dependent_column(spark):
    t = Table(cells_df(spark, [
        put("r1", "f", "ref", 10, "x"),
        put("r1", "f", "a", 10, "keep"),
        put("r1", "f", "a", 11, "drop"),
        put("r2", "f", "a", 10, "drop-no-ref"),
    ]))
    f = DependentColumnFilter("f", "ref")
    out = t.scan(Scan(max_versions=None, filter=f))
    assert cells_of(out) == {("r1", "f", "ref", 10), ("r1", "f", "a", 10)}
    f2 = DependentColumnFilter("f", "ref", drop_dependent_column=True)
    out2 = t.scan(Scan(max_versions=None, filter=f2))
    assert cells_of(out2) == {("r1", "f", "a", 10)}


def test_skip_filter(grid):
    # drop any row containing a q2 cell (i.e. rows where qualifier != q2
    # fails for some cell) — rd's q2 is deleted so rd survives
    f = SkipFilter(QualifierFilter(CompareOp.NOT_EQUAL, BinaryComparator("q2")))
    out = grid.scan(Scan(max_versions=None, filter=f))
    assert rows_of(out) == {"rd"}


def test_while_match(grid):
    f = WhileMatchFilter(RowFilter(CompareOp.LESS, BinaryComparator("rc")))
    out = grid.scan(Scan(filter=f))
    assert rows_of(out) == {"ra", "rb"}


def test_while_match_page(grid):
    # the PerformanceEvaluation filterScan shape (:805-808)
    f = WhileMatchFilter(PageFilter(3))
    out = grid.scan(Scan(filter=f))
    assert rows_of(out) == {"ra", "rb", "rc"}


def test_filter_list_and(grid):
    f = FilterList(FilterList.MUST_PASS_ALL, [
        RowFilter(CompareOp.GREATER_OR_EQUAL, BinaryComparator("rb")),
        QualifierFilter(CompareOp.EQUAL, BinaryComparator("q0")),
    ])
    out = grid.scan(Scan(max_versions=None, filter=f))
    assert rows_of(out) == {"rb", "rc", "rd"}
    assert {r.qualifier for r in out.collect()} == {"q0"}


def test_filter_list_or(grid):
    f = FilterList(FilterList.MUST_PASS_ONE, [
        RowFilter(CompareOp.EQUAL, BinaryComparator("ra")),
        RowFilter(CompareOp.EQUAL, BinaryComparator("rd")),
    ])
    out = grid.scan(Scan(filter=f))
    assert rows_of(out) == {"ra", "rd"}


def test_filter_list_nested(grid):
    f = FilterList(FilterList.MUST_PASS_ALL, [
        FilterList(FilterList.MUST_PASS_ONE, [
            RowFilter(CompareOp.EQUAL, BinaryComparator("ra")),
            RowFilter(CompareOp.EQUAL, BinaryComparator("rb")),
        ]),
        QualifierFilter(CompareOp.EQUAL, BinaryComparator("q1")),
    ])
    out = grid.scan(Scan(max_versions=None, filter=f))
    assert cells_of(out) == {("ra", "f", "q1", 10), ("rb", "f", "q1", 10)}


def test_filter_list_or_rowlevel(grid):
    f = FilterList(FilterList.MUST_PASS_ONE, [
        SingleColumnValueFilter("f", "q1", CompareOp.EQUAL, "rb-f-q1-v10",
                                filter_if_missing=True),
        RowFilter(CompareOp.EQUAL, BinaryComparator("rd")),
    ])
    out = grid.scan(Scan(filter=f))
    assert rows_of(out) == {"rb", "rd"}


def test_scan_range_with_filter(grid):
    out = grid.scan(Scan(
        start_row="rb", stop_row="rd",
        filter=QualifierFilter(CompareOp.EQUAL, BinaryComparator("q0")),
    ))
    assert rows_of(out) == {"rb", "rc"}


def test_get_point_read(grid):
    out = grid.get(Get("rb", columns={"f": ["q0"]}))
    assert cells_of(out) == {("rb", "f", "q0", 20)}


def test_exists(grid):
    assert grid.exists(Get("ra"))
    assert not grid.exists(Get("zz"))


def test_get_row_or_before(grid):
    out = grid.get_row_or_before("rbb")
    assert rows_of(out) == {"rb"}


def test_row_count(grid):
    assert grid.row_count() == 4


def test_binary_table_filters(spark):
    """the exact reference model: byte[] keys/qualifiers/values with
    unsigned-lexicographic comparators (util/Bytes.java compareTo)"""
    t = Table(cells_df(spark, [
        put(b"\x00row", "f", b"q1", 10, b"\x01"),
        put(b"\x7frow", "f", b"q1", 10, b"\x80"),
        put(b"\x80row", "f", b"q2", 10, b"\xff"),
        put(b"\xffrow", "f", b"q2", 10, b"\x00"),
    ], binary=True))
    # unsigned: 0x80row > 0x7frow
    out = t.scan(Scan(filter=RowFilter(
        CompareOp.GREATER_OR_EQUAL, BinaryComparator(bytes([0x80]) + b"row"))))
    assert {bytes(r.row) for r in out.collect()} == {b"\x80row", b"\xffrow"}
    # value compare across the sign boundary
    out2 = t.scan(Scan(filter=ValueFilter(
        CompareOp.GREATER, BinaryComparator(b"\x7f"))))
    assert {bytes(r.value) for r in out2.collect()} == {b"\x80", b"\xff"}
    # binary prefix on the row key
    out3 = t.scan(Scan(filter=PrefixFilter(b"\x7f")))
    assert {bytes(r.row) for r in out3.collect()} == {b"\x7frow"}
    # binary range scan [start, stop)
    out4 = t.scan(Scan(start_row=b"\x7f", stop_row=b"\xff"))
    assert {bytes(r.row) for r in out4.collect()} == {b"\x7frow", b"\x80row"}


def test_filter_list_composite_all_stages(grid):
    """a FilterList exercising every pipeline stage at once: cell
    predicate (Qualifier), stream rank (ColumnCount), row keep (SCVF),
    and a global page limit — chained in list order"""
    f = FilterList(FilterList.MUST_PASS_ALL, [
        QualifierFilter(CompareOp.NOT_EQUAL, BinaryComparator("q2")),
        ColumnCountGetFilter(3),
        SingleColumnValueFilter("f", "q0", CompareOp.NOT_EQUAL, "zz",
                                latest_version_only=True),
        PageFilter(3),
    ])
    out = grid.scan(Scan(max_versions=None, filter=f))
    got = cells_of(out)
    # rows limited to first 3 (ra..rc); per row first 3 cells of the
    # q2-filtered stream: f:q0@20, f:q0@10, f:q1@10
    assert rows_of(out) == {"ra", "rb", "rc"}
    for r in ["ra", "rb", "rc"]:
        assert {(c[1], c[2], c[3]) for c in got if c[0] == r} == {
            ("f", "q0", 20), ("f", "q0", 10), ("f", "q1", 10)
        }


def test_while_match_boundary_cells(grid):
    # the reference flips filterAllRemaining only AFTER the first failing
    # cell (WhileMatchFilter.java:30-37): passing cells of the boundary
    # row that sort before it in KeyValue order are still emitted
    f = WhileMatchFilter(
        ValueFilter(CompareOp.NOT_EQUAL, BinaryComparator("rc-f-q1-v10"))
    )
    out = grid.scan(Scan(filter=f))
    assert cells_of(out) == {
        ("ra", "f", "q0", 20), ("ra", "f", "q1", 10),
        ("ra", "f", "q2", 10), ("ra", "g", "q0", 10),
        ("rb", "f", "q0", 20), ("rb", "f", "q1", 10),
        ("rb", "f", "q2", 10), ("rb", "g", "q0", 10),
        ("rc", "f", "q0", 20),
    }


def test_scan_add_family_plus_add_column(spark):
    # addFamily('f1') alongside addColumn('f2','b') returns ALL of f1
    # plus only f2:b — Scan.addFamily puts (family -> null) in the
    # familyMap (client/Scan.java:178-180)
    t = Table(cells_df(spark, [
        put("r1", "f1", "a", 10, "va"),
        put("r1", "f2", "b", 10, "vb"),
        put("r1", "f2", "c", 10, "vc"),
    ]))
    out = t.scan(Scan().add_family("f1").add_column("f2", "b"))
    assert visible_set(out) == {
        ("r1", "f1", "a", 10, "va"),
        ("r1", "f2", "b", 10, "vb"),
    }


def test_filter_list_with_while_match_inner(grid):
    # FilterList AND composing a cell predicate with a cell-level
    # WhileMatch: per the documented stage order, the qualifier
    # predicate restricts the stream FIRST, then WhileMatch cuts at its
    # first failing cell in KeyValue order
    f = FilterList(FilterList.MUST_PASS_ALL, [
        QualifierFilter(CompareOp.EQUAL, BinaryComparator("q0")),
        WhileMatchFilter(
            ValueFilter(CompareOp.NOT_EQUAL, BinaryComparator("rc-f-q0-v20"))
        ),
    ])
    out = grid.scan(Scan(filter=f))
    # q0-only stream in KeyValue order: ra f(20), ra g(10), rb f(20),
    # rb g(10), rc f(20)=FAIL → everything strictly before survives
    assert cells_of(out) == {
        ("ra", "f", "q0", 20), ("ra", "g", "q0", 10),
        ("rb", "f", "q0", 20), ("rb", "g", "q0", 10),
    }


def test_filter_list_or_with_while_match(grid):
    # OR of a cell-level WhileMatch (stream cut) with a row filter:
    # union of each child's surviving rows
    f = FilterList(FilterList.MUST_PASS_ONE, [
        WhileMatchFilter(RowFilter(CompareOp.LESS, BinaryComparator("rb"))),
        PrefixFilter("rd"),
    ])
    out = grid.scan(Scan(filter=f))
    assert rows_of(out) == {"ra", "rd"}


def test_while_match_model_random(spark):
    # adversarial model check of the boundary-cell cut: engine output ==
    # a literal Python transcription of the reference loop (iterate the
    # masked stream in KeyValue order, include until the first failing
    # cell, then count versions) over randomized cell tables
    import random

    from hbase_snapshot_spark.resolve import ResolveSpec, mask

    rng = random.Random(77)
    for _trial in range(4):
        rows = []
        values = []
        for r in range(6):
            for fam in ("f", "g"):
                for q in ("qa", "qb"):
                    for ts in rng.sample([10, 20, 30], k=rng.randint(1, 3)):
                        v = f"v{rng.randint(0, 6)}"
                        values.append(v)
                        rows.append(put(f"r{r}", fam, q, ts, v, seq=ts))
        t = Table(cells_df(spark, rows))
        target = rng.choice(values)

        f = WhileMatchFilter(ValueFilter(CompareOp.NOT_EQUAL, BinaryComparator(target)))
        got = {(r.row, r.family, r.qualifier, r.ts)
               for r in t.scan(Scan(max_versions=1, filter=f)).collect()}

        # model: masked stream in KeyValue order, cut at first failing
        stream = mask(cells_df(spark, rows), ResolveSpec(max_versions=None)).collect()
        ordered = sorted(stream, key=lambda c: (c.row, c.family, c.qualifier,
                                                -c.ts, -c.seq))
        surviving = []
        for c in ordered:
            if c.value == target:
                break
            surviving.append(c)
        seen = set()
        expected = set()
        for c in surviving:  # newest-first within qualifier: first wins
            k = (c.row, c.family, c.qualifier)
            if k not in seen:
                seen.add(k)
                expected.add((c.row, c.family, c.qualifier, c.ts))
        assert got == expected, (target, got ^ expected)


def test_filter_list_or_rejects_pagination(grid):
    # OR over a per-row cell-counting filter would degenerate to
    # keep-everything; it must raise, per the documented contract
    f = FilterList(FilterList.MUST_PASS_ONE, [
        ColumnPaginationFilter(1, 0),
        RowFilter(CompareOp.EQUAL, BinaryComparator("ra")),
    ])
    with pytest.raises(NotImplementedError):
        grid.scan(Scan(filter=f))
    with pytest.raises(ValueError):
        FilterList(FilterList.MUST_PASS_ONE, []).compile()


def test_prefix_filter_non_utf8_increment(grid):
    # a prefix whose last byte increments into invalid UTF-8 must not
    # produce a lone-surrogate stop key (crashes lit()); the hint is
    # dropped, the predicate still applies
    out = grid.scan(Scan(filter=PrefixFilter("a\x7f")))
    assert out.count() == 0  # no such rows; the point is it runs
    out = grid.scan(Scan(filter=PrefixFilter("r")))
    assert rows_of(out) == {"ra", "rb", "rc", "rd"}


def test_scan_object_not_mutated_across_tables(spark):
    # reusing one Scan object across tables must not leak descriptor
    # caps between them
    from hbase_snapshot_spark.model import FamilyDescriptor, TableDescriptor

    cells = cells_df(spark, [put("r1", "f", "q", t, f"v{t}") for t in (1, 2, 3)])
    desc = TableDescriptor("t").add_family(FamilyDescriptor("f", max_versions=1))
    with_desc = Table(cells, descriptor=desc)
    bare = Table(cells)
    s = Scan(max_versions=None)
    assert with_desc.scan(s).count() == 1   # descriptor cap applies
    assert s.family_max_versions == {}      # caller's Scan untouched
    assert bare.scan(s).count() == 3        # no leak into the next table


def test_row_cursor_paging_invariant(spark):
    # RowCursor: any page-size sequence yields the same rows in the same
    # order as one big fetch; rows never split across pages
    import random

    from hbase_snapshot_spark.client import RowCursor

    cells = cells_df(spark, [
        put(f"r{i:02d}", "f", f"q{j}", 10 + v, f"x{v}")
        for i in range(7) for j in range(2) for v in range(2)
    ])

    def make_row(row_key, cs):
        return (row_key, tuple((c.family, c.qualifier, c.ts) for c in cs))

    full = RowCursor(cells, make_row).next_rows(1000)
    rng = random.Random(5)
    for _ in range(3):
        cur = RowCursor(cells, make_row)
        paged = []
        while True:
            page = cur.next_rows(rng.randint(1, 4))
            if not page:
                break
            paged.extend(page)
        assert paged == full
    assert [r[0] for r in full] == [f"r{i:02d}" for i in range(7)]


def test_filterlist_skip_before_page_short_circuits_in_order(grid):
    """(r11 self-review) FilterList.filterRow evaluates children IN
    ORDER with short-circuit: a row an earlier SkipFilter drops must
    never consume a later PageFilter's slot.  The old separate
    keep/drop buckets computed the page over the pre-drop stream, so
    the page came back short.  Grid rows: SkipFilter(q != q2) drops
    ra/rb/rc (they carry f:q2; rd's q2 is deleted), leaving rd — a
    PageFilter(2) AFTER the skip must page over survivors only."""
    f = FilterList(FilterList.MUST_PASS_ALL, [
        SkipFilter(QualifierFilter(CompareOp.NOT_EQUAL,
                                   BinaryComparator("q2"))),
        PageFilter(2),
    ])
    out = grid.scan(Scan(max_versions=None, filter=f))
    assert rows_of(out) == {"rd"}
    # and the orderly converse: a PageFilter BEFORE the dropper counts
    # the dropped row against the page (the reference client may see
    # fewer than pageSize rows) — page {ra, rb}, then skip drops both
    f2 = FilterList(FilterList.MUST_PASS_ALL, [
        PageFilter(2),
        SkipFilter(QualifierFilter(CompareOp.NOT_EQUAL,
                                   BinaryComparator("q2"))),
    ])
    out2 = grid.scan(Scan(max_versions=None, filter=f2))
    assert rows_of(out2) == set()
