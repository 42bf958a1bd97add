"""The filter algebra — full parity with the reference's ``filter/``
package (2747 LoC, 17 filters + 4 comparators).

Evaluation contract being re-created (filter/Filter.java:51): filters
run inside the scan loop at cell granularity, BEFORE version counting
(ScanQueryMatcher.java:182-200) and AFTER tombstone/TTL/time-range
masking (deletes and masked cells never reach the filter slot — they are
SKIPped earlier in ScanQueryMatcher.match).  Row-level hooks
(``filterRow``) drop whole rows after their cells were streamed.

Spark mapping: each filter compiles to a ``Compiled`` contribution with
up to four parts, applied at the matching pipeline stage by
plans/scan_exec.py:

  cell_pred         Column predicate on the pre-count cell stream
                    (the ``filterKeyValue`` SKIP path)
  stream_transform  window-rank transform of the pre-count stream
                    (stateful per-row cell counting: pagination filters)
  row_keep/row_drop row-key sets computed FROM the pre-count stream,
                    applied as semi/anti joins (the ``filterRow`` path)
  post              transform of the final resolved output (column
                    exclusion, global page limits)

Scale notes: row_keep/row_drop frames carry only row keys and are
aggregated before joining — AQE broadcasts them in the common case.
PrefixFilter additionally exposes a (start, stop) range rewrite so the
scan planner can prune parquet files (the reference's early-out at
PrefixFilter.java passEDKey / seek-hint machinery → predicate pushdown).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from hbase_snapshot_spark import bytes_util

# ------------------------------------------------------------ comparators


class CompareOp:
    """filter/CompareFilter.java:50-66"""

    LESS = "LESS"
    LESS_OR_EQUAL = "LESS_OR_EQUAL"
    EQUAL = "EQUAL"
    NOT_EQUAL = "NOT_EQUAL"
    GREATER_OR_EQUAL = "GREATER_OR_EQUAL"
    GREATER = "GREATER"
    NO_OP = "NO_OP"


class Comparator:
    """WritableByteArrayComparable (filter/WritableByteArrayComparable.java:66)."""

    def compare(self, col: Column, op: str) -> Column:
        raise NotImplementedError


class BinaryComparator(Comparator):
    """Unsigned lexicographic compare (filter/BinaryComparator.java).
    Spark's BinaryType/StringType ordering matches util/Bytes.compareTo."""

    def __init__(self, value):
        self.value = value

    def compare(self, col: Column, op: str) -> Column:
        v = F.lit(self.value)
        return {
            CompareOp.LESS: col < v,
            CompareOp.LESS_OR_EQUAL: col <= v,
            CompareOp.EQUAL: col == v,
            CompareOp.NOT_EQUAL: col != v,
            CompareOp.GREATER_OR_EQUAL: col >= v,
            CompareOp.GREATER: col > v,
            CompareOp.NO_OP: F.lit(False),
        }[op]


class BinaryPrefixComparator(Comparator):
    """Compare against a prefix of equal length (filter/BinaryPrefixComparator.java)."""

    def __init__(self, prefix):
        self.prefix = prefix

    def compare(self, col: Column, op: str) -> Column:
        n = len(self.prefix)
        return BinaryComparator(self.prefix).compare(col.substr(1, n), op)


class RegexStringComparator(Comparator):
    """Regex on the UTF-8 value; EQUAL/NOT_EQUAL only
    (filter/RegexStringComparator.java — compareTo returns 0 on find())."""

    def __init__(self, pattern: str):
        self.pattern = pattern

    def compare(self, col: Column, op: str) -> Column:
        m = col.cast("string").rlike(self.pattern)
        if op == CompareOp.EQUAL:
            return m
        if op == CompareOp.NOT_EQUAL:
            return ~m
        raise ValueError("RegexStringComparator supports EQUAL/NOT_EQUAL only")


class SubstringComparator(Comparator):
    """Case-insensitive contains (filter/SubstringComparator.java)."""

    def __init__(self, substr: str):
        self.substr = substr.lower()

    def compare(self, col: Column, op: str) -> Column:
        m = F.instr(F.lower(col.cast("string")), self.substr) > 0
        if op == CompareOp.EQUAL:
            return m
        if op == CompareOp.NOT_EQUAL:
            return ~m
        raise ValueError("SubstringComparator supports EQUAL/NOT_EQUAL only")


# ------------------------------------------------------------ compiled form


@dataclass
class Compiled:
    cell_pred: Optional[Column] = None
    stream_transform: Optional[Callable[[DataFrame], DataFrame]] = None
    row_keep: Optional[Callable[[DataFrame], DataFrame]] = None   # stream -> df[row]
    row_drop: Optional[Callable[[DataFrame], DataFrame]] = None   # stream -> df[row]
    post: Optional[Callable[[DataFrame], DataFrame]] = None       # resolved -> resolved
    # optional row-range hint for scan pruning: (start_inclusive, stop_exclusive)
    range_hint: Optional[tuple] = None
    # stream_transform is row-semantic (WhileMatch's cut): the rows in
    # its output ARE the filter's row verdict, so an OR may union them.
    # Per-row cell-counting transforms (pagination family) keep cells of
    # every row and must NOT be row-unioned.
    row_cut: bool = False
    # stream_transform reads its input MORE THAN ONCE (DependentColumn's
    # stamp join, WhileMatch's first-failing-cell cut) — run_scan
    # persists the masked stream only then; the single-pass window
    # transforms (pagination family) don't need the materialization
    multi_consume: bool = False


_KV_ORDER = lambda: (  # noqa: E731 — KeyValue total order within a row
    F.col("family").asc(),
    F.col("qualifier").asc(),
    F.col("ts").desc(),
    F.col("seq").desc(),
)


class Filter:
    def compile(self) -> Compiled:
        raise NotImplementedError


class CompareFilterBase(Filter):
    _col = "row"

    def __init__(self, op: str, comparator: Comparator):
        self.op = op
        self.comparator = comparator

    def compile(self) -> Compiled:
        return Compiled(cell_pred=self.comparator.compare(F.col(self._col), self.op))


class RowFilter(CompareFilterBase):
    """filter/RowFilter.java — keep rows whose key satisfies the compare.
    (Row-key predicates hold uniformly for every cell of the row, so the
    cell-level predicate IS the row-level semantics.)"""
    _col = "row"


class QualifierFilter(CompareFilterBase):
    """filter/QualifierFilter.java"""
    _col = "qualifier"


class ValueFilter(CompareFilterBase):
    """filter/ValueFilter.java"""
    _col = "value"


def _startswith(col: Column, prefix) -> Column:
    """prefix predicate for str OR bytes (Column.startswith only takes
    strings; for binary keys compare the length-matched substring,
    preserving unsigned-lexicographic semantics)"""
    if isinstance(prefix, bytes):
        return col.substr(1, len(prefix)) == F.lit(prefix)
    return col.startswith(prefix)


class PrefixFilter(Filter):
    """filter/PrefixFilter.java — rows with the given key prefix; also
    rewritten to a [prefix, prefix+1) range for storage pruning."""

    def __init__(self, prefix):
        self.prefix = prefix

    def compile(self) -> Compiled:
        p = self.prefix
        end = bytes_util.prefix_end(p.encode() if isinstance(p, str) else p)
        if isinstance(p, str) and end is not None:
            try:
                end = end.decode("utf-8")
            except UnicodeDecodeError:
                # incrementing the last byte can leave invalid UTF-8
                # (e.g. 'a\x7f' -> b'a\x80'); a lone-surrogate stop key
                # would crash py4j's lit() — drop the stop hint, the
                # startswith predicate alone stays correct
                end = None
        return Compiled(
            cell_pred=_startswith(F.col("row"), p),
            range_hint=(p, end),
        )


class ColumnPrefixFilter(Filter):
    """filter/ColumnPrefixFilter.java:30-34"""

    def __init__(self, prefix):
        self.prefix = prefix

    def compile(self) -> Compiled:
        return Compiled(cell_pred=_startswith(F.col("qualifier"), self.prefix))


class InclusiveStopFilter(Filter):
    """filter/InclusiveStopFilter.java — scan [start, stop] inclusive."""

    def __init__(self, stop_row):
        self.stop_row = stop_row

    def compile(self) -> Compiled:
        return Compiled(cell_pred=F.col("row") <= F.lit(self.stop_row))


class TimestampsFilter(Filter):
    """filter/TimestampsFilter.java — cell ts ∈ explicit list."""

    def __init__(self, timestamps: Sequence[int]):
        self.timestamps = list(timestamps)

    def compile(self) -> Compiled:
        return Compiled(cell_pred=F.col("ts").isin(self.timestamps))


class FirstKeyOnlyFilter(Filter):
    """filter/FirstKeyOnlyFilter.java — only the first cell of each row
    (in KeyValue order), the fast row-count device (RowCounter.java)."""

    def compile(self) -> Compiled:
        def transform(df: DataFrame) -> DataFrame:
            w = Window.partitionBy("row").orderBy(*_KV_ORDER())
            return (
                df.withColumn("_fko", F.row_number().over(w))
                .filter(F.col("_fko") == 1)
                .drop("_fko")
            )

        return Compiled(stream_transform=transform)


class ColumnPaginationFilter(Filter):
    """filter/ColumnPaginationFilter.java — per-row slice of the cell
    stream: every cell reaching the filter slot increments the count
    (the reference counts versions too, since the filter runs before
    version tracking); cells with count in (offset, offset+limit] pass."""

    def __init__(self, limit: int, offset: int):
        self.limit = limit
        self.offset = offset

    def compile(self) -> Compiled:
        lo, hi = self.offset, self.offset + self.limit

        def transform(df: DataFrame) -> DataFrame:
            w = Window.partitionBy("row").orderBy(*_KV_ORDER())
            return (
                df.withColumn("_cp", F.row_number().over(w))
                .filter((F.col("_cp") > lo) & (F.col("_cp") <= hi))
                .drop("_cp")
            )

        return Compiled(stream_transform=transform)


class ColumnCountGetFilter(Filter):
    """filter/ColumnCountGetFilter.java:28-33 — first N cells of a row
    (Get-oriented; aborts the row after the quota)."""

    def __init__(self, limit: int):
        self.limit = limit

    def compile(self) -> Compiled:
        n = self.limit

        def transform(df: DataFrame) -> DataFrame:
            w = Window.partitionBy("row").orderBy(*_KV_ORDER())
            return (
                df.withColumn("_cc", F.row_number().over(w))
                .filter(F.col("_cc") <= n)
                .drop("_cc")
            )

        return Compiled(stream_transform=transform)


class PageFilter(Filter):
    """filter/PageFilter.java — limit the number of rows.  The reference
    applies the limit per region (doc at :30-39 — clients may see more
    than pageSize rows); we return the GLOBAL first N rows in key order,
    a documented, strictly-more-exact divergence."""

    def __init__(self, page_size: int):
        self.page_size = page_size

    def compile(self) -> Compiled:
        n = self.page_size

        def keep(stream: DataFrame) -> DataFrame:
            return (
                stream.select("row").distinct().orderBy("row").limit(n)
            )

        return Compiled(row_keep=keep)


class SingleColumnValueFilter(Filter):
    """filter/SingleColumnValueFilter.java:37-62 — emit/suppress whole
    rows based on one column's value.

    latest_version_only=True tests only the newest surviving version of
    the column (the first one the reference's scan streams);
    filter_if_missing=False lets rows lacking the column pass."""

    def __init__(
        self,
        family: str,
        qualifier,
        op: str,
        comparator_or_value,
        filter_if_missing: bool = False,
        latest_version_only: bool = True,
    ):
        self.family = family
        self.qualifier = qualifier
        self.op = op
        self.comparator = (
            comparator_or_value
            if isinstance(comparator_or_value, Comparator)
            else BinaryComparator(comparator_or_value)
        )
        self.filter_if_missing = filter_if_missing
        self.latest_version_only = latest_version_only

    def compile(self) -> Compiled:
        def keep(stream: DataFrame) -> DataFrame:
            # single aggregation pass: one shuffle on row computes the
            # column's latest version, any-version match, and presence —
            # no re-scans of the stream per row-set
            is_target = (F.col("family") == self.family) & (
                F.col("qualifier") == self.qualifier
            )
            any_pred = self.comparator.compare(F.col("value"), self.op)
            agg = stream.groupBy("row").agg(
                F.max(
                    F.when(is_target, F.struct("ts", "seq", "value"))
                ).alias("_latest"),
                F.max(F.when(is_target & any_pred, F.lit(1))).alias("_any"),
            )
            if self.latest_version_only:
                ok = self.comparator.compare(F.col("_latest.value"), self.op)
            else:
                ok = F.col("_any") == 1
            present = F.col("_latest").isNotNull()
            if self.filter_if_missing:
                cond = present & ok
            else:
                cond = ~present | ok
            return agg.filter(cond).select("row")

        return Compiled(row_keep=keep)


class SingleColumnValueExcludeFilter(SingleColumnValueFilter):
    """filter/SingleColumnValueExcludeFilter.java — SCVF + drop the
    tested column from the output."""

    def compile(self) -> Compiled:
        c = super().compile()
        fam, qual = self.family, self.qualifier

        def post(resolved: DataFrame) -> DataFrame:
            return resolved.filter(
                ~((F.col("family") == fam) & (F.col("qualifier") == qual))
            )

        return Compiled(row_keep=c.row_keep, post=post)


class DependentColumnFilter(Filter):
    """filter/DependentColumnFilter.java:35-75 — intra-row timestamp
    equi-join: keep cells whose ts matches a timestamp present on the
    reference column in the same row (optionally value-checked,
    optionally dropping the reference column)."""

    def __init__(
        self,
        family: str,
        qualifier,
        drop_dependent_column: bool = False,
        op: str | None = None,
        comparator: Comparator | None = None,
    ):
        self.family = family
        self.qualifier = qualifier
        self.drop_dependent_column = drop_dependent_column
        self.op = op
        self.comparator = comparator

    def compile(self) -> Compiled:
        fam, qual = self.family, self.qualifier

        def transform(df: DataFrame) -> DataFrame:
            ref = df.filter((F.col("family") == fam) & (F.col("qualifier") == qual))
            if self.op is not None and self.comparator is not None:
                ref = ref.filter(self.comparator.compare(F.col("value"), self.op))
            stamps = ref.select("row", "ts").distinct()
            out = df.join(stamps, on=["row", "ts"], how="left_semi")
            if self.drop_dependent_column:
                out = out.filter(
                    ~((F.col("family") == fam) & (F.col("qualifier") == qual))
                )
            return out

        return Compiled(stream_transform=transform, multi_consume=True)


class SkipFilter(Filter):
    """filter/SkipFilter.java:30-47 — drop the entire row if ANY cell
    fails the wrapped filter's cell predicate.  Evaluated on the
    pre-version-count stream, exactly like the reference (a failing old
    version still kills the row)."""

    def __init__(self, inner: Filter):
        self.inner = inner

    def compile(self) -> Compiled:
        pred = self.inner.compile().cell_pred
        if pred is None:
            raise ValueError("SkipFilter requires a cell-predicate filter inside")

        def drop(stream: DataFrame) -> DataFrame:
            return stream.filter(~pred).select("row").distinct()

        return Compiled(row_drop=drop)


class WhileMatchFilter(Filter):
    """filter/WhileMatchFilter.java:30-37 — emit cells while the wrapped
    filter passes; terminate the scan at the first failing cell.  The
    reference flips filterAllRemaining only AFTER the failing cell, so
    passing cells of the boundary row that sort before it in KeyValue
    order (KeyValue.java:1329: row, family, qualifier asc, ts desc, seq
    desc) are still emitted — this keeps exactly the cells strictly
    before the first failing cell in that total order."""

    def __init__(self, inner: Filter):
        self.inner = inner

    @staticmethod
    def _kv_pos():
        # negate ts/seq so an ascending struct comparison gives KeyValue
        # order (newest version first within a qualifier)
        return F.struct(
            F.col("row").alias("r"),
            F.col("family").alias("f"),
            F.col("qualifier").alias("q"),
            (-F.col("ts")).alias("nts"),
            (-F.col("seq")).alias("nseq"),
        )

    def compile(self) -> Compiled:
        inner_c = self.inner.compile()
        if inner_c.cell_pred is not None:
            pred = inner_c.cell_pred
            pos = self._kv_pos

            def cut(stream: DataFrame) -> DataFrame:
                first_bad = stream.filter(~pred).agg(F.min(pos()).alias("_stop"))
                return (
                    stream.crossJoin(F.broadcast(first_bad))
                    .filter(F.col("_stop").isNull() | (pos() < F.col("_stop")))
                    .drop("_stop")
                )

            return Compiled(stream_transform=cut, row_cut=True,
                            multi_consume=True)
        if inner_c.row_keep is not None:
            if isinstance(self.inner, PageFilter):
                # PageFilter keeps a PREFIX of the row order, so the
                # first rejected row is exactly row n+1 and the
                # while-match cut is the page itself — skip the
                # distinct + anti-join entirely (this is the
                # PerformanceEvaluation filterScan hot path)
                return Compiled(row_keep=inner_c.row_keep)
            # row-level inner (SCVF, ...): the reference's
            # WhileMatch.filterRow flips filterAllRemaining at the FIRST
            # row the inner filter rejects — everything from that row on
            # is cut, kept or not (TestFilter.
            # testWhileMatchFilterWithFilterKeyValue: the first row
            # fails the SCVF, so the whole scan yields nothing).
            keep = inner_c.row_keep

            def keep_while(stream: DataFrame) -> DataFrame:
                kept = keep(stream)
                first_bad = (
                    stream.select("row").distinct()
                    .join(kept, on="row", how="left_anti")
                    .agg(F.min("row").alias("_stop"))
                )
                return (
                    kept.crossJoin(F.broadcast(first_bad))
                    .filter(F.col("_stop").isNull()
                            | (F.col("row") < F.col("_stop")))
                    .select("row")
                )

            return Compiled(row_keep=keep_while, row_cut=True)
        raise ValueError("WhileMatchFilter: unsupported inner filter")


class FilterList(Filter):
    """filter/FilterList.java:34-52 — AND (MUST_PASS_ALL) / OR
    (MUST_PASS_ONE) tree of filters, arbitrarily nested.

    AND composes each contribution at its pipeline stage (the exact
    chained-``filterKeyValue`` semantics).  OR is supported across
    cell-predicate filters (predicate disjunction) and across row-set
    filters (union of kept rows); OR over pagination/stream filters
    would need per-branch materialization and is rejected — the
    reference's own test corpus (TestFilterList) uses none."""

    MUST_PASS_ALL = "MUST_PASS_ALL"
    MUST_PASS_ONE = "MUST_PASS_ONE"

    def __init__(self, operator: str, filters: Sequence[Filter]):
        self.operator = operator
        self.filters = list(filters)

    def compile(self) -> Compiled:
        parts = [f.compile() for f in self.filters]
        if self.operator == self.MUST_PASS_ALL:
            out = Compiled()
            transforms, keeps, drops, posts = [], [], [], []
            for p in parts:
                if p.cell_pred is not None:
                    out.cell_pred = (
                        p.cell_pred if out.cell_pred is None else out.cell_pred & p.cell_pred
                    )
                if p.stream_transform:
                    transforms.append(p.stream_transform)
                if p.row_keep:
                    keeps.append(p.row_keep)
                if p.row_drop:
                    drops.append(p.row_drop)
                if p.post:
                    posts.append(p.post)
                if p.range_hint and out.range_hint is None:
                    out.range_hint = p.range_hint

            def chain(fns):
                def run(df):
                    for fn in fns:
                        df = fn(df)
                    return df
                return run if fns else None

            out.stream_transform = chain(transforms)
            out.multi_consume = any(p.multi_consume for p in parts)
            out.post = chain(posts)
            if keeps and drops:
                # ordered fold over BOTH hook kinds, matching
                # FilterList.filterRow's in-order short-circuit: a row a
                # preceding child drops (SkipFilter) must never consume a
                # later PageFilter slot, and a row PageFilter accepted
                # still counts against the page even if a LATER child
                # drops it (the reference client may see < pageSize rows
                # then).  Separate keep/drop buckets lost that order.
                def row_select(stream, _parts=parts):
                    alive = stream
                    for pc in _parts:
                        if pc.row_drop is not None:
                            alive = alive.join(pc.row_drop(alive),
                                               on="row", how="left_anti")
                        if pc.row_keep is not None:
                            alive = alive.join(pc.row_keep(alive),
                                               on="row", how="left_semi")
                    return alive.select("row").distinct()
                out.row_keep = row_select
            elif keeps:
                # sequential restriction, matching FilterList.filterRow's
                # in-order child evaluation: a later row-counting filter
                # (PageFilter) only sees rows the earlier children kept
                def keep_all(stream, _keeps=keeps):
                    acc_stream = stream
                    rows = None
                    for k in _keeps:
                        rows = k(acc_stream)
                        acc_stream = acc_stream.join(rows, on="row", how="left_semi")
                    return rows
                out.row_keep = keep_all
            elif drops:
                def drop_any(stream, _drops=drops):
                    acc = _drops[0](stream)
                    for d in _drops[1:]:
                        acc = acc.unionByName(d(stream))
                    return acc.distinct()
                out.row_drop = drop_any
            return out

        # MUST_PASS_ONE
        if any(p.post or (p.stream_transform and not p.row_cut) for p in parts):
            # a per-row cell-counting transform (pagination family) keeps
            # cells of EVERY row, so row-unioning it would degenerate the
            # OR to keep-everything — reject loudly, as documented
            raise NotImplementedError(
                "FilterList OR over pagination/stream-counting filters is "
                "not supported"
            )
        pure = [p.cell_pred for p in parts if p.cell_pred is not None and not (p.row_keep or p.row_drop or p.stream_transform)]
        rowish = [p for p in parts if p.row_keep or p.row_drop or p.stream_transform]
        if not pure and not rowish:
            raise ValueError(
                "FilterList MUST_PASS_ONE needs at least one usable child"
            )
        if not rowish:
            pred = pure[0]
            for p in pure[1:]:
                pred = pred | p
            return Compiled(cell_pred=pred)

        def keep(stream: DataFrame) -> DataFrame:
            frames = []
            for pr in pure:
                frames.append(stream.filter(pr).select("row").distinct())
            for p in rowish:
                if p.row_keep:
                    frames.append(p.row_keep(stream))
                elif p.stream_transform:
                    # a stream-cutting child (WhileMatch) contributes the
                    # rows that survive its cut — OR = union of each
                    # child's kept rows, same as the row_keep branch
                    frames.append(
                        p.stream_transform(stream).select("row").distinct()
                    )
                else:
                    all_rows = stream.select("row").distinct()
                    frames.append(all_rows.join(p.row_drop(stream), on="row", how="left_anti"))
            acc = frames[0]
            for fdf in frames[1:]:
                acc = acc.unionByName(fdf)
            return acc.distinct()

        return Compiled(row_keep=keep)
