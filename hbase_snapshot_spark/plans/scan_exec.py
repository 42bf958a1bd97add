"""Scan execution pipeline — the engine's equivalent of the reference's
scanner stack (HRegion.RegionScanner:2333 → StoreScanner:36 →
ScanQueryMatcher.match:105), laid out as declarative DataFrame stages so
Catalyst plans the physical execution:

  1. row-range + prefix pruning          (file skipping / seek hints)
  2. mask(): family proj, TTL, tombstones, time range
  3. filter cell predicate               (filterKeyValue SKIP path)
  4. filter stream transforms            (per-row cell counting filters)
  5. qualifier projection                (ExplicitColumnTracker)
  6. version counting                    (newest N per column)
  7. row keep/drop joins + post hooks    (filterRow path)

Stage 1 happens BEFORE everything so parquet row-group pruning sees the
predicate (the reference's analogue: bloom/timerange ``shouldSeek``
pruning at StoreScanner.java:150-168).  Stages 3-4 run before version
counting, matching ScanQueryMatcher.java:182-187.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hbase_snapshot_spark.resolve import ResolveSpec, count_versions, mask, project_columns

# persisted filter-stream handles keyed by cache owner (a StoredTable's
# directory).  The owner's manifest swap (mutate/compact/restore) calls
# release_caches so blocks from a superseded table version don't sit in
# the storage pool as dead weight until LRU eviction — at 100x scale
# with many distinct scans that pool fills with unreachable blocks.
_PERSISTED: dict[str, list[DataFrame]] = {}


def release_caches(owner: str) -> int:
    """unpersist every filter-stream cache registered under ``owner``;
    returns how many handles were released.  Safe while readers hold the
    derived DataFrames: unpersist only drops cached blocks, the lazy
    plan recomputes from the (still-present, pre-vacuum) segment files."""
    handles = _PERSISTED.pop(owner, [])
    for df in handles:
        df.unpersist(blocking=False)
    return len(handles)


def run_scan(cells: DataFrame, scan, cache_owner: str | None = None) -> DataFrame:
    """Execute a client.Scan against a raw cell DataFrame.

    ``cache_owner``: registry key for any persist this scan takes out,
    so the owning table can release it on manifest swap; None (bare
    DataFrame views with no table lifecycle) keeps the block-cache
    behavior — LRU eviction bounds the footprint."""
    spec: ResolveSpec = scan.to_spec()
    compiled = scan.filter.compile() if scan.filter is not None else None

    # ---- stage 1: key-range pruning (pushed to the parquet scan)
    pred = None
    start, stop = scan.start_row, scan.stop_row
    if compiled is not None and compiled.range_hint is not None:
        h_start, h_stop = compiled.range_hint
        if start is None or (h_start is not None and h_start > start):
            start = h_start
        if stop is None or (h_stop is not None and h_stop < stop):
            stop = h_stop
    if start is not None:
        pred = F.col("row") >= F.lit(start)
    if stop is not None:
        p2 = F.col("row") < F.lit(stop)
        pred = p2 if pred is None else pred & p2
    if pred is not None:
        cells = cells.filter(pred)

    # ---- stage 2: the masked "filter slot" stream
    stream = mask(cells, spec)

    # ---- stage 3: cell predicate (filterKeyValue SKIP path)
    if compiled is not None and compiled.cell_pred is not None:
        stream = stream.filter(compiled.cell_pred)

    # stream transforms (DependentColumn's stamp join, WhileMatch's
    # first-failing-cell cut) and row-level hooks all consume the stream
    # more than once; persist it so the mask shuffle runs once instead
    # of relying on plan-level exchange reuse (MEMORY_AND_DISK: spills
    # rather than recomputes at scale)
    multi_use = compiled is not None and (
        compiled.stream_transform is not None
        or compiled.row_keep is not None
        or compiled.row_drop is not None
    )
    if multi_use:
        from pyspark import StorageLevel

        # the result is lazy, so there is no safe point to release the
        # cache inside this function; owned scans register the handle so
        # the table's next manifest swap frees it (release_caches), and
        # ownerless scans fall back to LRU-bounded block-cache behavior
        stream = stream.persist(StorageLevel.MEMORY_AND_DISK)
        if cache_owner is not None:
            _PERSISTED.setdefault(cache_owner, []).append(stream)

    # ---- stage 4: stream transforms (per-row/cell counting filters)
    if compiled is not None and compiled.stream_transform is not None:
        stream = compiled.stream_transform(stream)

    # ---- stages 5-6
    out = project_columns(stream, spec)
    out = count_versions(out, spec)

    # ---- stage 7: row-level hooks (filterRow) and output shaping
    if compiled is not None:
        if compiled.row_drop is not None:
            out = out.join(compiled.row_drop(stream), on="row", how="left_anti")
        if compiled.row_keep is not None:
            out = out.join(compiled.row_keep(stream), on="row", how="left_semi")
        if compiled.post is not None:
            out = compiled.post(out)
    return out
