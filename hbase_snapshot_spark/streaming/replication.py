"""Streaming — the reference's replication stream re-expressed as
Structured Streaming, plus the watermark/window/stateful operators a
training-data pipeline needs (which the reference lacks — SURVEY §2.7:
replication is transport, not computation).

Replication parity:
  - ReplicationSource (replication/regionserver/ReplicationSource.java:
    69,224,334 readAllEntriesToReplicateOrNextFile, :518 shipEdits)
    tails WAL files and ships entries filtered by per-family replication
    scope (HColumnDescriptor.java:81,129).  Here: a file-source stream
    over the table's edit-log segments — every committed segment IS a
    WAL chunk, so "tailing the WAL" is just the parquet file source
    discovering new files; scope filtering is a predicate.
  - ReplicationSink (ReplicationSink.java:55,90 replicateEntries)
    applies edits preserving timestamps.  Here: foreachBatch appending
    the batch verbatim (ts/seq preserved) into the peer table —
    at-least-once, idempotent because a batch re-append is dedup-able on
    (row,family,qualifier,ts,type,seq).

Scale: the file source lists only NEW segment files per trigger;
foreachBatch appends are one manifest commit per micro-batch (group
commit, like HLog.sync's batching).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hbase_snapshot_spark.model import cell_schema


def cell_stream(spark: SparkSession, table_dir: str, binary: bool = False) -> DataFrame:
    """readStream over a stored table's WAL segments ONLY (the
    ``seg-*-wal-*`` names written by mutate/append_cells).  Compaction
    rewrites and adopted bulk segments are excluded on purpose: a
    compaction re-files existing edits (re-shipping would double the
    peer per compaction), and bulk loads bypass the WAL in the reference
    too — HBase famously does not replicate bulk-loaded HFiles."""
    return (
        spark.readStream.schema(cell_schema(binary=binary))
        .option("maxFilesPerTrigger", 64)
        .parquet(f"{table_dir}/segments/seg-*-wal-*")
    )


def replicate(
    spark: SparkSession,
    src_table,
    dst_table,
    checkpoint_dir: str,
    once: bool = True,
    dedupe: bool = False,
    commit_grace_s: float = 5.0,
    on_uncommitted: str = "fail",
):
    """Ship the source table's edit log into the peer table, filtered by
    family replication scope — the ReplicationSource→Sink contract.
    ``once=True`` uses availableNow (drain-and-stop; the test/batch
    mode); otherwise the stream keeps tailing.

    Delivery is at-least-once; ``dedupe=True`` makes the sink idempotent
    under duplicate delivery by anti-joining each batch against the
    peer's existing cells on (row, family, qualifier, ts, type, seq) —
    seq is part of the key because two distinct puts at the same
    (row,f,q,ts) with different seq are both legitimate ("newer store
    file wins" resolution needs both); only true re-deliveries collapse.
    Correct for re-delivered segments at the cost of a peer read per
    batch (the reference's sink has the same at-least-once contract,
    ReplicationSink.java:55).

    Source of truth is the MANIFEST, not the filesystem: the writer
    protocol puts the segment parquet on disk BEFORE the manifest
    commit, so a writer crash between the two leaves an orphan segment
    that ``src.cells()`` never shows — but the file-source glob still
    matches it.  Each batch is therefore gated on its segments being
    manifest-committed (in any manifest version — compaction drops old
    WAL segments from the HEAD manifest without un-committing them).
    A segment normally commits milliseconds after its files appear, so
    an uncommitted segment gets ``commit_grace_s`` to show up; past
    that, ``on_uncommitted`` decides (r12, ADVICE):

    * ``"fail"`` (default) — raise, failing the batch so the
      checkpoint does NOT advance past the segment and the stream
      re-delivers it on retry.  A slow commit (GC pause, slow shared
      storage between the parquet write and the manifest commit)
      costs a retry instead of silently losing committed edits — the
      at-least-once contract holds unconditionally.  A true orphan
      (crashed writer, never commits) blocks the stream until an
      operator removes the segment file or opts into ``"drop"`` —
      loud, which is what an unacknowledged-edit anomaly deserves.
    * ``"drop"`` — filter the segment out with a warning and keep
      going (the pre-r12 behavior).  Opt-in ONLY: the file source's
      checkpoint has already marked the files processed, so a dropped
      segment that later commits is never re-delivered — choose this
      only where orphans are expected and edit loss past the grace
      window is acceptable."""
    if on_uncommitted not in ("fail", "drop"):
        raise ValueError(
            f"on_uncommitted={on_uncommitted!r}: expected 'fail' or 'drop'")
    import os
    import time as _time
    import warnings

    from hbase_snapshot_spark.table import _read_json

    desc = src_table.descriptor
    scoped = [f.name for f in desc.families.values() if f.replication_scope > 0]
    stream = cell_stream(spark, src_table.dir, binary=src_table.manifest()["binary"])
    stream = stream.filter(F.col("family").isin(scoped))

    # ever-committed segment names, folded incrementally across batches
    # (manifest files are append-only versioned JSON — read each once)
    committed: set[str] = set()
    next_v = 0

    def _refresh_committed() -> None:
        nonlocal next_v
        mdir = os.path.join(src_table.dir, "manifests")
        head = src_table._head_version()
        while next_v <= head:
            try:
                committed.update(
                    _read_json(os.path.join(mdir, f"v{next_v}.json"))["segments"])
            except FileNotFoundError:
                # vacuum() drops superseded manifest versions; any
                # segment they exclusively committed is gone from disk
                # too, so nothing globbable is lost by skipping
                pass
            next_v += 1
        # vacuum can delete every manifest that committed a segment
        # while a SNAPSHOT still references (and so preserves) it —
        # HEAD + snapshot manifests are commit evidence in their own
        # right (referenced == was committed, by vacuum's refcount rule)
        committed.update(src_table.referenced_segments())

    def ship(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark import StorageLevel

        # persisted: the batch feeds the segment-commit gate, the
        # empty check, and the sink write — one evaluation, not three
        cached = batch_df.withColumn(
            "_seg", F.element_at(F.split(F.input_file_name(), "/"), -2)
        ).persist(StorageLevel.MEMORY_AND_DISK)
        batch = cached
        try:
            segs = {r[0] for r in batch.select("_seg").distinct().collect()}
            if not segs:
                return
            _refresh_committed()
            pending = segs - committed
            deadline = _time.monotonic() + commit_grace_s
            while pending and _time.monotonic() < deadline:
                _time.sleep(0.05)
                _refresh_committed()
                pending = segs - committed
            if pending:
                if on_uncommitted == "fail":
                    raise RuntimeError(
                        f"replicate: {len(pending)} segment(s) still not "
                        f"manifest-committed after {commit_grace_s}s grace: "
                        f"{sorted(pending)} — failing the batch so the "
                        "checkpoint does not advance past them (the file "
                        "source would otherwise never re-deliver, silently "
                        "losing any late-committed edits).  If these are "
                        "true orphans from a crashed writer, remove the "
                        "segment files or re-run with on_uncommitted='drop'")
                warnings.warn(
                    f"replicate: dropping {len(pending)} uncommitted "
                    f"(orphaned) segment(s) not in any source manifest: "
                    f"{sorted(pending)}")
                batch = batch.filter(~F.col("_seg").isin(sorted(pending)))
                if batch.isEmpty():
                    return
            out = batch.drop("_seg")
            if dedupe:
                key = ["row", "family", "qualifier", "ts", "type", "seq"]
                # eqNullSafe on every key column: tombstones carry NULL
                # qualifiers (DeleteFamily), and NULL = NULL is NULL under
                # plain equality — a family tombstone would never match its
                # already-delivered copy and re-append forever
                existing = dst_table.cells().select(*key)
                cond = None
                for k in key:
                    c = out[k].eqNullSafe(existing[k])
                    cond = c if cond is None else cond & c
                out = (out.dropDuplicates(key)
                       .join(existing, on=cond, how="left_anti")
                       .persist(StorageLevel.MEMORY_AND_DISK))
            try:
                # ReplicationSink.replicateEntries: apply preserving ts
                # (and seq, so duplicate-ts resolution order survives)
                if not out.isEmpty():
                    dst_table.append_cells(out)
            finally:
                if dedupe:
                    out.unpersist()
        finally:
            cached.unpersist()

    writer = (
        stream.writeStream.foreachBatch(ship)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if once:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


# ------------------------------------------------------------------ windows

def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "1 day",
    keys: list[str] | None = None,
    slide: str | None = None,
) -> DataFrame:
    """Event-time window counts with late-data watermarking — works on
    a stream or a batch DataFrame (same code path, Spark semantics
    guarantee the batch result is the stream's final state).  Default
    tumbling; pass ``slide`` for overlapping sliding windows (each
    event lands in window/slide windows)."""
    keys = keys or []
    wm = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    win = (F.window(F.col(ts_col), window, slide) if slide
           else F.window(F.col(ts_col), window))
    return (
        wm.groupBy(win, *keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *keys,
            "n",
        )
    )


def sessionize_events(
    events: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    key: str = "user_id",
    watermark: str = "1 day",
    value_col: str | None = "value",
) -> DataFrame:
    """Session windows (gap-based) per key — built-in session_window
    keeps this fully JVM-side and stateful-streaming-capable.
    ``value_col`` names the column summed per session (``sum_value``);
    pass ``None`` for event streams that carry no numeric payload —
    the default would otherwise fail at plan time on a DataFrame
    without a ``value`` column."""
    wm = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("sum_value"))
    return (
        wm.groupBy(F.session_window(F.col(ts_col), gap), F.col(key))
        .agg(*aggs)
        .select(
            F.col(key),
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            *(["sum_value"] if value_col is not None else []),
        )
    )


# --------------------------------------------------- custom stateful op

def stateful_streaming_dedup(
    stream: DataFrame,
    key_cols: list[str],
    checkpoint_passthrough_cols: list[str] | None = None,
):
    """Cross-batch exact dedup for streaming ingest — emit each key the
    first time it is seen, suppress all later occurrences.  The custom
    stateful operator pattern (applyInPandasWithState): per-key state
    holds a seen flag; Arrow batches in/out.

    This is the streaming twin of operators/dedup.exact_dedup — the
    shape a 100 TB ingest dedup uses (state store scales out per key)."""
    import pandas as pd  # noqa: F401
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [stream.schema[c] for c in (checkpoint_passthrough_cols or stream.columns)]
    )
    state_schema = T.StructType([T.StructField("seen", T.BooleanType())])

    def fn(key, pdfs, state: GroupState):
        if state.exists:
            return
        first = None
        for pdf in pdfs:
            if len(pdf):
                first = pdf.iloc[[0]]
                break
        state.update((True,))
        if first is not None:
            yield first[[f.name for f in out_schema.fields]]

    return stream.groupBy(*[F.col(c) for c in key_cols]).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _round_half_up(x: float, digits: int) -> float:
    """Round exactly like Spark's ``F.round``: the JVM builds
    BigDecimal.valueOf(double) — the double's SHORTEST decimal
    representation — and rounds HALF_UP.  Python's ``round()`` is
    half-even on the BINARY value instead, so e.g. 2.62345 (whose
    binary value is 2.62344999…) rounds to 2.6234 while Spark emits
    2.6235; the streaming==batch parity pins need the Spark answer."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(float(x)))
                 .quantize(Decimal(1).scaleb(-digits), rounding=ROUND_HALF_UP))


def streaming_distinct_hll(
    stream: DataFrame,
    key_col: str,
    group_cols: list[str],
):
    """Streaming distinct-count per group via HyperLogLog state (r8) —
    the streaming twin of operators/sketches.hll_sketch+hll_estimate.
    Per-group state is the 256-byte register array (bucket → max rho);
    every micro-batch folds its keys in and emits the group's CURRENT
    estimate (update semantics).  Hashing is identical to the batch
    sketch — md5(CAST(key AS STRING)) with the cast IN THE PLAN so the
    JVM formats the key (Python str() disagrees with the JVM cast for
    double/boolean/timestamp/decimal keys: '1e+16' vs '1.0E16', 'True'
    vs 'true') — so after draining a source the streaming estimate
    EQUALS the batch estimate of the same data for EVERY key type;
    pinned by test_streaming.

    100 TB shape: state is m bytes per group no matter how many keys
    flow through — the property that makes per-entity lifetime distinct
    counts feasible in a state store; exact streaming distinct state
    grows with the key universe."""
    import hashlib
    import math

    import numpy as np
    import pandas as pd  # noqa: F401
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    m = 256
    alpha = 0.7213 / (1.0 + 1.079 / m)
    # parity by construction: hash the JVM-formatted string (the exact
    # bytes batch hll_sketch hashes); the cast also sidesteps Arrow's
    # nullable-long → float64 coercion entirely
    key_str = "__hll_key_str"
    stream = stream.withColumn(key_str, F.col(key_col).cast("string"))
    out_schema = T.StructType(
        [stream.schema[c] for c in group_cols]
        + [T.StructField("est", T.DoubleType()),
           T.StructField("nonempty", T.IntegerType())]
    )
    state_schema = T.StructType([T.StructField("regs", T.BinaryType())])

    def fn(key, pdfs, state: GroupState):
        regs = (
            np.frombuffer(state.get[0], dtype=np.uint8).copy()
            if state.exists else np.zeros(m, dtype=np.uint8)
        )
        for pdf in pdfs:
            # dropna matches batch hll_sketch's key.isNotNull() filter;
            # unique() because duplicate keys can't move a max-register
            # — one md5 per DISTINCT key per batch, not per row
            for v in pdf[key_str].dropna().unique():
                hx = hashlib.md5(str(v).encode()).hexdigest()
                b = int(hx[:2], 16)
                rest = hx[2:15]
                stripped = rest.lstrip("0")
                z = 13 - len(stripped)
                if z == 13:
                    rho = 53
                else:
                    c = stripped[0]
                    rho = 4 * z + (3 if c == "1" else 2 if c in "23"
                                   else 1 if c in "4567" else 0) + 1
                if rho > regs[b]:
                    regs[b] = rho
        state.update((regs.tobytes(),))
        nonempty = int((regs > 0).sum())
        s = float(np.power(2.0, -regs[regs > 0].astype(np.float64)).sum()) \
            + (m - nonempty)
        e = alpha * m * m / s
        v_empty = m - nonempty
        est = (m * math.log(m / v_empty)
               if (e <= 2.5 * m and v_empty > 0) else e)
        yield pd.DataFrame(
            [tuple(key) + (_round_half_up(est, 4), nonempty)],
            columns=[f.name for f in out_schema.fields],
        )

    return stream.groupBy(*[F.col(c) for c in group_cols]) \
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )


def streaming_heavy_hitters(
    stream: DataFrame,
    key_col: str,
    group_cols: list[str],
    k: int = 10,
    track: int = 64,
):
    """Streaming per-group heavy hitters via Count-Min state (r9) — the
    streaming twin of operators/sketches.cms_sketch + cms_query, in the
    sketch-and-heap shape of Charikar/Chen/Farach-Colton 2002: per-group
    state is the FIXED d×256 counter grid plus a bounded candidate set.
    Every micro-batch folds its keys into the counters, re-estimates
    candidates ∪ this batch's keys from the counters, keeps the
    ``track`` largest as the new candidates, and emits the current
    top-``k`` (update semantics, rank by estimate desc then key asc).

    Counter updates hash exactly like the batch sketch —
    md5('<row>:' + CAST(key AS STRING)) with the cast IN THE PLAN so
    the JVM formats the key (parity for every key type, including
    double/timestamp/decimal where Python str() disagrees) — so after
    draining a source every key retained in the candidate set carries
    EXACTLY the batch ``cms_query`` estimate — pinned by test.  A true
    heavy hitter can only be absent if it never ranked in the top
    ``track`` at any batch boundary (the standard sketch-heap
    guarantee; size ``track`` ≫ k to taste).

    100 TB shape: state is d·256 longs + ``track`` keys per group no
    matter how many distinct keys flow through — the property that
    makes per-entity lifetime top-k feasible in a state store; exact
    streaming top-k state grows with the key universe.  The emitted
    ``key`` column is the Spark string cast of the key."""
    import hashlib

    import numpy as np
    import pandas as pd  # noqa: F401
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from hbase_snapshot_spark.operators.sketches import _CMS_D, _CMS_W

    # parity by construction, exactly like streaming_quantiles /
    # streaming_distinct_hll: hash the JVM-formatted string
    key_str = "__cms_key_str"
    stream = stream.withColumn(key_str, F.col(key_col).cast("string"))
    out_schema = T.StructType(
        [stream.schema[c] for c in group_cols]
        + [T.StructField("key", T.StringType()),
           T.StructField("est", T.LongType()),
           T.StructField("rank", T.IntegerType())]
    )
    state_schema = T.StructType([
        T.StructField("regs", T.BinaryType()),
        T.StructField("cands", T.ArrayType(T.StringType())),
    ])

    def _buckets(s: str) -> list[int]:
        return [
            int(hashlib.md5(f"{r}:{s}".encode()).hexdigest()[:2], 16)
            for r in range(_CMS_D)
        ]

    def fn(key, pdfs, state: GroupState):
        if state.exists:
            st_regs, st_cands = state.get
            regs = np.frombuffer(st_regs, dtype=np.int64).copy()
            cands = list(st_cands)
        else:
            regs = np.zeros(_CMS_D * _CMS_W, dtype=np.int64)
            cands = []
        batch_keys = set()
        for pdf in pdfs:
            # one set of _CMS_D md5 calls per DISTINCT key per batch —
            # a hot key occurring 100k times adds its COUNT to each
            # bucket instead of hashing 100k times
            for s, c in pdf[key_str].dropna().value_counts().items():
                batch_keys.add(s)
                for r, b in enumerate(_buckets(s)):
                    regs[r * _CMS_W + b] += int(c)

        def estimate(s: str) -> int:
            return int(min(
                regs[r * _CMS_W + b] for r, b in enumerate(_buckets(s))))

        scored = sorted(
            ((estimate(s), s) for s in set(cands) | batch_keys),
            key=lambda t: (-t[0], t[1]))
        scored = scored[:track]
        state.update((regs.tobytes(), [s for _e, s in scored]))
        top = scored[:k]
        yield pd.DataFrame(
            [tuple(key) + (s, e, i + 1) for i, (e, s) in enumerate(top)],
            columns=[f.name for f in out_schema.fields],
        )

    return stream.groupBy(*[F.col(c) for c in group_cols]) \
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )


def streaming_quantiles(
    stream: DataFrame,
    value_col: str,
    ident_col: str,
    group_cols: list[str],
    k: int = 256,
    probs: tuple[float, ...] = (0.5,),
):
    """Streaming per-group quantiles via bottom-k-sample state (r10) —
    the streaming twin of sketches.quantile_sketch+quantile_estimate.
    Per-group state is the k (identity-hash, value) register pairs
    (bounded regardless of how many rows flow through); every
    micro-batch folds its rows in and emits the group's CURRENT
    estimates for each ``probs`` entry (update semantics).  Hashing and
    the lower-rank selection are identical to the batch sketch, so
    after draining a source the streaming estimates EQUAL the batch
    estimates of the same data — pinned by test_streaming.

    100 TB shape: the state store carries 16k bytes per group, never
    the value multiset — per-entity lifetime latency/size percentiles
    stay feasible where an exact percentile's state would grow without
    bound."""
    import hashlib
    import math

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    den = float(16 ** 13)
    # Parity contract: the batch sketch hashes md5(CAST(ident AS
    # STRING)) — JVM formatting.  Python str() agrees for ints and
    # strings but NOT for double/timestamp/decimal (1e16 -> '1e+16'
    # vs '1.0E16'), so do the cast IN THE PLAN and hash the
    # JVM-formatted string — parity holds by construction for every
    # identity type.
    ident_str = "__qsk_ident_str"
    stream = stream.withColumn(ident_str, F.col(ident_col).cast("string"))
    out_schema = T.StructType(
        [stream.schema[c] for c in group_cols]
        + [T.StructField("p", T.DoubleType()),
           T.StructField("est", T.DoubleType()),
           T.StructField("n_reg", T.IntegerType())]
    )
    state_schema = T.StructType([
        T.StructField("fracs", T.BinaryType()),
        T.StructField("vals", T.BinaryType()),
    ])

    def fn(key, pdfs, state: GroupState):
        if state.exists:
            fracs = np.frombuffer(state.get[0], dtype=np.float64).copy()
            vals = np.frombuffer(state.get[1], dtype=np.float64).copy()
        else:
            fracs = np.empty(0, np.float64)
            vals = np.empty(0, np.float64)
        pairs = {(float(f), float(v)) for f, v in zip(fracs, vals)}
        for pdf in pdfs:
            for ident, v in zip(pdf[ident_str], pdf[value_col]):
                # batch filter parity: null value or null identity
                # contributes nothing
                if not isinstance(ident, str) or pd.isna(v):
                    continue   # None/NaN ident (null) or null value
                hx = hashlib.md5(ident.encode()).hexdigest()
                frac = int(hx[:13], 16) / den
                pairs.add((frac, float(v)))
        reg = sorted(pairs)[:k]   # bottom-k by (frac, val) — batch order
        fracs = np.array([f for f, _ in reg], np.float64)
        vals = np.array([v for _, v in reg], np.float64)
        state.update((fracs.tobytes(), vals.tobytes()))
        n = len(reg)
        out = []
        if n:
            by_val = sorted((v, f) for f, v in reg)
            for p in probs:
                est = by_val[math.floor(p * (n - 1))][0]
                out.append(tuple(key) + (float(p), est, n))
        yield pd.DataFrame(
            out, columns=[f.name for f in out_schema.fields])

    return stream.groupBy(*[F.col(c) for c in group_cols]) \
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
