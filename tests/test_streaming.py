"""Streaming tests: replication source→sink contract, event-time
windows, sessionization, cross-batch stateful dedup."""

import datetime

import pytest

from pyspark.sql import functions as F

from hbase_snapshot_spark.model import FamilyDescriptor, TableDescriptor
from hbase_snapshot_spark.streaming import (
    replicate,
    sessionize_events,
    stateful_streaming_dedup,
    windowed_event_counts,
)
from hbase_snapshot_spark.table import Delete, Put, TableStore


@pytest.fixture()
def stores(spark, tmp_path):
    src_store = TableStore(spark, str(tmp_path / "src"))
    dst_store = TableStore(spark, str(tmp_path / "dst"))
    desc = (
        TableDescriptor("t")
        .add_family(FamilyDescriptor("f", replication_scope=1))
        .add_family(FamilyDescriptor("local", replication_scope=0))
    )
    import copy

    src = src_store.create_table(copy.deepcopy(desc))
    dst = dst_store.create_table(copy.deepcopy(desc))
    return src, dst


def cellset(df):
    return {(r.row, r.family, r.qualifier, r.ts, r.type, r.value) for r in df.collect()}


def test_replication_ships_scoped_families(spark, stores, tmp_path):
    src, dst = stores
    src.mutate([
        Put("r1").add("f", "q", "v1", ts=10).add("local", "q", "nope", ts=10),
        Put("r2").add("f", "q", "v2", ts=10),
    ])
    src.mutate([Delete("r1").delete_columns("f", "q", ts=15)])
    replicate(spark, src, dst, str(tmp_path / "ckpt"), once=True)
    shipped = cellset(dst.cells())
    # scope=1 family replicated (puts AND tombstones, ts preserved);
    # scope=0 family not shipped
    assert ("r1", "f", "q", 10, 4, "v1") in shipped
    assert ("r2", "f", "q", 10, 4, "v2") in shipped
    assert ("r1", "f", "q", 15, 12, None) in shipped
    assert not any(fam == "local" for (_, fam, *_rest) in shipped)
    # resolved view agrees with the source's replicated family
    assert {r.row for r in dst.read().collect()} == {"r2"}


def test_replication_incremental(spark, stores, tmp_path):
    src, dst = stores
    ckpt = str(tmp_path / "ckpt2")
    src.mutate([Put("a").add("f", "q", "1", ts=1)])
    replicate(spark, src, dst, ckpt, once=True)
    n1 = dst.cells().count()
    src.mutate([Put("b").add("f", "q", "2", ts=2)])
    replicate(spark, src, dst, ckpt, once=True)
    shipped = cellset(dst.cells())
    # second drain ships only the new segment (checkpointed offsets)
    assert n1 == 1 and len(shipped) == 2
    assert ("b", "f", "q", 2, 4, "2") in shipped


def _events(spark):
    base = datetime.datetime(2026, 1, 1, 0, 0, 0)
    rows = []
    for uid, offsets in [(1, [0, 10, 70]), (2, [5, 200])]:
        for off in offsets:
            rows.append((uid, base + datetime.timedelta(minutes=off), 1.0))
    return spark.createDataFrame(rows, ["user_id", "ts", "value"])


def test_windowed_counts_batch_parity(spark):
    ev = _events(spark)
    out = {
        (r.window_start.minute + 60 * r.window_start.hour, r.n)
        for r in windowed_event_counts(ev, window="1 hour").collect()
    }
    assert out == {(0, 3), (60, 1), (180, 1)}


def test_sessionize(spark):
    ev = _events(spark)
    out = sessionize_events(ev, gap="30 minutes").collect()
    got = {(r.user_id, r.n_events) for r in out}
    # user1: [0,10] one session, [70] another; user2: [5], [200]
    assert got == {(1, 2), (1, 1), (2, 1), (2, 1)}


def test_sessionize_streaming_drain_matches_batch(spark, tmp_path):
    """(r11) sessionize_events' STREAMING path (watermark + built-in
    session_window state): events arriving over two micro-batches,
    append-mode drain — every session the watermark has closed is
    emitted exactly once and EQUALS the batch operator's row for the
    same session; the still-open trailing session stays in state."""
    from datetime import datetime

    def t(minute):
        return datetime(2026, 1, 1, minute // 60, minute % 60)

    # user 1: session [0..2], session [20..21]; user 2: session [1]
    early = [(1, t(0), 1.0), (1, t(2), 2.0), (1, t(20), 3.0),
             (1, t(21), 4.0), (2, t(1), 5.0)]
    # the sentinel batch pushes the watermark past every early session
    late = [(1, t(300), 9.0)]
    schema = "user_id long, ts timestamp, value double"
    src = tmp_path / "sess-src"
    src.mkdir()
    spark.createDataFrame(early, schema).write.parquet(str(src / "b1"))
    spark.createDataFrame(late, schema).write.parquet(str(src / "b2"))

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(str(src / "*")))
    q = (sessionize_events(stream, gap="5 minutes",
                           watermark="10 minutes")
         .writeStream.format("memory").queryName("sess_drain")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "sess-ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    got = {(r.user_id, r.session_start, r.session_end, r.n_events,
            r.sum_value)
           for r in spark.sql("SELECT * FROM sess_drain").collect()}

    batch = sessionize_events(
        spark.createDataFrame(early + late, schema), gap="5 minutes")
    frontier = t(300 - 10)
    want = {(r.user_id, r.session_start, r.session_end, r.n_events,
             r.sum_value)
            for r in batch.collect() if r.session_end <= frontier}
    assert got == want and len(got) == 3
    # the sentinel's own session is still open — not emitted
    assert not any(s == t(300) for _, s, _, _, _ in got)


def test_stateful_streaming_dedup(spark, tmp_path):
    # two micro-batches with overlapping keys: the second occurrence of a
    # key is suppressed even across batches (state persists)
    src_dir = tmp_path / "stream-src"
    src_dir.mkdir()
    spark.createDataFrame(
        [("k1", "a"), ("k2", "b")], ["key", "payload"]
    ).write.parquet(str(src_dir / "batch1"))

    stream = (
        spark.readStream.schema("key string, payload string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir / "*"))
    )
    out_dir = str(tmp_path / "dedup-out")

    def drain():
        q = (
            stateful_streaming_dedup(stream, ["key"])
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    first = {(r.key, r.payload) for r in spark.read.parquet(out_dir).collect()}
    assert first == {("k1", "a"), ("k2", "b")}

    spark.createDataFrame(
        [("k1", "dup"), ("k3", "c")], ["key", "payload"]
    ).write.parquet(str(src_dir / "batch2"))
    drain()
    second = {(r.key, r.payload) for r in spark.read.parquet(out_dir).collect()}
    assert ("k3", "c") in second
    assert ("k1", "dup") not in second


def test_streaming_distinct_hll_matches_batch(spark, tmp_path):
    """After draining all micro-batches, the streaming HLL estimate must
    equal the BATCH sketch estimate of the same data — the registers are
    the same function of the key set."""
    from pyspark.sql import functions as F

    from hbase_snapshot_spark.operators import sketches as sk
    from hbase_snapshot_spark.streaming.replication import (
        streaming_distinct_hll,
    )

    src_dir = tmp_path / "hll-src"
    src_dir.mkdir()
    rows1 = [(i % 40, "g1") for i in range(100)] + [
        (i % 7, "g2") for i in range(30)]
    rows2 = [(i % 90, "g1") for i in range(200)]  # overlaps batch 1
    spark.createDataFrame(rows1, ["user_id", "grp"]).write.parquet(
        str(src_dir / "b1"))
    spark.createDataFrame(rows2, ["user_id", "grp"]).write.parquet(
        str(src_dir / "b2"))

    stream = (
        spark.readStream.schema("user_id long, grp string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir / "*"))
    )
    q = (
        streaming_distinct_hll(stream, "user_id", ["grp"])
        .writeStream.format("memory")
        .queryName("hll_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "hll-ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.sql("select * from hll_out").collect()
    # final estimate per group = the row with max nonempty (register
    # count is monotonic across micro-batches; memory-sink row order
    # across batches is NOT guaranteed, so don't rely on it)
    last, best = {}, {}
    for r in out:
        key = (r.nonempty, r.est)  # registers only grow ⇒ both monotonic
        if key >= best.get(r.grp, (-1, -1.0)):
            best[r.grp] = key
            last[r.grp] = r.est
    batch = spark.createDataFrame(rows1 + rows2, ["user_id", "grp"])
    expected = {
        r.grp: r.est
        for r in sk.hll_estimate(
            sk.hll_sketch(batch, F.col("user_id"), ["grp"]), ["grp"]
        ).collect()
    }
    assert set(last) == {"g1", "g2"}
    for g in last:
        assert abs(last[g] - expected[g]) < 1e-6, (g, last[g], expected[g])
    # sane accuracy on the true cardinalities (g1: 90, g2: 7)
    assert abs(last["g1"] - 90) / 90 < 0.2
    assert abs(last["g2"] - 7) < 2.5


def test_replication_duplicate_delivery_idempotent(spark, stores, tmp_path):
    # F6 corpus contract: duplicate delivery converges (dedupe sink)
    src, dst = stores
    src.mutate([Put("r1").add("f", "q", "v", ts=10)])
    replicate(spark, src, dst, str(tmp_path / "c1"), once=True, dedupe=True)
    # simulate re-delivery: fresh checkpoint ⇒ the whole log replays
    replicate(spark, src, dst, str(tmp_path / "c2"), once=True, dedupe=True)
    assert dst.cells().count() == 1
    assert {r.value for r in dst.read().collect()} == {"v"}


def test_replication_dedupe_keeps_distinct_seq(spark, stores, tmp_path):
    # two legitimate puts at the same (row,f,q,ts) differ only by seq
    # ("newer store file wins"): the idempotent sink keys its anti-join
    # on seq too, so both survive — while true re-deliveries converge
    src, dst = stores
    src.mutate([Put("r1").add("f", "q", "old", ts=10)])
    src.mutate([Put("r1").add("f", "q", "new", ts=10)])
    replicate(spark, src, dst, str(tmp_path / "c1"), once=True, dedupe=True)
    assert dst.cells().count() == 2
    replicate(spark, src, dst, str(tmp_path / "c2"), once=True, dedupe=True)
    assert dst.cells().count() == 2
    # replica resolves exactly what the source resolves (both cells at
    # multi-version reads; the newer seq at maxVersions=1)
    from hbase_snapshot_spark.resolve import ResolveSpec

    assert cellset(dst.read()) == cellset(src.read())
    spec = ResolveSpec(max_versions=1)
    assert {r.value for r in dst.read(spec=spec).collect()} == {"new"}


def test_windowed_counts_streaming_late_data_dropped(spark, tmp_path):
    # TRUE streaming run of the windowed operator: tumbling 1h window +
    # 1h watermark in append mode.  An event arriving in a later batch
    # but older than the watermark is dropped; the finalized window
    # emits exactly once with the on-time count.
    import datetime as dt

    base = dt.datetime(2026, 1, 1, 0, 0, 0)
    src = tmp_path / "wsrc"
    src.mkdir()
    spark.createDataFrame(
        [(1, base + dt.timedelta(minutes=m), 1.0) for m in (5, 10, 120)],
        ["user_id", "ts", "value"],
    ).write.parquet(str(src / "b1"))

    stream = spark.readStream.schema(
        "user_id bigint, ts timestamp, value double"
    ).parquet(str(src / "*"))
    out_dir = str(tmp_path / "wout")

    def drain():
        q = (
            windowed_event_counts(stream, window="1 hour", watermark="1 hour")
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", str(tmp_path / "wckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    # late event at 00:20 (watermark is already 01:00) + on-time 02:10
    spark.createDataFrame(
        [(2, base + dt.timedelta(minutes=20), 1.0),
         (2, base + dt.timedelta(minutes=130), 1.0)],
        ["user_id", "ts", "value"],
    ).write.parquet(str(src / "b2"))
    drain()

    rows = spark.read.parquet(out_dir).collect()
    finalized = {(r.window_start.hour, r.n) for r in rows}
    # hour-0 window finalized with the TWO on-time events only — the
    # 00:20 straggler was behind the watermark and never counted
    assert finalized == {(0, 2)}


def test_replication_family_tombstone_idempotent(spark, stores, tmp_path):
    # whole-row deletes ship DeleteFamily cells with NULL qualifiers;
    # the idempotent sink must null-safely match them on re-delivery
    src, dst = stores
    src.mutate([Put("r1").add("f", "q", "v", ts=10)])
    src.mutate([Delete("r1")])
    replicate(spark, src, dst, str(tmp_path / "f1"), once=True, dedupe=True)
    n1 = dst.cells().count()
    replicate(spark, src, dst, str(tmp_path / "f2"), once=True, dedupe=True)
    assert dst.cells().count() == n1  # tombstones converge too
    assert dst.read().count() == 0


def test_replication_skips_compaction_rewrites(spark, stores, tmp_path):
    # a compaction re-files existing edits; the WAL tail must not
    # re-ship them (and bulk-adopted segments bypass the WAL, like the
    # reference's bulk-loaded HFiles)
    src, dst = stores
    for k in range(4):
        src.mutate([Put(f"r{k}").add("f", "q", str(k), ts=10)])
    replicate(spark, src, dst, str(tmp_path / "ckpt"), once=True)
    n1 = dst.cells().count()
    src.compact()  # full rewrite into a -compact- segment
    replicate(spark, src, dst, str(tmp_path / "ckpt"), once=True)
    assert dst.cells().count() == n1  # nothing new shipped


# ----------------- replication/regionserver/TestReplicationSink.java port
#
# The sink contract: applied entries preserve their timestamps and
# types, so the peer's RESOLVED view matches what the same edits would
# have produced locally.  createEntry gives each entry a distinct,
# increasing ts (the reference sleeps 1 ms between entries).


def test_replication_sink_batch(spark, stores, tmp_path):
    """testBatchSink:117 — a whole batch of puts arrives; peer scan
    sees every row."""
    src, dst = stores
    src.mutate([Put(f"{i:02d}").add("f", "q1", f"v{i}", ts=100 + i)
                for i in range(6)])
    replicate(spark, src, dst, str(tmp_path / "ck_batch"), once=True)
    assert {r.row for r in dst.read().collect()} == {f"{i:02d}" for i in range(6)}


def test_replication_sink_mixed_put_delete(spark, stores, tmp_path):
    """testMixedPutDelete:133 — first batch all puts; second batch
    re-puts odd rows and DeleteColumns even rows; peer resolves to the
    odd half."""
    src, dst = stores
    ckpt = str(tmp_path / "ck_mixed")
    src.mutate([Put(f"{i:02d}").add("f", "q1", f"v{i}", ts=100 + i)
                for i in range(6)])
    replicate(spark, src, dst, ckpt, once=True)

    muts = []
    for i in range(6):
        if i % 2 != 0:
            muts.append(Put(f"{i:02d}").add("f", "q1", f"w{i}", ts=200 + i))
        else:
            muts.append(Delete(f"{i:02d}").delete_columns("f", "q1", ts=200 + i))
    src.mutate(muts)
    replicate(spark, src, dst, ckpt, once=True)

    assert {r.row for r in dst.read().collect()} \
        == {f"{i:02d}" for i in range(6) if i % 2 != 0}


def test_replication_sink_mixed_tables(spark, tmp_path):
    """testMixedPutTables:157 — entries interleave two tables; each
    peer table receives only its own rows."""
    import copy
    src_store = TableStore(spark, str(tmp_path / "src2"))
    dst_store = TableStore(spark, str(tmp_path / "dst2"))
    desc1 = TableDescriptor("t1").add_family(FamilyDescriptor("f", replication_scope=1))
    desc2 = TableDescriptor("t2").add_family(FamilyDescriptor("f", replication_scope=1))
    src1 = src_store.create_table(copy.deepcopy(desc1))
    src2 = src_store.create_table(copy.deepcopy(desc2))
    dst1 = dst_store.create_table(copy.deepcopy(desc1))
    dst2 = dst_store.create_table(copy.deepcopy(desc2))

    for i in range(6):
        target = src2 if i % 2 == 0 else src1
        target.mutate([Put(f"{i:02d}").add("f", "q1", f"v{i}", ts=100 + i)])
    # one ReplicationSource per table (the reference's source set)
    replicate(spark, src1, dst1, str(tmp_path / "ck_t1"), once=True)
    replicate(spark, src2, dst2, str(tmp_path / "ck_t2"), once=True)

    assert all(int(r.row) % 2 == 0 for r in dst2.read().collect())
    assert all(int(r.row) % 2 != 0 for r in dst1.read().collect())
    assert dst2.read().count() == 3 and dst1.read().count() == 3


def test_replication_sink_mixed_deletes(spark, stores, tmp_path):
    """testMixedDeletes:178 — put 3 rows, then DeleteColumn /
    DeleteFamily / DeleteColumn them; peer scan is empty."""
    src, dst = stores
    ckpt = str(tmp_path / "ck_dels")
    src.mutate([Put(f"{i:02d}").add("f", "q1", f"v{i}", ts=100 + i)
                for i in range(3)])
    replicate(spark, src, dst, ckpt, once=True)
    src.mutate([
        Delete("00").delete_columns("f", "q1", ts=200),
        Delete("01").delete_family("f", ts=201),
        Delete("02").delete_columns("f", "q1", ts=202),
    ])
    replicate(spark, src, dst, ckpt, once=True)
    assert dst.read().count() == 0


def test_replication_sink_delete_before_put_entry(spark, stores, tmp_path):
    """testApplyDeleteBeforePut:203 — one shipped batch carries puts
    for rows 0,1, then a DeleteFamily for row 1, then more puts; the
    peer's get(row1) is empty (ts order decides, not arrival order)."""
    src, dst = stores
    src.mutate([Put("00").add("f", "q1", "v0", ts=100),
                Put("01").add("f", "q1", "v1", ts=101)])
    src.mutate([Delete("01").delete_family("f", ts=102)])
    src.mutate([Put("03").add("f", "q1", "v3", ts=103),
                Put("04").add("f", "q1", "v4", ts=104)])
    replicate(spark, src, dst, str(tmp_path / "ck_dbp"), once=True)
    assert {r.row for r in dst.read().collect()} == {"00", "03", "04"}


def test_stream_ingest_corpus_end_to_end(spark, tmp_path):
    """Two arrivals into the ingest directory: run 1 gates + dedups +
    appends batch 1; run 2 (same checkpoint) processes ONLY the new
    file, suppresses cross-run duplicate texts, and appends the rest —
    exactly-once across restarts."""
    from hbase_snapshot_spark.streaming.ingest import stream_ingest_corpus

    good = ("the quick brown fox is of a mind to jump over the lazy "
            "dog and the dog is not amused ") * 2
    src = tmp_path / "arrivals"
    src.mkdir()
    out, ckpt = str(tmp_path / "corpus"), str(tmp_path / "ckpt")

    def doc(i, text):
        return (i, text, "en", f"src{i % 3}", len(text))

    schema = ("doc_id bigint, text string, lang string, source string, "
              "n_chars bigint")
    spark.createDataFrame(
        [doc(1, good + "one"), doc(2, good + "one"),   # in-batch dup
         doc(3, good + "two"), doc(4, "??!!")],        # 4 fails quality
        schema,
    ).write.parquet(str(src / "f1"))

    def drain():
        q = stream_ingest_corpus(
            spark, str(src / "*"), out, ckpt, min_quality=0.5)
        q.awaitTermination()

    drain()
    got = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert got == {1, 3}

    spark.createDataFrame(
        [doc(5, good + "one"),                         # cross-RUN dup
         doc(6, good + "three")],
        schema,
    ).write.parquet(str(src / "f2"))
    drain()
    rows = spark.read.parquet(out).collect()
    assert {r.doc_id for r in rows} == {1, 3, 6}
    # gates ran on the stream: quality + detected lang present, and the
    # sink layout is batch-id / detected-language partitioned (the
    # idempotent dynamic-overwrite layout)
    assert all(r.quality >= 0.5 and r.lang_detected == "en" for r in rows)
    assert {r._ingest_batch for r in rows} == {0, 1}
    import os

    batch_dirs = [d for d in os.listdir(out) if d.startswith("_ingest_batch=")]
    assert batch_dirs
    assert any(d.startswith("lang_detected=")
               for d in os.listdir(os.path.join(out, batch_dirs[0])))


def test_stream_ingest_batch_write_idempotent(spark, tmp_path):
    """the foreachBatch writer must be replay-safe: re-writing the same
    batch id (what a crash-retry does) overwrites that batch's
    partitions instead of appending duplicates, and leaves other
    batches untouched."""
    from hbase_snapshot_spark.streaming import ingest as ing

    out = str(tmp_path / "corpus")
    b0 = spark.createDataFrame(
        [(1, "x", "en"), (2, "y", "de")],
        "doc_id long, text string, lang_detected string")
    b1 = spark.createDataFrame(
        [(3, "z", "en")], "doc_id long, text string, lang_detected string")

    # reach into the module-level pattern: build the same writer the
    # stream installs, by calling stream_ingest_corpus's inner logic
    def write(batch, bid):
        from pyspark.sql import functions as F
        (batch.withColumn("_ingest_batch", F.lit(bid))
         .repartition("lang_detected")
         .write.partitionBy("_ingest_batch", "lang_detected")
         .option("partitionOverwriteMode", "dynamic")
         .mode("overwrite").parquet(out))

    write(b0, 0)
    write(b1, 1)
    write(b0, 0)  # replay of batch 0
    rows = spark.read.parquet(out).collect()
    assert sorted(r.doc_id for r in rows) == [1, 2, 3]


def test_streaming_distinct_hll_skips_null_keys(spark, tmp_path):
    """ADVICE r8: str(None) used to hash as a phantom 'None' key while
    batch hll_sketch filters key.isNotNull() — streams containing nulls
    broke the streaming==batch-after-drain guarantee. Nulls must now
    contribute nothing."""
    from pyspark.sql import functions as F

    from hbase_snapshot_spark.operators import sketches as sk
    from hbase_snapshot_spark.streaming.replication import (
        streaming_distinct_hll,
    )

    src_dir = tmp_path / "hll-null-src"
    src_dir.mkdir()
    rows = [(float(i % 20), "g") for i in range(60)] + [(None, "g")] * 10
    spark.createDataFrame(rows, "user_id double, grp string").write.parquet(
        str(src_dir / "b1"))

    stream = (
        spark.readStream.schema("user_id double, grp string")
        .parquet(str(src_dir / "*"))
    )
    q = (
        streaming_distinct_hll(stream, "user_id", ["grp"])
        .writeStream.format("memory")
        .queryName("hll_null_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "hll-null-ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.sql("select * from hll_null_out").collect()
    got = max((r.nonempty, r.est) for r in out if r.grp == "g")[1]

    batch = spark.createDataFrame(rows, "user_id double, grp string")
    want = sk.hll_estimate(
        sk.hll_sketch(batch, F.col("user_id"), ["grp"]), ["grp"]
    ).collect()[0].est
    assert abs(got - want) < 1e-6


def test_streaming_heavy_hitters_matches_batch_cms(spark, tmp_path):
    """After draining all micro-batches, every key the streaming
    sketch-and-heap retained must carry EXACTLY the batch cms_query
    estimate of the same data, and the top-k set must be the true
    heavy keys.  Null keys contribute nothing (batch parity)."""
    from pyspark.sql import functions as F

    from hbase_snapshot_spark.operators import sketches as sk
    from hbase_snapshot_spark.streaming.replication import (
        streaming_heavy_hitters,
    )

    src_dir = tmp_path / "hh-src"
    src_dir.mkdir()
    # g1: key 7 hot (60x), key 3 warm (25x), long tail; g2: key 1 only
    b1 = ([(7, "g1")] * 30 + [(3, "g1")] * 10
          + [(i, "g1") for i in range(100, 140)] + [(1, "g2")] * 5)
    b2 = ([(7, "g1")] * 30 + [(3, "g1")] * 15
          + [(i, "g1") for i in range(140, 180)] + [(None, "g1")] * 9)
    spark.createDataFrame(b1, "user_id long, grp string").write.parquet(
        str(src_dir / "b1"))
    spark.createDataFrame(b2, "user_id long, grp string").write.parquet(
        str(src_dir / "b2"))

    stream = (
        spark.readStream.schema("user_id long, grp string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir / "*"))
    )
    q = (
        streaming_heavy_hitters(stream, "user_id", ["grp"], k=3, track=16)
        .writeStream.format("memory")
        .queryName("hh_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "hh-ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.sql("select * from hh_out").collect()
    # final emission per group = rows with the max estimate sum (counts
    # only grow); reconstruct per-group final top-k by max est per key
    final = {}
    for r in out:
        cur = final.setdefault((r.grp, r.key), (-1, None))
        if r.est >= cur[0]:
            final[(r.grp, r.key)] = (r.est, r.rank)

    batch = spark.createDataFrame(
        [t for t in b1 + b2], "user_id long, grp string")
    keys = spark.createDataFrame(
        [(k,) for g, k in final if g == "g1"], "k string")
    sketch = sk.cms_sketch(
        batch.withColumn("user_id", F.col("user_id").cast("string")),
        F.col("user_id"), ["grp"])
    want = {(r.grp, r.k): r.est for r in sk.cms_query(
        sketch, keys, "k", ["grp"]).collect() if r.grp == "g1"}
    for (g, k), (est, _rank) in final.items():
        if g == "g1":
            assert est == want[(g, k)], (k, est, want[(g, k)])
    # the two true heavies rank 1-2 in g1's final emission
    g1_final = sorted(
        ((e, k) for (g, k), (e, r) in final.items() if g == "g1"),
        reverse=True)
    assert [k for _e, k in g1_final[:2]] == ["7", "3"]
    assert g1_final[0][0] >= 60  # CMS never underestimates
    assert final[("g2", "1")][0] == 5 and final[("g2", "1")][1] == 1


def test_streaming_quantiles_matches_batch(spark, tmp_path):
    """(r10) after draining, the streaming bottom-k quantile state must
    equal the BATCH sketch estimates of the same data — registers are
    the same function of the row set.  Two separate drains against one
    checkpoint: the second run's emissions are the final estimates."""
    from pyspark.sql import functions as F

    from hbase_snapshot_spark.operators import sketches as sk
    from hbase_snapshot_spark.streaming.replication import (
        streaming_quantiles,
    )

    src_dir = tmp_path / "q-src"
    src_dir.mkdir()
    rows1 = [(i, "g1", float((i * 37) % 101)) for i in range(120)] + [
        (1000 + i, "g2", float(i)) for i in range(15)]
    rows2 = [(5000 + i, "g1", float((i * 53) % 997)) for i in range(300)]
    schema = "event_id long, grp string, v double"
    spark.createDataFrame(rows1, schema).write.parquet(str(src_dir / "b1"))
    spark.createDataFrame(rows2, schema).write.parquet(str(src_dir / "b2"))

    # one drain, one file per micro-batch; capture per-batch emissions
    # so the LAST batch's rows are unambiguous (memory-sink row order
    # across update-mode batches is not)
    per_batch = {}

    def capture(batch, batch_id):
        per_batch[batch_id] = batch.collect()

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(str(src_dir / "*")))
    q = (
        streaming_quantiles(stream, "v", "event_id", ["grp"],
                            k=64, probs=(0.1, 0.5, 0.9))
        .writeStream.foreachBatch(capture)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "q-ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len(per_batch) >= 2          # the two files arrived separately
    # update mode re-emits only groups touched by the batch — the final
    # estimate per (group, p) is its LATEST emission in batch order
    latest = {}
    for bid in sorted(per_batch):
        for r in per_batch[bid]:
            latest[(r.grp, r.p)] = r
    out = list(latest.values())

    batch = spark.createDataFrame(rows1 + rows2, schema)
    expected = {
        (r.grp, r.p): r.est
        for r in sk.quantile_estimate(
            sk.quantile_sketch(batch, F.col("v"), F.col("event_id"),
                               ["grp"], k=64),
            ["grp"], probs=(0.1, 0.5, 0.9)).collect()
    }
    got = {(r.grp, r.p): r.est for r in out}
    assert got == expected, (got, expected)
    # g2 never reached k=64: its sample IS the group, estimates exact
    g2 = sorted(v for _, g, v in rows1 if g == "g2")
    import math
    for p in (0.1, 0.5, 0.9):
        assert got[("g2", p)] == g2[math.floor(p * (len(g2) - 1))]


def test_streaming_quantiles_double_identity_parity(spark, tmp_path):
    """(r11, ADVICE) non-integral identity columns: the batch sketch
    hashes md5(CAST(ident AS STRING)) — JVM formatting (1.0E16) — while
    Python str() would give '1e+16'.  The streaming twin now casts in
    the PLAN, so double/decimal/timestamp identities keep parity."""
    from pyspark.sql import functions as F

    from hbase_snapshot_spark.operators import sketches as sk
    from hbase_snapshot_spark.streaming.replication import (
        streaming_quantiles,
    )

    src_dir = tmp_path / "qd-src"
    src_dir.mkdir()
    # identities chosen to straddle JVM-vs-Python float formatting:
    # 1e16 ('1.0E16' vs '1e+16'), small exacts, negative exponents
    rows = [(float(10 ** 16 + i * 1024), "g", float((i * 37) % 101))
            for i in range(80)] + \
           [(i * 0.001, "g", float(i)) for i in range(40)]
    schema = "event_id double, grp string, v double"
    spark.createDataFrame(rows, schema).write.parquet(str(src_dir / "b1"))

    per_batch = {}

    def capture(batch, batch_id):
        per_batch[batch_id] = batch.collect()

    stream = spark.readStream.schema(schema).parquet(str(src_dir / "*"))
    q = (
        streaming_quantiles(stream, "v", "event_id", ["grp"],
                            k=32, probs=(0.25, 0.75))
        .writeStream.foreachBatch(capture)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "qd-ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {(r.grp, r.p): r.est
           for rows_ in per_batch.values() for r in rows_}
    expected = {
        (r.grp, r.p): r.est
        for r in sk.quantile_estimate(
            sk.quantile_sketch(spark.createDataFrame(rows, schema),
                               F.col("v"), F.col("event_id"),
                               ["grp"], k=32),
            ["grp"], probs=(0.25, 0.75)).collect()
    }
    assert got == expected, (got, expected)


def test_replication_skips_orphan_segments(spark, stores, tmp_path):
    """(r11 self-review) source of truth is the MANIFEST, not the
    filesystem glob: a writer crash between the segment parquet write
    and the manifest commit leaves an orphan segment that src.cells()
    never shows — the replica must not ship it (the edit was never
    acknowledged), and later real commits must keep flowing."""
    import os

    src, dst = stores
    src.mutate([Put("r1").add("f", "q", "v1", ts=10)])
    seg_root = os.path.join(src.dir, "segments")
    template = spark.read.parquet(
        os.path.join(seg_root, os.listdir(seg_root)[0]))
    # the crashed writer's leftovers: valid cell parquet, never committed
    template.withColumn("row", F.lit("orphan-row")).write.parquet(
        os.path.join(seg_root, "seg-000099-wal-deadbeef"))
    ckpt = str(tmp_path / "ckpt-orphan")
    replicate(spark, src, dst, ckpt, once=True, commit_grace_s=0.3,
              on_uncommitted="drop")
    shipped = {r.row for r in dst.cells().collect()}
    assert shipped == {"r1"}          # orphan dropped, committed shipped
    # the stream is not poisoned: later commits still replicate
    src.mutate([Put("r2").add("f", "q", "v2", ts=11)])
    replicate(spark, src, dst, ckpt, once=True, commit_grace_s=0.3,
              on_uncommitted="drop")
    assert {r.row for r in dst.cells().collect()} == {"r1", "r2"}


def test_replication_default_fails_batch_on_uncommitted(spark, stores,
                                                        tmp_path):
    """(r12, ADVICE) a commit slower than commit_grace_s must cost a
    RETRY, not the edits: the old drop-with-warning default let the
    file-source checkpoint advance past the segment, so a segment that
    committed late was never re-delivered — the replica silently
    diverged from the source.  Default policy now fails the batch
    (checkpoint does not advance); once the segment commits, re-running
    against the SAME checkpoint delivers the full batch."""
    import os
    import pytest
    from pyspark.sql.streaming import StreamingQueryException

    src, dst = stores
    src.mutate([Put("r1").add("f", "q", "v1", ts=10)])
    seg_root = os.path.join(src.dir, "segments")
    template = spark.read.parquet(
        os.path.join(seg_root, os.listdir(seg_root)[0]))
    # a slow writer: segment parquet on disk, manifest commit pending
    late_seg = os.path.join(seg_root, "seg-000098-wal-feedc0de")
    template.withColumn("row", F.lit("late-row")).write.parquet(late_seg)
    ckpt = str(tmp_path / "ckpt-late")
    with pytest.raises(StreamingQueryException,
                       match="not\\s+manifest-committed"):
        replicate(spark, src, dst, ckpt, once=True, commit_grace_s=0.3)
    # the failed batch shipped nothing and advanced nothing
    assert dst.cells().isEmpty()
    # the slow commit lands (the writer protocol's manifest commit,
    # arriving after the grace window instead of before it) ...
    m = src.manifest()
    m2 = dict(m)
    m2["version"] = m["version"] + 1
    m2["segments"] = list(m["segments"]) + [os.path.basename(late_seg)]
    m2["commit_seq"] = m["commit_seq"] + 1
    src._commit(m2)
    # ... and the RETRY against the same checkpoint delivers everything
    replicate(spark, src, dst, ckpt, once=True, commit_grace_s=0.3)
    assert {r.row for r in dst.cells().collect()} == {"r1", "late-row"}


def test_streaming_hll_nonstring_keys_match_batch(spark, tmp_path):
    """(r11 self-review) double/boolean keys: the key is cast to string
    IN THE PLAN, so the hashed bytes are the JVM's formatting (1.0E16,
    1.0E-4, true) — Python str() would produce 1e+16 / 0.0001 / True
    and silently break the drained-streaming == batch parity."""
    from pyspark.sql import functions as F

    from hbase_snapshot_spark.operators import sketches as sk
    from hbase_snapshot_spark.streaming.replication import (
        streaming_distinct_hll,
    )

    src_dir = tmp_path / "hlld-src"
    src_dir.mkdir()
    rows = ([(1e16 + 2048 * i, "dbl") for i in range(25)]
            + [(1e-4 * (i + 1), "dbl") for i in range(25)]
            + [(float(i % 3 == 0), "bool") for i in range(30)])
    schema = "k double, grp string"
    spark.createDataFrame(rows, schema).write.parquet(str(src_dir / "b1"))
    stream = (spark.readStream.schema(schema)
              .parquet(str(src_dir / "*")))
    q = (
        streaming_distinct_hll(stream, "k", ["grp"])
        .writeStream.format("memory")
        .queryName("hlld_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "hlld-ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r.grp: r.est for r in spark.sql("select * from hlld_out").collect()}
    want = {
        r.grp: r.est
        for r in sk.hll_estimate(
            sk.hll_sketch(spark.createDataFrame(rows, schema),
                          F.col("k"), ["grp"]), ["grp"]).collect()
    }
    assert got == want, (got, want)


def test_streaming_heavy_hitters_double_keys_match_batch(spark, tmp_path):
    """(r11 self-review) same cast-in-plan parity for the CMS heavy
    hitters: double keys in the scientific-notation divergence range
    must carry EXACTLY the batch cms_query estimates after draining."""
    from pyspark.sql import functions as F

    from hbase_snapshot_spark.operators import sketches as sk
    from hbase_snapshot_spark.streaming.replication import (
        streaming_heavy_hitters,
    )

    src_dir = tmp_path / "hhd-src"
    src_dir.mkdir()
    rows = ([(1e16, "g")] * 12 + [(1e-4, "g")] * 7 + [(2.5, "g")] * 3)
    schema = "k double, grp string"
    spark.createDataFrame(rows, schema).write.parquet(str(src_dir / "b1"))
    stream = spark.readStream.schema(schema).parquet(str(src_dir / "*"))
    q = (
        streaming_heavy_hitters(stream, "k", ["grp"], k=3, track=8)
        .writeStream.format("memory")
        .queryName("hhd_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "hhd-ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r.key: r.est
           for r in spark.sql("select * from hhd_out").collect()}
    batch = spark.createDataFrame(rows, schema)
    sketch = sk.cms_sketch(batch, F.col("k"), ["grp"])
    keys = batch.select(F.col("k").cast("string").alias("ks")).distinct()
    want = {r.ks: r.est
            for r in sk.cms_query(sketch, keys, "ks", ["grp"]).collect()}
    # emitted key strings are the JVM cast (1.0E16, not 1e+16)
    assert set(got) == {"1.0E16", "1.0E-4", "2.5"}
    assert got == want, (got, want)


def test_sessionize_events_without_value_column(spark):
    """(r11 self-review) value_col=None: event streams with no numeric
    payload sessionize instead of failing at plan time on the
    hardcoded 'value' column."""
    rows = [
        ("u1", datetime.datetime(2026, 1, 1, 10, 0)),
        ("u1", datetime.datetime(2026, 1, 1, 10, 10)),
        ("u1", datetime.datetime(2026, 1, 1, 12, 0)),
    ]
    ev = spark.createDataFrame(rows, "user_id string, ts timestamp")
    out = sessionize_events(ev, gap="30 minutes", value_col=None).collect()
    assert sorted(r.n_events for r in out) == [1, 2]
    assert "sum_value" not in out[0].asDict()


def test_round_half_up_matches_spark_round(spark):
    """(r11 self-review) the streaming HLL emission rounds like
    F.round (BigDecimal HALF_UP on the shortest decimal repr), not
    Python round() (half-even on the binary value): 0.00035's shortest
    repr ends in 5 but its binary value is 0.000349999…, so round()
    says 0.0003 while Spark says 0.0004."""
    from hbase_snapshot_spark.streaming.replication import _round_half_up

    cases = [0.00035, 0.00065, 0.00105, 2.62345, 123.45675, 7.0, 1e16]
    got = [_round_half_up(x, 4) for x in cases]
    want = [
        r[0] for r in spark.createDataFrame([(x,) for x in cases], "x double")
        .select(F.round("x", 4)).collect()
    ]
    assert got == want, (got, want)
    # the documented divergence from Python round()
    assert round(0.00035, 4) == 0.0003 and _round_half_up(0.00035, 4) == 0.0004


def test_ingest_checkpoint_preflight_names_remedy(spark, tmp_path):
    """(r13 VERDICT Wrong #5 / Next #6) a checkpoint carrying dedup
    state from a different operator format must fail AT QUERY START
    with the remedy named (fresh checkpoint dir; sink idempotent) —
    not as an async Spark state-schema mismatch mid-batch.  Fresh
    checkpoints adopt the current format via the marker and restart
    cleanly (the end-to-end test above covers the happy restart)."""
    import json
    import os

    import pytest

    from hbase_snapshot_spark.streaming import ingest as ing

    src = tmp_path / "arrivals"
    src.mkdir()
    spark.createDataFrame(
        [(1, "a perfectly ordinary document about foxes and dogs " * 3,
          "en", "s", 50)],
        ing.DOCUMENTS_SCHEMA,
    ).write.parquet(str(src / "f1"))
    out = str(tmp_path / "corpus")

    # pre-r14 checkpoint shape: streaming state present, no marker
    old = tmp_path / "ckpt_old"
    (old / "state" / "0" / "0").mkdir(parents=True)
    (old / "state" / "0" / "0" / "1.delta").write_bytes(b"\x00")
    with pytest.raises(RuntimeError, match="FRESH checkpoint"):
        ing.stream_ingest_corpus(spark, str(src / "*"), out, str(old))

    # a marker recording a DIFFERENT format is equally actionable
    newer = tmp_path / "ckpt_other"
    newer.mkdir()
    (newer / ing._STATE_MARKER).write_text(
        json.dumps({"format": "somethingElse-v9"}))
    with pytest.raises(RuntimeError, match="FRESH checkpoint"):
        ing.stream_ingest_corpus(spark, str(src / "*"), out, str(newer))

    # fresh dir: marker adopted, query starts and drains
    ckpt = str(tmp_path / "ckpt_fresh")
    q = ing.stream_ingest_corpus(spark, str(src / "*"), out, ckpt,
                                 min_quality=0.0)
    q.awaitTermination()
    with open(os.path.join(ckpt, ing._STATE_MARKER)) as f:
        assert json.load(f)["format"] == ing._STATE_FORMAT
    # restart under the adopted marker is allowed (no raise)
    q2 = ing.stream_ingest_corpus(spark, str(src / "*"), out, ckpt,
                                  min_quality=0.0)
    q2.awaitTermination()

    # an explicit adoption of unmarked state is honored
    (old / ing._STATE_MARKER).write_text(
        json.dumps({"format": ing._STATE_FORMAT}))
    ing._checkpoint_preflight(str(old))  # no raise
