"""Derived scale-stress harness (VERDICT r6 item 3): every 100TB claim
in this repo is a plan pin at sf0.1 — this script MEASURES them on
derived data at 3x and 10x the sf0.1 volume, with no new driver data:

  1. build: each table replicated R times with key-space spreading —
     every key column gets +replica*domain_cardinality, so keyspaces
     stay dense and referential integrity holds within each replica
     (replica 0 is byte-identical to the base data).
  2. plans: the pinned physical plans (single-exchange resolve,
     pre-resolve block-pushdown seek scan, no-global-sort sequential
     read) are captured at 1x and 10x and asserted BYTE-IDENTICAL
     after normalizing ids/paths/literals — scale must change data
     volume, never plan shape.
  3. parity: check_parity runs the 10 cheapest queries against the 10x
     data (DuckDB reads the same derived files), so the LLM-operator
     results stay oracle-green above the gate's sf.
  4. exponents: bulk_write / resolve / random_seek_scan wall time at
     1x/3x/10x, log-log slope per op -> BASELINE.md S-I table.

Everything writes under --work (default /tmp/scale_stress); nothing
touches the driver gate.  Run alone on an idle host (bench discipline).

Usage: python scripts/scale_stress.py [--reps 3,10] [--skip-build]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import re
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

BASE = "/root/testdata/sf0.1"

# key column -> domain owner table (cardinality = spread stride, so a
# dense 0-based domain stays dense across replicas)
DOMAIN_OWNER = {
    "regionkey": "region", "nationkey": "nation", "custkey": "customer",
    "suppkey": "supplier", "partkey": "part", "orderkey": "orders",
    "eventkey": "events", "userkey": "events", "dockey": "documents",
    "veckey": "embeddings",
}
KEY_COLS = {
    "region": {"r_regionkey": "regionkey"},
    "nation": {"n_nationkey": "nationkey", "n_regionkey": "regionkey"},
    "customer": {"c_custkey": "custkey", "c_nationkey": "nationkey"},
    "supplier": {"s_suppkey": "suppkey", "s_nationkey": "nationkey"},
    "part": {"p_partkey": "partkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {"l_orderkey": "orderkey", "l_partkey": "partkey",
                 "l_suppkey": "suppkey"},
    "events": {"event_id": "eventkey", "user_id": "userkey"},
    "documents": {"doc_id": "dockey"},
    "embeddings": {"vec_id": "veckey"},
}

# the 10 cheapest sf0.01 parity queries (TESTDATA.md r7 timing log),
# chosen to span cell-table, TPC-H, and per-row LLM operators while
# avoiding the quadratic pair ops (minhash_pairs/cosine_pairs explode
# when replicas are exact text duplicates — by design of the replication)
CHEAP10 = [
    "point_get", "scan_range", "scan_versions", "tpch_q1", "fingerprint",
    "quality", "lang_id", "scrub_pii", "seq_packing", "embed_quantize",
]

# r9: the round-8 additions, parity-checked at top scale too — quality
# already carries the gopher/ppl/nb branches; rollup_counts carries the
# kmv/hll/cms sketch branches; sessionize carries the funnel branch;
# tfidf_topterms carries bm25
R8_QUERIES = ["rollup_counts", "sessionize", "tfidf_topterms"]

# r10: the round-9 additions at top scale.  windowed_counts carries the
# slide + zscore branches; the other r9 branches ride queries already
# listed (sessionize: cohort + the distributed-rank rfm; fingerprint:
# canon/meta/blocked; quality: justext jxh/jxn)
R9_QUERIES = ["windowed_counts"]


def build_scaled(out_dir: str, reps: int) -> None:
    import duckdb

    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    card = {
        d: con.execute(
            f"SELECT count(*) FROM '{BASE}/{t}.parquet'"
        ).fetchone()[0]
        for d, t in DOMAIN_OWNER.items()
    }
    # user_id spreads by its own stride (ids may exceed event count)
    card["userkey"] = con.execute(
        f"SELECT max(user_id)+1 FROM '{BASE}/events.parquet'"
    ).fetchone()[0]
    card["eventkey"] = con.execute(
        f"SELECT max(event_id)+1 FROM '{BASE}/events.parquet'"
    ).fetchone()[0]
    for t, keys in KEY_COLS.items():
        cols = [c[0] for c in con.execute(
            f"DESCRIBE SELECT * FROM '{BASE}/{t}.parquet'"
        ).fetchall()]
        sel = ", ".join(
            f"{c} + r * {card[keys[c]]} AS {c}" if c in keys else c
            for c in cols
        )
        con.execute(
            f"COPY (SELECT {sel} FROM '{BASE}/{t}.parquet' "
            f"CROSS JOIN (SELECT unnest(range({reps})) AS r) "
            f"ORDER BY r) TO '{out_dir}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.close()


# ---------------------------------------------------------- plan capture

_NORM = [
    (re.compile(r"#\d+"), "#N"),
    (re.compile(r"file:[^\],\s]+"), "file:X"),
    (re.compile(r"INSET [0-9, ]+"), "INSET ..."),
    (re.compile(r"Statistics\([^)]*\)"), "Statistics(X)"),
    (re.compile(r"plan_id=\d+"), "plan_id=N"),
    (re.compile(r"cachedPlan=\d+"), "cachedPlan=N"),
    # ExistingRDD prints the session-global RDD counter
    # (MapPartitionsRDD[984]) — it shifts with how many jobs ran before
    # plan capture (a cosmetic r12 false-DIVERGED when the zorder
    # ladder row changed the pre-capture job count), never with plan
    # shape
    (re.compile(r"RDD\[\d+\]"), "RDD[N]"),
    # ExistingRDD also prints the JVM call site that created the RDD
    # ("applySchemaToPythonRDD at NativeMethodAccessorImpl.java:0" vs
    # "at <unknown>:0" — differs by JDK reflection internals, a
    # cosmetic r14 false-DIVERGED on the seek pin), never plan shape.
    # Anchored to the reflection call-site SHAPE (r14 advice: the old
    # ` at [^,\]]+:\d+` could swallow genuine plan text that merely
    # contains " at X:N")
    (re.compile(r"\bat (?:[\w.$]+\.(?:java|scala)|<unknown>):\d+"),
     "at X:0"),
]


def normalize_plan(s: str) -> str:
    for pat, rep in _NORM:
        s = pat.sub(rep, s)
    return s


def plan_of(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return normalize_plan(buf.getvalue())


def pinned_plans(bench) -> dict:
    """The three 100TB-claim plans, built exactly as bench builds them."""
    from pyspark.sql import functions as F

    import bench as B
    from hbase_snapshot_spark.resolve import ResolveSpec, resolve
    from profile_seek import build_seeks, plan_pushdown

    plans = {}
    plans["resolve_single_exchange"] = plan_of(
        resolve(bench.table.cells(), spec=ResolveSpec(max_versions=1))
    )
    seek_df, blks, ranges = build_seeks(bench.spark, bench.n_orders)
    plans["seek_scan_pushdown"] = plan_of(
        plan_pushdown(bench, seek_df, blks, ranges))
    rows = resolve(bench.table.cells(), spec=ResolveSpec(max_versions=1))
    plans["sequential_read_local_sort"] = plan_of(
        rows.repartitionByRange(B.CPUS, "row")
        .sortWithinPartitions("row", "family", "qualifier")
    )
    return plans


# shared with tests/test_plans.py so the unit pin and this shape check
# can never silently diverge
from hbase_snapshot_spark.plans.plan_text import (  # noqa: E402
    strip_cached_subtrees as _strip_cached_subtrees,
)


def shape_checks(bench) -> dict:
    """Scale-INVARIANT checks (r10, persist discipline r11) for plans
    whose byte shape is ALLOWED to change with volume — rfm_scores'
    final payload join legitimately flips BroadcastHashJoin ->
    SortMergeJoin as the user table outgrows the broadcast threshold
    (that adaptivity is the point), so the pin is the property the
    operator exists for: no data-sized single-task shape at ANY scale,
    and both spark_partition_id consumers + the payload join reading
    CACHES (the r11 persist contract) with no top-level source scan."""
    import bench as B
    from hbase_snapshot_spark.operators.asof import rfm_scores

    ev = bench.spark.read.parquet(
        os.path.join(bench.sf_dir, "events.parquet"))
    df = rfm_scores(ev.selectExpr(
        "user_id",
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01', ts)"
        " * 1000 AS ts", "value"), range_partitions=B.CPUS)
    # collect() — not count() — so THIS DataFrame's own query execution
    # is the one AQE finalizes (count() builds a separate plan and
    # leaves df's executedPlan un-adaptive with no cache-scan markers)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("+- == Initial Plan ==")[0]
    top = _strip_cached_subtrees(final)
    # cache scans counted on the FULL plan string: under AQE at scale
    # the final-plan section prints materialized stages as bare
    # QueryStage references (the sf0.1 run shows ONE InMemoryTableScan
    # there vs 14 in the whole tree) — the Initial Plan section carries
    # the complete tree, and cache substitution happens at analysis so
    # it is already visible there
    checks = {
        "rfm_no_single_partition": "SinglePartition" not in final,
        # a global sort prints "Sort [...], true, 0"
        "rfm_no_global_sort": "], true, 0" not in final,
        "rfm_cached_consumers": plan.count("InMemoryTableScan") >= 3,
        "rfm_single_source_scan": not re.search(
            r"Scan ExistingRDD|FileScan", top),
    }
    checks.update(pruned_scan_checks(bench))
    return checks


def pruned_scan_checks(bench) -> dict:
    """(r13) the file-skipping manifest must keep pruning AT SCALE: a
    narrow client scan against the bulk-loaded table reads strictly
    fewer parquet files than the segment holds, a point Get reads
    exactly one, and the pruned scan's rows EQUAL the unpruned twin's
    (parity through the real stored-table path, per scale)."""
    import glob as _glob

    from hbase_snapshot_spark.client import Get, Scan
    from hbase_snapshot_spark.client import Table as ClientTable

    t = bench.table
    total_files = len(_glob.glob(
        os.path.join(t.dir, "segments", "*", "*.parquet")))
    lo, hi = "000000000100", "000000000600"
    sc = Scan(start_row=lo, stop_row=hi)
    pruned = t.client().scan(sc)
    unpruned = ClientTable(t.cells(), t.descriptor).scan(sc)
    n_pruned, n_unpruned = pruned.count(), unpruned.count()
    g = t.client().get(Get("000000000042"))
    checks = {
        "pruned_scan_reads_fewer_files":
            len(set(pruned.inputFiles())) < total_files,
        "pruned_point_get_reads_one_file":
            len(set(g.inputFiles())) == 1 and g.count() > 0,
        "pruned_scan_parity": n_pruned == n_unpruned and n_pruned > 0,
    }
    checks.update(pruned_seek_checks(bench))
    return checks


def pruned_seek_checks(bench) -> dict:
    """(r14, VERDICT r13 Next #5) the 100-seek shape through the
    skipping manifest: at the bench's 32 files every file is hit (100
    random 120-row bands — pruning is a designed no-op there), so the
    invariant re-sorts the SAME cells into a 320-file segment — the
    §P regime where the files-kept share is what shrinks at 100 TB —
    and asserts bench.random_seek_scan's exact seek ranges (a) read
    strictly fewer files than the segment holds and (b) return the
    same banded cell population as the unpruned twin, at every ladder
    scale."""
    from functools import reduce

    from pyspark.sql import functions as F

    from hbase_snapshot_spark.model import FamilyDescriptor, TableDescriptor
    from hbase_snapshot_spark.sources.tools import bulk_load
    from hbase_snapshot_spark.table import TableStore
    from profile_seek import build_seeks

    _df, _blks, ranges = build_seeks(bench.spark, bench.n_orders)
    store = TableStore(bench.spark, os.path.join(bench.workdir, "seekstore"))
    t2 = store.create_table(
        TableDescriptor("seek320")
        .add_family(FamilyDescriptor("o")).add_family(FamilyDescriptor("m")))
    prep = os.path.join(bench.workdir, "seekprep")
    bulk_load(bench.table.cells(), prep, num_partitions=320)
    t2.adopt_segment(prep, move=True)
    n_files = len(_glob_files(t2))
    band = reduce(lambda a, b: a | b,
                  [(F.col("row") >= lo) & (F.col("row") < hi)
                   for lo, hi in ranges])
    pruned = t2.cells_for_ranges(ranges).filter(band)
    full = t2.cells().filter(band)
    return {
        "pruned_seek_reads_fewer_files":
            len(set(pruned.inputFiles())) < n_files == 320,
        "pruned_seek_parity":
            pruned.count() == full.count() > 0,
    }


def _glob_files(t) -> list:
    import glob as _glob

    return _glob.glob(os.path.join(t.dir, "segments", "*", "*.parquet"))


# ----------------------------------------------------- sketch mergeability

def sketch_merge_equivalence(sf_dir: str) -> dict:
    """The property that makes sketches the 100 TB rollup primitive:
    sketch(half A) MERGE sketch(half B) must equal sketch(A ∪ B)
    register-for-register, measured at top scale on the derived events
    table (split by event_id parity — any partitioning must work)."""
    import bench as B
    from pyspark.sql import functions as F

    from hbase_snapshot_spark.operators import sketches as sk

    spark = B.make_spark()
    spark.sparkContext.setLogLevel("ERROR")
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    a, b = ev.filter("event_id % 2 = 0"), ev.filter("event_id % 2 = 1")
    by, key = ["event_type"], F.col("user_id")
    results = {}

    def rows(df):
        return sorted(map(tuple, df.collect()))

    results["kmv"] = rows(sk.kmv_merge(
        sk.kmv_sketch(a, key, by), sk.kmv_sketch(b, key, by), by
    )) == rows(sk.kmv_sketch(ev, key, by))
    results["hll"] = rows(sk.hll_merge(
        sk.hll_sketch(a, key, by), sk.hll_sketch(b, key, by), by
    )) == rows(sk.hll_sketch(ev, key, by))
    results["cms"] = rows(sk.cms_merge(
        sk.cms_sketch(a, key, by), sk.cms_sketch(b, key, by), by
    )) == rows(sk.cms_sketch(ev, key, by))
    # r10: the quantile-sample sketch joins the family
    val, ident = F.col("value"), F.col("event_id")
    results["qsk"] = rows(sk.quantile_merge(
        sk.quantile_sketch(a, val, ident, by),
        sk.quantile_sketch(b, val, ident, by), by
    )) == rows(sk.quantile_sketch(ev, val, ident, by))
    spark.stop()
    return results


# ------------------------------------------------------------- measuring

def measure(sf_dir: str, label: str) -> tuple[dict, dict, dict]:
    import bench as B

    spark = B.make_spark()
    spark.sparkContext.setLogLevel("ERROR")
    B.calibrate(spark)  # codegen + shuffle warmup, discarded
    workdir = tempfile.mkdtemp(prefix=f"stress-{label}-")
    b = B.Bench(spark, sf_dir, workdir)
    times = {}
    # best-of-2: the first bulk_write in a fresh JVM still pays parquet
    # writer classloading that the probe can't warm
    times["bulk_write"] = round(min(b.bulk_write()["sec"] for _ in range(2)), 3)

    from hbase_snapshot_spark.resolve import ResolveSpec, resolve

    best = None
    for _ in range(3):
        t0 = time.time()
        resolve(b.table.cells(), spec=ResolveSpec(max_versions=1)).count()
        best = min(best or 1e9, time.time() - t0)
    times["resolve"] = round(best, 3)
    best = None
    for _ in range(3):
        t0 = time.time()
        b.random_seek_scan()
        best = min(best or 1e9, time.time() - t0)
    times["random_seek_scan"] = round(best, 3)
    # r11: the end-to-end front door joins the ladder — the corpus is
    # synthesized DISTRIBUTIVELY (no driver collect), so it scales with
    # the derived documents table.  Corpus build is setup: warm it
    # before the first timed attempt.
    b._warc_corpus_dir()
    # best-of-3: the r11 first run's best-of-2 caught a throttled 3x
    # attempt (13.8s vs the best-of-3 3.05s) and bent the exponent
    best = None
    for _ in range(3):
        t0 = time.time()
        b.llm_front_door()
        best = min(best or 1e9, time.time() - t0)
    times["llm_front_door"] = round(best, 3)
    # r12: the two sub-second ops join the ladder — their sf0.1 ratios
    # are floor-dominated (BASELINE §J: ~0.15-0.3s fixed Spark cost
    # against 0.4s baselines), so the tracked scale signal is the
    # exponent here, not the bench ratio (VERDICT r11 Next #6)
    for op in ("ann_topk", "text_pipeline", "zorder_write"):
        best = None
        for _ in range(3):
            t0 = time.time()
            getattr(b, op)()
            best = min(best or 1e9, time.time() - t0)
        times[op] = round(best, 3)
    plans = pinned_plans(b)
    shapes = shape_checks(b)
    spark.stop()
    shutil.rmtree(workdir, ignore_errors=True)
    return times, plans, shapes


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", default="3,10",
                    help="comma-separated SCALE FACTORS to build and "
                         "measure beyond the implicit 1x (not repeat "
                         "counts)")
    ap.add_argument("--work", default="/tmp/scale_stress")
    ap.add_argument("--skip-build", action="store_true")
    ap.add_argument("--skip-parity", action="store_true")
    args = ap.parse_args()
    reps = [int(r) for r in args.reps.split(",")]

    dirs = {1: BASE}
    for r in reps:
        d = os.path.join(args.work, f"x{r}")
        if not args.skip_build:
            print(f"== building {r}x derived data at {d}")
            t0 = time.time()
            build_scaled(d, r)
            print(f"   built in {time.time() - t0:.1f}s")
        dirs[r] = d

    all_times, all_plans, all_shapes = {}, {}, {}
    for r in sorted(dirs):
        print(f"== measuring at {r}x ({dirs[r]})")
        all_times[r], all_plans[r], all_shapes[r] = measure(dirs[r], f"x{r}")
        print(f"   {all_times[r]}")
        print(f"   shape invariants: {all_shapes[r]}")

    # plan byte-identity 1x vs max scale
    top = max(dirs)
    plan_ok = {}
    for name in all_plans[1]:
        same = all_plans[1][name] == all_plans[top][name]
        plan_ok[name] = same
        print(f"plan {name}: {'IDENTICAL' if same else 'DIVERGED'} at {top}x")
        if not same:
            import difflib

            sys.stdout.writelines(difflib.unified_diff(
                all_plans[1][name].splitlines(True),
                all_plans[top][name].splitlines(True),
                f"{name}@1x", f"{name}@{top}x"))

    # scaling exponents: least-squares slope of log t vs log r — needs
    # ≥2 distinct scales (a 1x-only run, e.g. --reps 1, has zero
    # variance in x and used to die with ZeroDivisionError)
    exps = {}
    if len(all_times) >= 2:
        for op in next(iter(all_times.values())):
            xs = [math.log(r) for r in sorted(all_times)]
            ys = [math.log(all_times[r][op]) for r in sorted(all_times)]
            n = len(xs)
            mx, my = sum(xs) / n, sum(ys) / n
            exps[op] = round(
                sum((x - mx) * (y - my) for x, y in zip(xs, ys))
                / sum((x - mx) ** 2 for x in xs), 3)
            print(f"exponent {op}: {exps[op]}")
    else:
        print("exponents: n/a (single scale measured)")

    parity = None
    if not args.skip_parity:
        print(f"== parity (10 cheapest + r8/r9 composites) at {top}x")
        p = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts/check_parity.py"),
             dirs[top], *CHEAP10, *R8_QUERIES, *R9_QUERIES],
            capture_output=True, text=True)
        sys.stdout.write(p.stdout[-4000:])
        parity = ("FAIL" not in p.stdout) and p.returncode == 0

    print(f"== sketch merge equivalence at {top}x")
    merge_ok = sketch_merge_equivalence(dirs[top])
    print(f"   {merge_ok}")

    shapes_ok = all(v for shapes in all_shapes.values()
                    for v in shapes.values())
    out = {"times": all_times, "exponents": exps,
           "plans_identical": plan_ok,
           "shape_invariants": all_shapes,
           "parity_cheap10_at_top": parity,
           "sketch_merge_equal_at_top": merge_ok}
    print(json.dumps(out))
    ok = (all(plan_ok.values()) and (parity is not False)
          and all(merge_ok.values()) and shapes_ok)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
