"""Phase-profile the snapshot_restore bench op (VERDICT r14 Next #4):
where do the ~3.8s go — the two row_count verification reads, the
mutate commit, or the snapshot/restore metadata ops?  Also times the
row_count SUB-phases (client bind, scan plan, distinct count) so the
no-tombstone fast-path work targets the right stage.

Usage: python scripts/profile_snapshot.py  (env like bench.py)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench as B


def main() -> int:
    spark = B.make_spark()
    spark.sparkContext.setLogLevel("ERROR")
    B.calibrate(spark)
    workdir = tempfile.mkdtemp(prefix="profsnap-")
    bench = B.Bench(spark, B.SF_DIR, workdir)
    bench.bulk_write()

    from hbase_snapshot_spark.table import Delete

    t = bench.table
    out = {}
    for attempt in range(3):
        p = {}

        t0 = time.time()
        c = t.client()
        p["client_bind"] = round(time.time() - t0, 3)

        t0 = time.time()
        df = c.scan()
        p["scan_plan"] = round(time.time() - t0, 3)

        t0 = time.time()
        before = df.select("row").distinct().count()
        p["row_count_1"] = round(time.time() - t0, 3)

        t0 = time.time()
        t.snapshot("prof-snap")
        p["snapshot"] = round(time.time() - t0, 3)

        t0 = time.time()
        t.mutate([Delete(f"{i:012d}") for i in range(100)], now=10_000)
        p["mutate"] = round(time.time() - t0, 3)

        t0 = time.time()
        t.restore_snapshot("prof-snap")
        p["restore"] = round(time.time() - t0, 3)

        t0 = time.time()
        after = t.client().row_count()
        p["row_count_2"] = round(time.time() - t0, 3)
        assert after == before, (before, after)

        t0 = time.time()
        t.delete_snapshot("prof-snap")
        p["delete_snapshot"] = round(time.time() - t0, 3)

        p["total"] = round(sum(p.values()), 3)
        p["calib"] = B.calibrate(spark)["total"]
        out[f"attempt{attempt + 1}"] = p
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
