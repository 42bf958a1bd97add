"""Port of TestAcidGuarantees.java — multi-threaded full-row writers
against concurrent readers/scanners: a read must NEVER observe a
partially-complete write (every column of a row carries the value of
ONE write, not a mix of two).

The engine's guarantee comes from the manifest swap: a reader binds to
the HEAD manifest version at plan time, and a mutate batch becomes
visible only by the atomic HEAD repoint — so torn reads are impossible
by construction.  The port still drives real concurrent threads
(bounded: Spark jobs serialize on the local scheduler, so iterations
are capped for runtime)."""

import random
import threading

import pytest

from hbase_snapshot_spark.client import Get, Scan
from hbase_snapshot_spark.model import FamilyDescriptor, TableDescriptor
from hbase_snapshot_spark.table import Put, TableStore

FAMILIES = ["A", "B", "C"]
N_COLS = 10       # NUM_COLS_TO_CHECK, scaled for local runtime
ROWS = ["row0", "row1", "row2"]


def test_acid_no_torn_reads(spark, tmp_path):
    store = TableStore(spark, str(tmp_path / "acid"))
    desc = TableDescriptor("TestAcidGuarantees")
    for f in FAMILIES:
        desc.add_family(FamilyDescriptor(f))
    t = store.create_table(desc)

    # seed every row so readers always find data
    t.mutate([_full_row_put(r, "seed") for r in ROWS], now=1)

    stop = threading.Event()
    errors: list = []
    reads = {"n": 0}

    def writer():
        rng = random.Random(1821)
        i = 0
        while not stop.is_set() and i < 12:
            i += 1
            row = ROWS[rng.randrange(len(ROWS))]
            t.mutate([_full_row_put(row, f"w{i}")], now=10 + i)

    def reader(get_fn):
        try:
            while not stop.is_set():
                cells = get_fn()
                by_row: dict = {}
                for c in cells:
                    by_row.setdefault(c.row, set()).add(c.value)
                for row, vals in by_row.items():
                    # AtomicGetReader.gotFailure: all columns of a row
                    # must carry ONE write's value
                    assert len(vals) == 1, f"torn read on {row}: {vals}"
                reads["n"] += 1
        except Exception as ex:  # noqa: BLE001
            errors.append(ex)
            stop.set()

    def get_one():
        return t.client().get(Get(ROWS[0])).collect()

    def scan_all():
        return t.client().scan(Scan()).collect()

    threads = [threading.Thread(target=writer)]
    threads += [threading.Thread(target=reader, args=(fn,))
                for fn in (get_one, scan_all)]
    for th in threads:
        th.start()
    threads[0].join()  # writer finishes its 12 batches
    stop.set()
    for th in threads[1:]:
        th.join()
    assert not errors
    assert reads["n"] > 0  # the readers genuinely overlapped the writes

    # final state is the last write applied to each row, whole-row
    final = t.client().scan(Scan()).collect()
    per_row: dict = {}
    for c in final:
        per_row.setdefault(c.row, set()).add(c.value)
    assert all(len(v) == 1 for v in per_row.values())
    assert sum(1 for _ in final) == len(ROWS) * len(FAMILIES) * N_COLS


def _full_row_put(row, value):
    p = Put(row)
    for fam in FAMILIES:
        for i in range(N_COLS):
            p.add(fam, f"col{i}", value)
    return p
