"""Port of regionserver/TestCompaction.java — major compaction's
PHYSICAL guarantees: deletes clean up to no output, version trimming
to the family cap, deleted rows absent from the compacted files, and
TTL purging.  The assertions read the raw stored cell stream (the
analogue of the reference's HFileScanner walk over the store files),
not just the resolved view."""

import pytest

from hbase_snapshot_spark.client import Get, Scan
from hbase_snapshot_spark.model import FamilyDescriptor, TableDescriptor
from hbase_snapshot_spark.table import Delete, Put, TableStore

ROWS = [f"r{i:02d}" for i in range(10)]


@pytest.fixture()
def store(spark, tmp_path):
    return TableStore(spark, str(tmp_path / "tables"))


def _mk(store, name, versions=3, ttl=None):
    fam = FamilyDescriptor("f", max_versions=versions)
    if ttl is not None:
        fam.ttl = ttl
    return store.create_table(TableDescriptor(name).add_family(fam))


def _fill(t, n_batches):
    """createStoreFile xN: each batch = one segment, one more version
    of every row's column at a distinct ts."""
    for b in range(n_batches):
        t.mutate([Put(r).add("f", "text", f"v{b}", ts=100 + b)
                  for r in ROWS], now=100 + b)


def _raw(t):
    return [(c.row, c.qualifier, c.ts, c.type) for c in t.cells().collect()]


# --------------------------------------- testMajorCompactingToNoOutput:90


def test_major_compacting_to_no_output(store):
    t = _mk(store, "tono")
    _fill(t, 4)
    # delete every row the scanner returns
    for r in ROWS:
        t.mutate([Delete(r)], now=1000)
    t.compact(major=True)
    assert t.client().scan(Scan()).count() == 0
    # and the PHYSICAL store has no product at all — masked puts AND
    # the tombstones themselves are purged by a major compaction
    assert _raw(t) == []


# ------------------------------------------------------ testCompaction:123


def test_compaction_version_trim_delete_and_ttl(store):
    t = _mk(store, "comp")
    _fill(t, 5)  # ~5 versions per column; family cap is 3

    # reads cap at the family max BEFORE any compaction
    got = t.client().get(Get(ROWS[0], families=["f"], max_versions=100))
    assert got.count() == 3
    # ...but the raw store still holds all 5 versions
    assert sum(1 for c in _raw(t) if c[0] == ROWS[0]) == 5

    t.compact(major=True)
    # major compaction TRIMS to the family cap physically: exactly the
    # 3 newest versions of each column survive in the files
    mine = sorted(c[2] for c in _raw(t) if c[0] == ROWS[0])
    assert mine == [102, 103, 104]
    got = t.client().get(Get(ROWS[1], families=["f"], max_versions=100))
    assert got.count() == 3

    # family-delete the second row, verify at every boundary
    second = ROWS[1]
    t.mutate([Delete(second).delete_family("f")], now=2000)
    for _ in range(2):
        assert t.client().get(
            Get(second, families=["f"], max_versions=100)).count() == 0
        t.mutate([Put("zzz-extra").add("f", "text", "x", ts=150)], now=2001)

    t.compact(major=True)
    raw = _raw(t)
    # deleted row physically gone from the compacted store; first row
    # still has exactly its 3 versions
    assert not any(c[0] == second for c in raw)
    assert sum(1 for c in raw if c[0] == ROWS[0]) == 3

    # TTL: cap the family at 1s and major-compact far in the future —
    # everything expires to no output (store.ttl = 1000 in the
    # reference; injected `now` replaces its Thread.sleep)
    desc = TableDescriptor("comp")
    desc.add_family(FamilyDescriptor("f", max_versions=3, ttl=1))
    t.alter(desc)
    t.compact(major=True, now=10_000_000)
    assert _raw(t) == []
