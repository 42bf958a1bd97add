"""Port of the client/TestAdmin.java admin-surface corpus — table
lifecycle, name legality (HBASE-771), and the fork's OWN flagship: the
cluster-scope snapshot registry (snapshot survives table deletion;
restoreSnapshot recreates the dropped table, TestAdmin:598-700).

Mapping notes:
- RetriesExhaustedException on a disabled table = TableNotEnabledError
  (the client() gate).
- `admin` = TableStore; `flush` = segment boundary (each mutate batch
  commits one).
- testEnableDisableAddColumnDeleteColumn's TableNotDisabledException
  on enabled-table alters is a documented divergence (DIVERGENCES.md:
  engine-level maintenance is a superset); the port pins OUR contract:
  alter works in either state.
"""

import pytest

from hbase_snapshot_spark.client import Get, Scan
from hbase_snapshot_spark.model import FamilyDescriptor, TableDescriptor
from hbase_snapshot_spark.table import (
    Delete,
    Put,
    TableExistsError,
    TableNotEnabledError,
    TableNotFoundError,
    TableStore,
)


@pytest.fixture()
def store(spark, tmp_path):
    return TableStore(spark, str(tmp_path / "tables"))


def _mk(store, name, *fams):
    desc = TableDescriptor(name)
    for f in fams or ("info",):
        desc.add_family(FamilyDescriptor(f))
    return store.create_table(desc)


# ----------------------------------------------------- testCreateTable:80


def test_create_table_listed(store):
    n0 = len(store.list_tables())
    _mk(store, "testCreateTable")
    assert len(store.list_tables()) == n0 + 1


# ------------------------------------------- testDisableAndEnableTable:250


def test_disable_and_enable_table(store):
    t = _mk(store, "testDisableAndEnableTable")
    t.mutate([Put("row").add("info", "qualifier", "value")], now=10)

    t.disable()
    with pytest.raises(TableNotEnabledError):
        t.client().get(Get("row", columns={"info": ["qualifier"]}))
    t.enable()
    assert t.client().get(
        Get("row", columns={"info": ["qualifier"]})).count() == 1


# ------------------------------------------------------ testTableExist:284


def test_table_exist(store):
    name = "testTableExist"
    assert name not in store.list_tables()
    _mk(store, name)
    assert name in store.list_tables()
    assert store.table(name) is not None


# ----------------------------------------- testEmptyHHTableDescriptor:387


def test_empty_table_descriptor_rejected(store):
    with pytest.raises(ValueError):
        store.create_table(TableDescriptor(""))
    with pytest.raises(ValueError):
        store.create_table(TableDescriptor("nofam"))


# ------------------------------ testEnableDisableAddColumnDeleteColumn:392


def test_enable_disable_add_delete_column(store):
    """engine-level alter works in either enable state (documented
    superset divergence); the read surface still honors disable."""
    t = _mk(store, "testMasterAdmin")
    t.disable()
    desc = TableDescriptor("testMasterAdmin")
    desc.add_family(FamilyDescriptor("info"))
    desc.add_family(FamilyDescriptor("col2"))
    t.alter(desc)
    t.enable()
    assert set(t.descriptor.families) == {"info", "col2"}
    # delete the family again (enabled — superset)
    desc2 = TableDescriptor("testMasterAdmin")
    desc2.add_family(FamilyDescriptor("info"))
    t.alter(desc2)
    assert set(t.descriptor.families) == {"info"}
    store.drop_table("testMasterAdmin")
    assert "testMasterAdmin" not in store.list_tables()


# ------------------------------------------------- testTableNameClash:481


def test_table_name_clash(store):
    _mk(store, "testTableNameClashSOMEUPPERCASE")
    _mk(store, "testTableNameClash")
    assert store.table("testTableNameClash") is not None


# ----------------------------------------------------- testTableNames:510


def test_table_names(store):
    """HBASE-771: '-' and '.' are legal INSIDE a name, never leading
    (that namespace belongs to -ROOT-/.META./.snapshot)."""
    for bad in ("-bad", ".bad", "-ROOT-", ".META."):
        with pytest.raises(ValueError):
            _mk(store, bad)
    with pytest.raises(ValueError):
        _mk(store, "has space")
    t = _mk(store, "g-oo.d")
    assert "g-oo.d" in store.list_tables()
    assert t.descriptor.name == "g-oo.d"


# ------------------------- testTableNotFoundException{With,Without}:541


def test_table_exists_and_not_found(store):
    _mk(store, "clash")
    with pytest.raises(TableExistsError):
        _mk(store, "clash")
    with pytest.raises(TableNotFoundError):
        store.table("no-such-table")
    with pytest.raises(TableNotFoundError):
        store.drop_table("no-such-table")


# ---------------------------------------------- testGetTableDescriptor:582


def test_get_table_descriptor(store):
    desc = TableDescriptor("myTestTable")
    for f in ("fam1", "fam2", "fam3"):
        desc.add_family(FamilyDescriptor(f, max_versions=4))
    store.create_table(desc)
    got = store.table("myTestTable").descriptor
    assert set(got.families) == {"fam1", "fam2", "fam3"}
    assert all(f.max_versions == 4 for f in got.families.values())


# --------------------------------------------------------- testSnapshot:598


def test_admin_snapshot_listed(store):
    n0 = len(store.list_snapshots())
    _mk(store, "testTableForSnapshot1", "fam1", "fam2", "fam3")
    store.snapshot("testSnapshot1", "testTableForSnapshot1")
    snaps = store.list_snapshots()
    assert len(snaps) == n0 + 1 and "testSnapshot1" in snaps
    d = store.snapshot_descriptor("testSnapshot1")
    assert d["snapshot_table"] == "testTableForSnapshot1"
    assert d["creation_time"] > 0


# -------------------------------------------------- testRestoreSnapshot:619


def test_admin_restore_snapshot_after_table_deletion(store):
    """THE fork feature: snapshot, DELETE the table, restore from the
    store-level registry — all 20 rows back, all three families, values
    keyed by row."""
    t = _mk(store, "testTableForSnapshot2", "fam1", "fam2", "fam3")
    # first half 'flushed', second half 'still in the edit log' —
    # two segments
    for lo, hi in ((0, 10), (10, 20)):
        t.mutate([
            Put(f"{i:04d}").add("fam1", "", f"{i:04d}")
            .add("fam2", "", f"{i:04d}").add("fam3", "", f"{i:04d}")
            for i in range(lo, hi)
        ], now=100 + lo)
    store.snapshot("testSnapshot2", "testTableForSnapshot2")

    t.disable()
    store.drop_table("testTableForSnapshot2")
    assert "testTableForSnapshot2" not in store.list_tables()

    restored = store.restore_snapshot("testSnapshot2")
    rows = restored.client().scan(Scan()).collect()
    by_row: dict = {}
    for c in rows:
        by_row.setdefault(c.row, {})[c.family] = c.value
    assert len(by_row) == 20
    for r, fams in by_row.items():
        assert fams == {"fam1": r, "fam2": r, "fam3": r}

    # restoring over an existing table is refused (delete it first)
    with pytest.raises(TableExistsError):
        store.restore_snapshot("testSnapshot2")

    # post-restore the table is fully live: mutations + snapshots work
    restored.mutate([Delete("0000")], now=500)
    assert restored.client().row_count() == 19


# --------------------------------------------------- testDeleteSnapshot:680


def test_admin_delete_snapshot(store):
    _mk(store, "testTableForSnapshot3", "fam1")
    n0 = len(store.list_snapshots())
    store.snapshot("testSnapshot3", "testTableForSnapshot3")
    assert len(store.list_snapshots()) == n0 + 1
    store.delete_snapshot("testSnapshot3")
    assert len(store.list_snapshots()) == n0
    with pytest.raises(TableNotFoundError):
        store.delete_snapshot("testSnapshot3")
    # duplicate snapshot names are refused while one exists
    store.snapshot("testSnapshot3", "testTableForSnapshot3")
    with pytest.raises(TableExistsError):
        store.snapshot("testSnapshot3", "testTableForSnapshot3")


def test_store_snapshot_binary_table_roundtrip(store):
    """the store-level registry preserves the binary flag and exact
    byte payloads through drop + restore."""
    from hbase_snapshot_spark.bytes_util import to_bytes, to_long

    desc = TableDescriptor("binsnap").add_family(FamilyDescriptor("f"))
    t = store.create_table(desc, binary=True)
    t.mutate([Put(to_bytes(7)).add("f", b"q", to_bytes(42))], now=10)
    store.snapshot("bs1", "binsnap")
    store.drop_table("binsnap")
    restored = store.restore_snapshot("bs1")
    assert restored.manifest()["binary"] is True
    cells = restored.client().scan(Scan()).collect()
    assert len(cells) == 1
    assert to_long(bytes(cells[0].row)) == 7
    assert to_long(bytes(cells[0].value)) == 42


def test_store_snapshot_survives_compaction_and_vacuum(store):
    """the registry's hard-linked segments are independent directory
    entries: the source table may compact and vacuum its history away,
    the snapshot still restores the frozen state byte-for-byte."""
    t = _mk(store, "vacsnap", "f")
    t.mutate([Put("r1").add("f", "q", "v1", ts=10)], now=10)
    t.mutate([Put("r2").add("f", "q", "v2", ts=20)], now=20)
    store.snapshot("vs1", "vacsnap")

    # source moves on: more data, major compaction, vacuum
    t.mutate([Put("r3").add("f", "q", "v3", ts=30)], now=30)
    t.compact(major=True)
    removed = t.vacuum()
    assert removed  # the pre-compaction segments really are gone

    store.drop_table("vacsnap")
    restored = store.restore_snapshot("vs1")
    got = {(c.row, c.value) for c in restored.client().scan(Scan()).collect()}
    assert got == {("r1", "v1"), ("r2", "v2")}  # frozen state, no r3


def test_store_snapshot_concurrent_same_name(store):
    """two threads snapshotting the same name race on the atomic
    publish: exactly one wins, the loser gets TableExistsError, no
    half-built or tmp dirs remain listed."""
    import threading

    _mk(store, "racesnap", "f")
    results = []

    def snap():
        try:
            store.snapshot("race1", "racesnap")
            results.append("ok")
        except TableExistsError:
            results.append("exists")

    threads = [threading.Thread(target=snap) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert results.count("ok") == 1 and results.count("exists") == 3
    assert store.list_snapshots() == ["race1"]
    store.restore_snapshot  # the winner's snapshot is complete:
    d = store.snapshot_descriptor("race1")
    assert d["snapshot_table"] == "racesnap"
