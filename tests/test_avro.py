"""Avro API surface tests — mirrors TestAvroServer.java's cases
(testTableAdminAndMetadata, testFamilyAdminAndMetadata, testDML,
testScanning) against the method-surface parity layer."""

import pytest

from hbase_snapshot_spark.table import TableStore
from hbase_snapshot_spark.avro_api import (
    AColumn,
    AColumnValue,
    ADelete,
    AFamilyDescriptor,
    AGet,
    AIllegalArgument,
    AIOError,
    APut,
    AScan,
    ATableDescriptor,
    ATableExists,
    ATimeRange,
    AvroServer,
)


@pytest.fixture()
def server(spark, tmp_path):
    return AvroServer(TableStore(spark, str(tmp_path / "avro")))


def _mk(server, name="tableA"):
    server.createTable(ATableDescriptor(
        name, families=[AFamilyDescriptor("familyA", maxVersions=3)]
    ))
    return server


def test_table_admin_and_metadata(server):
    # TestAvroServer.testTableAdminAndMetadata
    assert server.listTables() == []
    _mk(server)
    assert server.tableExists("tableA")
    assert not server.tableExists("tableB")
    desc = server.describeTable("tableA")
    assert desc.name == "tableA" and desc.families[0].name == "familyA"
    with pytest.raises(ATableExists):
        _mk(server)

    assert server.isTableEnabled("tableA")
    server.disableTable("tableA")
    assert not server.isTableEnabled("tableA")
    with pytest.raises(AIOError):
        server.get("tableA", AGet("rowA"))
    server.enableTable("tableA")
    assert server.isTableEnabled("tableA")
    server.flush("tableA")
    server.split("tableA")

    # deleteTable requires the table disabled first
    # (admin.deleteTable → TableNotDisabledException)
    with pytest.raises(AIOError, match="TableNotDisabled"):
        server.deleteTable("tableA")
    server.disableTable("tableA")
    server.deleteTable("tableA")
    assert not server.tableExists("tableA")


def test_family_admin_and_metadata(server):
    # TestAvroServer.testFamilyAdminAndMetadata
    _mk(server)
    fam = server.describeFamily("tableA", "familyA")
    assert fam.maxVersions == 3

    server.addFamily("tableA", AFamilyDescriptor("familyB", maxVersions=1))
    assert len(server.describeTable("tableA").families) == 2
    server.modifyFamily("tableA", "familyB", AFamilyDescriptor("familyB", maxVersions=2))
    assert server.describeFamily("tableA", "familyB").maxVersions == 2
    server.deleteFamily("tableA", "familyB")
    assert len(server.describeTable("tableA").families) == 1
    with pytest.raises(AIOError):
        server.describeFamily("tableA", "familyB")


def test_dml(server):
    # TestAvroServer.testDML
    _mk(server)
    g = AGet("rowA", columns=[AColumn("familyA", "qualifierA")])
    assert not server.exists("tableA", g)

    server.put("tableA", APut("rowA", [
        AColumnValue("familyA", "qualifierA", "valueA", timestamp=100)
    ]))
    assert server.exists("tableA", g)
    res = server.get("tableA", g)
    assert res.row == "rowA"
    assert [(e.family, e.qualifier, e.value, e.timestamp) for e in res.entries] == [
        ("familyA", "qualifierA", "valueA", 100)
    ]

    # versions + timerange
    server.put("tableA", APut("rowA", [
        AColumnValue("familyA", "qualifierA", "valueB", timestamp=200)
    ]))
    res = server.get("tableA", AGet("rowA", maxVersions=2))
    assert [e.value for e in res.entries] == ["valueB", "valueA"]
    res = server.get("tableA", AGet("rowA", timestamp=100))
    assert [e.value for e in res.entries] == ["valueA"]
    res = server.get("tableA", AGet("rowA", timerange=ATimeRange(150, 250)))
    assert [e.value for e in res.entries] == ["valueB"]

    assert server.incrementColumnValue(
        "tableA", "rowI", "familyA", "cnt", 7) == 7

    server.delete("tableA", ADelete("rowA", [AColumn("familyA", "qualifierA")]))
    assert not server.exists("tableA", g)
    server.delete("tableA", ADelete("rowI"))
    assert not server.exists("tableA", AGet("rowI"))


def test_scanning(server):
    # TestAvroServer.testScanning
    _mk(server)
    for i in range(10):
        server.put("tableA", APut(f"row{i:02d}", [
            AColumnValue("familyA", "q", str(i), timestamp=50 + i)
        ]))
    sid = server.scannerOpen("tableA", AScan(startRow="row03", stopRow="row08"))
    rows = server.scannerGetRows(sid, 3)
    assert [r.row for r in rows] == ["row03", "row04", "row05"]
    rows = server.scannerGetRows(sid, 100)
    assert [r.row for r in rows] == ["row06", "row07"]
    assert server.scannerGetRows(sid, 1) == []
    server.scannerClose(sid)
    with pytest.raises(AIllegalArgument):
        server.scannerGetRows(sid, 1)

    # timerange scan
    sid = server.scannerOpen("tableA", AScan(timerange=ATimeRange(50, 53)))
    assert [r.row for r in server.scannerGetRows(sid, 100)] == [
        "row00", "row01", "row02"
    ]
    server.scannerClose(sid)
