"""Cell-table builder for tests — the analogue of the reference's
KeyValueScanFixture.java: hand-rolled cell lists with explicit
timestamps (never wall clock; the reference's TTL tests use wall time
and are flaky by design — we inject `now`)."""

from hbase_snapshot_spark.model import KeyType, cell_schema


def put(row, fam, qual, ts, value, seq=0):
    return (row, fam, qual, ts, KeyType.PUT, seq, value)


def delete(row, fam, qual, ts, seq=0):
    """exact-version tombstone (client/Delete.java deleteColumn:213)"""
    return (row, fam, qual, ts, KeyType.DELETE, seq, None)


def delete_column(row, fam, qual, ts, seq=0):
    """qualifier tombstone, masks ts <= tombstone (Delete.deleteColumns:180)"""
    return (row, fam, qual, ts, KeyType.DELETE_COLUMN, seq, None)


def delete_family(row, fam, ts, seq=0):
    """family tombstone (Delete.deleteFamily:147)"""
    return (row, fam, None, ts, KeyType.DELETE_FAMILY, seq, None)


def cells_df(spark, rows, binary=False):
    return spark.createDataFrame(rows, schema=cell_schema(binary=binary))


def visible_set(df):
    """(row, family, qualifier, ts, value) set for assertion."""
    return {
        (r.row, r.family, r.qualifier, r.ts, r.value)
        for r in df.collect()
    }
