"""hbase_snapshot_spark — a PySpark-native analytics engine re-creating the
query and data-processing capabilities of the lichongxin/hbase-snapshot
reference (Apache HBase 0.89.0-SNAPSHOT + table snapshots).

The engine models a table as a stream of versioned cells
(row, family, qualifier, ts, type, seq, value) and implements the
reference's read semantics (maxVersions / tombstones / TTL / time range /
filters), mutation model, snapshot feature, ETL tools, and a
replication stream — all as idiomatic DataFrame / Structured Streaming
programs so Catalyst/Tungsten pick the physical strategy.

Reference parity map: see SURVEY.md §2 (file:line citations live in each
module's docstrings).
"""

from hbase_snapshot_spark.model import (
    KeyType,
    CELL_FIELDS,
    cell_schema,
    FamilyDescriptor,
    TableDescriptor,
)
from hbase_snapshot_spark.resolve import resolve, ResolveSpec
from hbase_snapshot_spark import bytes_util as Bytes

__all__ = [
    "KeyType",
    "CELL_FIELDS",
    "cell_schema",
    "FamilyDescriptor",
    "TableDescriptor",
    "resolve",
    "ResolveSpec",
    "Bytes",
    "Scan",
    "Get",
    "Table",
    "TableStore",
    "Put",
    "Delete",
]


def __getattr__(name):
    # lazy re-exports of the client/storage surface (avoids importing
    # the heavier modules for codec-only users)
    if name in ("Scan", "Get", "Table"):
        from hbase_snapshot_spark import client

        return getattr(client, name if name != "Table" else "Table")
    if name in ("TableStore", "Put", "Delete", "NoSuchColumnFamilyError",
                "TableExistsError", "TableNotFoundError",
                "TableNotEnabledError"):
        from hbase_snapshot_spark import table

        return getattr(table, name)
    raise AttributeError(name)
