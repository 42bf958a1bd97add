"""Data model — the versioned cell and table/family descriptors.

Reference parity:
  - KeyValue (KeyValue.java:66): (row, family, qualifier, ts, type, value)
    with type codes at KeyValue.java:156-172 and the total order at
    KeyValue.java:1329 (row asc, family asc, qualifier asc, ts DESC,
    type DESC — newer versions first).
  - HTableDescriptor.java / HColumnDescriptor.java: table = name + set of
    column families; per-family maxVersions (default 3,
    HColumnDescriptor.java:92), TTL (default forever, :124), replication
    scope (:129).  Qualifiers are dynamic (any name, no declaration).

Spark mapping: a table is any DataFrame with the CELL_FIELDS columns.
``row``/``qualifier``/``value`` may be BinaryType (exact reference
semantics — Spark's BinaryType comparison is unsigned lexicographic,
matching util/Bytes.java) or StringType (convenient for SQL-oracle
parity); the engine is agnostic.  ``seq`` is an append sequence number
used to break ties between identical (row,family,qualifier,ts) puts —
it plays the role of HBase's "newer store file wins" rule
(client/TestFromClientSide.java testDuplicateVersions:2873).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T


class KeyType:
    """Cell type codes — KeyValue.java:156-172."""

    MINIMUM = 0
    PUT = 4
    DELETE = 8          # exact-version tombstone
    DELETE_COLUMN = 12  # qualifier tombstone: masks ts <= tombstone ts
    DELETE_FAMILY = 14  # family tombstone: masks ts <= tombstone ts
    MAXIMUM = 255

    DELETES = (DELETE, DELETE_COLUMN, DELETE_FAMILY)


#: canonical column names of a cell DataFrame
CELL_FIELDS = ("row", "family", "qualifier", "ts", "type", "seq", "value")

#: timestamp used by the reference for "latest" (HConstants.LATEST_TIMESTAMP)
LATEST_TIMESTAMP = (1 << 63) - 1

FOREVER = (1 << 31) - 1  # HConstants.FOREVER (TTL in seconds)


class NoSuchColumnFamilyError(Exception):
    """regionserver/NoSuchColumnFamilyException.java — a mutation or
    read addresses a family the table descriptor does not declare
    (HRegion.checkFamily:2391; reads go through it via
    HRegion.getScanner:2355 and HRegion.get)."""


def cell_schema(binary: bool = True) -> T.StructType:
    """Schema of the canonical cell DataFrame.

    binary=True  → exact reference model (row/qualifier/value byte[]).
    binary=False → string-typed convenience variant.
    """
    kt = T.BinaryType() if binary else T.StringType()
    return T.StructType(
        [
            T.StructField("row", kt, False),
            T.StructField("family", T.StringType(), False),
            T.StructField("qualifier", kt, True),
            T.StructField("ts", T.LongType(), False),
            T.StructField("type", T.IntegerType(), False),
            T.StructField("seq", T.LongType(), False),
            T.StructField("value", kt, True),
        ]
    )


@dataclass
class FamilyDescriptor:
    """HColumnDescriptor.java:47 — the schema-fixed dimension."""

    name: str
    max_versions: int = 3          # HColumnDescriptor.DEFAULT_VERSIONS (:92)
    ttl: int = FOREVER             # seconds; HColumnDescriptor.DEFAULT_TTL (:124)
    replication_scope: int = 0     # :129 — 1 = replicated
    # physical knobs kept for API parity; advisory in the Spark engine
    compression: str = "NONE"
    in_memory: bool = False
    block_cache: bool = True
    bloom_filter: str = "NONE"     # NONE / ROW / ROWCOL
    # user metadata (HColumnDescriptor.setValue/getValue:183-200)
    values: dict = field(default_factory=dict)

    def set_value(self, key: str, value: str) -> "FamilyDescriptor":
        self.values[key] = value
        return self

    def get_value(self, key: str):
        return self.values.get(key)

    def to_dict(self) -> dict:
        return {
            "name": self.name,
            "max_versions": self.max_versions,
            "ttl": self.ttl,
            "replication_scope": self.replication_scope,
            "compression": self.compression,
            "in_memory": self.in_memory,
            "block_cache": self.block_cache,
            "bloom_filter": self.bloom_filter,
            "values": dict(self.values),
        }

    @classmethod
    def from_dict(cls, d: dict) -> "FamilyDescriptor":
        return cls(**{**d, "values": d.get("values", {})})


@dataclass
class TableDescriptor:
    """HTableDescriptor.java — name + families + table attrs."""

    name: str
    families: dict[str, FamilyDescriptor] = field(default_factory=dict)
    max_filesize: int | None = None
    readonly: bool = False
    memstore_flushsize: int | None = None
    deferred_log_flush: bool = False
    # user metadata (HTableDescriptor.setValue/getValue:204-239)
    values: dict = field(default_factory=dict)

    def set_value(self, key: str, value: str) -> "TableDescriptor":
        self.values[key] = value
        return self

    def get_value(self, key: str):
        return self.values.get(key)

    def add_family(self, fam: FamilyDescriptor) -> "TableDescriptor":
        self.families[fam.name] = fam
        return self

    def family(self, name: str) -> FamilyDescriptor:
        return self.families[name]

    def to_dict(self) -> dict:
        return {
            "name": self.name,
            "families": {k: v.to_dict() for k, v in self.families.items()},
            "max_filesize": self.max_filesize,
            "readonly": self.readonly,
            "memstore_flushsize": self.memstore_flushsize,
            "deferred_log_flush": self.deferred_log_flush,
            "values": dict(self.values),
        }

    @classmethod
    def from_dict(cls, d: dict) -> "TableDescriptor":
        fams = {k: FamilyDescriptor.from_dict(v) for k, v in d["families"].items()}
        return cls(
            name=d["name"],
            families=fams,
            max_filesize=d.get("max_filesize"),
            readonly=d.get("readonly", False),
            memstore_flushsize=d.get("memstore_flushsize"),
            deferred_log_flush=d.get("deferred_log_flush", False),
            values=d.get("values", {}),
        )
