"""REST wire formats — protobuf and XML codecs for the reference's
Stargate model messages, byte-compatible with its 9 ``.proto`` files
(src/main/resources/org/apache/hadoop/hbase/rest/protobuf/*.proto) and
the JAXB XML shapes of ``rest/model/*.java``.

The protobuf layer is hand-rolled (no protobuf dependency): the wire
format is varint tags + length-delimited fields, and these messages use
only wire types 0 (varint) and 2 (bytes).  Field numbers match the
reference protos exactly:

  Cell        { row=1 bytes; column=2 bytes; timestamp=3 int64; data=4 bytes }
  CellSet     { rows=1 repeated Row { key=1 bytes; values=2 repeated Cell } }
  Scanner     { startRow=1; endRow=2; columns=3 rep bytes; batch=4 int32;
                startTime=5 int64; endTime=6 int64; maxVersions=7 int32;
                filter=8 string }
  TableList   { name=1 repeated string }
  ColumnSchema{ name=1; attrs=2 rep Attribute{name=1,value=2}; ttl=3;
                maxVersions=4; compression=5 }
  TableSchema { name=1; attrs=2 rep Attribute; columns=3 rep ColumnSchema;
                inMemory=4 bool; readOnly=5 bool }
  Version     { restVersion=1; jvmVersion=2; osVersion=3; serverVersion=4;
                jerseyVersion=5 }

XML (JAXB byte[] fields are base64, CellModel value is the element
text):

  <CellSet><Row key="b64"><Cell column="b64" timestamp="T">b64</Cell>
  </Row></CellSet>           (CellSetModel/RowModel/CellModel)
  <TableList><table name="..."/></TableList>   (TableListModel)
"""

from __future__ import annotations

import base64
import xml.etree.ElementTree as ET

# --------------------------------------------------------------- varints


def _uvarint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zig64(n: int) -> int:
    """int64 as unsigned (two's complement), for wire type 0."""
    return n & 0xFFFFFFFFFFFFFFFF


def _read_uvarint(data: bytes, pos: int) -> tuple[int, int]:
    shift = n = 0
    while True:
        b = data[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, pos
        shift += 7
        if shift > 63:
            raise ValueError("varint too long")


def _tag(field: int, wire: int) -> bytes:
    return _uvarint((field << 3) | wire)


def _field_varint(field: int, value: int) -> bytes:
    return _tag(field, 0) + _uvarint(_zig64(value))


def _field_bytes(field: int, value: bytes) -> bytes:
    return _tag(field, 2) + _uvarint(len(value)) + value


def _signed64(n: int) -> int:
    return n - (1 << 64) if n >= (1 << 63) else n


def _walk(data: bytes):
    """Yield (field, wire, value) triples; value is int (wire 0) or
    bytes (wire 2).  Unknown wire types raise — these messages use no
    others."""
    pos = 0
    while pos < len(data):
        key, pos = _read_uvarint(data, pos)
        field, wire = key >> 3, key & 7
        if wire == 0:
            v, pos = _read_uvarint(data, pos)
            yield field, wire, v
        elif wire == 2:
            ln, pos = _read_uvarint(data, pos)
            yield field, wire, data[pos : pos + ln]
            pos += ln
        else:
            raise ValueError(f"unsupported wire type {wire}")


# ------------------------------------------------------------- CellSet pb
# cells: list of (row_key: bytes, [(column: bytes, ts: int, data: bytes)])


def encode_cell_set(rows: list) -> bytes:
    out = bytearray()
    for key, cells in rows:
        row = bytearray(_field_bytes(1, key))
        for column, ts, data in cells:
            cell = bytearray()
            # row field (1) intentionally unset inside a CellSet
            cell += _field_bytes(2, column)
            if ts is not None:  # optional field 3 — absent ≠ 0
                cell += _field_varint(3, ts)
            if data is not None:
                cell += _field_bytes(4, data)
            row += _field_bytes(2, bytes(cell))
        out += _field_bytes(1, bytes(row))
    return bytes(out)


def decode_cell_set(data: bytes) -> list:
    rows = []
    for field, _w, v in _walk(data):
        if field != 1:
            continue
        key, cells = b"", []
        for f2, _w2, v2 in _walk(v):
            if f2 == 1:
                key = v2
            elif f2 == 2:
                column = data_ = b""
                # ts None = field 3 absent (server assigns the timestamp);
                # an explicit ts=0 in the body must stay 0 — the reference
                # RowResource honors it, so presence matters
                ts = None
                for f3, _w3, v3 in _walk(v2):
                    if f3 == 1:
                        pass  # row — unused inside CellSet
                    elif f3 == 2:
                        column = v3
                    elif f3 == 3:
                        ts = _signed64(v3)
                    elif f3 == 4:
                        data_ = v3
                cells.append((column, ts, data_))
        rows.append((key, cells))
    return rows


# ------------------------------------------------------------- Scanner pb


def encode_scanner(spec: dict) -> bytes:
    out = bytearray()
    if spec.get("startRow") is not None:
        out += _field_bytes(1, spec["startRow"])
    if spec.get("endRow") is not None:
        out += _field_bytes(2, spec["endRow"])
    for c in spec.get("columns", []):
        out += _field_bytes(3, c)
    if spec.get("batch") is not None:
        out += _field_varint(4, spec["batch"])
    if spec.get("startTime") is not None:
        out += _field_varint(5, spec["startTime"])
    if spec.get("endTime") is not None:
        out += _field_varint(6, spec["endTime"])
    if spec.get("maxVersions") is not None:
        out += _field_varint(7, spec["maxVersions"])
    if spec.get("filter") is not None:
        out += _field_bytes(8, spec["filter"].encode())
    return bytes(out)


def decode_scanner(data: bytes) -> dict:
    spec = {"columns": []}
    for field, _w, v in _walk(data):
        if field == 1:
            spec["startRow"] = v
        elif field == 2:
            spec["endRow"] = v
        elif field == 3:
            spec["columns"].append(v)
        elif field == 4:
            spec["batch"] = _signed64(v)
        elif field == 5:
            spec["startTime"] = _signed64(v)
        elif field == 6:
            spec["endTime"] = _signed64(v)
        elif field == 7:
            spec["maxVersions"] = _signed64(v)
        elif field == 8:
            spec["filter"] = v.decode()
    return spec


# ----------------------------------------------------------- TableList pb


def encode_table_list(names: list[str]) -> bytes:
    out = bytearray()
    for n in names:
        out += _field_bytes(1, n.encode())
    return bytes(out)


def decode_table_list(data: bytes) -> list[str]:
    return [v.decode() for f, _w, v in _walk(data) if f == 1]


# --------------------------------------------------------- TableSchema pb


def _encode_attrs(attrs: dict) -> bytes:
    out = bytearray()
    for name, value in attrs.items():
        body = _field_bytes(1, str(name).encode()) + _field_bytes(
            2, str(value).encode()
        )
        out += _field_bytes(2, bytes(body))
    return bytes(out)


def _decode_attrs(triples) -> dict:
    attrs = {}
    for f, _w, v in triples:
        if f == 2:
            name = value = ""
            for f2, _w2, v2 in _walk(v):
                if f2 == 1:
                    name = v2.decode()
                elif f2 == 2:
                    value = v2.decode()
            attrs[name] = value
    return attrs


def encode_column_schema(fam: dict) -> bytes:
    out = bytearray(_field_bytes(1, fam["name"].encode()))
    out += _encode_attrs(fam.get("attrs", {}))
    if fam.get("ttl") is not None:
        out += _field_varint(3, fam["ttl"])
    if fam.get("maxVersions") is not None:
        out += _field_varint(4, fam["maxVersions"])
    if fam.get("compression") is not None:
        out += _field_bytes(5, fam["compression"].encode())
    return bytes(out)


def decode_column_schema(data: bytes) -> dict:
    fam = {"name": "", "attrs": _decode_attrs(_walk(data))}
    for f, _w, v in _walk(data):
        if f == 1:
            fam["name"] = v.decode()
        elif f == 3:
            fam["ttl"] = _signed64(v)
        elif f == 4:
            fam["maxVersions"] = _signed64(v)
        elif f == 5:
            fam["compression"] = v.decode()
    return fam


def encode_table_schema(schema: dict) -> bytes:
    out = bytearray(_field_bytes(1, schema["name"].encode()))
    out += _encode_attrs(schema.get("attrs", {}))
    for fam in schema.get("columns", []):
        out += _field_bytes(3, encode_column_schema(fam))
    if schema.get("inMemory") is not None:
        out += _field_varint(4, 1 if schema["inMemory"] else 0)
    if schema.get("readOnly") is not None:
        out += _field_varint(5, 1 if schema["readOnly"] else 0)
    return bytes(out)


def decode_table_schema(data: bytes) -> dict:
    schema = {"name": "", "attrs": _decode_attrs(_walk(data)), "columns": []}
    for f, _w, v in _walk(data):
        if f == 1:
            schema["name"] = v.decode()
        elif f == 3:
            schema["columns"].append(decode_column_schema(v))
        elif f == 4:
            schema["inMemory"] = bool(v)
        elif f == 5:
            schema["readOnly"] = bool(v)
    return schema


# -------------------------------------------------------------- Version pb

_VERSION_FIELDS = ["restVersion", "jvmVersion", "osVersion",
                   "serverVersion", "jerseyVersion"]


def encode_version(info: dict) -> bytes:
    out = bytearray()
    for i, k in enumerate(_VERSION_FIELDS, start=1):
        if info.get(k) is not None:
            out += _field_bytes(i, info[k].encode())
    return bytes(out)


def decode_version(data: bytes) -> dict:
    info = {}
    for f, _w, v in _walk(data):
        if 1 <= f <= 5:
            info[_VERSION_FIELDS[f - 1]] = v.decode()
    return info


# ------------------------------------------------------------------- XML


def _b64(b: bytes) -> str:
    return base64.b64encode(b).decode("ascii")


def cell_set_to_xml(rows: list) -> bytes:
    """rows in the encode_cell_set shape → <CellSet> document."""
    root = ET.Element("CellSet")
    for key, cells in rows:
        row_el = ET.SubElement(root, "Row", key=_b64(key))
        for column, ts, data in cells:
            cell = ET.SubElement(row_el, "Cell", column=_b64(column))
            if ts is not None:  # optional attribute — absent ≠ 0
                cell.set("timestamp", str(ts))
            cell.text = _b64(data if data is not None else b"")
    return ET.tostring(root, encoding="utf-8", xml_declaration=True)


def xml_to_cell_set(doc: bytes) -> list:
    root = ET.fromstring(doc)
    if root.tag != "CellSet":
        raise ValueError(f"expected <CellSet>, got <{root.tag}>")
    rows = []
    for row_el in root.findall("Row"):
        key = base64.b64decode(row_el.get("key", ""))
        cells = []
        for cell in row_el.findall("Cell"):
            ts_attr = cell.get("timestamp")
            cells.append((
                base64.b64decode(cell.get("column", "")),
                int(ts_attr) if ts_attr is not None else None,
                base64.b64decode(cell.text or ""),
            ))
        rows.append((key, cells))
    return rows


def table_list_to_xml(names: list[str]) -> bytes:
    root = ET.Element("TableList")
    for n in names:
        ET.SubElement(root, "table", name=n)
    return ET.tostring(root, encoding="utf-8", xml_declaration=True)


def xml_to_table_list(doc: bytes) -> list[str]:
    root = ET.fromstring(doc)
    return [t.get("name") for t in root.findall("table")]


# --------------------------------------------------- cells → model rows


def group_cells(cell_rows) -> list:
    """Flat engine cells (objects with row/family/qualifier/ts/value,
    already in key order; str or bytes keyed) → CellSet model shape:
    [(key_bytes, [(column_bytes, ts, data_bytes)])].  Column =
    'family:qualifier' (the CellModel column convention)."""

    def as_bytes(v):
        if v is None:
            return b""
        if isinstance(v, (bytes, bytearray, memoryview)):
            return bytes(v)
        return str(v).encode()

    rows, cur_key, cur_cells = [], None, None
    for r in cell_rows:
        key = as_bytes(r.row)
        if key != cur_key:
            cur_cells = []
            rows.append((key, cur_cells))
            cur_key = key
        qual = as_bytes(r.qualifier)
        column = as_bytes(r.family) + b":" + qual
        cur_cells.append((column, r.ts, as_bytes(r.value)))
    return rows
