"""Byte codecs — parity with the reference's ``util/Bytes.java`` (1258 LoC).

The reference stores every value as an untyped ``byte[]``; typing is by
convention via these codecs (``Bytes.toLong`` at util/Bytes.java:452,
``toInt``:624, ``toShort``:699, ``toFloat``:532, ``toDouble``:569,
``toBoolean``:423, ``toString``:249, ``toStringBinary``:300).  All
numeric encodings are big-endian, matching Java's ``DataOutput``.

The ordering contract (util/Bytes.java ``compareTo`` via
WritableComparator) is *unsigned lexicographic* — which is exactly how
Spark compares ``BinaryType`` columns, so row-key ranges/sorts work on
binary columns with no custom comparator (verified in tests/test_bytes.py).
"""

from __future__ import annotations

import struct

SIZEOF_LONG = 8
SIZEOF_INT = 4
SIZEOF_SHORT = 2


def to_bytes(v) -> bytes:
    """Encode a Python value the way the reference's overloads do."""
    if isinstance(v, bytes):
        return v
    if isinstance(v, str):
        return v.encode("utf-8")
    if isinstance(v, bool):
        return b"\xff" if v else b"\x00"  # Bytes.toBytes(boolean): -1 / 0
    if isinstance(v, int):
        return struct.pack(">q", v)
    if isinstance(v, float):
        return struct.pack(">d", v)
    raise TypeError(f"unsupported type: {type(v)}")


def to_long(b: bytes) -> int:
    if len(b) != SIZEOF_LONG:
        raise ValueError(f"expected {SIZEOF_LONG} bytes, got {len(b)}")
    return struct.unpack(">q", b)[0]


def to_int(b: bytes) -> int:
    if len(b) != SIZEOF_INT:
        raise ValueError(f"expected {SIZEOF_INT} bytes, got {len(b)}")
    return struct.unpack(">i", b)[0]


def to_short(b: bytes) -> int:
    if len(b) != SIZEOF_SHORT:
        raise ValueError(f"expected {SIZEOF_SHORT} bytes, got {len(b)}")
    return struct.unpack(">h", b)[0]


def to_float(b: bytes) -> float:
    return struct.unpack(">f", b)[0]


def to_double(b: bytes) -> float:
    return struct.unpack(">d", b)[0]


def to_boolean(b: bytes) -> bool:
    if len(b) != 1:
        raise ValueError("expected 1 byte")
    return b != b"\x00"


def to_string(b: bytes) -> str:
    return b.decode("utf-8")


def to_string_binary(b: bytes) -> str:
    """Printable rendering with \\xNN escapes (util/Bytes.java:300)."""
    out = []
    for ch in b:
        if 32 <= ch < 127 and chr(ch) not in "\\":
            out.append(chr(ch))
        else:
            out.append(f"\\x{ch:02X}")
    return "".join(out)


def compare_to(a: bytes, b: bytes) -> int:
    """Unsigned lexicographic compare (util/Bytes.java compareTo)."""
    if a == b:
        return 0
    return -1 if a < b else 1  # Python bytes compare is unsigned lexicographic


def increment_bytes(b: bytes, amount: int) -> bytes:
    """8-byte big-endian counter arithmetic — the one server-interpreted
    type (HRegion.incrementColumnValue regionserver/HRegion.java:3126)."""
    return struct.pack(">q", to_long(b) + amount)


def split_keys(a: bytes, b: bytes, num: int) -> list[bytes]:
    """util/Bytes.split:1174 — ``num + 2`` keys dividing [a, b] into
    ``num + 1`` equal unsigned big-endian intervals, endpoints
    included (the reference's BigInteger interpolation; shorter key
    zero-padded to the common width)."""
    size = max(len(a), len(b))
    ai = int.from_bytes(bytes(a).ljust(size, b"\x00"), "big")
    bi = int.from_bytes(bytes(b).ljust(size, b"\x00"), "big")
    if num < 0 or bi < ai:
        raise ValueError("b must sort at-or-after a; num >= 0")
    interval = (bi - ai) // (num + 1)
    out = [
        (ai + interval * i).to_bytes(size, "big") for i in range(num + 1)
    ]
    out.append(bytes(b).ljust(size, b"\x00"))  # exact upper endpoint
    return out


def prefix_end(prefix: bytes) -> bytes | None:
    """Smallest byte string strictly greater than every string with
    ``prefix`` — the PrefixFilter → row-range rewrite used for partition
    pruning.  Returns None when the prefix is all 0xFF (unbounded)."""
    p = bytearray(prefix)
    for i in reversed(range(len(p))):
        if p[i] != 0xFF:
            p[i] += 1
            return bytes(p[: i + 1])
    return None
