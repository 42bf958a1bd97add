"""Codec tests — ports util/TestBytes.java cases."""

import struct

from hypothesis import given, strategies as st

from hbase_snapshot_spark import bytes_util as Bytes


def test_long_roundtrip():
    for v in (0, 1, -1, 2**62, -(2**62), 42):
        assert Bytes.to_long(Bytes.to_bytes(v)) == v


def test_long_is_big_endian():
    assert Bytes.to_bytes(1) == b"\x00" * 7 + b"\x01"


def test_double_roundtrip():
    for v in (0.0, -1.5, 3.141592653589793):
        assert Bytes.to_double(Bytes.to_bytes(v)) == v


def test_string_roundtrip():
    assert Bytes.to_string(Bytes.to_bytes("héllo")) == "héllo"


def test_boolean():
    assert Bytes.to_boolean(Bytes.to_bytes(True)) is True
    assert Bytes.to_boolean(Bytes.to_bytes(False)) is False


def test_string_binary_escapes():
    assert Bytes.to_string_binary(b"a\x00b") == "a\\x00b"


@given(st.binary(max_size=16), st.binary(max_size=16))
def test_compare_unsigned(a, b):
    # must match Java WritableComparator.compareBytes (unsigned)
    expect = (a > b) - (a < b)
    assert Bytes.compare_to(a, b) == expect


@given(st.integers(min_value=-(2**63), max_value=2**63 - 1),
       st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_signed_long_bytes_not_order_preserving_is_known(a, b):
    # documents the reference's behavior: raw long encodings do NOT sort
    # numerically for negatives (HBase shares this caveat)
    ea, eb = struct.pack(">q", a), struct.pack(">q", b)
    if (a >= 0) == (b >= 0):
        assert (ea < eb) == (a < b)


def test_increment_bytes():
    assert Bytes.to_long(Bytes.increment_bytes(Bytes.to_bytes(5), 37)) == 42
    assert Bytes.to_long(Bytes.increment_bytes(Bytes.to_bytes(5), -10)) == -5


def test_prefix_end():
    assert Bytes.prefix_end(b"abc") == b"abd"
    assert Bytes.prefix_end(b"a\xff") == b"b"
    assert Bytes.prefix_end(b"\xff\xff") is None


def test_split_keys_multibyte_and_padding():
    """util/Bytes.split over multi-byte keys: equal unsigned intervals,
    exact endpoints, shorter key zero-padded."""
    from hbase_snapshot_spark.bytes_util import split_keys

    assert split_keys(b"\x00\x00", b"\x01\x00", 3) == [
        b"\x00\x00", b"\x00\x40", b"\x00\x80", b"\x00\xc0", b"\x01\x00"]
    # shorter first key is right-padded to the common width
    assert split_keys(b"a", b"ab", 0) == [b"a\x00", b"ab"]
    import pytest as _pytest
    with _pytest.raises(ValueError):
        split_keys(b"b", b"a", 1)
