"""WARC ingestion (sources/warc.py): record grammar, gzip member
split, HTTP framing (chunked + content-encoding), WHATWG charset
resolution, and the Spark read path end-to-end."""

import gzip
import zlib

import pytest

from hbase_snapshot_spark.sources import warc as W


def _rec(wtype, uri, block, rid=None, content_type="application/http; msgtype=response"):
    headers = {
        "WARC-Type": wtype,
        "WARC-Record-ID": rid or f"<urn:uuid:{wtype}-{abs(hash((uri, block))) % 10**8}>",
        "WARC-Date": "2026-08-15T00:00:00Z",
        "Content-Type": content_type,
    }
    if uri:
        headers["WARC-Target-URI"] = uri
    return {"headers": headers, "block": block}


def _http(body, status=200, ctype="text/html", extra=b""):
    return (
        f"HTTP/1.1 {status} OK\r\nContent-Type: {ctype}\r\n".encode()
        + extra
        + b"\r\n"
        + body
    )


HTML = b"<html><head><title>T</title></head><body><p>hello world</p></body></html>"


def _fixture_records():
    return [
        _rec("warcinfo", None, b"software: test\r\n",
             content_type="application/warc-fields"),
        _rec("request", "http://a.example/x",
             b"GET /x HTTP/1.1\r\nHost: a.example\r\n\r\n",
             content_type="application/http; msgtype=request"),
        _rec("response", "http://a.example/x", _http(HTML), rid="<urn:uuid:r1>"),
        _rec("response", "http://a.example/miss", _http(b"gone", status=404),
             rid="<urn:uuid:r404>"),
        _rec("conversion", "http://a.example/x", b"hello world wet",
             rid="<urn:uuid:wet1>", content_type="text/plain"),
    ]


# ------------------------------------------------------------ pure parsing

def test_plain_stream_roundtrip():
    data = W.write_warc_file(_fixture_records(), gzip_members=False)
    recs = list(W.iter_warc_records(data, on_error="raise"))
    assert len(recs) == 5
    assert [h.get("warc-type") for _o, h, _b, _t in recs] == [
        "warcinfo", "request", "response", "response", "conversion"]
    assert recs[2][2] == _http(HTML)
    assert not any(t for *_x, t in recs)


def test_gzip_member_roundtrip_and_offsets():
    data = W.write_warc_file(_fixture_records(), gzip_members=True)
    recs = list(W.iter_warc_records(data, on_error="raise"))
    assert len(recs) == 5
    # member offsets must be strictly increasing file positions
    offs = [o for o, *_ in recs]
    assert offs == sorted(offs) and offs[0] == 0 and offs[1] > 0


def test_whole_file_gzip():
    plain = W.write_warc_file(_fixture_records(), gzip_members=False)
    data = gzip.compress(plain)
    assert len(list(W.iter_warc_records(data, on_error="raise"))) == 5


def test_truncated_archive_yields_sentinel_not_raise():
    data = W.write_warc_file(_fixture_records(), gzip_members=False)
    cut = data[: len(data) - 40]
    recs = list(W.iter_warc_records(cut))
    assert recs[-1][3] is True  # truncated sentinel
    assert len([r for r in recs if not r[3]]) < 5
    with pytest.raises(W.WarcFormatError):
        list(W.iter_warc_records(cut, on_error="raise"))


def test_bad_magic():
    with pytest.raises(W.WarcFormatError):
        list(W.iter_warc_stream(b"NOTWARC/1.0\r\n\r\n"))


def test_header_obs_fold_and_case():
    raw = b"WARC-Type: response\r\nX-Long: a\r\n  b\r\n"
    h = W._parse_header_block(raw)
    assert h["warc-type"] == "response"
    assert h["x-long"] == "a b"


# ------------------------------------------------------------ http framing

def test_http_split_basic():
    status, headers, body = W.split_http_response(_http(HTML))
    assert status == 200
    assert headers["content-type"] == "text/html"
    assert body == HTML


def test_http_chunked():
    chunked = b"7\r\nhello w\r\n4;ext=1\r\norld\r\n0\r\n\r\n"
    block = _http(chunked, extra=b"Transfer-Encoding: chunked\r\n")
    status, _h, body = W.split_http_response(block)
    assert status == 200 and body == b"hello world"


def test_http_content_encoding_gzip():
    block = _http(gzip.compress(HTML), extra=b"Content-Encoding: gzip\r\n")
    _s, _h, body = W.split_http_response(block)
    assert body == HTML


def test_http_malformed_chunked_falls_back_raw():
    block = _http(b"ZZZ not chunks", extra=b"Transfer-Encoding: chunked\r\n")
    _s, _h, body = W.split_http_response(block)
    assert body == b"ZZZ not chunks"


def test_non_http_block_passthrough():
    status, headers, body = W.split_http_response(b"raw bytes")
    assert status is None and headers == {} and body == b"raw bytes"


# ------------------------------------------------------------ charset

def test_charset_bom_wins():
    assert W.decode_charset(b"\xef\xbb\xbfh\xc3\xa9", "text/html; charset=latin-1") == "hé"


def test_charset_header_param():
    assert W.decode_charset(b"caf\xe9", "text/html; charset=iso-8859-1") == "café"


def test_charset_meta_sniff():
    body = b'<html><meta charset="iso-8859-1"><body>caf\xe9</body>'
    assert "café" in W.decode_charset(body, "text/html")


def test_charset_utf8_default_then_latin1_fallback():
    assert W.decode_charset("héllo".encode()) == "héllo"
    assert W.decode_charset(b"\xff\x00raw", None) == "\xff\x00raw"


def test_charset_utf16_bom():
    assert W.decode_charset("hi".encode("utf-16")) == "hi"


def test_charset_unknown_label_skipped():
    assert W.decode_charset(b"ok", "text/html; charset=x-noexist") == "ok"


# ------------------------------------------------------------ spark e2e

@pytest.fixture(scope="module")
def warc_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("warc")
    (d / "a.warc.gz").write_bytes(
        W.write_warc_file(_fixture_records(), gzip_members=True))
    latin = _rec(
        "response", "http://b.example/l",
        _http(b"jalape\xf1o page", ctype="text/html; charset=iso-8859-1"),
        rid="<urn:uuid:latin>")
    chunked = _rec(
        "response", "http://b.example/c",
        _http(b"3\r\nabc\r\n0\r\n\r\n",
              extra=b"Transfer-Encoding: chunked\r\n"),
        rid="<urn:uuid:chunk>")
    (d / "b.warc").write_bytes(
        W.write_warc_file([latin, chunked], gzip_members=False))
    return str(d)


def test_read_warc_records(spark, warc_dir):
    df = W.read_warc(spark, warc_dir + "/*")
    rows = {(r.source_file.rsplit("/", 1)[-1], r.record_id): r
            for r in df.collect()}
    assert len(rows) == 7
    r1 = rows[("a.warc.gz", "<urn:uuid:r1>")]
    assert r1.warc_type == "response" and r1.http_status == 200
    assert r1.http_content_type == "text/html"
    assert bytes(r1.payload) == HTML
    assert r1.target_uri == "http://a.example/x"
    assert not r1.truncated
    r404 = rows[("a.warc.gz", "<urn:uuid:r404>")]
    assert r404.http_status == 404
    chunk = rows[("b.warc", "<urn:uuid:chunk>")]
    assert bytes(chunk.payload) == b"abc"


def test_read_warc_max_payload(spark, warc_dir):
    df = W.read_warc(spark, warc_dir + "/a.warc.gz", max_payload=4)
    r = [x for x in df.collect() if x.record_id == "<urn:uuid:r1>"][0]
    assert bytes(r.payload) == HTML[:4] and r.payload_length == 4


def test_warc_to_documents(spark, warc_dir):
    docs = W.warc_to_documents(spark, warc_dir + "/*")
    got = {r.url: r for r in docs.collect()}
    # 404 and request/warcinfo records are filtered out; the response,
    # conversion, latin-1 and chunked docs remain
    assert set(got) == {"http://a.example/x", "http://b.example/l",
                        "http://b.example/c"} or len(got) == 4
    by_url = docs.groupBy("url").count().collect()
    assert all(c["count"] >= 1 for c in by_url)
    rows = docs.collect()
    texts = {r.url: r.text for r in rows}
    # html response: tags stripped
    assert texts["http://a.example/x"].startswith("T hello world") or \
        "hello world" in texts["http://a.example/x"]
    assert "<p>" not in texts["http://a.example/x"]
    # latin-1 charset honoured
    assert "jalapeño" in texts["http://b.example/l"]
    # chunked body de-chunked
    assert texts["http://b.example/c"] == "abc"
    for r in rows:
        assert r.source == "warc" and r.n_chars == len(r.text)
        assert r.doc_id is not None


def test_warc_to_documents_includes_wet_conversion(spark, warc_dir):
    docs = W.warc_to_documents(spark, warc_dir + "/a.warc.gz").collect()
    wet = [r for r in docs if r.text == "hello world wet"]
    assert len(wet) == 1


def test_truncated_file_surfaces_row(spark, tmp_path):
    data = W.write_warc_file(_fixture_records(), gzip_members=False)
    (tmp_path / "cut.warc").write_bytes(data[:-40])
    df = W.read_warc(spark, str(tmp_path / "cut.warc"))
    rows = df.collect()
    assert any(r.truncated for r in rows)
    assert any(not r.truncated for r in rows)  # prefix still parsed


def test_corrupt_gzip_member_surfaces_truncated(spark, tmp_path):
    good = W.write_warc_file(_fixture_records()[:2], gzip_members=True)
    (tmp_path / "corrupt.warc.gz").write_bytes(good + b"\x1f\x8bgarbage")
    rows = W.read_warc(spark, str(tmp_path / "corrupt.warc.gz")).collect()
    assert sum(1 for r in rows if not r.truncated) == 2
    assert sum(1 for r in rows if r.truncated) == 1


# ------------------------------------------------------------ properties

from hypothesis import given, settings, strategies as st


_rec_strategy = st.lists(
    st.tuples(
        st.sampled_from(["response", "request", "metadata", "conversion"]),
        st.binary(min_size=0, max_size=200),
    ),
    min_size=1, max_size=8,
)


@settings(max_examples=50, deadline=None)
@given(recs=_rec_strategy, gz=st.booleans())
def test_warc_write_parse_roundtrip_property(recs, gz):
    """Any record list survives write→parse byte-exactly, gzipped or
    plain — blocks with CRLFs, WARC-like magic, or gzip magic inside
    must not confuse the splitter (Content-Length framing)."""
    records = [
        {"headers": {"WARC-Type": t, "WARC-Record-ID": f"<urn:r{i}>",
                     "Content-Type": "application/octet-stream"},
         "block": b}
        for i, (t, b) in enumerate(recs)
    ]
    data = W.write_warc_file(records, gzip_members=gz)
    out = list(W.iter_warc_records(data, on_error="raise"))
    assert len(out) == len(records)
    for (_, headers, block, trunc), rec in zip(out, records):
        assert not trunc
        assert block == rec["block"]
        assert headers["warc-record-id"] == rec["headers"]["WARC-Record-ID"]


@settings(max_examples=50, deadline=None)
@given(body=st.binary(max_size=300))
def test_charset_never_raises_property(body):
    for ct in (None, "text/html", "text/html; charset=utf-8",
               "text/html; charset=nonsense"):
        assert isinstance(W.decode_charset(body, ct), str)


@settings(max_examples=20, deadline=None)
@given(seed=st.integers(0, 2**31 - 1))
def test_warc_parser_terminates_on_mutations(seed):
    """Truncations and bit flips either parse (possibly with a
    truncated sentinel) or raise WarcFormatError under 'raise' — and
    NEVER raise under the default keep policy."""
    import numpy as np
    rng = np.random.RandomState(seed)
    data = W.write_warc_file(_fixture_records(), gzip_members=bool(seed % 2))
    i = int(rng.randint(0, len(data)))
    mutated = bytearray(data)
    mutated[i] ^= 1 << int(rng.randint(0, 8))
    for payload in (bytes(mutated), data[: int(rng.randint(0, len(data)))]):
        out = list(W.iter_warc_records(payload))  # must not raise
        assert all(isinstance(r, tuple) and len(r) == 4 for r in out)


def test_bz2_and_xz_whole_stream_archives():
    """(r10) .warc.bz2 / .warc.xz (older Internet Archive crawls):
    whole-stream compression auto-detected by magic; records equal the
    plain-stream parse of the same bytes; a truncated bz2 stream
    yields the damage sentinel instead of raising."""
    import bz2
    import lzma

    from hbase_snapshot_spark.sources import warc as W

    recs = _fixture_records()
    plain = W.write_warc_file(recs, gzip_members=False)
    want = list(W.iter_warc_records(plain))
    for comp in (bz2.compress, lzma.compress):
        got = list(W.iter_warc_records(comp(plain)))
        assert got == want, comp
    # damage policy parity with gzip: sentinel, not an exception —
    # for BOTH codecs (lzma.LZMAError subclasses Exception directly,
    # not OSError, so the xz leg guards its own except slot)
    import pytest

    for damaged in (bz2.compress(plain)[:-10], lzma.compress(plain)[:-8]):
        out = list(W.iter_warc_records(damaged))
        assert out and out[-1][3] is True      # truncated sentinel
        # partial salvage: the decoded prefix's complete records are
        # yielded BEFORE the sentinel (one damaged archive loses its
        # tail, not every record) — same contract as a bad gzip member
        assert [r for r in out[:-1] if not r[3]] == want[: len(out) - 1]
        assert len(out) > 1
        with pytest.raises(W.WarcFormatError):
            list(W.iter_warc_records(damaged, on_error="raise"))
    # stdlib decompress() parity: non-stream trailing bytes after a
    # complete stream are IGNORED (pbzip2 trailers, stray padding) —
    # all records parse, no sentinel, in BOTH modes
    for comp in (bz2.compress, lzma.compress):
        noisy = comp(plain) + b"\x00\x00GARBAGE-TRAILER"
        assert list(W.iter_warc_records(noisy)) == want
        assert list(W.iter_warc_records(noisy, on_error="raise")) == want


def test_many_stream_archives_walk_linearly():
    """pbzip2 / parallel-xz archives carry one stream per block —
    hundreds per file.  The offset-based walk (unused_data is a suffix
    of the fed bytes, so stream end is a POS REWIND, not a tail copy)
    must parse them identically to a single-stream archive; the old
    per-stream ``unused_data + buf[pos:]`` concat was O(streams²) in
    memcpy."""
    import bz2
    import lzma

    from hbase_snapshot_spark.sources import warc as W

    recs = _fixture_records()
    plain = W.write_warc_file(recs, gzip_members=False)
    want = list(W.iter_warc_records(plain))
    for comp in (bz2.compress, lzma.compress):
        many = b"".join(comp(plain) for _ in range(64))
        got = list(W.iter_warc_records(many))
        assert len(got) == 64 * len(want)
        for i in range(64):
            assert got[i * len(want)][1:] == want[0][1:]
        # a mid-archive cut still salvages every stream before it
        cut = b"".join(comp(plain) for _ in range(8)) + comp(plain)[:-9]
        out = list(W.iter_warc_records(cut))
        assert out[-1][3] is True
        assert len([r for r in out if not r[3]]) >= 8 * len(want)


def test_whole_stream_decompression_bomb_cap():
    """A bz2/xz archive whose decompressed size exceeds the cap yields
    the truncated sentinel (keep) / WarcFormatError (raise) instead of
    materializing the full output — executor-memory safety for the
    whole-stream path (bounded incremental decompressors)."""
    import bz2
    import lzma

    import pytest

    from hbase_snapshot_spark.sources import warc as W

    # 16 MiB of zeros compresses tiny but inflates far past a 1 MiB cap
    bomb_plain = b"\x00" * (16 << 20)
    for comp in (bz2.compress, lzma.compress):
        bomb = comp(bomb_plain)
        assert len(bomb) < 64 << 10            # it IS a bomb
        out = list(W.iter_warc_records(bomb, max_decompressed=1 << 20))
        assert out and out[-1][3] is True      # sentinel, no OOM
        with pytest.raises(W.WarcFormatError, match="decompression-bomb"):
            list(W.iter_warc_records(
                bomb, on_error="raise", max_decompressed=1 << 20))
    # concatenated streams (both formats allow them) still parse whole
    recs = _fixture_records()
    plain = W.write_warc_file(recs, gzip_members=False)
    for comp in (bz2.compress, lzma.compress):
        cat = comp(plain) + comp(plain)
        got = list(W.iter_warc_records(cat))
        want = list(W.iter_warc_records(plain))
        assert len(got) == 2 * len(want)
        assert got[: len(want)] == want
