"""End-to-end tests for the shell/Driver CLI (cli.py) — each test drives
``main()`` exactly as ``python -m hbase_snapshot_spark.cli`` would,
asserting on printed output and exit codes.

Covers the round-3 admin commands (enable/disable/is_enabled/status —
shell enable.rb/disable.rb and 'status simple') plus a put/get/scan
round-trip through the --flag parsing, including the usage-error paths
(unknown flag, flag missing its value).
"""

import pytest

from hbase_snapshot_spark.cli import main


@pytest.fixture()
def base(tmp_path, spark):
    # main() creates its own SparkSession via getOrCreate, which reuses
    # the test session; depending on `spark` pins creation order
    return str(tmp_path / "store")


def run(capsys, *argv):
    rc = main(list(argv))
    out = capsys.readouterr()
    return rc, out.out, out.err


def test_create_put_get_scan_roundtrip(base, capsys):
    rc, out, _ = run(capsys, "create", base, "t1", "f:3")
    assert rc == 0 and "created t1" in out

    for ts, val in ((100, "v1"), (200, "v2")):
        rc, out, _ = run(capsys, "put", base, "t1", "row1", "f:q", val, str(ts))
        assert rc == 0 and "ok" in out
    rc, out, _ = run(capsys, "put", base, "t1", "row2", "f:q", "w1", "150")
    assert rc == 0

    # default get = 1 version (get.rb VERSIONS => 1), newest first
    rc, out, _ = run(capsys, "get", base, "t1", "row1", "f:q")
    assert rc == 0 and "1 cell(s)" in out and "v2" in out and "v1" not in out

    rc, out, _ = run(capsys, "get", base, "t1", "row1", "f:q", "--versions", "2")
    assert rc == 0 and "2 cell(s)" in out
    # newest-version-first within the column
    assert out.index("v2") < out.index("v1")

    rc, out, _ = run(capsys, "scan", base, "t1")
    assert rc == 0 and "2 cell(s)" in out  # 1 version per column by default

    rc, out, _ = run(capsys, "scan", base, "t1", "--start", "row2")
    assert rc == 0 and "row2" in out and "row1" not in out

    rc, out, _ = run(capsys, "scan", base, "t1", "--limit", "1")
    assert rc == 0 and "1 cell(s)" in out


def test_flag_usage_errors(base, capsys):
    run(capsys, "create", base, "t2", "f")
    run(capsys, "put", base, "t2", "r", "f:q", "v", "100")

    # typo'd flag must error, not silently fall back to 1 version
    rc, _, err = run(capsys, "get", base, "t2", "r", "f:q", "--version", "3")
    assert rc == 2 and "usage error" in err and "--version" in err

    # trailing flag with no value must error, not be dropped
    rc, _, err = run(capsys, "get", base, "t2", "r", "f:q", "--versions")
    assert rc == 2 and "missing a value" in err

    rc, _, err = run(capsys, "scan", base, "t2", "--limt", "5")
    assert rc == 2 and "usage error" in err


def test_enable_disable_is_enabled_status(base, capsys):
    run(capsys, "create", base, "t3", "f")
    run(capsys, "put", base, "t3", "r1", "f:q", "hello", "100")

    rc, out, _ = run(capsys, "is_enabled", base, "t3")
    assert rc == 0 and out.strip() == "true"

    rc, out, _ = run(capsys, "disable", base, "t3")
    assert rc == 0 and "ok" in out
    rc, out, _ = run(capsys, "is_enabled", base, "t3")
    assert rc == 0 and out.strip() == "false"

    # status reports the serving state + manifest storage metrics,
    # including the bytes path over t._segment_size
    rc, out, _ = run(capsys, "status", base)
    assert rc == 0 and "1 table(s)" in out
    line = next(ln for ln in out.splitlines() if ln.strip().startswith("t3:"))
    assert "DISABLED" in line and "segments=1" in line
    nbytes = int(line.split("bytes=")[1].split()[0])
    assert nbytes > 0

    rc, out, _ = run(capsys, "enable", base, "t3")
    assert rc == 0
    rc, out, _ = run(capsys, "status", base, "t3")
    assert rc == 0 and "ENABLED" in out


def test_unknown_command(base, capsys):
    rc, _, err = run(capsys, "frobnicate", base)
    assert rc == 2 and "unknown command" in err


def test_store_scope_snapshot_flow(base, capsys):
    """snapshot --store → drop → restore_snapshot recreates the table
    (the TestAdmin:619 flow through the shell surface)."""
    run(capsys, "create", base, "t3", "f")
    run(capsys, "put", base, "t3", "r1", "f:q", "v1", "100")

    rc, out, _ = run(capsys, "snapshot", base, "t3", "snap1", "--store")
    assert rc == 0 and "ok" in out
    rc, out, _ = run(capsys, "list_snapshots", base)
    assert rc == 0 and "snap1" in out

    rc, out, _ = run(capsys, "drop", base, "t3")
    assert rc == 0
    rc, out, _ = run(capsys, "restore_snapshot", base, "snap1")
    assert rc == 0 and "ok" in out

    rc, out, _ = run(capsys, "get", base, "t3", "r1", "f:q")
    assert rc == 0 and "v1" in out

    rc, out, _ = run(capsys, "delete_snapshot", base, "snap1")
    assert rc == 0
    rc, out, _ = run(capsys, "list_snapshots", base)
    assert "snap1" not in out
