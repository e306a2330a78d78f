"""CLI dispatch tests (run.sh parity surface): dgrep and store paths
exercised end-to-end through main(); rainstorm is covered by
test_rainstorm_plans / test_streaming (it runs a streaming job)."""

from __future__ import annotations

from stream_processing_spark.cli import main


def test_dgrep_count_via_cli(spark, tmp_path, capsys):
    d = tmp_path / "logs"
    d.mkdir()
    (d / "machine.1.log").write_text("GET /a\nGET /b\nPOST /a\n")
    (d / "machine.2.log").write_text("GET /a\n")
    rc = main(["dgrep", "GET", f"{d}/*.log", "-c"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "TOTAL: 3" in out
    assert "machine.1.log: 2" in out


def test_store_lifecycle_via_cli(spark, tmp_path, capsys):
    root = str(tmp_path / "store")
    local = tmp_path / "payload.txt"
    local.write_text("alpha\nbeta\n")
    assert main(["store", "create", root, "ds1", str(local)]) == 0
    assert main(["store", "append", root, "ds1", str(local), "w1"]) == 0
    assert main(["store", "merge", root, "ds1"]) == 0
    assert main(["store", "get", root, "ds1"]) == 0
    out = capsys.readouterr().out
    assert out.count("alpha") == 1 or "alpha" in out
    assert main(["store", "list", root]) == 0
    assert "ds1" in capsys.readouterr().out


def test_multiappend_via_cli(spark, tmp_path, capsys):
    root = str(tmp_path / "store2")
    a, b = tmp_path / "a.txt", tmp_path / "b.txt"
    a.write_text("one\n")
    b.write_text("two\n")
    assert main(["store", "create", root, "ds2", str(a)]) == 0
    assert main(["store", "multiappend", root, "ds2", str(a), str(b)]) == 0
    assert main(["store", "merge", root, "ds2"]) == 0
    assert main(["store", "get", root, "ds2"]) == 0
    out = capsys.readouterr().out
    assert "one" in out and "two" in out


def test_unknown_command_prints_usage(capsys):
    assert main(["bogus"]) == 2
    assert "rainstorm" in capsys.readouterr().out
