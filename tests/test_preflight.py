"""FS pre-flight (M7's credential/permission half): Hadoop-FileSystem
probes for input-exists / input-listable / output-writable, mirroring
convert_to_iceberg.py:1197-1242 — plus its wiring into the convert
CLI's early-termination path."""

from __future__ import annotations

import os

from mirrulations_iceberg_spark.etl.preflight import fs_preflight, preflight_df


def _by_name(checks):
    return {c.name: c for c in checks}


def test_all_green_on_readable_tree(spark, tmp_path):
    data = tmp_path / "in"
    data.mkdir()
    (data / "x.json").write_text("{}")
    out = tmp_path / "out"
    out.mkdir()
    checks = _by_name(fs_preflight(spark, str(data), str(out)))
    assert checks["input_exists"].ok
    assert checks["input_listable"].ok
    assert "1 entries" in checks["input_listable"].detail
    assert checks["output_writable"].ok
    # local scheme → no committer check
    assert "object_store_committer" not in checks


def test_missing_input_fails_and_skips_listing(spark, tmp_path):
    checks = _by_name(
        fs_preflight(spark, str(tmp_path / "nope"), str(tmp_path))
    )
    assert not checks["input_exists"].ok
    assert not checks["input_listable"].ok
    assert "skipped" in checks["input_listable"].detail


def test_unwritable_output_fails(spark, tmp_path):
    # a regular FILE as the output path's parent defeats even root:
    # creating out/<probe> under a file fails on every filesystem
    blocker = tmp_path / "blocker"
    blocker.write_text("i am a file")
    data = tmp_path / "in"
    data.mkdir()
    checks = _by_name(
        fs_preflight(spark, str(data), str(blocker / "out"))
    )
    assert not checks["output_writable"].ok


def test_probe_file_is_cleaned_up(spark, tmp_path):
    out = tmp_path / "out"
    out.mkdir()
    fs_preflight(spark, str(out), str(out))
    assert os.listdir(out) == []


def test_preflight_df_shape(spark, tmp_path):
    df = preflight_df(spark, str(tmp_path), str(tmp_path))
    assert df.columns == ["check", "ok", "detail", "advisory"]
    assert df.count() >= 3


def test_cli_terminates_early_on_bad_input(tmp_path, capsys):
    from mirrulations_iceberg_spark.__main__ import main

    out = str(tmp_path / "out")
    rc = main(["convert", "/definitely/not/a/tree", "--output-path", out])
    assert rc == 1
    err = capsys.readouterr().err
    assert "Pre-flight check failed: input_exists" in err
    assert "read access" in err


def test_unresolvable_scheme_reports_not_raises(spark, tmp_path):
    """An unsupported scheme (no connector jar) must become a failed
    check, not a raw Py4J traceback — that misconfiguration is exactly
    what preflight exists to report cleanly (ADVICE r8)."""
    checks = _by_name(
        fs_preflight(spark, "nosuchscheme://bucket/key", str(tmp_path))
    )
    assert not checks["input_fs_resolvable"].ok
    assert not checks["input_exists"].ok
    assert "skipped" in checks["input_exists"].detail
    # output side still probed and green
    assert checks["output_writable"].ok

    out_checks = _by_name(
        fs_preflight(spark, str(tmp_path), "nosuchscheme://bucket/out")
    )
    assert out_checks["input_exists"].ok
    assert not out_checks["output_fs_resolvable"].ok
    assert not out_checks["output_writable"].ok
