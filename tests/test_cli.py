"""CLI smoke: ``python -m mirrulations_iceberg_spark convert`` over the
synthetic docket tree — the reference's argparse surface
(``convert_to_iceberg.py:1294-1341``) re-expressed as a thin wrapper
around ``etl.pipeline.run_pipeline``. Invoked in-process (main()) so
the test reuses the session fixture instead of paying a second JVM."""

from __future__ import annotations

import os

import pytest

from mirrulations_iceberg_spark.__main__ import _build_parser, main
from mirrulations_iceberg_spark.etl.fixtures import AGENCIES, write_docket_tree


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cli_tree"))
    expected = write_docket_tree(root)
    return root, expected


def test_convert_full_tree(spark, tree, tmp_path_factory, capsys):
    root, expected = tree
    out = str(tmp_path_factory.mktemp("cli_out"))
    rc = main(["convert", root, "--output-path", out])
    assert rc == 0
    stdout = capsys.readouterr().out
    assert f"comments: {expected['comments']} rows" in stdout
    assert f"documents: {expected['documents']} rows" in stdout
    # the partitioned layout landed
    assert os.path.isdir(os.path.join(out, "comments", "agencyId=CMS"))


def test_convert_agency_filter(spark, tree, tmp_path_factory):
    root, _ = tree
    out = str(tmp_path_factory.mktemp("cli_out_agency"))
    rc = main(
        ["convert", root, "--output-path", out, "--agency", "DEA",
         "--compression", "snappy"]
    )
    assert rc == 0
    comments = spark.read.parquet(os.path.join(out, "comments"))
    agencies = [r[0] for r in comments.select("agencyId").distinct().collect()]
    assert agencies == ["DEA"]
    assert comments.count() > 0
    dirs = sorted(os.listdir(os.path.join(out, "comments")))
    assert [d for d in dirs if d.startswith("agencyId=")] == ["agencyId=DEA"]


def test_parser_rejects_unknown_codec():
    with pytest.raises(SystemExit):
        _build_parser().parse_args(
            ["convert", "/x", "--output-path", "/y", "--compression", "brotli"]
        )


def test_convert_missing_tree_is_an_error(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("cli_out_missing"))
    rc = main(["convert", "/nonexistent/tree", "--output-path", out])
    assert rc == 1


def test_parser_surface_matches_reference():
    """Flag-for-flag parity with convert_to_iceberg.py:1297-1308
    (data_path, --output-path, --agency, --compression) — AGENCIES
    doubles as the reference's documented example values."""
    args = _build_parser().parse_args(
        ["convert", "/data", "--output-path", "/out", "--agency", AGENCIES[0]]
    )
    assert args.data_path == "/data"
    assert args.output_path == "/out"
    assert args.agency == "CMS"
    assert args.compression == "zstd"


def test_convert_runs_as_real_subprocess(tree, tmp_path_factory):
    """The in-process tests above share the session fixture; this one
    pays for one real ``python -m`` invocation so packaging problems
    (import cycles, __main__ wiring, exit codes) can't hide."""
    import subprocess
    import sys

    root, expected = tree
    out = str(tmp_path_factory.mktemp("cli_out_subproc"))
    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "mirrulations_iceberg_spark",
            "convert",
            root,
            "--output-path",
            out,
            "--shuffle-partitions",
            "4",
        ],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert f"comments: {expected['comments']} rows" in proc.stdout
