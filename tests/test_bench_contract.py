"""Driver-contract shape of bench.py — the driver parses ONE JSON line
from stdout; this pins the schema without paying a full sf0.1 run by
benching the sf0.001 fixtures through the real main()."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


import pytest


@pytest.mark.parametrize("shuffle_args", [(), ("--shuffle-order", "7")])
def test_bench_emits_one_wellformed_json_line(tmp_path, shuffle_args):
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = "/root/testdata/sf0.001"
    env["SPARK_GRAFT_CPUS"] = "8"
    detail_path = str(tmp_path / "detail.json")
    env["SPARK_GRAFT_DETAIL_PATH"] = detail_path
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), *shuffle_args],
        capture_output=True,
        text=True,
        timeout=900,
        cwd=REPO,
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    # progress lines precede the ONE machine-readable line; the
    # driver parses the LAST stdout line as JSON
    assert lines, "no stdout"
    d = json.loads(lines[-1])
    for ln in lines[:-1]:
        assert ln.startswith("bench."), f"unexpected stdout line: {ln!r}"
    for key in ("metric", "value", "unit", "queries", "sf"):
        assert key in d, key
    assert d["unit"] == "sec"
    assert isinstance(d["value"], (int, float)) and d["value"] > 0
    assert isinstance(d["queries"], dict) and d["queries"]
    # the detail sidecar must cover every registered query (written to
    # the overridden path — the committed sf0.1 prior stays untouched)
    detail = json.load(open(detail_path))
    from mirrulations_iceberg_spark.operators import collect_queries

    q, _ = collect_queries()
    assert set(detail["queries"]) == set(q)
    assert detail["failed"] == []
    # shuffle mode (VERDICT r15 item #2): order is recorded in both
    # artifacts, the seed is deterministic, and positions cover every
    # query so position-effect regressions stay computable.
    if shuffle_args:
        assert d["order"] == "shuffled:7"
        assert detail["order"] == "shuffled:7"
        assert set(detail["positions"]) == set(q)
        assert sorted(detail["positions"].values()) == list(range(len(q)))
        # the sweep really was shuffled: ordering queries by recorded
        # position must differ from alphabetical. (JSON key order can't
        # carry this — the detail is dumped with sort_keys=True.)
        by_position = sorted(detail["positions"], key=detail["positions"].get)
        assert by_position != sorted(detail["positions"])
    else:
        assert d["order"] == "sorted"
        assert detail["order"] == "sorted"
        assert "positions" not in detail
