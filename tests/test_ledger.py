"""Ledger drift guard (VERDICT r6 item #2).

Coverage claims about driver-green queries must be mechanically derived
from the ``CORRECTNESS_r*.json`` files, never hand-maintained — round 6
found three phantom claims (d4/d5/x1 "green r4" with no such rows) and
two stale ones (o7/o8 described green when their only rows were r2
hash-fails). These tests pin the generated ``LEDGER.md`` to the actual
files and keep the rotation queue mechanical (item #3).
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

import ledger  # noqa: E402


def test_ledger_md_matches_generated():
    """LEDGER.md is byte-identical to what ledger.py derives right now."""
    generated = ledger.render(ledger.build_ledger())
    with open(os.path.join(REPO, "LEDGER.md")) as fh:
        committed = fh.read()
    assert committed == generated, (
        "LEDGER.md drifted from CORRECTNESS_r*.json — regenerate with "
        "`python scripts/ledger.py --write`"
    )


def test_rows_only_by_design_have_no_oracle():
    led = ledger.build_ledger()
    for name in ledger.ROWS_ONLY_BY_DESIGN:
        assert name in led and not led[name]["oracle"]
    # and conversely: every no-oracle entry is accounted for by design
    no_oracle = {n for n, r in led.items() if not r["oracle"]}
    assert no_oracle == set(ledger.ROWS_ONLY_BY_DESIGN)


def test_cli_runs():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "ledger.py")],
        capture_output=True,
        text=True,
        check=True,
    )
    assert "Rotation queue" in out.stdout
