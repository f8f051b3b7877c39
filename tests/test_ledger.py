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
    """LEDGER.md matches a regeneration over its *stamped* input set.

    The driver drops ``CORRECTNESS_r{N}.json`` at round close, *after*
    the builder's last commit — so comparing against "all files present
    right now" made every judging pass start red (VERDICT r8 item #1).
    LEDGER.md stamps the rounds it consumed; we regenerate from exactly
    that set, so newer driver drops are ignored while real drift (a
    stamped file changing, queries() changing, hand-edits) still fails.
    """
    with open(os.path.join(REPO, "LEDGER.md")) as fh:
        committed = fh.read()
    stamped = ledger.parse_inputs(committed) or None
    # Tolerance is ONLY for rounds newer than the newest stamped one
    # (the driver's round-close drop); a stamp missing an OLDER round
    # means the ledger is genuinely stale and must fail.
    if stamped:
        available = set(ledger.load_rounds())
        stale = sorted(
            r for r in available - stamped if r <= max(stamped)
        )
        assert not stale, (
            f"LEDGER.md's stamp omits non-newest rounds {stale} — "
            "regenerate with `python scripts/ledger.py --write`"
        )
    inputs = sorted(ledger.load_rounds(stamped))
    generated = ledger.render(ledger.build_ledger(stamped), inputs)
    assert committed == generated, (
        "LEDGER.md drifted from its stamped CORRECTNESS inputs — "
        "regenerate with `python scripts/ledger.py --write`"
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
