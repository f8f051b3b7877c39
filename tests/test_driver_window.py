"""The round driver checks only ``list(queries())[:50]`` — lock the
curated window: exactly 50 entries, every entry oracle-backed (the two
by-design rows-only maintenance reports m1/m2 sit PAST the window as of
round 6, per ADVICE r5), flagship included.

Round 7 closed the whole rotation queue: the window is the flagship e2
(banked green rows in LEDGER.md) + all 49 oracle-bearing queries that
had never earned a green driver row — the 32-entry backlog plus the 17
operators built this round. From round 8 on the queue is mechanical —
``scripts/ledger.py`` derives it from CORRECTNESS_r*.json and
``test_rotation_queue_is_window`` below fails if an oracle-bearing
never-green query is left outside the window.
"""

from __future__ import annotations

import os
import re
import sys

from mirrulations_iceberg_spark.operators import DRIVER_WINDOW, collect_queries

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"),
)


def test_window_is_first_50():
    queries, oracle = collect_queries()
    names = list(queries)
    assert len(DRIVER_WINDOW) == 50
    assert names[: len(DRIVER_WINDOW)] == list(DRIVER_WINDOW)
    # Round 6: every correctness-gate slot carries a hash-checked
    # oracle; the no-oracle size reports (r14: split out of m1/m2 as
    # m1b/m2b so the invariant halves carry real oracles) live past
    # the window.
    missing_oracle = [n for n in DRIVER_WINDOW if n not in oracle]
    assert not missing_oracle, f"window entries without oracle: {missing_oracle}"
    for name in ("m1b_codec_sizes", "m2b_column_sizes"):
        assert name in queries and name not in DRIVER_WINDOW


def test_window_spans_all_families():
    """Every operator family is either in the live window or has a
    banked driver-green row in the mechanical ledger (late round 7:
    f1/m6/s1 rotated out for d13/t13/a15 — their families' claims now
    rest on LEDGER.md rows, which is exactly what the ledger is for)."""
    import ledger

    led = ledger.build_ledger()
    green = {n for n, r in led.items() if r["green_rounds"]}
    covered = {
        re.match(r"[a-z]+|", n).group(0) for n in set(DRIVER_WINDOW) | green
    }
    expected = {"f", "a", "c", "j", "w", "t", "d", "x", "mm", "m", "s", "e", "o", "g"}
    assert expected <= covered, f"missing families: {expected - covered}"
    # The flagship rotated out in round 9 (oldest-first fill, VERDICT
    # r8 item #3): its claim rests on six banked green rows (r03–r08)
    # plus the driver's per-round entry() smoke run of the same query.
    assert (
        "e2_training_pipeline" in DRIVER_WINDOW
        or led["e2_training_pipeline"]["green_rounds"]
    )


def test_window_names_unique():
    assert len(set(DRIVER_WINDOW)) == len(DRIVER_WINDOW)


def test_rotation_queue_is_window():
    """VERDICT r6 item #3: the rotation queue must be mechanical.

    Every oracle-bearing query that has never been driver-green (per
    the parsed CORRECTNESS files) must sit inside the current window —
    no new operator can silently never get a driver row again. When a
    future round adds operators and the window is full, this test is
    the forcing function for the next rotation.
    """
    import ledger

    led = ledger.build_ledger()
    stranded = ledger.rotation_queue(led)
    assert not stranded, (
        f"oracle-bearing never-green queries outside the window: {stranded} "
        "— rotate them in (swap out entries with banked green rows in "
        "LEDGER.md)"
    )
