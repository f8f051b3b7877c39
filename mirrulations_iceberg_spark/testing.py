"""Shared differential-check helpers (used by scripts/drivercheck.py
and the pytest suite): order-insensitive value-hash comparison between
a Spark result and a DuckDB oracle result, mirroring the round
driver's CORRECTNESS gate."""

from __future__ import annotations

import hashlib


def norm_cell(v) -> str:
    if v is None:
        return "␀"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        return f"{v:.6g}"
    return str(v)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    """Hash of rows with columns sorted by name and rows sorted —
    order-insensitive on both axes."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\x1e")
    return h.hexdigest()[:16]


def compare(
    scols: list[str],
    srows: list[tuple],
    ocols: list[str],
    orows: list[tuple],
) -> str | None:
    """None if equivalent, else a human-readable mismatch reason."""
    if sorted(scols) != sorted(ocols):
        return f"columns differ: spark={sorted(scols)} oracle={sorted(ocols)}"
    if len(srows) != len(orows):
        return f"row counts differ: spark={len(srows)} oracle={len(orows)}"
    if value_hash(scols, srows) != value_hash(ocols, orows):
        return f"value hash mismatch over {len(srows)} rows"
    return None
