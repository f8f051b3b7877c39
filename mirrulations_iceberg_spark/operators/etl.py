"""Driver-surface queries for the conversion ETL (SURVEY Phase 2).

e1 runs the whole pipeline — synthesize the docket tree (seeded),
tolerant scan, flatten, partitioned write, re-read — and returns the
landed row counts. The fixture is deterministic, so the oracle is the
ground truth declared by the fixture itself; a hash match means the
scan found every file, quarantined exactly the corrupt ones, and the
flatten/write/re-read cycle lost nothing.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

from ..etl.fixtures import expected_counts, write_docket_tree
from ..etl.pipeline import run_pipeline


def e1_docket_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tree → tables → counts. ``sf_dir`` is unused (the ETL input is
    the synthesized JSON:API tree, not the relational fixtures)."""
    base = tempfile.mkdtemp(prefix="miis_etl_")
    try:
        write_docket_tree(f"{base}/tree")
        result = run_pipeline(spark, f"{base}/tree", f"{base}/out")
        rows = [(t, n) for t, n in sorted(result.counts.items())]
        rows.append(("quarantine", result.quarantined))
        return spark.createDataFrame(rows, "tbl string, n_rows long")
    finally:
        shutil.rmtree(base, ignore_errors=True)


def _oracle() -> str:
    exp = expected_counts()
    rows = [
        ("comments", exp["comments"]),
        ("docket_info", exp["dockets"]),
        ("documents", exp["documents"]),
        ("quarantine", exp["corrupt"]),
    ]
    return "\nUNION ALL\n".join(
        f"SELECT '{t}' AS tbl, {n} AS n_rows" for t, n in rows
    )


QUERIES = {"e1_docket_pipeline": e1_docket_pipeline}
ORACLE = {"e1_docket_pipeline": _oracle()}
