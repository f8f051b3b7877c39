"""Conversion ETL (SURVEY Phase 2): docket-tree JSON → flattened tables.

The reference's reason to exist is ``convert_to_iceberg.py`` — walk a
mirrulations docket tree, flatten the JSON:API envelopes, write
analytics tables. Here the walk is a recursive schema'd JSON scan, the
flatten is a single projection of nested-field expressions, and the
write is a distributed partitioned parquet sink:

* :mod:`.ingest`   — tolerant scan (S1/S2/S4/S5/F7)
* :mod:`.flatten`  — JSON:API → columns (P1–P9)
* :mod:`.pipeline` — end-to-end tree → 3 tables (S8–S10 sinks)
* :mod:`.fixtures` — deterministic synthetic docket tree for tests
"""

from .flatten import flatten_comments, flatten_dockets, flatten_documents
from .ingest import ENVELOPE_SCHEMA, read_docket_json
from .pipeline import run_pipeline

__all__ = [
    "ENVELOPE_SCHEMA",
    "read_docket_json",
    "flatten_comments",
    "flatten_dockets",
    "flatten_documents",
    "run_pipeline",
]
