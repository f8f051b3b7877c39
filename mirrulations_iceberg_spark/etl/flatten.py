"""JSON:API flattening as single projections (SURVEY §2.2 P1–P9).

The reference flattens dict-by-dict in Python per record
(``convert_to_iceberg.py:319-411``); here each output table is ONE
``select`` of nested-field expressions — no shuffle, no UDF, fully
codegen'd, and Catalyst prunes unread envelope branches out of the
JSON parser itself (check ReadSchema in the scan plan).

Output schemas follow FIXTURES.md §A3: fixed columns, all non-key
fields nullable (absent JSON keys arrive as nulls from the PERMISSIVE
schema'd read).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ATTRS = "data.attributes"


def _envelope_cols() -> list:
    """P1: the shared data.id / data.type / links.self projection
    (``convert_to_iceberg.py:372-374``)."""
    return [
        F.col("data.id").alias("id"),
        F.col("data.links.self").alias("link"),
        F.col("data.type").alias("type"),
    ]


def _rel_count(rel: str):
    """P3: ``<rel>_count`` from a relationship's data array
    (``convert_to_iceberg.py:337-339``). Absent relationship → 0."""
    return F.coalesce(
        F.size(F.col(f"data.relationships.{rel}.data")), F.lit(0)
    ).alias(f"{rel}_count")


def flatten_comments(raw: DataFrame) -> DataFrame:
    """Comments table (``convert_to_iceberg.py:367-398``).

    P2 attribute splat, P4 attachment flags (``:386-387``), P5
    included-attachment flags (``:390-396``), P8 comment_length, P9
    postedDate → timestamp, P6/P7 agency extraction + docket-comment
    concat id as derived columns.
    """
    att = F.col("data.relationships.attachments.data")
    inc_att = F.filter(F.col("included"), lambda x: x["type"] == "attachments")
    return raw.select(
        *_envelope_cols(),
        F.col(f"{_ATTRS}.commentOn").alias("commentOn"),
        F.col(f"{_ATTRS}.docketId").alias("docketId"),
        F.col(f"{_ATTRS}.agencyId").alias("agencyId"),
        F.col(f"{_ATTRS}.comment").alias("comment"),
        F.col(f"{_ATTRS}.firstName").alias("firstName"),
        F.col(f"{_ATTRS}.lastName").alias("lastName"),
        F.col(f"{_ATTRS}.organization").alias("organization"),
        F.to_timestamp(F.col(f"{_ATTRS}.postedDate")).alias("postedDate"),
        F.col(f"{_ATTRS}.withdrawn").alias("withdrawn"),
        F.col(f"{_ATTRS}.reasonWithdrawn").alias("reasonWithdrawn"),
        F.col(f"{_ATTRS}.documentType").alias("documentType"),
        F.coalesce(F.size(att) > 0, F.lit(False)).alias("has_attachments"),
        F.coalesce(F.size(att), F.lit(0)).cast("long").alias("attachment_count"),
        F.coalesce(F.size(inc_att) > 0, F.lit(False)).alias(
            "has_included_attachments"
        ),
        F.coalesce(F.size(inc_att), F.lit(0))
        .cast("long")
        .alias("included_attachment_count"),
        F.length(F.col(f"{_ATTRS}.comment")).alias("comment_length"),
        # P6 (convert_to_iceberg.py:400-411): agency is the docket id's
        # first dash-field; P7: a docket-scoped comment key.
        F.split(F.col(f"{_ATTRS}.docketId"), "-").getItem(0).alias("agency"),
        F.concat_ws("/", F.col(f"{_ATTRS}.docketId"), F.col("data.id")).alias(
            "docket_comment_id"
        ),
    )


def flatten_dockets(raw: DataFrame) -> DataFrame:
    """docket_info table (``convert_to_iceberg.py:319-341``): envelope +
    title/agency + ``<rel>_count`` per declared relationship."""
    return raw.select(
        *_envelope_cols(),
        F.col(f"{_ATTRS}.title").alias("title"),
        F.col(f"{_ATTRS}.agencyId").alias("agencyId"),
        _rel_count("comments"),
        _rel_count("documents"),
    )


def flatten_documents(raw: DataFrame) -> DataFrame:
    """documents table (``convert_to_iceberg.py:343-365``): envelope +
    attribute splat + relationship counts."""
    return raw.select(
        *_envelope_cols(),
        F.col(f"{_ATTRS}.docketId").alias("docketId"),
        F.col(f"{_ATTRS}.agencyId").alias("agencyId"),
        F.col(f"{_ATTRS}.title").alias("title"),
        F.col(f"{_ATTRS}.documentType").alias("documentType"),
        F.to_timestamp(F.col(f"{_ATTRS}.postedDate")).alias("postedDate"),
        _rel_count("attachments"),
        _rel_count("comments"),
    )
