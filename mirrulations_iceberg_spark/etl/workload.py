"""The reference's 8-query analytics workload over the flattened
comments table (``demo_optimized_data.py:92-119``) — the
switch-and-keep-your-queries surface: a user of the reference runs
these same shapes, Spark-side, on the pipeline's output.

Each function takes the flattened ``comments`` DataFrame (any source —
the batch pipeline's parquet, a streaming sink, a temp view). All are
single-pass DataFrame plans; WORKLOAD_SQL carries the reference's
original SQL (adapted only for deterministic top-5 tie-breaks) so the
pair is differential-testable on any engine that reads the same
parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def q1_count_total(comments: DataFrame) -> DataFrame:
    return comments.agg(F.count(F.lit(1)).alias("n"))


def q2_count_by_agency(comments: DataFrame) -> DataFrame:
    return comments.groupBy("agencyId").agg(F.count(F.lit(1)).alias("cnt"))


def q3_with_attachments(comments: DataFrame) -> DataFrame:
    return comments.filter(F.col("has_attachments")).agg(
        F.count(F.lit(1)).alias("n")
    )


def q4_avg_comment_length(comments: DataFrame) -> DataFrame:
    return comments.agg(
        F.round(F.avg(F.length("comment")), 4).alias("avg_len")
    )


def q5_top_commenters(comments: DataFrame) -> DataFrame:
    return (
        comments.filter(F.col("firstName").isNotNull())
        .groupBy("firstName", "lastName")
        .agg(F.count(F.lit(1)).alias("comment_count"))
        .orderBy(F.desc("comment_count"), "firstName", "lastName")
        .limit(5)
    )


def q6_comments_by_date(comments: DataFrame) -> DataFrame:
    return (
        comments.groupBy(F.to_date("postedDate").alias("date"))
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.desc("count"), "date")
        .limit(5)
    )


def q7_text_search(comments: DataFrame) -> DataFrame:
    return comments.filter(F.col("comment").like("%health%")).agg(
        F.count(F.lit(1)).alias("n")
    )


def q8_complex_filter(comments: DataFrame) -> DataFrame:
    return comments.filter(
        F.col("has_attachments")
        & ~F.col("withdrawn")
        & (F.length("comment") > 100)
    ).agg(F.count(F.lit(1)).alias("n"))


def q9_comments_per_document(comments: DataFrame, documents: DataFrame) -> DataFrame:
    """comments ⋈ documents star join (commentOn → documents.id):
    comment volume per document type. The documents side broadcasts."""
    return (
        comments.join(
            F.broadcast(
                documents.select(
                    F.col("id").alias("doc_id"), F.col("documentType").alias("doc_type")
                )
            ),
            comments.commentOn == F.col("doc_id"),
        )
        .groupBy("doc_type")
        .agg(F.count(F.lit(1)).alias("n_comments"))
    )


def q10_docket_rollup(comments: DataFrame, dockets: DataFrame) -> DataFrame:
    """comments ⋈ docket_info: per-docket counts against the docket's
    declared relationship count — the integrity check a reference user
    runs after conversion."""
    per_docket = comments.groupBy("docketId").agg(
        F.count(F.lit(1)).alias("n_comments")
    )
    return (
        dockets.select(
            F.col("id").alias("docketId"),
            F.col("comments_count").alias("declared"),
        )
        .join(per_docket, "docketId", "left")
        .select(
            "docketId",
            "declared",
            F.coalesce("n_comments", F.lit(0)).alias("actual"),
            (F.coalesce("n_comments", F.lit(0)) == F.col("declared")).alias("consistent"),
        )
    )


WORKLOAD = {
    "q1_count_total": q1_count_total,
    "q2_count_by_agency": q2_count_by_agency,
    "q3_with_attachments": q3_with_attachments,
    "q4_avg_comment_length": q4_avg_comment_length,
    "q5_top_commenters": q5_top_commenters,
    "q6_comments_by_date": q6_comments_by_date,
    "q7_text_search": q7_text_search,
    "q8_complex_filter": q8_complex_filter,
}

#: The reference's SQL, adapted: aliases match the DataFrame columns,
#: top-5 LIMITs get deterministic tie-breaks, and q8's length cutoff
#: fits the synthetic fixture (the reference used 1000 on real data).
WORKLOAD_SQL = {
    "q1_count_total": "SELECT COUNT(*) AS n FROM comments",
    "q2_count_by_agency": (
        "SELECT agencyId, COUNT(*) AS cnt FROM comments GROUP BY agencyId"
    ),
    "q3_with_attachments": (
        "SELECT COUNT(*) AS n FROM comments WHERE has_attachments = true"
    ),
    "q4_avg_comment_length": (
        "SELECT ROUND(AVG(LENGTH(comment)), 4) AS avg_len FROM comments"
    ),
    "q5_top_commenters": """
        SELECT firstName, lastName, COUNT(*) AS comment_count
        FROM comments
        WHERE firstName IS NOT NULL
        GROUP BY firstName, lastName
        ORDER BY comment_count DESC, firstName, lastName
        LIMIT 5
    """,
    "q6_comments_by_date": """
        SELECT CAST(postedDate AS DATE) AS date, COUNT(*) AS count
        FROM comments
        GROUP BY CAST(postedDate AS DATE)
        ORDER BY count DESC, date
        LIMIT 5
    """,
    "q7_text_search": (
        "SELECT COUNT(*) AS n FROM comments WHERE comment LIKE '%health%'"
    ),
    "q8_complex_filter": """
        SELECT COUNT(*) AS n FROM comments
        WHERE has_attachments = true
          AND withdrawn = false
          AND LENGTH(comment) > 100
    """,
}
