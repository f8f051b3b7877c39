"""Round-7 operators: text-format round trips (g2/g3), cumulative
distinct users (w9), and resize-thumbnail verification (mm5).

The driver fixture's text is clean ASCII, so the adversarial cases the
g2/g3 escaping options exist for (embedded quotes, commas, newlines,
unicode, empty strings) are exercised here on a crafted documents
table routed through the SAME write/read lambdas the named queries use.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mirrulations_iceberg_spark.operators.relational import (
    g2_csv_roundtrip,
    g3_jsonl_roundtrip,
)
from mirrulations_iceberg_spark.operators.windows import w9_users_to_date

NASTY_TEXTS = [
    'he said "quote", twice ""',
    "comma, separated, values",
    "line\nbreak\r\nand another",
    "unicode: déjà vu — naïve 日本語",
    "",
    "trailing backslash \\",
]


@pytest.fixture()
def nasty_sf_dir(spark, tmp_path):
    """A documents.parquet whose text column is CSV/JSON-hostile."""
    rows = [
        (i, t, "xx", "src%d" % (i % 5), len(t)) for i, t in enumerate(NASTY_TEXTS)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "documents.parquet")
    )
    return str(tmp_path)


def _fingerprint_direct(spark, sf_dir):
    from mirrulations_iceberg_spark.operators.relational import (
        _roundtrip_fingerprint,
    )
    from mirrulations_iceberg_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    return _roundtrip_fingerprint(
        docs.select("doc_id", "text", "lang", "n_chars")
    ).collect()[0]


def test_csv_roundtrip_survives_hostile_text(spark, nasty_sf_dir):
    """quoteAll + escape='"' + multiLine: quotes, commas, newlines and
    unicode all survive the CSV round trip byte-exactly."""
    got = g2_csv_roundtrip(spark, nasty_sf_dir).collect()[0]
    want = _fingerprint_direct(spark, nasty_sf_dir)
    assert got.asDict() == want.asDict()


def test_jsonl_roundtrip_survives_hostile_text(spark, nasty_sf_dir):
    got = g3_jsonl_roundtrip(spark, nasty_sf_dir).collect()[0]
    want = _fingerprint_direct(spark, nasty_sf_dir)
    assert got.asDict() == want.asDict()


def test_orc_roundtrip_survives_hostile_text(spark, nasty_sf_dir):
    from mirrulations_iceberg_spark.operators.relational import (
        g4_orc_roundtrip,
    )

    got = g4_orc_roundtrip(spark, nasty_sf_dir).collect()[0]
    want = _fingerprint_direct(spark, nasty_sf_dir)
    assert got.asDict() == want.asDict()


def test_users_to_date_cumulative_semantics(spark, tmp_path):
    """Hand-checkable case: users A,B on day 1; B,C on day 2; C on day 3
    → to-date 2, 3, 3. Repeat events never re-count a user."""
    rows = [
        (1, "2024-01-01 10:00:00", 10),
        (2, "2024-01-01 11:00:00", 20),
        (3, "2024-01-02 09:00:00", 20),  # B again — not new
        (4, "2024-01-02 10:00:00", 30),
        (5, "2024-01-03 08:00:00", 30),  # C again — not new
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long"
    ).select(
        "event_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "user_id",
        F.lit("t").alias("event_type"),
        F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    df.write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "events.parquet")
    )
    out = {
        str(r["day"]): (r["n_events"], r["users_active"], r["new_users"], r["users_to_date"])
        for r in w9_users_to_date(spark, str(tmp_path)).collect()
    }
    assert out == {
        "2024-01-01": (2, 2, 2, 2),
        "2024-01-02": (2, 2, 1, 3),
        "2024-01-03": (1, 1, 0, 3),
    }


def test_users_to_date_window_input_is_day_sized(spark):
    """The unpartitioned running-sum window must sit above the day-level
    aggregate, never above event rows: every Window node in the plan
    consumes an Aggregate, so its input cardinality is |distinct days|."""
    plan = w9_users_to_date(
        spark, os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")
    )._jdf.queryExecution().optimizedPlan().toString()
    window_at = plan.find("Window")
    assert window_at != -1
    # everything below the window (later in the tree string) must reach
    # an Aggregate before any relation scan
    below = plan[window_at:]
    assert below.find("Aggregate") < below.find("Relation")


def test_mm5_empty_payload_zero_checksum(spark, tmp_path):
    """An empty payload resizes to 64 zero bytes — checksum 0, size 64
    (the fixed-size contract of _strided_thumbnail)."""
    from mirrulations_iceberg_spark.operators.multimodal import (
        mm5_resize_thumbs,
    )

    rows = [
        # source 'src0' % 3 == 0 -> kind 'image'
        (1, "", "xx", "src0", 0),
        (2, "abc", "xx", "src0", 3),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "documents.parquet")
    )
    out = {r["media_id"]: r for r in mm5_resize_thumbs(spark, str(tmp_path)).collect()}
    assert out[1]["thumb_bytes"] == 64 and out[1]["thumb_checksum"] == 0
    assert out[2]["thumb_bytes"] == 64 and out[2]["thumb_checksum"] > 0
