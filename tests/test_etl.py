"""ETL round-trip: synthetic docket tree → flattened tables →
partitioned parquet, with tolerant-scan quarantine (SURVEY Phase 2)."""

from __future__ import annotations

import os

import pytest

from mirrulations_iceberg_spark.etl import (
    flatten_comments,
    read_docket_json,
    run_pipeline,
)
from mirrulations_iceberg_spark.etl.fixtures import write_docket_tree
from mirrulations_iceberg_spark.etl.ingest import split_corrupt


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("tree"))
    expected = write_docket_tree(root)
    return root, expected


@pytest.fixture(scope="module")
def result(spark, tree, tmp_path_factory):
    root, expected = tree
    out = str(tmp_path_factory.mktemp("out"))
    return run_pipeline(spark, root, out), expected, out


def test_round_trip_counts(result):
    res, expected, _ = result
    assert res.counts["comments"] == expected["comments"]
    assert res.counts["documents"] == expected["documents"]
    assert res.counts["docket_info"] == expected["dockets"]
    assert res.quarantined == expected["corrupt"]


def test_comments_schema(result):
    res, _, _ = result
    cols = dict(res.tables["comments"].dtypes)
    assert cols["postedDate"] == "timestamp"
    assert cols["withdrawn"] == "boolean"
    assert cols["attachment_count"] == "bigint"
    assert cols["has_attachments"] == "boolean"
    assert cols["comment_length"] == "int"


def test_sparse_attributes_are_null_not_missing(result):
    """Absent JSON keys must land as nulls in fixed columns
    (FIXTURES.md: 'Null attributes may be absent entirely')."""
    res, _, _ = result
    comments = res.tables["comments"]
    n = comments.count()
    n_org = comments.filter(comments.organization.isNotNull()).count()
    assert 0 < n_org < n  # sparse but present as a column


def test_agency_partitioned_layout(result):
    _, _, out = result
    parts = sorted(
        d for d in os.listdir(os.path.join(out, "comments")) if d.startswith("agencyId=")
    )
    assert parts == ["agencyId=CMS", "agencyId=DEA", "agencyId=EPA"]


def test_agency_extraction(result):
    res, _, _ = result
    rows = res.tables["comments"].select("agency", "agencyId").distinct().collect()
    assert all(r.agency == r.agencyId for r in rows)


def test_attachment_flags_consistent(result):
    res, _, _ = result
    bad = res.tables["comments"].filter(
        (res.tables["comments"].has_attachments)
        != (res.tables["comments"].attachment_count > 0)
    )
    assert bad.count() == 0


def test_partition_pruning_on_agency_filter(spark, result):
    """F5/F6: an agency filter over the partitioned comments table must
    prune at the partition level (PartitionFilters in the scan, only
    the CMS directory read) — the 100 TB reason for partitionBy."""
    _, expected, out = result
    comments = spark.read.parquet(os.path.join(out, "comments"))
    cms = comments.filter(comments.agencyId == "CMS")
    plan = cms._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(agencyId" in plan
    # CMS is the first, largest docket (COMMENT_COUNTS[0]).
    from mirrulations_iceberg_spark.etl.fixtures import COMMENT_COUNTS

    assert cms.count() == COMMENT_COUNTS[0]
    # F6 docket-pattern prune: the docketId prefix predicate pushes to
    # the scan as a data filter.
    pat = comments.filter(comments.docketId.startswith("CMS-"))
    pplan = pat._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(docketId), StringStartsWith(docketId,CMS-)" in pplan


def test_quarantine_keeps_raw_and_source(spark, tree):
    root, expected = tree
    raw = read_docket_json(spark, root, "comments")
    _clean, bad = raw, None
    clean, bad = split_corrupt(raw)
    rows = bad.collect()
    assert len(rows) == expected["corrupt"]
    assert all(r.raw.startswith('{"data"') for r in rows)
    assert all("corrupt-" in r.source_file for r in rows)


def test_kind_pruning(spark, tree):
    root, expected = tree
    docket_only = read_docket_json(spark, root, "docket")
    assert docket_only.count() == expected["dockets"]


def test_normalize_event_ts_generation_agnostic(spark, tmp_path):
    """The events fixture has flipped between TIMESTAMP(NANOS) and
    plain-micros across driver testdata regenerations (r5). Pin that
    normalize_event_ts yields the SAME TimestampType values from both
    encodings — the nanos branch must not rot while current testdata
    happens to be micros."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from mirrulations_iceberg_spark.tables import (
        ensure_events_read_conf,
        normalize_event_ts,
    )

    ts = [datetime.datetime(2025, 3, 1, 12, 0, i) for i in range(5)]
    outs = {}
    ensure_events_read_conf(spark)
    for name, unit in (("nanos", "ns"), ("micros", "us")):
        path = str(tmp_path / f"{name}.parquet")
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array(range(5), pa.int64()),
                    "ts": pa.array(ts, pa.timestamp(unit)),
                }
            ),
            path,
            version="2.6",
        )
        df = normalize_event_ts(spark.read.parquet(path))
        assert dict(df.dtypes)["ts"] == "timestamp", name
        outs[name] = [(r.event_id, r.ts) for r in df.orderBy("event_id").collect()]
    assert outs["nanos"] == outs["micros"]
    assert outs["micros"][0][1] == ts[0]
