"""The reference's 8-query workload over the pipeline's comments
output, differential-checked against DuckDB on the same parquet —
end-to-end proof that a reference user can switch engines and keep
their queries."""

from __future__ import annotations

import os

import duckdb
import pytest

from mirrulations_iceberg_spark.etl.fixtures import write_docket_tree
from mirrulations_iceberg_spark.etl.pipeline import run_pipeline
from mirrulations_iceberg_spark.etl.workload import WORKLOAD, WORKLOAD_SQL
from mirrulations_iceberg_spark.testing import compare


@pytest.fixture(scope="module")
def comments_env(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("tree"))
    out = str(tmp_path_factory.mktemp("out"))
    write_docket_tree(root)
    res = run_pipeline(spark, root, out)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW comments AS SELECT * FROM read_parquet("
        f"'{os.path.join(out, 'comments')}/*/*.parquet', hive_partitioning=true)"
    )
    return res.tables["comments"], con


@pytest.mark.parametrize("name", sorted(WORKLOAD))
def test_reference_workload(name, comments_env):
    comments, con = comments_env
    sdf = WORKLOAD[name](comments)
    srows = [tuple(r) for r in sdf.collect()]
    res = con.execute(WORKLOAD_SQL[name])
    ocols = [d[0] for d in res.description]
    assert compare(sdf.columns, srows, ocols, res.fetchall()) is None


@pytest.mark.parametrize("name", sorted(WORKLOAD))
def test_workload_sql_runs_on_spark(name, comments_env, spark):
    """The same SQL strings the reference ran on DuckDB run UNCHANGED
    through spark.sql over a registered view and agree with the
    DataFrame formulation — the switch-and-keep-your-SQL surface."""
    comments, _ = comments_env
    comments.createOrReplaceTempView("comments")
    via_sql = {tuple(r) for r in spark.sql(WORKLOAD_SQL[name]).collect()}
    via_df = {tuple(r) for r in WORKLOAD[name](comments).collect()}
    assert via_sql == via_df


@pytest.fixture(scope="module")
def all_tables_env(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("tree2"))
    out = str(tmp_path_factory.mktemp("out2"))
    write_docket_tree(root)
    res = run_pipeline(spark, root, out)
    con = duckdb.connect()
    for t in ("comments", "documents", "docket_info"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet("
            f"'{os.path.join(out, t)}/*/*.parquet', hive_partitioning=true)"
        )
    return res.tables, con


def test_comments_per_document_join(all_tables_env):
    from mirrulations_iceberg_spark.etl.workload import q9_comments_per_document

    tables, con = all_tables_env
    sdf = q9_comments_per_document(tables["comments"], tables["documents"])
    srows = [tuple(r) for r in sdf.collect()]
    res = con.execute(
        """
        SELECT d.documentType AS doc_type, COUNT(*) AS n_comments
        FROM comments c JOIN documents d ON c.commentOn = d.id
        GROUP BY d.documentType
        """
    )
    assert compare(sdf.columns, srows, [d[0] for d in res.description], res.fetchall()) is None


def test_docket_rollup_consistency(all_tables_env):
    from mirrulations_iceberg_spark.etl.workload import q10_docket_rollup

    tables, con = all_tables_env
    sdf = q10_docket_rollup(tables["comments"], tables["docket_info"])
    rows = sdf.collect()
    assert len(rows) == 3
    # the fixture's corrupt files were quarantined, not counted — every
    # docket's landed count matches its declared relationship count
    assert all(r.consistent for r in rows)


def test_pipeline_tables_memo_single_slot(spark):
    """ADVICE r5: the memo must hold only the CURRENT session's tables
    (single slot, old sessions evicted) so long-lived processes that
    recreate sessions don't leak collected fixtures."""
    from mirrulations_iceberg_spark.etl import workload

    t1 = workload.pipeline_tables(spark)
    assert workload.pipeline_tables(spark) is t1  # memo hit
    assert len(workload._TABLES_MEMO) == 1
    # simulate a dead session's stale slot: inserting for the live
    # session must evict it rather than accumulate
    workload._TABLES_MEMO.clear()
    workload._TABLES_MEMO[-1] = (object(), {})
    t2 = workload.pipeline_tables(spark)
    assert len(workload._TABLES_MEMO) == 1
    assert -1 not in workload._TABLES_MEMO
    assert set(t2) == set(t1)
