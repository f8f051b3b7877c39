"""Structural properties of the round-8 operators (d14 / w12 / x10)
beyond the oracle-parity sweep: invariants that hold by construction
and would catch a refactor that still happens to match a buggy oracle."""

from __future__ import annotations

from mirrulations_iceberg_spark.operators.dedup import (
    d14_contamination_grade,
)
from mirrulations_iceberg_spark.operators.similarity import (
    MMR_K,
    MMR_QUERY_ID,
    x10_mmr_select,
)
from mirrulations_iceberg_spark.operators.windows import (
    w12_retention_cohorts,
)

from .conftest import SF_DIR


def test_d14_grades_are_valid_basis_points(spark):
    rows = d14_contamination_grade(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r["max_doc_bp"] <= 10000
        assert r["n_flagged"] <= r["n_docs"]
        assert r["matched_grams"] <= r["total_grams"]


def test_w12_offset_zero_is_the_cohort_itself(spark):
    """Every user is active in their own cohort week, so the offset-0
    row of each cohort must count the full cohort: retention 10000 bp."""
    rows = w12_retention_cohorts(spark, SF_DIR).collect()
    zero = [r for r in rows if r["week_offset"] == 0]
    assert zero  # at least one cohort
    for r in zero:
        assert r["n_active"] == r["cohort_size"]
        assert r["retention_bp"] == 10000
    for r in rows:
        assert r["week_offset"] >= 0
        assert r["n_active"] <= r["cohort_size"]


def test_x10_greedy_invariants(spark):
    rows = x10_mmr_select(spark, SF_DIR).collect()
    assert len(rows) == MMR_K
    assert [r["step"] for r in rows] == list(range(1, MMR_K + 1))
    # step 1 is pure relevance: no penalty, and the highest rel overall
    assert rows[0]["max_sim"] == 0.0
    assert rows[0]["rel"] == max(r["rel"] for r in rows)
    # selections are distinct and never the query itself
    ids = [r["vec_id"] for r in rows]
    assert len(set(ids)) == MMR_K
    assert MMR_QUERY_ID not in ids
    # mmr is exactly rel minus the max-similarity term; note max_sim
    # may be NEGATIVE (cosine range is [-1,1]) — anti-similar
    # candidates legitimately get a diversity BOOST, not a penalty
    for r in rows:
        assert r["mmr"] == r["rel"] - r["max_sim"]
        assert -1.0 <= r["max_sim"] <= 1.0
