"""Cache lifecycle: operators that persist an intermediate and return
a dimension-bounded result must release every block before returning
(operators/util.materialize_release) — a long-lived session composing
them must not accumulate orphaned executor storage. Operators whose
OUTPUT scales with the corpus (d3/x4 pair enumerations) intentionally
keep their cache attached to the returned lazy plan instead; they are
not in this sweep."""

from __future__ import annotations

import pytest

from mirrulations_iceberg_spark.operators import collect_queries

from .conftest import SF_DIR

QUERIES, _ = collect_queries()

#: Every query that cache()/persist()-es internally and returns a
#: bounded result. New cache sites must either release-and-join this
#: list or document why their cache rides the returned plan.
RELEASING = (
    "w7_ntile_deciles",
    "w11_funnel_steps",
    "e2_training_pipeline",
    "e6_budget_select",
    "x2_ann_lsh_topk",
    "x5_ann_ivf_topk",
    "x11_ivf_tuning_curve",
    "x6_embedding_dedup_apply",
    "d7_dedup_apply_lsh",
)


@pytest.mark.parametrize("name", RELEASING)
def test_bounded_result_queries_release_their_caches(spark, name):
    spark.catalog.clearCache()
    QUERIES[name](spark, SF_DIR).collect()
    persistent = spark.sparkContext._jsc.sc().getPersistentRDDs()
    assert persistent.size() == 0, f"{name} leaked {persistent.size()} cached RDD(s)"
