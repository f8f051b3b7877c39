"""Regression tests for the round-12 ADVICE fixes (applied round 13).

* o11's 2^53 radicand guard now evaluates in DECIMAL(38,0): with ANSI
  off, the old BIGINT ``n_docs*syy - sy*sy`` wrapped past 2^63 and a
  wrapped (possibly negative) value sailed under the very >= 2^53
  comparison the guard exists for.
* x20's output is now driven from the filtered-truth key set: a query
  whose ROUTED candidate set holds zero same-label rows used to vanish
  from the result instead of reporting recall_pre = 0 — the exact
  worst-case pre-filter miss the operator exists to surface.
"""

from __future__ import annotations

import math
import os

import pytest


def _ssq(spark, n_docs: int, sy: int, syy: int):
    from mirrulations_iceberg_spark.operators.relational import _o11_with_ssq

    per = spark.createDataFrame(
        [(n_docs, sy, syy)], "n_docs long, sy long, syy long"
    )
    return _o11_with_ssq(per).select("ssq").collect()[0][0]


def test_o11_guard_exact_past_bigint_wrap(spark):
    """n_docs*syy > 2^63 (BIGINT product wraps) but the true radicand
    is tiny: the DECIMAL path must return the exact difference where
    the old BIGINT arithmetic computed garbage from a wrapped
    intermediate."""
    n_docs = 3_000_000_000
    syy = 3_100_000_000
    product = n_docs * syy  # 9.3e18 > 2^63 ~ 9.22e18
    assert product > 2**63
    sy = math.isqrt(product - 1_000_000)
    want = product - sy * sy
    assert 0 <= want < 2**53  # happy path: guard must NOT fire
    assert _ssq(spark, n_docs, sy, syy) == want


def test_o11_guard_fires_despite_bigint_wrap(spark):
    """The silent-bypass case from ADVICE r12: radicand >= 2^53 while
    the BIGINT product wraps negative. The old comparison saw the
    wrapped value and passed; the DECIMAL guard must raise."""
    n_docs = 4_000_000_000
    syy = 4_000_000_000
    sy = 1_000_000
    assert n_docs * syy - sy * sy >= 2**53
    assert n_docs * syy > 2**63  # the wrap that defeated the old guard
    with pytest.raises(Exception, match="o11"):
        _ssq(spark, n_docs, sy, syy)


def test_o11_guard_boundary(spark):
    """2^53 - 1 passes through exactly; 2^53 itself raises."""
    assert _ssq(spark, 1, 0, 2**53 - 1) == 2**53 - 1
    with pytest.raises(Exception, match="o11"):
        _ssq(spark, 1, 0, 2**53)


def test_x20_zero_routed_candidate_query_reports_zero(spark, tmp_path):
    """Engineered worst-case pre-filter miss: query 0's only same-label
    partner (vec 50, label 7) sits at a far corner of the space whose
    cell exists (sampled seed 60 anchors a far centroid) but is never
    among query 0's IVF_NPROBE nearest probes — so the routed candidate
    set holds ZERO label-7 rows. The query must still appear, reporting
    n_candidates = 0 and recall_pre = recall_post = 0.0 against its
    nonempty filtered truth (the pre-fix code dropped the row, hiding
    exactly this failure mode). Queries 1–4 keep nonzero recalls,
    pinning that the truth-driven left joins don't zero healthy rows.
    """
    from mirrulations_iceberg_spark.operators.similarity import (
        EMB_DIM,
        N_QUERIES,
        x20_filtered_ann_topk,
    )

    n = 64
    rows = []
    for i in range(n):
        if i == 0:
            vec, label = [0.0] * EMB_DIM, 7
        elif i == 50:
            vec, label = [100.0] * EMB_DIM, 7
        elif i == 60:  # sampled (60 % 4 == 0): anchors the far centroid
            vec = [100.0 + ((60 * 7 + j) % 5) / 10.0 for j in range(EMB_DIM)]
            label = 0
        else:
            vec = [float(((i * 7 + j * 13) % 19) / 19.0) for j in range(EMB_DIM)]
            label = i % 4
        rows.append((i, vec, label))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label long"
    )
    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf, "embeddings.parquet")
    )
    out = {r["query_id"]: r for r in x20_filtered_ann_topk(spark, sf).collect()}
    # every query has >= 1 same-label non-self vector -> full key set
    assert sorted(out) == list(range(N_QUERIES))
    miss = out[0]
    assert miss["n_candidates"] == 0
    assert miss["id_checksum"] == 0
    assert miss["n_kept_post"] == 0
    assert miss["recall_pre"] == 0.0
    assert miss["recall_post"] == 0.0
    for q in range(1, N_QUERIES):
        assert out[q]["n_candidates"] > 0
        assert out[q]["recall_pre"] > 0.0
