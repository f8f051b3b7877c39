"""Round-15 operator pins.

* The s9↔d18 LSH cap boundary turned from prose into an executable
  contract (VERDICT r14 #6 + ADVICE r14): an engineered hot bucket
  shows the exact divergence regime — the all-at-once (d18-style)
  probe drops a bucket the smaller per-batch (s9-style) probes keep —
  and that parity is restored the moment the cap stops firing.
* ``lsh_hottest_bucket`` (the quantity s9's runtime guard compares
  against the cap) is pinned on the same engineered frames.
"""

from __future__ import annotations

import pytest

from mirrulations_iceberg_spark.operators.dedup import (
    LSH_MAX_BUCKET,
    lsh_hottest_bucket,
    minhash_lsh_cross_pairs_over,
    minhash_signatures,
)

#: One text shared by every engineered doc: identical shingle sets put
#: every doc in the SAME (band, bucket) for every band — the hottest
#: bucket possible — and make every probe×base pair an exact dup
#: (Jaccard 1.0), so the verified pair set is fully determined by
#: which buckets survive the cap.
_TEXT = "alpha beta gamma delta epsilon zeta eta theta iota kappa"

_BASE_IDS = list(range(1000, 1006))  # 6 base docs
_PROBE_IDS = list(range(1, 7))  # 6 probe docs, 3 deliveries of 2
_DELIVERIES = [_PROBE_IDS[0:2], _PROBE_IDS[2:4], _PROBE_IDS[4:6]]
#: 6 probe + 6 base = 12 > CAP, but any 2-doc delivery + 6 base = 8 <= CAP.
_CAP = 9


def _docs(spark, ids):
    return spark.createDataFrame(
        [(i, _TEXT) for i in ids], "doc_id long, text string"
    )


def _pairs(df) -> list[tuple[int, int]]:
    return sorted((r["doc_a"], r["doc_b"]) for r in df.collect())


def test_s9_cap_boundary_divergence_then_parity(spark):
    base = _docs(spark, _BASE_IDS)
    all_probes = _docs(spark, _PROBE_IDS)
    full_truth = sorted(
        (p, b) for p in _PROBE_IDS for b in _BASE_IDS
    )

    # --- cap firing: the all-at-once probe sees a 12-doc bucket and
    # drops it; each per-batch probe sees an 8-doc bucket and keeps it.
    batch_all = _pairs(
        minhash_lsh_cross_pairs_over(all_probes, base=base, max_bucket_size=_CAP)
    )
    streamed = sorted(
        p
        for ids in _DELIVERIES
        for p in _pairs(
            minhash_lsh_cross_pairs_over(
                _docs(spark, ids), base=base, max_bucket_size=_CAP
            )
        )
    )
    assert batch_all == []  # d18-style: bucket capped away, zero pairs
    assert streamed == full_truth  # s9-style: every pair found
    assert batch_all != streamed  # THE divergence the docstring states

    # --- cap lifted: both probe shapes agree on the full pair set.
    batch_ok = _pairs(
        minhash_lsh_cross_pairs_over(
            all_probes, base=base, max_bucket_size=LSH_MAX_BUCKET
        )
    )
    streamed_ok = sorted(
        p
        for ids in _DELIVERIES
        for p in _pairs(
            minhash_lsh_cross_pairs_over(
                _docs(spark, ids), base=base, max_bucket_size=LSH_MAX_BUCKET
            )
        )
    )
    assert batch_ok == streamed_ok == full_truth


def test_lsh_hottest_bucket_measures_occupancy(spark):
    # 12 identical docs -> every band's bucket holds all 12.
    sigs = minhash_signatures(_docs(spark, range(2000, 2012)))
    assert lsh_hottest_bucket(sigs) == 12
    # shingle-less docs sign NULL and occupy no bucket at all
    empty = minhash_signatures(
        spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    )
    assert lsh_hottest_bucket(empty) == 0


def test_s9_guard_raises_on_cap_proximity(spark, monkeypatch):
    """Drive s9's OWN runtime guard: with the measured occupancy forced
    one past the guard line (cap // 2 + 1), the operator refuses to run
    with a diagnosis — the ADVICE r14 tripwire — instead of producing a
    silently batch-composition-dependent parity row. (Note the collapse
    makes a real trip near-impossible: identical texts reduce to ONE
    rep per side before signing, so a hot rep bucket needs >cap/2
    DISTINCT texts sharing every band hash — the guard is a tripwire
    for exactly that 'should never happen' regime.)"""
    from mirrulations_iceberg_spark.operators import dedup, streamq

    from .conftest import SF_DIR

    monkeypatch.setattr(
        dedup,
        "lsh_hottest_bucket",
        lambda sigs: LSH_MAX_BUCKET // 2 + 1,
    )
    with pytest.raises(RuntimeError, match="cap proximity"):
        streamq.s9_stream_neardup_admission(spark, SF_DIR)
