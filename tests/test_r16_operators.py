"""Round-16 operator tests.

The float-log2 boundary sweep (VERDICT r15 item #4 / ADVICE r15): e18
and t23 fit integer weights as ``floor((log2(A) - log2(B)) * 1e4)``
over exact-integer A, B and assume Python's ``math.log2`` and DuckDB's
``log2`` agree bit-for-bit.  That holds on this host only because both
bind the same platform libm (log2 is NOT correctly rounded by
IEEE-754).  These tests replicate both train passes in pure Python on
the actual fixtures and prove NO fit input lands within 1e-9 of a
floor boundary — ~4x the worst-case absolute divergence two
conforming libms can show on these magnitudes (2 ulp relative on
log2 <= 53 -> ~2.4e-14 absolute, x1e4 scale -> ~2.4e-10) — so no
sub-ulp libm difference can flip any fixture weight by 1 unit.
"""

from __future__ import annotations

import hashlib
import math
import os
import re
from collections import Counter

import pytest

SF_DIRS = [
    d
    for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01")
    if os.path.isdir(d)
]

#: Generous vs the ~2.4e-10 worst-case cross-libm divergence (see
#: module docstring) yet far below any plausible fixture coincidence.
BOUNDARY_EPS = 1e-9


def _docs(sf_dir):
    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "source", "lang", "text"],
    )
    return t.to_pylist()


def _frac_dist(x: float) -> float:
    """Distance from x to the nearest integer (floor flips when the
    true value crosses an integer in either direction)."""
    return abs(x - round(x))


def _assert_clear(values, label):
    worst = min(values, key=_frac_dist)
    assert _frac_dist(worst) > BOUNDARY_EPS, (
        f"{label}: fit input {worst!r} sits {_frac_dist(worst):.3e} "
        f"from a floor boundary — within the cross-libm divergence "
        f"band; the same-libm assumption is load-bearing here"
    )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_t23_fit_inputs_clear_floor_boundaries(sf_dir):
    """Replays t23's train pass (lowercase char trigrams, top-200 per
    lang by count desc / gram asc) in pure Python and sweeps every
    (c, tot) the fit quantizes — including the c=0 OOV floor row per
    language (text.py t23_char_ngram_langid)."""
    from mirrulations_iceberg_spark.operators.text import (
        T23_GRAM,
        T23_TOP_GRAMS,
        T23_UNIT,
    )

    counts: dict[str, Counter] = {}
    for row in _docs(sf_dir):
        txt = (row["text"] or "").lower()
        if len(txt) < T23_GRAM:
            continue
        c = counts.setdefault(row["lang"], Counter())
        for i in range(len(txt) - T23_GRAM + 1):
            c[txt[i : i + T23_GRAM]] += 1

    inputs = []
    for lang, ctr in counts.items():
        top = sorted(ctr.items(), key=lambda kv: (-kv[1], kv[0]))[
            :T23_TOP_GRAMS
        ]
        tot = sum(c for _, c in top)
        for c in {c for _, c in top} | {0}:  # 0 = the OOV floor weight
            inputs.append(
                (math.log2(c + 1) - math.log2(tot + T23_TOP_GRAMS))
                * float(T23_UNIT)
            )
    assert inputs
    _assert_clear(inputs, f"t23 @ {sf_dir}")


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_e18_fit_inputs_clear_floor_boundaries(sf_dir):
    """Replays e18's distribution pass (t19 feature recipe: regex
    unigrams + space-joined bigrams, md5 first-3-hex-chars mod 512
    bucketing) in pure Python and sweeps all 512 per-bucket log-ratio
    inputs (etl.py e18_dsir_resample)."""
    from mirrulations_iceberg_spark.operators.etl import (
        E18_TARGET_SOURCES,
        E18_UNIT,
    )
    from mirrulations_iceberg_spark.operators.text import (
        T19_BUCKETS,
        TOKEN_PATTERN,
    )

    pat = re.compile(TOKEN_PATTERN)

    def bucket(f: str) -> int:
        return int(hashlib.md5(f.encode()).hexdigest()[:3], 16) % T19_BUCKETS

    p: Counter = Counter()
    q: Counter = Counter()
    for row in _docs(sf_dir):
        toks = pat.findall((row["text"] or "").lower())
        feats = toks + [
            f"{toks[i]} {toks[i + 1]}" for i in range(len(toks) - 1)
        ]
        side = p if row["source"] in E18_TARGET_SOURCES else q
        for f in feats:
            side[bucket(f)] += 1

    pt, qt = sum(p.values()), sum(q.values())
    inputs = [
        (
            math.log2((p.get(b, 0) + 1) * (qt + T19_BUCKETS))
            - math.log2((q.get(b, 0) + 1) * (pt + T19_BUCKETS))
        )
        * float(E18_UNIT)
        for b in range(T19_BUCKETS)
    ]
    _assert_clear(inputs, f"e18 @ {sf_dir}")
