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


def test_e19b_calibrated_point_reproduces_e19(spark):
    """The sweep's center-of-grid point IS e19's calibrated operating
    point: n_fail / n_unique_fail at that threshold must equal e19's
    report exactly (both run the same recipe; e19b is self-contained
    per the t20 precedent, so this is the drift tripwire)."""
    from mirrulations_iceberg_spark.operators.etl import (
        E19_MAX_TOPSHARE_BP,
        E19_MIN_ALPHA_BP,
        E19_MIN_MEANLEN_DECI,
        E19_MIN_TOKENS,
        e19_filter_ablation,
        e19b_filter_threshold_sweep,
    )
    from tests.conftest import SF_DIR

    e19 = {
        r["component"]: r
        for r in e19_filter_ablation(spark, SF_DIR).collect()
    }
    sweep = {
        (r["rule"], r["threshold"]): r
        for r in e19b_filter_threshold_sweep(spark, SF_DIR).collect()
    }
    calibrated = {
        "min_tokens": E19_MIN_TOKENS,
        "alpha_ratio": E19_MIN_ALPHA_BP,
        "max_token_share": E19_MAX_TOPSHARE_BP,
        "mean_token_len": E19_MIN_MEANLEN_DECI,
    }
    for rule, theta in calibrated.items():
        s, e = sweep[(rule, theta)], e19[rule]
        assert s["n_docs"] == e["n_docs"]
        assert s["n_fail"] == e["n_fail"], rule
        assert s["n_unique_fail"] == e["n_unique_fail"], rule
        # ensemble at the calibrated point = e19's ensemble total
        assert s["n_ensemble_fail"] == e19["ensemble"]["n_fail"], rule


def test_e19b_sweep_is_monotone(spark):
    """Tightening a kill threshold can only kill more: n_fail and
    n_ensemble_fail are nondecreasing in theta for < rules,
    nonincreasing for the > rule — and unique kills never exceed
    kills, ensemble never falls below either component."""
    from mirrulations_iceberg_spark.operators.etl import (
        E19B_GRID,
        e19b_filter_threshold_sweep,
    )
    from tests.conftest import SF_DIR

    rows = {
        (r["rule"], r["threshold"]): r
        for r in e19b_filter_threshold_sweep(spark, SF_DIR).collect()
    }
    for rule, op, _stat, grid in E19B_GRID:
        seq = [rows[(rule, t)] for t in grid]
        fails = [r["n_fail"] for r in seq]
        ens = [r["n_ensemble_fail"] for r in seq]
        if op == "gt":
            fails, ens = fails[::-1], ens[::-1]
        assert fails == sorted(fails), rule
        assert ens == sorted(ens), rule
        for r in seq:
            assert 0 <= r["n_unique_fail"] <= r["n_fail"] <= r["n_ensemble_fail"]
            assert r["n_ensemble_fail"] <= r["n_docs"]


def test_t24_agreement_matches_t23_diagonal(spark):
    """t24's grand-total n_agree IS t23's confusion-matrix diagonal —
    both compose t23_pred_frame, so the two reports must tell one
    story (and every doc, including the sub-gram 'und' ones, is on
    the card exactly once)."""
    import pyarrow.parquet as pq

    from mirrulations_iceberg_spark.operators.etl import (
        t24_predlang_dataset_card,
    )
    from mirrulations_iceberg_spark.operators.text import (
        t23_char_ngram_langid,
    )
    from tests.conftest import SF_DIR

    card = t24_predlang_dataset_card(spark, SF_DIR).collect()
    conf = t23_char_ngram_langid(spark, SF_DIR).collect()
    total = [r for r in card if r["g_source"] == 1 and r["g_lang"] == 1]
    assert len(total) == 1
    diag = sum(r["n_docs"] for r in conf if r["true_lang"] == r["pred_lang"])
    assert total[0]["n_agree"] == diag
    n_all = pq.read_metadata(
        os.path.join(SF_DIR, "documents.parquet")
    ).num_rows
    assert total[0]["n_docs"] == n_all


def test_t24_card_levels_roll_up(spark):
    """Detail rows sum to their per-pred-language subtotal, subtotals
    to the grand total; 'und' rows never agree."""
    from collections import defaultdict

    from mirrulations_iceberg_spark.operators.etl import (
        t24_predlang_dataset_card,
    )
    from tests.conftest import SF_DIR

    rows = t24_predlang_dataset_card(spark, SF_DIR).collect()
    detail = [r for r in rows if r["g_source"] == 0]
    sub = {r["pred_lang"]: r for r in rows if r["g_source"] == 1 and r["g_lang"] == 0}
    total = next(r for r in rows if r["g_source"] == 1 and r["g_lang"] == 1)
    by_lang: dict[str, list[int]] = defaultdict(lambda: [0, 0, 0])
    for r in detail:
        acc = by_lang[r["pred_lang"]]
        acc[0] += r["n_docs"]
        acc[1] += r["n_tokens"]
        acc[2] += r["n_agree"]
    for lang, (nd, nt, na) in by_lang.items():
        assert sub[lang]["n_docs"] == nd, lang
        assert sub[lang]["n_tokens"] == nt, lang
        assert sub[lang]["n_agree"] == na, lang
    assert sum(r["n_docs"] for r in sub.values()) == total["n_docs"]
    assert sum(r["n_agree"] for r in sub.values()) == total["n_agree"]
    for r in rows:
        if r["pred_lang"] == "und":
            assert r["n_agree"] == 0
        assert 0 <= r["agree_bp"] <= 10000
        assert r["n_unique"] <= r["n_docs"]


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
