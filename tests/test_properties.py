"""Hypothesis property tests: Spark column expressions vs plain-Python
reference implementations on random inputs (SURVEY §5's property-based
layer). One shared Spark job per case keeps these fast."""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mirrulations_iceberg_spark.operators.dedup import SHINGLE_K, shingles_col
from mirrulations_iceberg_spark.operators.text import TOKEN_PATTERN, tokens_col

TEXTS = st.text(
    alphabet=st.characters(
        codec="ascii", categories=("Lu", "Ll", "Nd", "P", "Z")
    ),
    max_size=200,
)

_SETTINGS = settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _py_tokens(text: str) -> list[str]:
    return re.findall(TOKEN_PATTERN, text.lower())


def _py_shingles(text: str) -> list[str]:
    toks = _py_tokens(text)
    if len(toks) < SHINGLE_K:
        return []
    seen, out = set(), []
    for i in range(len(toks) - SHINGLE_K + 1):
        s = " ".join(toks[i : i + SHINGLE_K])
        if s not in seen:
            seen.add(s)
            out.append(s)
    return out


@given(st.lists(TEXTS, min_size=1, max_size=10))
@_SETTINGS
def test_tokens_match_python(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    got = [r.toks for r in df.select(tokens_col(F.col("text")).alias("toks")).collect()]
    assert got == [_py_tokens(t) for t in texts]


@given(st.lists(TEXTS, min_size=1, max_size=10))
@_SETTINGS
def test_shingles_match_python(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    got = [r.s for r in df.select(shingles_col(F.col("text")).alias("s")).collect()]
    assert got == [_py_shingles(t) for t in texts]


@given(
    st.lists(
        st.lists(st.floats(-10, 10, allow_nan=False), min_size=4, max_size=4),
        min_size=2,
        max_size=6,
    )
)
@_SETTINGS
def test_dot_product_matches_python(spark, vectors):
    from mirrulations_iceberg_spark.operators.similarity import _dot

    a, rest = vectors[0], vectors[1:]
    rows = [(v,) for v in rest]
    df = spark.createDataFrame(rows, "e array<double>")
    lit_a = F.array(*[F.lit(x) for x in a])
    got = [r.d for r in df.select(_dot(F.col("e"), lit_a).alias("d")).collect()]
    for g, v in zip(got, rest):
        expected = 0.0
        for x, y in zip(v, a):
            expected = expected + x * y  # same left-to-right fold
        assert abs(g - expected) < 1e-9


def test_winnowing_shared_run_guarantee(spark):
    """Schleimer et al.'s theorem: any two documents sharing a
    substring of at least k+w-1 characters (of the NORMALIZED text)
    share at least one winnowed fingerprint. Randomized pairs with an
    injected common run; one Spark job checks every pair."""
    import random

    from mirrulations_iceberg_spark.operators.text import (
        WINNOW_K,
        WINNOW_W,
        winnow_sets,
    )

    rng = random.Random(20260813)
    run_len = WINNOW_K + WINNOW_W - 1  # 11 chars incl. a space is fine

    def rand_norm(n):
        # already-normalized text: lowercase alnum words, single spaces
        return " ".join(
            "".join(rng.choice("abcdefghijklmnopqrstuvwxyz0123456789")
                    for _ in range(rng.randint(1, 8)))
            for _ in range(n)
        )

    rows = []
    for pair in range(30):
        shared = rand_norm(6)
        assert len(shared) >= run_len
        a = f"{rand_norm(rng.randint(0, 10))} {shared} {rand_norm(rng.randint(0, 10))}".strip()
        b = f"{rand_norm(rng.randint(0, 10))} {shared} {rand_norm(rng.randint(0, 10))}".strip()
        rows.append((2 * pair, a))
        rows.append((2 * pair + 1, b))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sets = {r.doc_id: set(r.fingerprints) for r in winnow_sets(df).collect()}
    for pair in range(30):
        assert sets[2 * pair] & sets[2 * pair + 1], f"pair {pair} shares no fingerprint"


ROUNDTRIP_TEXTS = st.text(
    # hostile-for-text-formats alphabet: quotes, commas, newlines,
    # backslash, unicode — but no uppercase N, so the g2 CSV null
    # sentinel "\N" (a documented, inherent CSV collision) can't be
    # generated as literal text
    alphabet=st.sampled_from(list("ab c\"',\n\\é—日0")),
    max_size=60,
)


@given(st.lists(ROUNDTRIP_TEXTS, min_size=1, max_size=6))
@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_roundtrip_fingerprint_lossless_all_formats(spark, texts):
    """g2/g3/g4 property: for ANY document set over a hostile alphabet,
    the sink→source fingerprint equals the direct fingerprint — i.e.
    every format's round trip is lossless."""
    import os
    import shutil
    import tempfile

    from mirrulations_iceberg_spark.operators.relational import (
        _roundtrip_fingerprint,
        g2_csv_roundtrip,
        g3_jsonl_roundtrip,
        g4_orc_roundtrip,
    )

    base = tempfile.mkdtemp(prefix="miis_prop_rt_")
    try:
        rows = [(i, t, "xx", "src0", len(t)) for i, t in enumerate(texts)]
        df = spark.createDataFrame(
            rows,
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        df.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(base, "documents.parquet")
        )
        want = _roundtrip_fingerprint(
            df.select("doc_id", "text", "lang", "n_chars")
        ).collect()[0]
        for fn in (g2_csv_roundtrip, g3_jsonl_roundtrip, g4_orc_roundtrip):
            got = fn(spark, base).collect()[0]
            assert got.asDict() == want.asDict(), fn.__name__
    finally:
        shutil.rmtree(base, ignore_errors=True)


@given(
    st.lists(
        # (user, step-type index, hour) — hours tight enough that the
        # 6 h horizon boundary (> t_prev, <= t_prev+6) gets exercised
        st.tuples(st.integers(0, 3), st.integers(0, 2), st.integers(0, 20)),
        min_size=1,
        max_size=25,
    )
)
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_funnel_matches_python_reference(spark, events):
    """w11 vs an independent plain-Python funnel (not the same-logic SQL
    oracle): per-step user counts and basis-point conversions must match
    the sequential-min reference exactly on arbitrary event sets."""
    import os
    import shutil
    import tempfile
    from collections import defaultdict

    from mirrulations_iceberg_spark.operators.windows import (
        FUNNEL_HORIZON_HOURS,
        FUNNEL_STEPS,
        w11_funnel_steps,
    )

    by_user = defaultdict(list)
    for u, ti, h in events:
        by_user[u].append((FUNNEL_STEPS[ti], h))
    want_n = [0] * len(FUNNEL_STEPS)
    for evs in by_user.values():
        t_prev = None
        for i, step in enumerate(FUNNEL_STEPS):
            if i == 0:
                cand = [h for ty, h in evs if ty == step]
            else:
                cand = [
                    h for ty, h in evs
                    if ty == step
                    and h > t_prev
                    and h <= t_prev + FUNNEL_HORIZON_HOURS
                ]
            if not cand:
                break
            t_prev = min(cand)
            want_n[i] += 1
    want = []
    for i, n in enumerate(want_n):
        prev = want_n[i - 1] if i else None
        bp = 10000 if prev is None else (0 if prev == 0 else (10000 * n) // prev)
        want.append((i + 1, FUNNEL_STEPS[i], n, bp))

    base = tempfile.mkdtemp(prefix="miis_prop_w11_")
    try:
        rows = [
            (i, f"2024-03-01 {h:02d}:00:00", u, FUNNEL_STEPS[ti], 1.0, "{}")
            for i, (u, ti, h) in enumerate(events)
        ]
        df = spark.createDataFrame(
            rows,
            "event_id long, ts string, user_id long, event_type string, "
            "value double, props string",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        df.write.mode("overwrite").parquet(os.path.join(base, "events.parquet"))
        got = [tuple(r) for r in w11_funnel_steps(spark, base).collect()]
        assert got == want
    finally:
        shutil.rmtree(base, ignore_errors=True)


@given(
    st.lists(  # documents as token-index lists; >512 possible tokens
        st.lists(st.integers(0, 1000), min_size=1, max_size=40),
        min_size=1,
        max_size=12,
    )
)
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_unigram_logprob_matches_python_reference(spark, docs):
    """t13 vs an independent Python unigram model: vocab truncation
    (count desc, token asc), OOV floor, and the per-language rollup
    must match to integer exactness (counts, bp) and 4-decimal bits."""
    import math
    import os
    import shutil
    import tempfile
    from collections import Counter

    from mirrulations_iceberg_spark.operators.text import (
        T13_VOCAB,
        t13_unigram_logprob,
    )

    texts = [" ".join(f"w{n}" for n in toks) for toks in docs]
    all_toks = [t for toks in docs for t in (f"w{n}" for n in toks)]
    T = len(all_toks)
    counts = Counter(all_toks)
    vocab = dict(
        sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:T13_VOCAB]
    )
    n_docs = len(docs)
    oov = sum(1 for t in all_toks if t not in vocab)
    bits = sum(
        math.log2(T) - math.log2(vocab.get(t, 1)) for t in all_toks
    )
    base = tempfile.mkdtemp(prefix="miis_prop_t13_")
    try:
        spark.createDataFrame(
            [(i, txt, "xx", "src", len(txt)) for i, txt in enumerate(texts)],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.mode("overwrite").parquet(os.path.join(base, "documents.parquet"))
        rows = t13_unigram_logprob(spark, base).collect()
        assert len(rows) == 1
        r = rows[0]
        assert (r.lang, r.n_docs, r.n_tokens) == ("xx", n_docs, T)
        assert r.oov_bp == (10000 * oov) // T
        assert abs(r.avg_bits_per_token - bits / T) < 2e-4
    finally:
        shutil.rmtree(base, ignore_errors=True)


@given(
    # adversarial shapes for the two-pass rank location: heavy ties,
    # empty buckets between clusters, everything-in-one-bucket, and
    # single-element tables all arise from this range mix
    st.lists(
        st.one_of(st.integers(0, 63), st.integers(0, 5000)),
        min_size=1,
        max_size=120,
    )
)
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_exact_quantiles_match_python_reference(spark, values):
    """a15 vs plain Python: for every target the returned element must
    BE sorted(values)[floor(q*(n-1))] — the histogram pass, cumulative
    offsets, and within-bucket ranking collapse to exact order
    statistics on arbitrary distributions."""
    import os
    import shutil
    import tempfile

    from mirrulations_iceberg_spark.operators.relational import (
        A15_QS,
        a15_exact_quantile_twopass,
    )

    base = tempfile.mkdtemp(prefix="miis_prop_a15_")
    try:
        spark.createDataFrame(
            [(i, v) for i, v in enumerate(values)], "doc_id long, n_chars long"
        ).write.mode("overwrite").parquet(
            os.path.join(base, "documents.parquet")
        )
        got = {r.quantile: (r.n, r.k_rank, r.exact_value) for r in
               a15_exact_quantile_twopass(spark, base).collect()}
        ref = sorted(values)
        n = len(values)
        for q, label in A15_QS:
            k = (q * (n - 1)) // 100
            assert got[label] == (n, k, ref[k]), label
    finally:
        shutil.rmtree(base, ignore_errors=True)


@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 9)),  # (user, day)
        min_size=1,
        max_size=30,
    )
)
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_users_to_date_invariants(spark, events):
    """w9 properties on arbitrary event sets: users_to_date is
    non-decreasing, ≥ that day's active count, ends at the total
    distinct-user count, and new_users sums to the same total."""
    import os
    import shutil
    import tempfile

    from mirrulations_iceberg_spark.operators.windows import w9_users_to_date

    base = tempfile.mkdtemp(prefix="miis_prop_w9_")
    try:
        rows = [
            (i, f"2024-03-{day + 1:02d} 12:00:00", user, "t", 1.0, "{}")
            for i, (user, day) in enumerate(events)
        ]
        df = spark.createDataFrame(
            rows,
            "event_id long, ts string, user_id long, event_type string, "
            "value double, props string",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        df.write.mode("overwrite").parquet(os.path.join(base, "events.parquet"))
        out = w9_users_to_date(spark, base).collect()
        total_users = len({u for u, _ in events})
        running = 0
        for r in out:
            assert r["users_to_date"] >= running  # non-decreasing
            running = r["users_to_date"]
            assert r["users_active"] <= r["users_to_date"]
        assert running == total_users
        assert sum(r["new_users"] for r in out) == total_users
    finally:
        shutil.rmtree(base, ignore_errors=True)


@given(
    st.lists(
        st.tuples(st.integers(0, 10**9), st.integers(1, 5000)),
        min_size=1,
        max_size=30,
        unique_by=lambda t: t[0],
    )
)
@_SETTINGS
def test_o9_weighted_keep_matches_python(spark, rows):
    """o9's all-integer keep rule vs a hashlib replay: the Spark
    CONV(md5-prefix) threshold compare must equal Python's
    int(md5[:12], 16) * w_max < w << 48 on arbitrary ids/weights."""
    import hashlib

    wmax = max(w for _i, w in rows)
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    got = {
        r.doc_id: r.keep
        for r in df.select(
            "doc_id",
            (
                F.conv(
                    F.substring(
                        F.md5(F.col("doc_id").cast("string")), 1, 12
                    ),
                    16,
                    10,
                ).cast("long")
                * F.lit(wmax)
                < F.col("n_chars") * F.lit(2**48)
            ).alias("keep"),
        ).collect()
    }
    for i, w in rows:
        u = int(hashlib.md5(str(i).encode()).hexdigest()[:12], 16)
        assert got[i] == (u * wmax < w * 2**48), (i, w, wmax)


@given(st.lists(st.integers(1, 10**12), min_size=1, max_size=30))
@_SETTINGS
def test_e8_sqrt_scores_match_python(spark, counts):
    """e8's temperature score floor(sqrt(n)*1e6) vs Python math.sqrt —
    IEEE-exact sqrt means all three runtimes must agree bit-for-bit."""
    import math

    df = spark.createDataFrame([(c,) for c in counts], "n long")
    got = [
        r.s
        for r in df.select(
            F.floor(F.sqrt(F.col("n")) * 1_000_000).cast("long").alias("s")
        ).collect()
    ]
    assert got == [math.floor(math.sqrt(c) * 1_000_000) for c in counts]


@given(st.lists(st.integers(1, 10**15), min_size=1, max_size=30))
@_SETTINGS
def test_t15_log2_band_matches_python(spark, counts):
    """t15's length(bin(c)) - 1 band vs Python's int.bit_length - 1."""
    df = spark.createDataFrame([(c,) for c in counts], "c long")
    got = [
        r.b
        for r in df.select(
            (F.length(F.bin(F.col("c"))) - 1).cast("int").alias("b")
        ).collect()
    ]
    assert got == [c.bit_length() - 1 for c in counts]


def test_t13_no_rounding_boundary_exposure(spark):
    """Close the last documented nondeterminism (VERDICT r8 item #5):
    t13's only remaining float step is the per-token ROUND(bits, 4)
    where bits = log2(T) - log2(c). A cross-engine mismatch requires a
    bits value within ~1 ulp (≈1e-16 relative) of a 4-decimal HALF-UP
    boundary, where Spark's and DuckDB's libm log2 could round
    opposite ways. bits takes only |{distinct c}|+1 values (vocab
    counts + the OOV floor), so we measure the distance of every one
    of them from the nearest x.xxxx5 boundary on the driver's own
    fixture: the minimum observed is ~1e-6 — ten orders of magnitude
    above ulp noise — so the decimal-summed mean is deterministic on
    this board, as a measured fact rather than an accepted budget.
    """
    import math

    from mirrulations_iceberg_spark.operators.text import (
        T13_VOCAB,
        tokens_col,
    )
    from mirrulations_iceberg_spark.tables import load_table
    from pyspark.sql import functions as F

    from .conftest import SF_DIR

    tok = (
        load_table(spark, SF_DIR, "documents")
        .select(F.explode(tokens_col(F.col("text"))).alias("token"))
    )
    total = tok.count()
    counts = [
        r["c"]
        for r in tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("token"))
        .limit(T13_VOCAB)
        .collect()
    ]
    worst = 1.0
    for c in set(counts) | {1}:  # OOV floor charges log2(T)-log2(1)
        bits = math.log2(total) - math.log2(c)
        frac = abs(bits) * 10000.0
        dist = abs((frac % 1.0) - 0.5)  # distance to the HALF-UP boundary
        worst = min(worst, dist)
    # 1e-9 is ~7 orders of magnitude above 1-ulp log2 divergence
    assert worst > 1e-9, f"bits value {worst} too close to a rounding boundary"


def _py_cusum(counts: list[int], train: int, h: int):
    """Plain-Python replay of w16_detect's arithmetic (the textbook
    recursion, NOT the closed form) for one series."""
    import math

    tr = counts[:train]
    n = len(tr)
    st_, stt = sum(tr), sum(x * x for x in tr)
    sigma_n = math.isqrt(n * stt - st_ * st_)
    out, s_pos, s_neg = [], 0, 0
    for x in counts[train:]:
        s_pos = max(0, s_pos + (2 * n * x - 2 * st_ - sigma_n))
        s_neg = max(0, s_neg + (2 * st_ - 2 * n * x - sigma_n))
        out.append((x, s_pos, s_neg, 2 * h * sigma_n))
    return out


@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=10_000),
                 min_size=15, max_size=40),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_w16_closed_form_property(spark, series):
    """The window closed form S_t = P_t - min(0, min P_j) equals the
    max(0, S+d) recursion for ARBITRARY non-negative integer series —
    every hypothesis-drawn series rides one Spark job as its own
    event_type partition, so the property costs one action per
    example (the shared-job discipline of this file)."""
    import datetime

    from mirrulations_iceberg_spark.operators.windows import (
        W16_H,
        W16_TRAIN_DAYS,
        w16_detect,
    )

    rows = []
    for si, counts in enumerate(series):
        for d, c in enumerate(counts):
            rows.append(
                (f"s{si}", datetime.date(2024, 1, 1)
                 + datetime.timedelta(days=d), c)
            )
    daily = spark.createDataFrame(
        rows, "event_type string, day date, n_events long"
    )
    got = {}
    for r in w16_detect(daily).collect():
        got.setdefault(r["event_type"], []).append(
            (r["n_events"], r["cusum_pos"], r["cusum_neg"], r["threshold"])
        )
    for si, counts in enumerate(series):
        assert got.get(f"s{si}", []) == _py_cusum(
            counts, W16_TRAIN_DAYS, W16_H
        ), f"series {si}: {counts}"


@given(
    st.lists(st.integers(1, 50), min_size=30, max_size=30)
)
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_w17_matches_python_reference(spark, counts):
    """w17 vs an independent plain-Python per-dow median/MAD replay on
    arbitrary daily volumes: med2/mad4/dev2/flag must match exactly —
    including the MAD=0 (constant cell) and even-count half-integer
    median cases the scaled-integer algebra exists for."""
    import os
    import shutil
    import statistics
    import tempfile

    from mirrulations_iceberg_spark.operators.windows import (
        W17_K,
        W17_TRAIN_DAYS,
        w17_seasonal_robust_anomaly,
    )

    # Python reference: days are contiguous from Monday 2024-01-01,
    # so dn = i+1 and iso dow = i % 7 + 1
    want = []
    for i in range(W17_TRAIN_DAYS, 30):
        dow = i % 7 + 1
        train = [counts[j] for j in range(W17_TRAIN_DAYS)
                 if j % 7 + 1 == dow]
        med2 = round(2 * statistics.median(train))
        dev2s = [abs(2 * c - med2) for c in train]
        mad4 = round(2 * statistics.median(dev2s))
        dev2 = abs(2 * counts[i] - med2)
        flag = 1 if 2 * dev2 > W17_K * mad4 else 0
        want.append(("p", i, dow, counts[i], med2, mad4, dev2, flag))

    base = tempfile.mkdtemp(prefix="miis_prop_w17_")
    try:
        rows, eid = [], 0
        for i, n in enumerate(counts):
            day = 1 + i  # January 2024: days 1..30
            for k in range(n):
                rows.append(
                    (eid, f"2024-01-{day:02d} 06:00:00", k, "p", 1.0, "{}")
                )
                eid += 1
        df = spark.createDataFrame(
            rows,
            "event_id long, ts string, user_id long, event_type string, "
            "value double, props string",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        df.write.mode("overwrite").parquet(
            os.path.join(base, "events.parquet")
        )
        got = [
            (r["event_type"], r["day"].day - 1, r["dow"], r["n_events"],
             r["med2"], r["mad4"], r["dev2"], r["flag"])
            for r in w17_seasonal_robust_anomaly(spark, base).collect()
        ]
        assert got == want
    finally:
        shutil.rmtree(base, ignore_errors=True)


@given(st.lists(TEXTS, min_size=1, max_size=8))
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_t21_chunks_match_python_reference(spark, texts):
    """t21 vs an independent plain-Python chunker on arbitrary texts:
    every chunk row (ordinal, offset, length, fingerprint) must match,
    zero-token documents must vanish, and concatenating each doc's
    stride-prefixes must reconstruct its token stream (coverage)."""
    import hashlib
    import os
    import shutil
    import tempfile

    from mirrulations_iceberg_spark.operators.text import (
        T21_SIZE,
        T21_STRIDE,
        t21_chunk_documents,
    )

    want = []
    for doc_id, text in enumerate(texts):
        toks = _py_tokens(text)
        for start in range(1, len(toks) + 1, T21_STRIDE):
            w = toks[start - 1 : start - 1 + T21_SIZE]
            want.append((
                doc_id,
                (start - 1) // T21_STRIDE,
                start,
                len(w),
                hashlib.md5(" ".join(w).encode()).hexdigest(),
            ))

    base = tempfile.mkdtemp(prefix="miis_prop_t21_")
    try:
        df = spark.createDataFrame(
            [(i, t, "en", "src0", len(t)) for i, t in enumerate(texts)],
            "doc_id long, text string, lang string, source string, "
            "n_chars long",
        )
        df.write.mode("overwrite").parquet(
            os.path.join(base, "documents.parquet")
        )
        got = sorted(
            tuple(r) for r in t21_chunk_documents(spark, base).collect()
        )
        assert got == sorted(want)
    finally:
        shutil.rmtree(base, ignore_errors=True)
