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
