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


def test_e8_temperature_flattens_toward_uniform(spark):
    """α=0.5 must pull every domain's share toward the mean: sources
    above natural share lose, sources below gain (the DoReMi point)."""
    from mirrulations_iceberg_spark.operators.etl import (
        E8_BUDGET_TOKENS,
        e8_temperature_mixture,
    )

    rows = e8_temperature_mixture(spark, SF_DIR).collect()
    assert len(rows) >= 2
    uniform_bp = 10000 // len(rows)
    for r in rows:
        if r["natural_bp"] > uniform_bp:
            assert r["temp_bp"] <= r["natural_bp"]
        elif r["natural_bp"] < uniform_bp:
            assert r["temp_bp"] >= r["natural_bp"]
        assert 0 <= r["alloc_tokens"] <= E8_BUDGET_TOKENS
    # integer-DIV shares can undershoot but never overshoot the whole
    assert sum(r["temp_bp"] for r in rows) <= 10000
    assert sum(r["alloc_tokens"] for r in rows) <= E8_BUDGET_TOKENS


def test_t15_band_totals_cover_the_corpus(spark):
    from mirrulations_iceberg_spark.operators.text import (
        t15_freq_spectrum,
        t1_token_stats,
    )

    spec = t15_freq_spectrum(spark, SF_DIR).collect()
    total = sum(r["total_occurrences"] for r in spec)
    corpus_tokens = sum(
        r["total_tokens"] for r in t1_token_stats(spark, SF_DIR).collect()
    )
    assert total == corpus_tokens  # every token lands in exactly one band
    for r in spec:
        lo, hi = 2 ** r["log2_band"], 2 ** (r["log2_band"] + 1) - 1
        assert lo <= r["min_count"] <= r["max_count"] <= hi


def test_o9_keeps_heaviest_doc_always_and_respects_weights(spark):
    """The max-weight doc has keep probability 1 (u*wmax < wmax*2^48
    holds for every u < 2^48), so every language's heaviest docs keep
    the sample non-empty; kept char mass exceeds the uniform share."""
    from mirrulations_iceberg_spark.operators.relational import (
        o9_weighted_sample,
    )

    rows = o9_weighted_sample(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 < r["n_kept"] <= r["n_docs"]


def test_e9_funnel_is_monotone(spark):
    """Each refresh stage only removes documents: delta >= gated >=
    exact >= novel >= admitted, per language, and admitted docs carry
    positive token mass."""
    from mirrulations_iceberg_spark.operators.etl import e9_refresh_pipeline

    rows = e9_refresh_pipeline(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert (
            r["n_delta"]
            >= r["n_gated"]
            >= r["n_exact"]
            >= r["n_novel"]
            >= r["n_admitted"]
            >= 0
        )
        if r["n_admitted"] > 0:
            assert r["admitted_tokens"] > 0
            assert r["id_checksum"] > 0


def test_t15_bands_on_engineered_spectrum(spark, tmp_path):
    """The sf fixtures' closed vocabulary yields only high bands; this
    pins the banding math across the full range on engineered counts:
    tokens occurring 1x (band 0), 2x and 3x (band 1), 5x (band 2),
    and 9x (band 3)."""
    import os

    from mirrulations_iceberg_spark.operators.text import t15_freq_spectrum

    words = (
        ["hapax"]
        + ["twice"] * 2
        + ["thrice"] * 3
        + ["five"] * 5
        + ["nine"] * 9
    )
    df = spark.createDataFrame(
        [(1, " ".join(words), "en", "s", len(words))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    df.coalesce(1).write.parquet(os.path.join(sf, "documents.parquet"))
    rows = {r["log2_band"]: r for r in t15_freq_spectrum(spark, sf).collect()}
    assert set(rows) == {0, 1, 2, 3}
    assert rows[0]["n_types"] == 1 and rows[0]["total_occurrences"] == 1
    assert rows[1]["n_types"] == 2 and rows[1]["total_occurrences"] == 5
    assert rows[2]["n_types"] == 1 and rows[2]["min_count"] == 5
    assert rows[3]["n_types"] == 1 and rows[3]["max_count"] == 9


def _write_events(spark, tmp_path, rows):
    import os

    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf, "events.parquet")
    )
    return sf


def test_w13_engineered_veto_scenario(spark, tmp_path):
    """Four archetypes, one of each: clean converter, vetoed converter
    (error strictly between view and purchase), view-only user, and a
    purchase outside the horizon."""
    from datetime import datetime, timedelta

    from mirrulations_iceberg_spark.operators.windows import (
        w13_sequence_with_negation,
    )

    t0 = datetime(2024, 3, 1, 12, 0, 0)
    h = timedelta(hours=1)
    rows = [
        (1, t0, 1, "view", 1.0, "{}"),
        (2, t0 + h, 1, "purchase", 1.0, "{}"),        # clean
        (3, t0, 2, "view", 1.0, "{}"),
        (4, t0 + h / 2, 2, "error", 1.0, "{}"),
        (5, t0 + h, 2, "purchase", 1.0, "{}"),        # vetoed
        (6, t0, 3, "view", 1.0, "{}"),                # never converts
        (7, t0, 4, "view", 1.0, "{}"),
        (8, t0 + 10 * h, 4, "purchase", 1.0, "{}"),   # outside horizon
    ]
    sf = _write_events(spark, tmp_path, rows)
    r = w13_sequence_with_negation(spark, sf).collect()[0]
    assert (r["n_start"], r["n_seq"], r["n_vetoed"], r["n_clean"]) == (4, 2, 1, 1)
    assert r["clean_conv_bp"] == 2500  # 1 of 4
    assert r["veto_rate_bp"] == 5000  # 1 of 2


def test_w12_engineered_two_cohorts(spark, tmp_path):
    """Two cohorts a week apart; one user of cohort 1 returns in week
    2, the other doesn't — the matrix must show 50% week-1 retention
    for cohort 1 and a lone offset-0 row for cohort 2."""
    from datetime import datetime, timedelta

    from mirrulations_iceberg_spark.operators.windows import (
        w12_retention_cohorts,
    )

    mon1 = datetime(2024, 3, 4, 10, 0)   # a Monday
    mon2 = mon1 + timedelta(days=7)
    rows = [
        (1, mon1, 1, "view", 1.0, "{}"),
        (2, mon2, 1, "view", 1.0, "{}"),   # user 1 retained
        (3, mon1, 2, "view", 1.0, "{}"),   # user 2 churned
        (4, mon2, 3, "view", 1.0, "{}"),   # cohort 2
    ]
    sf = _write_events(spark, tmp_path, rows)
    out = {
        (str(r["cohort_week"]), r["week_offset"]): r
        for r in w12_retention_cohorts(spark, sf).collect()
    }
    c1, c2 = "2024-03-04", "2024-03-11"
    assert out[(c1, 0)]["cohort_size"] == 2
    assert out[(c1, 0)]["retention_bp"] == 10000
    assert out[(c1, 1)]["n_active"] == 1
    assert out[(c1, 1)]["retention_bp"] == 5000
    assert out[(c2, 0)]["cohort_size"] == 1
    assert len(out) == 3


def test_d14_engineered_contamination_grades(spark, tmp_path):
    """Known-answer corpus: doc 0 is the benchmark slice (0 % 97 == 0);
    doc 1 quotes one benchmark 5-gram (1 of its 6 grams -> 1666 bp),
    doc 2 is a verbatim copy (10000 bp, flagged), doc 3 is disjoint."""
    import os

    from mirrulations_iceberg_spark.operators.dedup import (
        d14_contamination_grade,
    )

    bench = "alpha beta gamma delta epsilon zeta eta theta"  # 8 toks, 4 grams
    quoting = "alpha beta gamma delta epsilon one two three four five"
    disjoint = "red green blue cyan magenta yellow black white"
    rows = [
        (0, bench, "en", "s", len(bench)),
        (1, quoting, "en", "s", len(quoting)),
        (2, bench, "en", "s", len(bench)),
        (3, disjoint, "en", "s", len(disjoint)),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    df.coalesce(1).write.parquet(os.path.join(sf, "documents.parquet"))
    out = d14_contamination_grade(spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_docs"] == 3
    assert r["n_flagged"] == 1  # only the verbatim copy clears 2000 bp
    assert r["total_grams"] == 6 + 4 + 4
    assert r["matched_grams"] == 1 + 4 + 0
    assert r["max_doc_bp"] == 10000


def test_d15_engineered_span_embedding(spark, tmp_path):
    """Known-answer d15 (r9): doc 2 embeds a >=K-token span of doc 1,
    doc 3 shares nothing, doc 4 repeats a span INSIDE itself only
    (within-doc repetition must NOT count — windows are per-doc
    distinct and the bar is cross-doc nd >= 2)."""
    from mirrulations_iceberg_spark.operators.dedup import (
        D15_K,
        d15_exact_substring_spans,
    )

    span = " ".join(f"w{i}" for i in range(D15_K))          # exactly K tokens
    span2 = " ".join(f"z{i}" for i in range(D15_K))
    uniq = lambda p, n: " ".join(f"{p}{i}" for i in range(n))
    rows = [
        (1, f"{uniq('a', 5)} {span} {uniq('b', 5)}", "en"),  # source of span
        (2, f"{uniq('c', 5)} {span}", "en"),                 # embeds the span
        (3, uniq("d", D15_K + 10), "en"),                    # no overlap
        (4, f"{span2} {span2}", "en"),                       # self-repeat only
    ]
    spark.createDataFrame(
        [(i, t, l, "synth", len(t)) for i, t, l in rows],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r["lang"]: r for r in d15_exact_substring_spans(spark, str(tmp_path)).collect()}
    en = out["en"]
    assert en["n_docs_spanned"] == 4
    assert en["n_docs_with_dup"] == 2          # docs 1 and 2 only
    # doc2's dup windows: its text has 5+K tokens -> 6 windows, but only
    # the window equal to the pure span matches doc1 (doc1 wraps the
    # span in different neighbors) -> exactly 1 dup window per doc
    assert en["dup_windows"] == 2


def test_x12_graph_invariants(spark):
    """x12 (r9): per-label audit must be internally consistent —
    degrees bounded by K, edges == sum of degrees, mean similarity a
    plausible ten-thousandths cosine."""
    from mirrulations_iceberg_spark.operators.similarity import (
        X12_K,
        x12_knn_graph,
    )

    rows = x12_knn_graph(spark, SF_DIR).collect()
    assert rows, "expected at least one label row"
    for r in rows:
        assert 1 <= r["min_degree"] <= r["max_degree"] <= X12_K
        assert r["n_edges"] >= r["n_nodes"] * r["min_degree"]
        assert r["n_edges"] <= r["n_nodes"] * r["max_degree"]
        assert -10000 <= r["mean_sim_e4"] <= 10000
