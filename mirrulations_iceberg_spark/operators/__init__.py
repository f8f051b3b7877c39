"""Named query/operator surface.

Each submodule exposes two module-level dicts:

* ``QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]`` —
  DataFrame implementations, one per operator row in ``SURVEY.md §2``.
* ``ORACLE: dict[str, str]`` — equivalent ANSI SQL for DuckDB
  differential checking (absent for non-SQL-expressible operators).

Conventions that keep the DuckDB differential check meaningful:

* every computed column is aliased identically on both sides;
* every ``LIMIT`` is preceded by a total order (explicit tie-breakers) so
  both engines select the same rows;
* floating-point **sums** go through ``DECIMAL(18,2)`` (exact,
  order-independent) and are cast back to double; floating-point
  **means/ratios** are ``ROUND``-ed (division by n makes the error
  negligible); min/max/median/count are exact and left untouched;
* **ratios of small integers** avoid double ``ROUND`` entirely — on an
  exact half (627/800) Spark's HALF_UP-on-decimal-repr, DuckDB's
  round(x·10⁴)-in-binary, and Python's banker's round give three
  different answers — and use integer basis points instead:
  ``(10000 * a) DIV b`` (Spark) == ``(10000 * a) // b`` (DuckDB).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

#: The round driver correctness-checks only the first 50 entries of
#: ``queries()`` in insertion order. Curate that window so it spans
#: every operator family — one representative per SURVEY §2 row plus
#: the LLM-pipeline operators (dedup, similarity, text, multimodal,
#: maintenance, streaming, and the flagship e2 pipeline). Everything
#: past the window stays pytest/replica-verified (tests/test_oracle_parity.py
#: sweeps all entries, not just these).
#:
#: Round-7 rotation (VERDICT r6 items #1/#3): close the ENTIRE
#: rotation queue in one window. Final composition — 1 banked-green
#: representative (the flagship e2) + 49 oracle-bearing queries that
#: have never had a green driver row per the mechanical ledger
#: (``python scripts/ledger.py`` — derived from CORRECTNESS_r*.json,
#: never hand-maintained): the 32-entry backlog the r6 verdict named
#: (the 8 r6 newcomers s6/x5/a5b/m11/x8/w8/g1/d12; the trust-gap four
#: o7/o8/d4/d5; the r2 nanos-casualties a13/w3/w6; every never-checked
#: tail) plus all 17 operators built in round 7 (g2/g3/g4, w9/w10,
#: u4/u5, t12, d3b, mm5, m12, x9, and the late five d13/t13/a15/j9/
#: w11). Every displaced representative (q1-q10, f1, c_scalar, j1, m6,
#: s1, a4, j6, d3, s4, s13, e1, ...) has banked green rows in
#: LEDGER.md; family coverage is asserted against window ∪
#: ledger-green by test_window_spans_all_families, and
#: tests/test_ledger.py::test_rotation_queue_is_window keeps the queue
#: mechanical: an oracle-bearing never-green query outside the window
#: fails CI. After this window lands, the only never-green entries are
#: m1/m2 — rows-only by design, kept past the window per ADVICE r5 so
#: every gate slot carries a hashed oracle. Every entrant was verified
#: via scripts/drivercheck.py (--plain-session sweeps and repeated
#: --window-order gate replays, 50/50 green) before commit.
DRIVER_WINDOW = (
    # --- the flagship (banked green r3–r6; smoke-checked via entry())
    "e2_training_pipeline",
    # --- NEW late-round-7 operators (oracle-bearing, never checked;
    # j9 took j1's slot and w11 took c_scalar's — both displaced reps
    # have banked green rows, and the j/w families stay window-live
    # through the newcomers themselves)
    "d13_semdedup",
    "t13_unigram_logprob",
    "a15_exact_quantile_twopass",
    "j9_bloom_pruned_join",
    "w11_funnel_steps",
    # --- NEW round-7 operators (never checked by definition; e1's and
    # s13's slots freed — banked green r6, e2/s1 keep those families
    # live)
    "g2_csv_roundtrip",
    "g3_jsonl_roundtrip",
    "g4_orc_roundtrip",
    "w9_users_to_date",
    "w10_trailing_window_value",
    "u4_except_all",
    "u5_intersect_all",
    "t12_vocab_growth",
    "d3b_minhash_accuracy",
    "mm5_resize_thumbs",
    "x9_pq_adc_topk",
    "m12_vacuum_orphans",
    # --- the full rotation queue: never driver-green until now
    # aggregations / sampling
    "a13_pivot",
    "a5b_approx_stats",
    "o7_stratified_sample",
    "o8_hash_split",
    "g1_glob_read",
    # windows
    "w3_lag_delta",
    "w6_session_window",
    "w8_decayed_engagement",
    # text analysis
    "t5_lang_profile",
    "t7_tfidf_top_terms",
    "t8_repetition_ratio",
    "t9_token_counts",
    "t10_pii_redact",
    # deduplication (incl. the two _diag quadratic twins + cap report)
    "d2_ngram_jaccard_pairs_diag",
    "d2b_cap_report",
    "d4_simhash",
    "d5_simhash_pairs",
    "d6_dedup_apply",
    "d12_segment_boilerplate",
    # similarity
    "x1_cosine_topk",
    "x3_label_centroid_sim",
    "x4_embedding_neardup_pairs_diag",
    "x4b_bucket_cap_report",
    "x5_ann_ivf_topk",
    "x8_range_search",
    # maintenance
    "m9_partition_overwrite",
    "m11_time_travel",
    # ETL / streaming / multimodal tails
    "e3_shard_assign",
    "mm1_media_manifest",
    "mm3_frame_sample",
    "mm4_audio_rms",
    "s6_stream_base_dedup",
)


def collect_queries() -> tuple[dict[str, QueryFn], dict[str, str]]:
    """Merge QUERIES/ORACLE from every operator module.

    Entries named in :data:`DRIVER_WINDOW` come first (in that order);
    the rest follow in module order.
    """
    from . import (
        dedup,
        etl,
        joins,
        maintenance,
        multimodal,
        relational,
        similarity,
        streamq,
        text,
        windows,
    )

    queries: dict[str, QueryFn] = {}
    oracle: dict[str, str] = {}
    for mod in (
        relational,
        joins,
        windows,
        text,
        dedup,
        similarity,
        maintenance,
        etl,
        multimodal,
        streamq,
    ):
        q = getattr(mod, "QUERIES", {})
        o = getattr(mod, "ORACLE", {})
        dup = set(q) & set(queries)
        if dup:
            raise ValueError(f"duplicate query names: {dup}")
        queries.update(q)
        oracle.update(o)
    missing = [n for n in DRIVER_WINDOW if n not in queries]
    if missing:
        raise ValueError(f"DRIVER_WINDOW names unknown queries: {missing}")
    ordered = {n: queries[n] for n in DRIVER_WINDOW}
    ordered.update((n, f) for n, f in queries.items() if n not in ordered)
    return ordered, oracle
