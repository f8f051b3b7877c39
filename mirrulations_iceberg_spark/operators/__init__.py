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
#: Round-8 rotation (VERDICT r7 item #4): the rotation queue is
#: empty — every oracle-bearing query has a banked green row — so the
#: window becomes a RE-VERIFICATION window, filled oldest-green-first
#: from the mechanical ledger (``python scripts/ledger.py``; claims
#: derive from CORRECTNESS_r*.json, never memory). Composition: the
#: flagship e2 + m9 (round 7's single red row, fixed this round via
#: integer-cents arithmetic) + the 33 queries whose latest green row
#: is r02/r04/r05 (three-plus rounds of code drift ago) + the 15
#: oldest r06-latest representatives chosen for family spread (agg,
#: scalar, filter, join, window, dedup, ETL). Every entrant was
#: re-verified green at the driver's sf0.01 via scripts/drivercheck.py
#: (--window-order gate replay) before commit; the sf0.01 sweep is now
#: a documented pre-rotation gate (VERDICT r7 item #2 — sf0.001 hides
#: value-boundary divergence, measured 0/493 vs 3/5,088 on m9).
#:
#: Twelve NEW r8 operators (never green by definition) took the r8
#: slots of a1/a2/a3/a4/a5/a12/f1/f4/c_scalar_suite/w7/d1/j1 — the
#: re-verification fillers with the deepest green history (r02–r06).
#:
#: Round-11 rotation (VERDICT r10 items #1-#6; r10 shipped nothing,
#: so this executes the outstanding r10 brief, plus five bonus
#: operators added later in the round): the window = 9 NEW operators
#: (j14 episode attribution, d15b ExactSubstr cut, x16 graph-community
#: dedup, t17b iterated BPE, d19 duplicate reweighting, t19 hashed-
#: feature quality classifier, x17 two-stage PQ rerank, x18 IVF-routed
#: PQ, o11 Neyman allocation — never green by definition) + 7 whose code changed this round
#: and must re-verify at the driver (j13: the redundant w.count() scan
#: folded into the island aggregation; x12: kept-edge core extracted
#: into the shared _x12_kept_edges helper x16 composes; x9:
#: fit/encode/ADC extracted into the shared _pq_codes_qside helper
#: x17/x18 compose; x5: centroid artifacts + assign fold extracted
#: into the helpers x18 composes; d13/x11/x14: their verbatim copies
#: of that fold rewired onto the shared _ivf_assign_fold — review
#: pass 2's half-applied-discipline finding) + ALL 28
#: r06-stale greens (last driver-checked four-plus rounds of refactors
#: ago — the 9bdcc3c shared-helper extraction touched d1/d3/d8's code
#: paths; list verified against the regenerated LEDGER.md, never
#: memory) + 6 r07-stale fillers chosen for family spread (the ten
#: displaced by the bonus operators and the fold-share re-entries —
#: a13/a15/d2/d4/d6/g2/t7/w6/x1/x5 — each leave another family
#: representative in the window and stay in the pytest sweep + next
#: round's rotation queue; x5 then re-entered as a code-changed row
#: when x18 extracted its centroid artifacts). Pre-
#: rotation gate: the full sf0.01 sweep ran green this session
#: (181 pass / 0 fail) and every changed/new entry re-verified at
#: sf0.01 in targeted passes; the exact 50-slot order replayed green
#: via --window-order before commit.
#: Round-12 rotation (VERDICT r11 item #1): the window = 4 NEW
#: operators (x18b residual IVFPQ, x19 build/serve split, m18 z-order
#: design, x20 filtered ANN — never green by definition) + 6 whose
#: code changed this round and must re-verify at the driver (o11: the 2^53 radicand
#: guard now rides the ssq projection; x9/x17/x18: the shared
#: _pq_code_col/_pq_dtab_col/_adc_col helpers gained column-name
#: parameters for x18b — defaults keep the plans identical, but
#: identical-by-argument is exactly the claim the gate exists to
#: attest; s4: directory-source single-filing for scale-stress; t17b:
#: per-round cache → localCheckpoint lineage truncation) + ALL 38
#: r07-stale greens (last driver-checked five rounds of refactors
#: ago; list verified against the regenerated LEDGER.md, never
#: memory) + 2 r08-stale fillers (the flagship e2 and w1). The r08
#: cohort's remainder (45) is next round's rotation queue. Pre-rotation gate: the full sf0.01 sweep ran green this
#: session (181 pass / 0 fail) BEFORE the new operators landed; every
#: new/changed entry re-verified at sf0.01 in targeted passes; the
#: exact 50-slot order replayed green via --window-order before each
#: commit that touched the window.
DRIVER_WINDOW = (
    # --- NEW round-12 operators (oracle-bearing, never checked)
    "x18b_ivfpq_residual_topk",  # residual vs raw PQ, both recalls
    "x19_ivfpq_build_serve",     # offline build / pruned online serve
    # --- code changed in round 12: re-verify at the driver
    "o11_neyman_allocation",     # in-plan 2^53 radicand guard
    "x9_pq_adc_topk",            # _pq_* helpers gained vec params
    "x17_pq_rerank_topk",        # (defaults identical; re-attest)
    "x18_ivfpq_topk",
    # --- the 38 r07-stale greens (VERDICT r11 #1), family-grouped
    "a13_pivot",
    "a15_exact_quantile_twopass",
    "a5b_approx_stats",
    "d12_segment_boilerplate",
    "d2_ngram_jaccard_pairs_diag",
    "d2b_cap_report",
    "d3b_minhash_accuracy",
    "d4_simhash",
    "d5_simhash_pairs",
    "d6_dedup_apply",
    "e3_shard_assign",
    "g2_csv_roundtrip",
    "g3_jsonl_roundtrip",
    "g4_orc_roundtrip",
    "m12_vacuum_orphans",
    "mm1_media_manifest",
    "mm4_audio_rms",
    "mm5_resize_thumbs",
    "o8_hash_split",
    "t10_pii_redact",
    "t12_vocab_growth",
    "t5_lang_profile",
    "t7_tfidf_top_terms",
    "t8_repetition_ratio",
    "t9_token_counts",
    "u4_except_all",
    "u5_intersect_all",
    "w10_trailing_window_value",
    "w11_funnel_steps",
    "w3_lag_delta",
    "w6_session_window",
    "w8_decayed_engagement",
    "w9_users_to_date",
    "x1_cosine_topk",
    "x3_label_centroid_sim",
    "x4_embedding_neardup_pairs_diag",
    "x4b_bucket_cap_report",
    "x8_range_search",
    # --- r08-stale fillers, family spread (next-oldest cohort)
    "e2_training_pipeline",  # flagship batch-curation pipeline
    "x20_filtered_ann_topk",  # NEW r12: metadata-filtered ANN
    "t17b_bpe_train_iters",  # code changed r12: per-round lineage
                             # truncation (cache -> localCheckpoint)
    "m18_zorder_design",     # NEW r12: multi-dim layout design report
    "w1_topn_per_group",
    "s4_stream_dedup",  # code changed r12: dir-source single-filing
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
