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
#: Round-9 rotation (VERDICT r8 item #3): after r08's all-green board
#: the stalest cohort is the 46 queries whose latest green is r06.
#: The window = 2 NEW ops (f1b, m13) + 4 whose code or oracle changed
#: this round (x10 driver-side greedy, x11 byte-budget axis, e9
#: NOT-EXISTS oracle, t13 whose r8 decimal-sum mean never held a
#: slot) + 44 of the 46 r06-stale queries, oldest-first. The two
#: r06 leave-outs are argued inline below; e2 (r08-green, and
#: smoke-run every round via ``entry()``) rotates out per the
#: oldest-first rule.
DRIVER_WINDOW = (
    # --- NEW round-9 operators (oracle-bearing, never checked)
    "f1b_indexed_substring",
    "m13_preflight_report",
    # --- code/oracle changed in round 9: re-verify at the driver
    "x10_mmr_select",       # greedy core moved driver-side
    "x11_ivf_tuning_curve",  # byte-budget axis added to output+oracle
    "e9_refresh_pipeline",   # oracle NOT IN -> NOT EXISTS
    # --- t13: the r8 decimal-sum mean (1198e7e) has never been in a
    #     window; VERDICT r8 item #5's done-criterion
    "t13_unigram_logprob",
    # --- NEW mid-round-9 operator (never checked): substring-level
    #     dedup; takes a12_rollup's slot (greens r02-r06 — the deepest
    #     history left in-window; the Expand family keeps a12b/a14/a16
    #     banked r08-green)
    "d15_exact_substring_spans",
    # --- NEW mid-round-9 operator: per-node k-NN graph; takes
    #     a1_count_star's slot (r02-r06 greens; plain COUNT(*) stays
    #     exercised by a2/q2 in-window and a6/a9 banked r08)
    "x12_knn_graph",
    # --- NEW mid-round-9 operator: incremental index refresh; takes
    #     a2_groupby_count's slot (r02-r06 greens; single-key counting
    #     stays exercised by q2 in-window and a6/a9 banked r08)
    "f1c_index_refresh",
    # --- NEW mid-round-9 operator: quality-staged curriculum; takes
    #     a3_multikey_groupby's slot (r02-r06 greens; multikey
    #     grouping stays exercised by q10 in-window and a16 banked)
    "e10_curriculum_schedule",
    # --- NEW mid-round-9 operator: keep-best-per-cluster dedup; takes
    #     d8_dedup_components's slot (d16's oracle IS d8's recursive
    #     closure extended with the quality argmax, and d16 calls the
    #     d3 LSH path internally — component semantics stay
    #     hash-verified through this slot)
    "d16_cluster_best_select",
    # --- NEW mid-round-9 operator: source-overlap matrix; takes
    #     d3_minhash_lsh_pairs's slot (d3's signature/banding code path
    #     runs inside d16 in-window, and d7 — the linear LSH apply over
    #     the same banding — stays in-window)
    "t16_source_overlap",
    # --- NEW mid-round-9 operator: epoch-cap mixture allocation; takes
    #     e5_mixture_sample's slot (mixture math covered by e11
    #     in-window + e8 banked r08; deterministic hash sampling covered
    #     by o10 in-window + o6/o9 banked r08)
    "e11_epoch_cap_allocation",
    # --- NEW mid-round-9 operator: exact-quota stratified sample;
    #     takes a4_avg_length's slot (r02-r06 greens; avg-length shape
    #     stays exercised by q4_avg_comment_length in-window)
    "o10_stratified_quota_sample",
    # --- NEW mid-round-9 operator: base-vs-delta drift monitor; takes
    #     a5_numeric_stats's slot (r02-r06 greens; numeric-stats shape
    #     stays exercised by m6_profile in-window + a5b banked r07)
    "m14_drift_report",
    # --- NEW mid-round-9 operator: SRP-LSH recall-vs-tables curve;
    #     takes x2_ann_lsh_topk's slot (x13's oracle embeds x2's full
    #     bucket/candidate/recall replay and its L=8 point is x2's
    #     configuration — the banding path stays hash-verified here)
    "x13_lsh_recall_curve",
    # --- NEW mid-round-9 operator: packing-efficiency curve; takes
    #     e4_pack_sequences's slot (e12's oracle IS e4's greedy
    #     recursive-CTE replay swept over four budgets — same
    #     greedy_pack code path, same shard hash, hash-verified here)
    "e12_packing_curve",
    # --- NEW mid-round-9 operator: cluster-balanced exact-quota
    #     sample; takes x6_embedding_dedup_apply's slot (the broadcast
    #     linear-apply shape stays exercised by x7 in-window and
    #     x5/x9/d13 banked; x14 runs the same centroid fold in-window)
    "x14_cluster_balanced_sample",
    # --- NEW mid-round-9 operator: cross-split near-dup leakage
    #     audit; takes d1_exact_dedup's slot (the md5-fingerprint
    #     collapse shape stays hash-verified in-window through d10's
    #     incremental dedup and d16's exact-collapse staging; d1
    #     banked green r06)
    "d17_split_leakage",
    # --- NEW mid-round-9 operator: scalar-int8 quantization recall;
    #     takes c_scalar_suite's slot (the scalar expression
    #     vocabulary stays exercised by c_json_extract in-window and
    #     c9/c11 banked r08; c_scalar banked green r06)
    "x15_sq_int8_recall",
    # --- NEW mid-round-9 operator: BPE merge-candidate induction;
    #     takes t1_token_stats's slot (t17 runs the same tokens_col
    #     tokenize+explode+count shape corpus-wide; per-doc token
    #     stats stay covered by t2/t9 banked r07 and t13 in-window)
    "t17_bpe_pair_stats",
    # --- NEW mid-round-9 operator: row-level CDC merge (MERGE INTO
    #     semantics); takes m6_profile's slot (profiling shapes stay
    #     exercised by m10 skew report and m14 drift bins in-window;
    #     m6 banked green r05/r06)
    "m15_cdc_merge",
    # --- NEW mid-round-9 operator: streaming CDC upsert (stream/batch
    #     parity with m15 under redelivery); takes
    #     s1_stream_windowed_counts's slot (the streaming windowed-agg
    #     shape stays exercised by s2/s3/s5 in-window; s1 banked r06)
    "s7_stream_cdc_upsert",
    # --- NEW mid-round-9 operator: gap-fill + LOCF downsample (the
    #     hypertable continuous-aggregate shape); takes
    #     w7_ntile_deciles's slot (window-function shapes stay
    #     exercised by w14's LOCF window in-window plus w1/w2/w4/w5
    #     banked r08; w7 banked green r06)
    "w14_gapfill_downsample",
    # --- NEW mid-round-9 operator: cluster-aware train/holdout split
    #     (the leakage REMEDY d17's audit motivates); takes
    #     e7_epoch_shuffle's slot (seeded-md5 shuffle keys stay
    #     exercised by e10's stage buckets in-window; e7 banked r06)
    "e13_cluster_aware_split",
    # --- NEW mid-round-9 operator: incremental near-dup admission
    #     (delta probes the base via cross-frame banded LSH); takes
    #     q3_with_attachments's slot (the q-family keeps eight reps
    #     in-window — q2/q4–q10 — and q3's boolean-flag shape stays
    #     banked via f3 r08)
    "d18_incremental_neardup",
    # --- NEW mid-round-9 operator: stupid-backoff bigram surprisal
    #     (order-2 upgrade of t13, same decimal-bits machinery); takes
    #     e6_budget_select's slot (budget/allocation math stays
    #     exercised in-window by e11's cap waterfill and e12's packing
    #     curve; e6 banked green r06)
    "t18_backoff_surprisal",
    # --- NEW mid-round-9 operator: layout/clustering scatter audit
    #     (the rewrite-with-sort-order decision input, measured through
    #     real partitioned writes + input_file_name reads); takes
    #     c_json_extract's slot (JSON-path extraction stays banked
    #     green r06 and the from_json shape is banked c11 r08)
    "m16_layout_scatter_report",
    # --- NEW mid-round-9 operator: hourly OHLC candles (the
    #     first/last/min/max hypertable rollup, one hash-agg); takes
    #     q9_comments_per_document's slot (per-key counting stays
    #     exercised by q2/q10 in-window; q9 banked green r06)
    "w15_ohlc_downsample",
    # --- NEW mid-round-9 operator: large×large interval overlap join
    #     (interval_bucket_join promoted to the oracle board, DuckDB
    #     IEJoin oracle); takes q8_complex_filter's slot (the
    #     conjunctive-filter shape stays exercised by f4 in-window;
    #     q8 banked green r06)
    "j12_interval_overlap_join",
    # --- NEW mid-round-9 operator: the THIRD flagship — release
    #     admission (e9 + d18 near-dup novelty + o8 split routing);
    #     takes a8_null_profile's slot (null-counting shapes stay
    #     banked via a6/a9 r08 and m6's profile r05/r06; a8 banked r06)
    "e14_release_pipeline",
    # --- NEW mid-round-9 operator: interval coalescing (scalable
    #     gaps-and-islands: per-day islands + driver boundary stitch,
    #     global-islands SQL oracle proving the decomposition); takes
    #     m10_skew_report's slot (per-key frequency profiling stays
    #     banked r06 and the skew-handling path is exercised by j11
    #     banked r08; m-family keeps m13/m14/m15/m16 in-window)
    "j13_interval_coalesce",
    # --- the stalest greens (last green r06), oldest-first fill
    #     (44 at round open; mid-round operators displaced 12, each
    #     argued above). Left out of the 46-query r06 cohort, with
    #     reasons:
    #     f1_like_substring (f1b's oracle IS f1's plain-scan SQL, so
    #     f1's result is hash-verified through f1b's slot) and
    #     q1_count_total (trivial COUNT(*), counting shapes covered by
    #     a1/a2/q2 in-window).
    "d10_incremental_dedup",
    "d7_dedup_apply_lsh",
    "f4_conjunctive_filter",
    "j1_broadcast_star_join",
    "m7_contract_check",
    "mm2_feature_stats",
    "q10_docket_rollup",
    "q2_count_by_agency",
    "q4_avg_comment_length",
    "q5_top_commenters",
    "q6_comments_by_date",
    "q7_text_search",
    "s13_schema_evolution",
    "s2_incremental_ingest",
    "s3_stream_sessions",
    "s4_stream_dedup",
    "s5_stream_attribution",
    "x7_ann_partitioned_index",
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
