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
#: Round-13 rotation (VERDICT r11 #1's trajectory, continued): the
#: window = 6 NEW operators (w16 CUSUM changepoint, d20 per-source
#: MinHash overlap sketch, x21 IVFPQ incremental upsert, e15 dataset-
#: card report, t20 BPE corpus encode, s8 streamed CUSUM with w16's
#: oracle verbatim as the stream/batch parity proof — never green by
#: definition) + 2 whose code changed
#: this round and must re-verify at the driver (o11: the radicand
#: guard now evaluates in DECIMAL — ADVICE r12; x20: output driven
#: from the filtered-truth key set with COALESCEd left joins — ADVICE
#: r12, oracle updated identically) + 42 of the 45 remaining r08-stale
#: greens (last driver-checked five rounds of refactors ago; list
#: verified against the regenerated LEDGER.md, never memory) —
#: w5_sessionize, f2_is_not_null, and a9_value_counts yield their
#: slots to e15, t20, and s8 and head r14's rotation queue — all
#: picked from the cohort's 10-way tie at the deepest green history
#: (5 banked rounds) by family redundancy: each leaves same-family
#: siblings in the window (w2/w4/w12/w13 for w5; f3 for f2;
#: a6/a7/a10/a12b/a14/a16 for a9), so no family's live attestation
#: thins. Pre-rotation
#: gate: the full sf0.01 sweep ran green this session (185 pass /
#: 2 rows-only / 0 fail) with the o11/x20 fixes in, each new operator
#: verified at sf0.01 on first contact, and the exact 50-slot order
#: replayed green via --window-order before commit.
DRIVER_WINDOW = (
    # --- NEW round-13 operators (oracle-bearing, never checked)
    "w16_cusum_changepoint",      # two-sided CUSUM over daily volumes
    "d20_minhash_source_sketch",  # one-pass source sketch + grade
    "x21_ivfpq_upsert_topk",      # frozen-model incremental upsert
    "e15_dataset_card",           # grouping-sets release-stats card
    "t20_bpe_encode_corpus",      # BPE-encode via the learned merges
    "s8_stream_cusum",            # streamed w16: parity-proved alarm
    "x22_binary_hamming_topk",    # 1-bit sign codes, packed Hamming
    "w17_seasonal_robust_anomaly",  # per-dow median/MAD outlier flags
    "m19_snapshot_diff",          # manifest-pruned changelog classes
    "e16_incremental_card",       # IVM card refresh vs full recompute
    "mm6_phash_neardup",          # aHash + banded Hamming image dedup
    "t21_chunk_documents",        # overlapping RAG/packing chunker
    "o12_temporal_embargo_split",  # purged time split + leakage audit
    "e17_changelog_card_refresh",  # manifest-diff-driven IVM refresh
    # (x22/w17/m19/e16/mm6/t21/o12/e17 landed late in round 13; the
    # displaced — a6_count_distinct, a10_date_histogram, o2_top_dates,
    # u1_union_base_delta, j6_asof_join, e1_docket_pipeline (5 banked
    # green rounds each — the whole 5-round tie save f3, the only
    # in-window f representative), o4_peak_day and a7_boolean_sum (4
    # rounds, with o6/o9 and a12b/a14/a16 keeping their families
    # live) — join w5/f2/a9 at the head of r14's rotation queue;
    # u2/u3 (u), j2/j3/j4/j5/j7/j8/j10/j11 (j), and e8/e15/e16 (e)
    # keep every family's live attestation.)
    # --- code changed in round 13: re-verify at the driver
    "o11_neyman_allocation",      # DECIMAL radicand guard (ADVICE r12)
    "x20_filtered_ann_topk",      # truth-driven output (ADVICE r12)
    # --- 35 of the 45 r08-stale greens (w5/f2/a9 -> r14 queue at
    #     rotation; a6/a10/o2/u1/j6/e1/o4 displaced late-round by
    #     x22/w17/m19/e16/mm6/t21/o12 — the list in the header
    #     comment above)
    "a12b_cube",
    "a14_histogram",
    "a16_grouping_sets",
    "c11_from_json_typed",
    "c9_ts_minmax",
    "d14_contamination_grade",
    "d9_decontaminate",
    "e8_temperature_mixture",
    "f3_boolean_filter",
    "j10_bucketed_colocated_join",
    "j11_salted_skew_join",
    "j2_semi_join",
    "j3_anti_join",
    "j4_fact_fact_join",
    "j5_left_outer_join",
    "j7_range_join",
    "j8_full_outer_join",
    "m3_delta_append",
    "m4_compaction",
    "m9_partition_overwrite",
    "o6_systematic_sample",
    "o9_weighted_sample",
    "t11_bigram_coverage",
    "t15_freq_spectrum",
    "t2_quality_score",
    "t3_fingerprint",
    "t4_token_index_lookup",
    "t6_winnow_fingerprints",
    "u2_intersect",
    "u3_except",
    "w12_retention_cohorts",
    "w13_sequence_with_negation",
    "w2_running_sum",
    "w4_rank_in_partition",
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
