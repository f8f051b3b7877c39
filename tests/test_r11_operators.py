"""Engineered known-answer tests for the round-11 operators
(j14 / d15b / x16 / t17b) — invariants that hold by construction and
would catch a refactor that still happens to match a buggy oracle.
The oracle-parity sweep (test_oracle_parity.py) covers cross-engine
equality; these pin the SEMANTICS on fixtures built to exercise each
operator's decision boundaries (cross-midnight stitching, keep-first
span cutting, community argmax, merge-table exhaustion)."""

from __future__ import annotations

import os


def _write_events_local(spark, tmp_path, rows):
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


def _write_docs(spark, tmp_path, rows):
    """rows: (doc_id, text, lang, source) — n_chars derived."""
    df = spark.createDataFrame(
        [(i, t, lg, s, len(t)) for i, t, lg, s in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf, "documents.parquet")
    )
    return sf


def _write_embeddings(spark, tmp_path, rows):
    """rows: (vec_id, embedding list[float], label)."""
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf, "embeddings.parquet")
    )
    return sf


def test_j14_engineered_stitched_attribution(spark, tmp_path):
    """A cross-midnight merged episode [d1 23:30 -> d2 03:00) plus a
    distant single episode [d5 10:00, 12:00). Events at d2 00:30 and
    d2 01:15 sit in the STITCH region: an unstitched per-day episode
    set would count the chain halves as two episodes (touched=3) and
    double-match 01:15 in the overlap — the assertions below fail in
    both cases, so this pins the merge, not just containment."""
    from datetime import datetime

    from mirrulations_iceberg_spark.operators.joins import (
        j14_episode_attribution,
    )

    def at(d, h, m=0):
        return datetime(2024, 1, d, h, m)

    sf = _write_events_local(
        spark,
        tmp_path,
        [
            (1, at(1, 23, 30), 100, "error", 0.0, "{}"),  # chain start
            (2, at(2, 1, 0), 101, "error", 0.0, "{}"),    # merges in
            (3, at(5, 10, 0), 102, "error", 0.0, "{}"),   # lone episode
            (4, at(1, 23, 45), 103, "view", 1.0, "{}"),   # in ep1
            (5, at(2, 2, 30), 104, "view", 1.0, "{}"),    # in ep1 tail
            (6, at(5, 11, 59), 105, "view", 1.0, "{}"),   # in ep2
            (7, at(5, 13, 0), 106, "click", 1.0, "{}"),   # outside all
            (8, at(2, 0, 30), 107, "view", 1.0, "{}"),    # stitch region
            (9, at(2, 1, 15), 108, "view", 1.0, "{}"),    # halves overlap
        ],
    )
    rows = {r["event_type"]: r for r in j14_episode_attribution(spark, sf).collect()}
    assert set(rows) == {"error", "view"}  # click never matches
    e = rows["error"]
    assert (e["n_events"], e["n_episodes_touched"], e["id_checksum"]) == (
        3, 2, 6,
    )
    v = rows["view"]
    # disjoint episodes: each event counted ONCE (9 would double under
    # unstitched halves), and the merged chain is ONE episode
    assert (v["n_events"], v["n_episodes_touched"], v["id_checksum"]) == (
        5, 2, 4 + 5 + 6 + 8 + 9,
    )


def test_d15b_engineered_keep_first_cut(spark, tmp_path):
    """Keep-first protects the earliest doc entirely: doc1 (30 unique
    tokens) is canonical for every duplicated window, doc2 embeds
    doc1's first 25-token window (fully cut), doc3 is an exact clone
    of doc1 (fully cut via the collapse staging's closed form), doc4
    is span-free (10 tokens < K), and the fr doc is untouched."""
    from mirrulations_iceberg_spark.operators.dedup import (
        D15_K,
        d15b_exact_substring_cut,
    )

    assert D15_K == 25  # fixture arithmetic below assumes it
    a = [f"a{i}" for i in range(30)]
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (1, " ".join(a), "en", "s"),
            (2, " ".join(a[:25]), "en", "s"),
            (3, " ".join(a), "en", "s"),
            (4, " ".join(f"u{i}" for i in range(10)), "en", "s"),
            (5, "b0 b1 b2 b3 b4", "fr", "s"),
        ],
    )
    rows = {r["lang"]: r for r in d15b_exact_substring_cut(spark, sf).collect()}
    en = rows["en"]
    assert (en["n_docs"], en["total_tokens"]) == (4, 95)
    assert (en["cut_tokens"], en["retained_tokens"]) == (55, 40)
    assert en["n_docs_cut"] == 2
    assert en["retained_bp"] == (10000 * 40) // 95
    fr = rows["fr"]
    assert (fr["cut_tokens"], fr["retained_tokens"], fr["retained_bp"]) == (
        0, 5, 10000,
    )


def test_d15b_partial_overlap_union(spark, tmp_path):
    """Overlapping cut windows must union, not double-count: doc2
    repeats doc1's tokens 0..25 (two overlapping duplicated windows at
    pos 0 and 1 -> covered = min(1, 25) + 25 = 26 of its 28 tokens)."""
    from mirrulations_iceberg_spark.operators.dedup import (
        d15b_exact_substring_cut,
    )

    a = [f"a{i}" for i in range(30)]
    doc2 = a[:26] + ["q0", "q1"]  # windows at pos 0,1 dup; pos 2,3 novel
    sf = _write_docs(
        spark,
        tmp_path,
        [(1, " ".join(a), "en", "s"), (2, " ".join(doc2), "en", "s")],
    )
    rows = {r["lang"]: r for r in d15b_exact_substring_cut(spark, sf).collect()}
    en = rows["en"]
    # doc1 fully retained (canonical), doc2 keeps 28 - 26 = 2 tokens
    assert (en["total_tokens"], en["cut_tokens"]) == (58, 26)
    assert en["retained_tokens"] == 32 and en["n_docs_cut"] == 1


def test_x16_engineered_two_communities(spark, tmp_path):
    """Two clusters of identical unit vectors on orthogonal axes:
    in-cluster cosine is exactly 1.0 (>= TAU), cross-cluster 0.0
    (< TAU), so the communities are the clusters, every member ties on
    the in-cluster score and the min vec_id wins, and the kept score
    is deg * 1.0 (cross-cluster 0.0 kept edges add nothing to the
    DECIMAL sum)."""
    from mirrulations_iceberg_spark.operators.similarity import (
        EMB_DIM,
        X12_K,
        X16_TAU,
        x16_graph_community_dedup,
    )

    assert X16_TAU <= 1.0 and X12_K >= 3
    e0 = [1.0] + [0.0] * (EMB_DIM - 1)
    e1 = [0.0, 1.0] + [0.0] * (EMB_DIM - 2)
    rows = [(i, e0, 1) for i in (0, 1, 2)]
    rows += [(i, e1, 2) for i in (10, 11, 12, 13)]
    sf = _write_embeddings(spark, tmp_path, rows)
    got = {r["community"]: r for r in x16_graph_community_dedup(spark, sf).collect()}
    assert set(got) == {0, 10}
    c0 = got[0]
    assert (c0["n_members"], c0["kept_vec"], c0["kept_label"]) == (3, 0, 1)
    assert (c0["kept_score_e4"], c0["n_dropped"]) == (2 * 10000, 2)
    c1 = got[10]
    assert (c1["n_members"], c1["kept_vec"], c1["kept_label"]) == (4, 10, 2)
    assert (c1["kept_score_e4"], c1["n_dropped"]) == (3 * 10000, 3)


def test_t17b_engineered_merge_sequence(spark, tmp_path):
    """Hand-computed 3-round trainer run that then EXHAUSTS the pair
    table: vocab {abab:2, ab:3, cd:4}. Round 1 learns (a,b) at corpus
    frequency 7 (greedy: 'abab' applies it twice), round 2 (c,d) at 4,
    round 3 (ab,ab) at 2; round 4 finds no adjacent pairs and the
    trainer stops at 3 rows."""
    from mirrulations_iceberg_spark.operators.text import (
        t17b_bpe_train_iters,
    )

    sf = _write_docs(
        spark,
        tmp_path,
        [(1, "abab abab ab ab ab cd cd cd cd", "en", "s")],
    )
    rows = t17b_bpe_train_iters(spark, sf).collect()
    assert len(rows) == 3
    r1, r2, r3 = rows
    assert (r1["left_sym"], r1["right_sym"], r1["merged"]) == ("a", "b", "ab")
    assert (r1["pair_count"], r1["merges_applied"]) == (7, 7)
    assert (r1["total_syms"], r1["compression_bp"]) == (15, 150000 // 22)
    assert (r2["left_sym"], r2["right_sym"]) == ("c", "d")
    assert (r2["pair_count"], r2["total_syms"]) == (4, 11)
    assert (r3["left_sym"], r3["right_sym"], r3["merged"]) == (
        "ab", "ab", "abab",
    )
    assert (r3["pair_count"], r3["total_syms"]) == (2, 9)
    assert r3["compression_bp"] == 90000 // 22


def test_d19_engineered_reweight(spark, tmp_path):
    """A 3-copy cluster spanning sources: 'hello world' appears twice
    in source A and once in source B, so every copy carries
    1000000 // 3 micro-weight regardless of which source holds it;
    B's unique 3-token doc keeps full weight. Hand-computed report."""
    from mirrulations_iceberg_spark.operators.dedup import (
        d19_duplicate_reweight,
    )

    sf = _write_docs(
        spark,
        tmp_path,
        [
            (1, "hello world", "en", "A"),
            (2, "Hello, WORLD!", "en", "A"),  # same tokens after norm
            (3, "hello world", "en", "B"),
            (4, "a b c", "en", "B"),
        ],
    )
    rows = {r["source"]: r for r in d19_duplicate_reweight(spark, sf).collect()}
    a, b = rows["A"], rows["B"]
    w3 = 1000000 // 3
    assert (a["n_docs"], a["n_fps"], a["n_dup_docs"]) == (2, 1, 2)
    assert a["eff_docs_micro"] == 2 * w3
    assert (a["raw_tokens"], a["eff_tokens_micro"]) == (4, 4 * w3)
    assert a["downweight_bp"] == (10000 * 2 * w3) // 2000000
    assert (b["n_docs"], b["n_fps"], b["n_dup_docs"]) == (2, 2, 1)
    assert b["eff_docs_micro"] == w3 + 1000000
    assert (b["raw_tokens"], b["eff_tokens_micro"]) == (
        5, 2 * w3 + 3 * 1000000,
    )
    assert b["downweight_bp"] == (10000 * (w3 + 1000000)) // 2000000


def test_t19_engineered_score(spark, tmp_path):
    """Score replayed feature-by-feature in pure Python (same md5
    bucket, same Knuth-constant weight): tokens + bigrams of a known
    doc must sum to exactly the Spark fold's score, and the keep gate
    is score >= 0."""
    import hashlib

    from mirrulations_iceberg_spark.operators.text import (
        T19_BUCKETS,
        T19_MOD,
        T19_MULT,
        T19_SHIFT,
        t19_quality_classifier,
    )

    def w(feat: str) -> int:
        b = int(hashlib.md5(feat.encode()).hexdigest()[:3], 16) % T19_BUCKETS
        return (b * T19_MULT) % T19_MOD - T19_SHIFT

    toks = ["alpha", "beta", "beta", "42"]
    feats = toks + [f"{x} {y}" for x, y in zip(toks, toks[1:])]
    expected = sum(w(f) for f in feats)
    sf = _write_docs(
        spark,
        tmp_path,
        [(1, "Alpha BETA beta 42!", "en", "A"), (2, "", "en", "B")],
    )
    rows = {r["source"]: r for r in t19_quality_classifier(spark, sf).collect()}
    a = rows["A"]
    assert (a["n_docs"], a["n_feats_sum"], a["score_sum"]) == (
        1, len(feats), expected,
    )
    assert a["n_keep"] == (1 if expected >= 0 else 0)
    assert a["keep_rate_bp"] == a["n_keep"] * 10000
    b = rows["B"]  # empty doc: zero features, score 0, kept
    assert (b["n_feats_sum"], b["score_sum"], b["n_keep"]) == (0, 0, 1)


def test_x17_rerank_recovers_exact_topk(spark, tmp_path):
    """With the corpus smaller than the shortlist (n - 1 < C), stage 2
    re-ranks EVERY candidate by exact L2, so reranked top-k must equal
    exact top-k for every query: recall_rerank == 1.0 and the gain is
    never negative (adc_topk ⊆ shortlist, same rounded-l2 + vec_id
    tie-break on both rankings)."""
    from mirrulations_iceberg_spark.operators.similarity import (
        EMB_DIM,
        N_QUERIES,
        X17_SHORTLIST,
        x17_pq_rerank_topk,
    )

    n = 30
    assert n - 1 <= X17_SHORTLIST
    rows = [
        (
            i,
            [float(((i * 7 + j * 13) % 19) / 19.0) for j in range(EMB_DIM)],
            i % 3,
        )
        for i in range(n)
    ]
    sf = _write_embeddings(spark, tmp_path, rows)
    out = x17_pq_rerank_topk(spark, sf).collect()
    assert len(out) == N_QUERIES
    for r in out:
        assert r["recall_rerank"] == 1.0
        assert r["gain_hits"] >= 0
        assert r["recall_adc"] <= r["recall_rerank"]


def test_x18_routing_invariants(spark, tmp_path):
    """IVF-routed PQ on a deterministic corpus: one row per query, the
    candidate count is bounded by the corpus (self excluded) and the
    top-k id checksum is a sum of TOP_K distinct non-self ids; recall
    is a multiple of 1/k in [0, 1]. Cross-engine equality of the
    routed set is the oracle sweep's job — this pins the plumbing."""
    from mirrulations_iceberg_spark.operators.similarity import (
        EMB_DIM,
        N_QUERIES,
        TOP_K,
        x18_ivfpq_topk,
    )

    n = 30
    rows = [
        (
            i,
            [float(((i * 7 + j * 13) % 19) / 19.0) for j in range(EMB_DIM)],
            i % 3,
        )
        for i in range(n)
    ]
    sf = _write_embeddings(spark, tmp_path, rows)
    out = x18_ivfpq_topk(spark, sf).collect()
    assert len(out) == N_QUERIES
    for r in out:
        assert 1 <= r["n_candidates"] <= n - 1
        assert 0.0 <= r["recall_at_k"] <= 1.0
        assert round(r["recall_at_k"] * TOP_K, 6) == int(
            round(r["recall_at_k"] * TOP_K)
        )
        # checksum of TOP_K distinct ids drawn from [0, n) \ {query}
        lo = sum(range(TOP_K + 1)) - r["query_id"] if r["query_id"] <= TOP_K \
            else sum(range(TOP_K))
        hi = sum(range(n - TOP_K, n))
        assert lo <= r["id_checksum"] <= hi


def test_x18b_raw_path_reproduces_x18(spark, tmp_path):
    """x18b runs raw-PQ and residual-PQ ADC over the IDENTICAL routed
    candidate set — so its raw-side columns must reproduce x18 exactly
    on the same fixture (same IVF routing, same raw codebooks/codes):
    n_candidates equal per query and recall_raw == x18's recall_at_k.
    Also pins internal consistency: delta_hits is exactly
    TOP_K · (recall_residual − recall_raw), and the id checksum sums
    TOP_K distinct non-self ids."""
    from mirrulations_iceberg_spark.operators.similarity import (
        EMB_DIM,
        N_QUERIES,
        TOP_K,
        x18_ivfpq_topk,
        x18b_ivfpq_residual_topk,
    )

    n = 30
    rows = [
        (
            i,
            [float(((i * 7 + j * 13) % 19) / 19.0) for j in range(EMB_DIM)],
            i % 3,
        )
        for i in range(n)
    ]
    sf = _write_embeddings(spark, tmp_path, rows)
    base = {r["query_id"]: r for r in x18_ivfpq_topk(spark, sf).collect()}
    out = x18b_ivfpq_residual_topk(spark, sf).collect()
    assert len(out) == N_QUERIES
    for r in out:
        b = base[r["query_id"]]
        assert r["n_candidates"] == b["n_candidates"]
        assert r["recall_raw"] == b["recall_at_k"]
        assert 0.0 <= r["recall_residual"] <= 1.0
        assert r["delta_hits"] == round(
            (r["recall_residual"] - r["recall_raw"]) * TOP_K
        )
        lo = sum(range(TOP_K + 1)) - r["query_id"] if r["query_id"] <= TOP_K \
            else sum(range(TOP_K))
        hi = sum(range(n - TOP_K, n))
        assert lo <= r["id_checksum"] <= hi


def test_x20_prefilter_dominates_postfilter(spark, tmp_path):
    """Engineered corpus where post-filtering MUST lose recall: two
    labels interleave in vector space, so any unfiltered shortlist of
    2k holds ~half wrong-label rows and the filtered survivors cannot
    reach k for most queries — while the pre-filter path ranks ONLY
    matching candidates and keeps full-k output. Pins: per-query
    recall_pre >= recall_post, n_kept_post <= 2k survivors bound,
    recalls are fractions of the per-query truth size, and the
    pre-filter checksum sums distinct non-self matching ids."""
    from mirrulations_iceberg_spark.operators.similarity import (
        EMB_DIM,
        N_QUERIES,
        TOP_K,
        X20_EXPAND,
        x20_filtered_ann_topk,
    )

    n = 60
    rows = [
        (
            i,
            [float(((i * 7 + j * 13) % 19) / 19.0) for j in range(EMB_DIM)],
            i % 2,
        )
        for i in range(n)
    ]
    sf = _write_embeddings(spark, tmp_path, rows)
    out = x20_filtered_ann_topk(spark, sf).collect()
    assert 0 < len(out) <= N_QUERIES
    for r in out:
        assert r["recall_pre"] >= r["recall_post"]
        assert 0 <= r["n_kept_post"] <= X20_EXPAND * TOP_K
        assert 0.0 <= r["recall_post"] <= r["recall_pre"] <= 1.0
        assert r["n_candidates"] >= 1
        assert r["id_checksum"] >= 0


def test_m18_zorder_design_orders_layouts(spark, tmp_path):
    """Engineered corpus where the three layouts MUST separate: ids
    interleave langs and lengths (so insertion-order zone maps cover
    everything → full scan), lengths spread uniformly (so 1-D length
    clustering prunes the length range but carries both langs), and
    the z-interleave isolates the (lang, length) quadrant. Also pins
    the exact match count (recomputed in Python from the operator's
    own published formulas) and the waste_bp arithmetic."""
    from mirrulations_iceberg_spark.operators.maintenance import (
        m18_zorder_design,
    )

    n = 128
    docs = [
        (i, "x" * ((i * 37) % 128 + 10), "aa" if i % 2 == 0 else "bb", "S")
        for i in range(n)
    ]
    sf = _write_docs(spark, tmp_path, docs)
    rows = {r["layout"]: r for r in m18_zorder_design(spark, sf).collect()}
    assert set(rows) == {"a_zorder", "b_bylen", "c_insertion"}
    lens = [len(t) for _, t, _, _ in docs]
    mn, mx = min(lens), max(lens)
    lo, hi = mn + (mx - mn) // 4, mn + (mx - mn) // 2
    expect_match = sum(
        1 for _, t, lg, _ in docs if lg == "aa" and lo <= len(t) <= hi
    )
    assert expect_match > 0
    for r in rows.values():
        assert r["rows_matching"] == expect_match
        assert r["rows_scanned"] >= r["rows_matching"]
        assert r["waste_bp"] == (
            10000 * (r["rows_scanned"] - r["rows_matching"])
        ) // r["rows_scanned"]
    ins = rows["c_insertion"]
    assert ins["units_touched"] == ins["n_units"]  # id order prunes nothing
    assert ins["rows_scanned"] == n
    assert (
        rows["a_zorder"]["rows_scanned"]
        < rows["b_bylen"]["rows_scanned"]
        < ins["rows_scanned"]
    )


def test_m18_raw_rank_probe_at_high_lang_cardinality(spark, tmp_path):
    """At ≥17 langs the scaled B-bit word maps rank 1 onto 0 as well
    (1·15 DIV 19 = 0 at 20 langs), so a scaled-value hit test would
    count rank-1 rows as probe matches on BOTH engines and parity
    could never catch it. 20 langs, every doc the same length (the
    whole corpus sits inside the probe's length range): matches must
    equal exactly the docs of the alphabetically FIRST lang."""
    from mirrulations_iceberg_spark.operators.maintenance import (
        m18_zorder_design,
    )

    langs = [f"l{chr(ord('a') + i)}" for i in range(20)]  # la..lt
    docs = [
        (i, "x" * 50, langs[i % 20], "S") for i in range(200)
    ]
    sf = _write_docs(spark, tmp_path, docs)
    rows = m18_zorder_design(spark, sf).collect()
    per_lang = 200 // 20
    for r in rows:
        # a scaled-compare regression would report 2*per_lang here
        # (rank 0 AND rank 1 both scale to word 0)
        assert r["rows_matching"] == per_lang, r


def test_o11_neyman_favors_spread_stratum(spark, tmp_path):
    """Hand-computed design table: stratum A is perfectly uniform
    (zero variance -> Neyman weight 0), stratum B spreads 1..10 tokens
    (N*Syy - Sy^2 = 10*385 - 55^2 = 825, isqrt = 28), so the whole
    budget (n_sample = 20 // 10 = 2) moves to B while proportional
    allocation splits it 1/1."""
    from mirrulations_iceberg_spark.operators.relational import (
        o11_neyman_allocation,
    )

    docs = [(i, "t0 t1 t2 t3 t4", "en", "A") for i in range(10)] + [
        (100 + i, " ".join(f"w{k}" for k in range(i + 1)), "en", "B")
        for i in range(10)  # 1..10 tokens
    ]
    sf = _write_docs(spark, tmp_path, docs)
    rows = {r["source"]: r for r in o11_neyman_allocation(spark, sf).collect()}
    a, b = rows["A"], rows["B"]
    assert (a["n_docs"], a["raw_tokens"], a["neyman_w"]) == (10, 50, 0)
    assert (b["n_docs"], b["raw_tokens"], b["neyman_w"]) == (10, 55, 28)
    assert (a["alloc_neyman"], b["alloc_neyman"]) == (0, 2)
    assert (a["alloc_prop"], b["alloc_prop"]) == (1, 1)
    assert (a["shift"], b["shift"]) == (-1, 1)
