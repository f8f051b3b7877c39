"""Engineered known-answer tests for the round-14 operators
(o13 grouped k-fold split / m20 z-order sorted rewrite) — invariants
that hold by construction, pinning the semantics the oracle-parity
sweep can't distinguish from a consistently-wrong twin (entity
fold-disjointness and assignment stability under corpus growth; the
rewrite reproducing m18's design prediction on real files)."""

from __future__ import annotations

from .conftest import SF_DIR


def test_o13_folds_partition_entities(spark):
    """Every entity in exactly one fold (the GroupKFold contract),
    counts consistent with the raw table, shares summing to ~10000."""
    from pyspark.sql import functions as F

    from mirrulations_iceberg_spark.operators.relational import (
        O13_FOLDS,
        o13_group_kfold_split,
    )
    from mirrulations_iceberg_spark.tables import load_table

    rows = o13_group_kfold_split(spark, SF_DIR).collect()
    events = load_table(spark, SF_DIR, "events")
    assert 1 <= len(rows) <= O13_FOLDS
    assert all(0 <= r.fold < O13_FOLDS for r in rows)
    assert all(r.cross_fold_users == 0 for r in rows)
    assert sum(r.n_rows for r in rows) == events.count()
    assert (
        sum(r.n_users for r in rows)
        == events.select(F.countDistinct("user_id")).collect()[0][0]
    )
    # integer-floor shares: sum in (10000 - k, 10000]
    assert 10000 - len(rows) < sum(r.row_share_bp for r in rows) <= 10000


def test_o13_assignment_stable_under_growth(spark, tmp_path):
    """o8's stability guarantee, grouped: a user keeps its fold when
    the corpus doubles — fold depends only on the entity key. Runs
    o13 on the fixture and on fixture ∪ shifted-clone; every fold's
    user set from the first run must be a subset of some fold with
    the same id in the second (here: per-fold user counts can only
    grow, and per-user fold ids match row-for-row)."""
    import os

    from pyspark.sql import functions as F

    from mirrulations_iceberg_spark.operators.relational import (
        o13_group_kfold_split,
    )
    from mirrulations_iceberg_spark.tables import load_table

    events = load_table(spark, SF_DIR, "events")
    # clone with NEW users (ids shifted far away) — existing users'
    # folds must not move
    grown = events.unionByName(
        events.withColumn("user_id", F.col("user_id") + F.lit(10_000_000))
    )
    sf2 = str(tmp_path / "sf2")
    os.makedirs(sf2, exist_ok=True)
    grown.write.mode("overwrite").parquet(os.path.join(sf2, "events.parquet"))

    base = {
        r.fold: r.n_users for r in o13_group_kfold_split(spark, SF_DIR).collect()
    }
    after = {
        r.fold: r.n_users for r in o13_group_kfold_split(spark, sf2).collect()
    }
    for fold, n in base.items():
        assert after.get(fold, 0) >= n, (
            f"fold {fold} shrank {n} -> {after.get(fold, 0)}: an existing "
            "entity moved folds under corpus growth"
        )


def test_t17c_batch1_equals_t17b_sequential(spark):
    """The VERDICT r13 done-criterion for the batched trainer: with
    batch=1 the greedy disjoint selection degenerates to t17b's
    argmax, so the merge table must equal t17b's sequential result
    merge-for-merge (same pairs, same counts, same totals)."""
    from mirrulations_iceberg_spark.operators.text import (
        T17B_ITERS,
        _t17c_train,
        t17b_bpe_train_iters,
    )

    seq = t17b_bpe_train_iters(spark, SF_DIR).collect()
    bat = _t17c_train(
        spark, SF_DIR, batch=1, rounds=T17B_ITERS, pool=1
    ).collect()
    assert len(bat) == len(seq)
    for s, b in zip(seq, bat):
        assert (b.round, b.rank_in_round) == (s.iter, 1)
        assert (b.left_sym, b.right_sym, b.merged) == (
            s.left_sym,
            s.right_sym,
            s.merged,
        )
        assert b.pair_count == s.pair_count
        assert b.round_merges_applied == s.merges_applied
        assert b.total_syms == s.total_syms
        assert b.compression_bp == s.compression_bp


def test_t17c_round_merges_are_symbol_disjoint(spark):
    """Within a round no accepted merge's INPUTS or OUTPUT may
    intersect the inputs-and-outputs of earlier accepted merges — the
    strengthened invariant (r14 review: input-disjointness alone lets
    one merge's output feed another's input, invalidating its
    round-start count) that keeps the batch fold order-independent."""
    from mirrulations_iceberg_spark.operators.text import (
        t17c_bpe_batch_train,
    )

    rows = t17c_bpe_batch_train(spark, SF_DIR).collect()
    assert rows, "trainer learned no merges on the fixture"
    by_round: dict[int, list] = {}
    for r in rows:
        by_round.setdefault(r.round, []).append(r)
    for rnd, merges in by_round.items():
        seen: set[str] = set()
        for m in merges:
            fresh = {m.left_sym, m.right_sym, m.merged}
            assert not (fresh & seen), (
                f"round {rnd}: merge ({m.left_sym},{m.right_sym})->"
                f"{m.merged} intersects earlier accepted symbols "
                f"{fresh & seen}"
            )
            seen |= fresh


def test_s9_stream_equals_d18_batch(spark):
    """The s-family parity claim on a second scale: the micro-batched
    streaming admission must equal d18's single-pass batch report
    row-for-row — same langs, same counts, same flagged checksums —
    regardless of how the three deliveries split the delta."""
    from mirrulations_iceberg_spark.operators.dedup import (
        d18_incremental_neardup,
    )
    from mirrulations_iceberg_spark.operators.streamq import (
        s9_stream_neardup_admission,
    )

    batch = [
        tuple(r) for r in d18_incremental_neardup(spark, SF_DIR).collect()
    ]
    stream = [
        tuple(r)
        for r in s9_stream_neardup_admission(spark, SF_DIR).collect()
    ]
    assert stream == batch


def test_t22_flags_repetitive_not_diverse(spark, tmp_path):
    """Engineered known answers: a doc that loops one bigram must flag
    (dup_bigram_bp ≈ 10000, top share 1/2), a doc of all-distinct
    tokens must not (zero repeats, top share 1/n); a single-token doc
    exercises the no-bigram guard (flags only via top_unigram 10000)."""
    import os

    from pyspark.sql import functions as F  # noqa: F401

    from mirrulations_iceberg_spark.operators.text import (
        t22_intra_doc_repetition,
    )

    docs = [
        # 40 tokens, all "spam spam ...": every bigram repeats
        (1, " ".join(["spam"] * 40), "xx", "s1"),
        # 40 distinct tokens: zero repeated bigrams, top share 1/40
        (2, " ".join(f"tok{i}" for i in range(40)), "xx", "s1"),
        # single token: no bigrams; flags on top_unigram_bp = 10000
        (3, "solo", "yy", "s1"),
    ]
    df = spark.createDataFrame(
        [(i, t, lg, src, len(t)) for i, t, lg, src in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    df.write.mode("overwrite").parquet(os.path.join(sf, "documents.parquet"))
    rows = {r.lang: r for r in t22_intra_doc_repetition(spark, sf).collect()}
    xx, yy = rows["xx"], rows["yy"]
    assert xx.n_docs == 2 and xx.n_flagged == 1
    assert xx.flagged_id_checksum == 1  # the spam doc, not the diverse one
    assert yy.n_docs == 1 and yy.n_flagged == 1
    assert yy.flagged_id_checksum == 3
    # the spam doc's bigram repetition is total: (39-1)/39 ≈ 9743 bp,
    # averaged with the diverse doc's 0 → 4871
    assert xx.avg_dup_bigram_bp == ((10000 * 38) // 39) // 2


def test_o14_expanding_windows(spark):
    """Walk-forward invariants: train windows expand monotonically
    (fold k's train set contains fold k−1's, so n_train and u_train
    are nondecreasing), the published geometry matches the constants,
    and the leakage audit is internally consistent."""
    from mirrulations_iceberg_spark.operators.relational import (
        O14_BASE_DAYS,
        O14_FOLDS,
        O14_STEP_DAYS,
        o14_walk_forward_folds,
    )

    rows = o14_walk_forward_folds(spark, SF_DIR).collect()
    assert [r.fold for r in rows] == list(range(1, O14_FOLDS + 1))
    assert [r.train_days for r in rows] == [
        O14_BASE_DAYS + (k - 1) * O14_STEP_DAYS
        for k in range(1, O14_FOLDS + 1)
    ]
    for prev, cur in zip(rows, rows[1:]):
        assert cur.n_train >= prev.n_train
        assert cur.u_train >= prev.u_train
    for r in rows:
        assert r.n_test > 0, f"fold {r.fold}: empty test window"
        assert r.u_both <= min(r.u_train, r.u_test)
        assert 0 <= r.leak_bp <= 10000


def test_mm7_containment_and_collapse(spark, tmp_path):
    """Engineered known answers for the video frame-signature dedup:
    a byte-identical clone pair collapses to one exact-signature
    cluster row; a 3/4-overlap cut pairs with that cluster's rep at
    containment 7500; an unrelated video appears nowhere."""
    import os

    from mirrulations_iceberg_spark.operators.multimodal import (
        mm7_video_framesig_neardup,
    )

    def vid(seed: str, n: int) -> str:
        # deterministic ASCII filler, 64-char period broken by the seed
        return "".join(
            f"{seed}{i:06d}!" [:8] + "abcdefgh" * 7 for i in range(n // 64)
        )[:n]

    a = vid("A", 1024)  # sampled frames at offsets 0/256/512/768
    c = a[:768] + vid("Z", 256)  # shares 3 of its 4 sampled frames
    d = vid("D", 1024)  # unrelated
    rows = [
        (1, a, "xx", "src1"),
        (2, a, "xx", "src1"),  # exact clone of 1
        (3, c, "xx", "src1"),
        (4, d, "xx", "src1"),
    ]
    df = spark.createDataFrame(
        [(i, t, lg, s, len(t)) for i, t, lg, s in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    df.write.mode("overwrite").parquet(os.path.join(sf, "documents.parquet"))
    out = {
        (r.media_id_a, r.media_id_b): r
        for r in mm7_video_framesig_neardup(spark, sf).collect()
    }
    assert set(out) == {(1, 1), (1, 3)}
    cluster = out[(1, 1)]
    assert cluster.n_a == 2 and cluster.containment_bp == 10000
    pair = out[(1, 3)]
    assert pair.shared_frames == 3
    assert (pair.nf_a, pair.nf_b) == (4, 4)
    assert pair.containment_bp == 7500


def test_m20_rewrite_matches_m18_prediction(spark):
    """The VERDICT r13 done-criterion: m20's measured before/after rows
    on REAL files must equal m18's virtual-layout prediction for the
    same probe — c_insertion ≡ before_insertion, a_zorder ≡
    after_zorder — and the rewrite must actually prune."""
    from mirrulations_iceberg_spark.operators.maintenance import (
        m18_zorder_design,
        m20_zorder_rewrite,
    )

    cols = (
        "n_units",
        "units_touched",
        "rows_scanned",
        "rows_matching",
        "waste_bp",
    )
    pred = {
        r.layout: tuple(r[c] for c in cols)
        for r in m18_zorder_design(spark, SF_DIR).collect()
    }
    meas = {
        r.layout: tuple(r[c] for c in cols)
        for r in m20_zorder_rewrite(spark, SF_DIR).collect()
    }
    assert meas["before_insertion"] == pred["c_insertion"]
    assert meas["after_zorder"] == pred["a_zorder"]
    # the payoff the rewrite was priced for: strictly fewer units
    # touched, never more rows scanned, identical matching rows
    b, a = meas["before_insertion"], meas["after_zorder"]
    assert a[1] <= b[1] and a[2] <= b[2]
    assert a[3] == b[3]
