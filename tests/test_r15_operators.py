"""Round-15 operator pins.

* The s9↔d18 LSH cap boundary turned from prose into an executable
  contract (VERDICT r14 #6 + ADVICE r14): an engineered hot bucket
  shows the exact divergence regime — the all-at-once (d18-style)
  probe drops a bucket the smaller per-batch (s9-style) probes keep —
  and that parity is restored the moment the cap stops firing.
* ``lsh_hottest_bucket`` (the quantity s9's runtime guard compares
  against the cap) is pinned on the same engineered frames.
* e18 DSIR resampling: target-like raw docs outrank distribution-alien
  ones on an engineered corpus, and the selection size is exactly the
  target count (the resample-to-target contract).
"""

from __future__ import annotations

import os

import pytest

from mirrulations_iceberg_spark.operators.dedup import (
    LSH_MAX_BUCKET,
    lsh_hottest_bucket,
    minhash_lsh_cross_pairs_over,
    minhash_signatures,
)

#: One text shared by every engineered doc: identical shingle sets put
#: every doc in the SAME (band, bucket) for every band — the hottest
#: bucket possible — and make every probe×base pair an exact dup
#: (Jaccard 1.0), so the verified pair set is fully determined by
#: which buckets survive the cap.
_TEXT = "alpha beta gamma delta epsilon zeta eta theta iota kappa"

_BASE_IDS = list(range(1000, 1006))  # 6 base docs
_PROBE_IDS = list(range(1, 7))  # 6 probe docs, 3 deliveries of 2
_DELIVERIES = [_PROBE_IDS[0:2], _PROBE_IDS[2:4], _PROBE_IDS[4:6]]
#: 6 probe + 6 base = 12 > CAP, but any 2-doc delivery + 6 base = 8 <= CAP.
_CAP = 9


def _docs(spark, ids):
    return spark.createDataFrame(
        [(i, _TEXT) for i in ids], "doc_id long, text string"
    )


def _pairs(df) -> list[tuple[int, int]]:
    return sorted((r["doc_a"], r["doc_b"]) for r in df.collect())


def test_s9_cap_boundary_divergence_then_parity(spark):
    base = _docs(spark, _BASE_IDS)
    all_probes = _docs(spark, _PROBE_IDS)
    full_truth = sorted(
        (p, b) for p in _PROBE_IDS for b in _BASE_IDS
    )

    # --- cap firing: the all-at-once probe sees a 12-doc bucket and
    # drops it; each per-batch probe sees an 8-doc bucket and keeps it.
    batch_all = _pairs(
        minhash_lsh_cross_pairs_over(all_probes, base=base, max_bucket_size=_CAP)
    )
    streamed = sorted(
        p
        for ids in _DELIVERIES
        for p in _pairs(
            minhash_lsh_cross_pairs_over(
                _docs(spark, ids), base=base, max_bucket_size=_CAP
            )
        )
    )
    assert batch_all == []  # d18-style: bucket capped away, zero pairs
    assert streamed == full_truth  # s9-style: every pair found
    assert batch_all != streamed  # THE divergence the docstring states

    # --- cap lifted: both probe shapes agree on the full pair set.
    batch_ok = _pairs(
        minhash_lsh_cross_pairs_over(
            all_probes, base=base, max_bucket_size=LSH_MAX_BUCKET
        )
    )
    streamed_ok = sorted(
        p
        for ids in _DELIVERIES
        for p in _pairs(
            minhash_lsh_cross_pairs_over(
                _docs(spark, ids), base=base, max_bucket_size=LSH_MAX_BUCKET
            )
        )
    )
    assert batch_ok == streamed_ok == full_truth


def test_lsh_hottest_bucket_measures_occupancy(spark):
    # 12 identical docs -> every band's bucket holds all 12.
    sigs = minhash_signatures(_docs(spark, range(2000, 2012)))
    assert lsh_hottest_bucket(sigs) == 12
    # shingle-less docs sign NULL and occupy no bucket at all
    empty = minhash_signatures(
        spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    )
    assert lsh_hottest_bucket(empty) == 0


def test_s9_guard_raises_on_cap_proximity(spark, monkeypatch):
    """Drive s9's OWN runtime guard: with the measured occupancy forced
    one past the guard line (cap // 2 + 1), the operator refuses to run
    with a diagnosis — the ADVICE r14 tripwire — instead of producing a
    silently batch-composition-dependent parity row. (Note the collapse
    makes a real trip near-impossible: identical texts reduce to ONE
    rep per side before signing, so a hot rep bucket needs >cap/2
    DISTINCT texts sharing every band hash — the guard is a tripwire
    for exactly that 'should never happen' regime.)"""
    from mirrulations_iceberg_spark.operators import dedup, streamq

    from .conftest import SF_DIR

    monkeypatch.setattr(
        dedup,
        "lsh_hottest_bucket",
        lambda *a, **k: LSH_MAX_BUCKET // 2 + 1,
    )
    with pytest.raises(RuntimeError, match="cap proximity"):
        streamq.s9_stream_neardup_admission(spark, SF_DIR)


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


def test_e18_engineered_target_like_docs_win(spark, tmp_path):
    """Semantics, not just plumbing: raw docs sharing the target's
    vocabulary must outrank distribution-alien docs, and the resample
    keeps exactly n_target raw docs. Target (src0, 4 docs) and srcA
    (3 docs) draw from one vocabulary; srcB (5 docs) from a disjoint
    one — so all of srcA is selected and exactly one srcB doc fills
    the remaining slot (ties broken by doc_id)."""
    from mirrulations_iceberg_spark.operators.etl import (
        E18_TARGET_SOURCES,
        e18_dsir_resample,
    )

    like = "cat dog fish bird cat dog fish bird cat dog"
    alien = "zeta omega sigma kappa zeta omega sigma kappa zeta omega"
    tgt = E18_TARGET_SOURCES[0]
    rows = [(i, like, "en", tgt) for i in range(4)]
    rows += [(10 + i, like, "en", "srcA") for i in range(3)]
    rows += [(20 + i, alien, "en", "srcB") for i in range(5)]
    sf = _write_docs(spark, tmp_path, rows)
    got = {
        r["source"]: r for r in e18_dsir_resample(spark, sf).collect()
    }
    assert set(got) == {"srcA", "srcB"}
    assert got["srcA"]["n_raw"] == 3 and got["srcA"]["n_selected"] == 3
    assert got["srcB"]["n_raw"] == 5 and got["srcB"]["n_selected"] == 1
    assert got["srcA"]["selected_bp"] == 10000
    assert got["srcB"]["selected_bp"] == 2000
    # target-like docs carry positive log-ratio mass, alien negative
    assert got["srcA"]["sel_score_units"] > 0
    assert got["srcB"]["raw_score_units"] < 0


def test_e18_resamples_to_target_size(spark):
    """On the real fixture the selected pool is exactly the target
    corpus' size — DSIR's resample-to-target contract."""
    import duckdb

    from mirrulations_iceberg_spark.operators.etl import (
        E18_TARGET_SOURCES,
        e18_dsir_resample,
    )

    from .conftest import SF_DIR

    rows = e18_dsir_resample(spark, SF_DIR).collect()
    targets = ", ".join(f"'{s}'" for s in E18_TARGET_SOURCES)
    n_target = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{SF_DIR}/documents.parquet')"
        f" WHERE source IN ({targets})"
    ).fetchone()[0]
    assert sum(r["n_selected"] for r in rows) == n_target
    assert all(r["n_selected"] <= r["n_raw"] for r in rows)


def test_mm8_engineered_clone_and_trimmed_pair(spark, tmp_path):
    """The mm7 discipline applied to audio: a byte-identical clone pair
    collapses to one exact-signature cluster (self-row, containment
    10000), and a TRIMMED copy — the shorter clip's frames a strict
    prefix of the longer's — pairs at containment 10000 with
    shared == the smaller signature. Texts are built from 16-char
    constant-energy blocks so each block quantizes to one known symbol
    and the two constructs share no 4-gram."""
    from mirrulations_iceberg_spark.operators.multimodal import (
        MM8_FRAME,
        MM8_MIN_SHINGLES,
        mm8_audio_fingerprint_neardup,
    )

    blk = {0: " ", 3: "a", 4: "d", 5: "f", 6: "h", 7: "j"}

    def audio(levels):
        return "".join(blk[v] * MM8_FRAME for v in levels)

    clone = audio([3, 0, 7, 4, 6, 0, 5, 3, 7, 0, 4, 6])
    full = audio([0, 3, 4, 7, 5, 6, 0, 4, 3, 7, 6, 5, 0, 7, 4])
    trim = full[: 11 * MM8_FRAME]  # 11 frames -> exactly 8 shingles
    rows = [
        (1, clone, "en", "src2"),
        (2, clone, "en", "src2"),
        (3, full, "en", "src2"),
        (4, trim, "en", "src2"),
    ]
    sf = _write_docs(spark, tmp_path, rows)
    got = {
        (r["media_id_a"], r["media_id_b"]): r
        for r in mm8_audio_fingerprint_neardup(spark, sf).collect()
    }
    assert set(got) == {(1, 1), (3, 4)}
    self_row = got[(1, 1)]  # the clone cluster, rep = min id
    assert self_row["n_a"] == 2 and self_row["containment_bp"] == 10000
    pair = got[(3, 4)]
    assert pair["containment_bp"] == 10000  # trim's shingles ⊂ full's
    assert pair["nf_b"] == MM8_MIN_SHINGLES  # right at the gate line
    assert pair["shared_shingles"] == min(pair["nf_a"], pair["nf_b"])


def test_mm8_short_clips_are_unfingerprintable(spark, tmp_path):
    """Clips below MM8_MIN_SHINGLES never pair — even a byte-identical
    short clone is excluded (too little signal to assert containment),
    which is what kept 125 chance pairs out of the sf0.01 output."""
    from mirrulations_iceberg_spark.operators.multimodal import (
        MM8_FRAME,
        mm8_audio_fingerprint_neardup,
    )

    short = "a" * (6 * MM8_FRAME)  # 6 frames -> 3 shingles < 8
    rows = [(1, short, "en", "src2"), (2, short, "en", "src2")]
    sf = _write_docs(spark, tmp_path, rows)
    assert mm8_audio_fingerprint_neardup(spark, sf).count() == 0


def test_mm6_swap_point_accepts_real_decoder():
    """VERDICT r14 #8 (skipped while the container ships no codec
    libs): prove the mm6 stub swap point compiles against a REAL
    decoder. The function to replace is
    ``multimodal._ahash_lanes(payloads) -> DataFrame[s0, s1]`` — this
    test implements it with PIL (decode -> 8x8 grayscale -> aHash ->
    the same two 32-bit lane packing) and asserts the contract the
    pipeline relies on: byte-identical re-uploads hash equal (the
    exact-collapse stage), and a lightly-corrupted re-encode lands
    within the pigeonhole-guaranteed Hamming radius (MM6_BANDS - 1).
    The sibling swap points are ``_audio_symbols`` (mm8) and the frame
    md5 in mm7 step 1 — same drill: replace the function, keep the
    schema, everything downstream is unchanged.

    NOTE scope: monkeypatching the stub cannot drive the full
    mapInPandas pipeline here — executors re-import the module, so a
    driver-side patch does not propagate; swapping for real means
    editing the function (or injecting via spark-submit --py-files),
    which is exactly what this test documents.
    """
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    import pandas as pd

    from mirrulations_iceberg_spark.operators.multimodal import (
        MM6_BANDS,
        MM6_CELLS,
    )

    def _ahash_lanes_pil(payloads: pd.Series) -> pd.DataFrame:
        """Drop-in replacement for multimodal._ahash_lanes."""
        s0s, s1s = [], []
        for p in payloads:
            img = (
                PIL_Image.open(io.BytesIO(bytes(p)))
                .convert("L")
                .resize((8, 8))
            )
            cells = list(img.getdata())
            mf = sum(cells) // MM6_CELLS
            s0s.append(
                sum(1 << (i - 1) for i in range(1, 33) if cells[i - 1] > mf)
            )
            s1s.append(
                sum(1 << (i - 33) for i in range(33, 65) if cells[i - 1] > mf)
            )
        return pd.DataFrame({"s0": s0s, "s1": s1s})

    def png_bytes(pixels) -> bytes:
        img = PIL_Image.new("L", (64, 64))
        img.putdata(pixels)
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()

    # structured gradient: a nontrivial aHash (half the cells above
    # the mean), not a constant image whose hash is all-zero
    base_px = [(x * 4 + y * 2) % 256 for y in range(64) for x in range(64)]
    corrupt_px = list(base_px)
    for k in range(0, 64):  # one corrupted scanline: a mild re-encode
        corrupt_px[32 * 64 + k] = (corrupt_px[32 * 64 + k] + 24) % 256
    clone, original, corrupted = (
        png_bytes(base_px),
        png_bytes(base_px),
        png_bytes(corrupt_px),
    )
    lanes = _ahash_lanes_pil(pd.Series([original, clone, corrupted]))
    assert lanes.dtypes.tolist() == [lanes["s0"].dtype] * 2  # two lanes
    o, c, x = (
        (int(lanes["s0"][i]), int(lanes["s1"][i])) for i in range(3)
    )
    assert o == c  # byte-identical copy -> exact-collapse cluster
    hamming = bin(o[0] ^ x[0]).count("1") + bin(o[1] ^ x[1]).count("1")
    assert 0 < hamming <= MM6_BANDS - 1  # within guaranteed recall


def test_e19_engineered_ablation_accounting(spark, tmp_path):
    """The ablation arithmetic on a hand-built corpus where every doc's
    fate is known: doc 1 passes everything, doc 2 fails ONLY min_tokens
    (unique kill), doc 3 fails ONLY alpha_ratio (unique kill), doc 4
    fails ONLY max_token_share (unique kill), doc 5 fails min_tokens
    AND alpha_ratio (shared kill — unique for neither). Zero-token docs
    must fail, not vanish: doc 6 is punctuation-only and fails
    min_tokens+alpha+mean_len (shared)."""
    from mirrulations_iceberg_spark.operators.etl import (
        e19_filter_ablation,
    )

    # 30 DISTINCT 5-char tokens: share 333bp, alpha 8379bp, len 50 deci
    pass_all = " ".join(f"abc{i:02d}" for i in range(30))
    short = " ".join(f"tok{i:02d}x" for i in range(10))  # 10 distinct
    # alpha: tokens are 7 chars, 10 tokens = 70 alpha / 79 chars = 8860 OK
    # share: 1000bp OK; mean len 70/10=7.0 (70 deci) OK -> fails ONLY min_tokens
    low_alpha = " ".join(
        f"w{i:02d}" for i in range(30)
    ) + "!!!" * 30  # 30 distinct 4-char tokens + 90 punct chars
    # alpha = 120 / (30*4 + 29 + 90=239) = 5020bp FAIL; tokens 30 OK;
    # share 333bp OK; mean len 40 deci < 42? 120*10/30 = 40 -> FAILS len too!
    low_alpha = " ".join(
        f"word{i:02d}" for i in range(30)
    ) + "!!!" * 40  # 30 tokens of 6 chars = 180 alpha
    # chars = 180 + 29 spaces + 120 punct = 329 -> 5471bp FAIL alpha;
    # mean len 60 deci OK; share 333 OK; tokens 30 OK -> alpha only
    top_heavy = " ".join(["abcdef"] * 10 + [f"zz{i:02d}qq" for i in range(20)])
    # 30 tokens, top share = 10/30 = 3333bp FAIL; alpha = 180/209=8612 OK;
    # mean len 60 OK -> share only
    both = " ".join(f"y{i}" for i in range(10)) + " " + "???" * 40
    # 10 tokens (2-3 chars): min_tokens FAIL; alpha small FAIL;
    # mean len ~25 deci FAIL too -> 3-way shared; fine, assert not-unique
    punct_only = "?!... ---"
    rows = [
        (1, pass_all, "en", "src0"),
        (2, short, "en", "src0"),
        (3, low_alpha, "en", "src0"),
        (4, top_heavy, "en", "src0"),
        (5, both, "en", "src0"),
        (6, punct_only, "en", "src0"),
    ]
    sf = _write_docs(spark, tmp_path, rows)
    got = {
        r["component"]: r for r in e19_filter_ablation(spark, sf).collect()
    }
    assert got["ensemble"]["n_docs"] == 6
    assert got["ensemble"]["n_fail"] == 5  # everyone but doc 1
    # unique kills: docs 2 (min_tokens), 3 (alpha), 4 (share)
    assert got["ensemble"]["n_unique_fail"] == 3
    assert got["min_tokens"]["n_unique_fail"] == 1
    assert got["alpha_ratio"]["n_unique_fail"] == 1
    assert got["max_token_share"]["n_unique_fail"] == 1
    assert got["mean_token_len"]["n_unique_fail"] == 0
    # shared kills count in n_fail: docs 2,5,6 fail min_tokens
    assert got["min_tokens"]["n_fail"] == 3
    assert got["ensemble"]["fail_bp"] == (10000 * 5) // 6


def test_t23_engineered_disjoint_alphabets(spark, tmp_path):
    """Language-ID semantics on a corpus with REAL language signal:
    two artificial languages over disjoint alphabets train separable
    trigram models, so the confusion matrix must be perfectly
    diagonal (share_bp 10000 on both diagonal cells). A third set of
    sub-gram-length docs carries no evidence and must be excluded."""
    from mirrulations_iceberg_spark.operators.text import (
        t23_char_ngram_langid,
    )

    aa = " ".join("abcab bacba cabac".split() * 8)   # alphabet {a,b,c}
    zz = " ".join("xyzxy zyxzy yxzyx".split() * 8)   # alphabet {x,y,z}
    rows = (
        [(i, aa + f" ab{i}ca", "aa", "src0") for i in range(6)]
        + [(10 + i, zz + f" xy{i}zx", "zz", "src0") for i in range(6)]
        + [(20, "hi", "aa", "src0")]  # shorter than one trigram
    )
    sf = _write_docs(spark, tmp_path, rows)
    got = {
        (r["true_lang"], r["pred_lang"]): r
        for r in t23_char_ngram_langid(spark, sf).collect()
    }
    assert set(got) == {("aa", "aa"), ("zz", "zz")}
    assert got[("aa", "aa")]["n_docs"] == 6
    assert got[("zz", "zz")]["n_docs"] == 6
    assert got[("aa", "aa")]["share_bp"] == 10000
    assert got[("zz", "zz")]["share_bp"] == 10000


def test_containment_helper_plan_is_bounded(spark):
    """The shared mm7/mm8 pairing machinery must never degenerate into
    a cartesian/broadcast-nested-loop product: the pair generator is an
    EQUI-join on the element hash, and the hot-postings cap is a
    left-anti join — assert both on the physical plan of the helper's
    output (mm7/mm8 themselves are SKIP_SWEEP'd as construction-heavy,
    so the plan sweep never sees this shape)."""
    from mirrulations_iceberg_spark.operators.multimodal import (
        signature_containment_pairs,
    )

    frames = spark.createDataFrame(
        [(i, f"h{i % 7}") for i in range(40)], "media_id long, fhash string"
    )
    out, clusters = signature_containment_pairs(frames, 5000, 64)
    plan = out._jdf.queryExecution().executedPlan().toString()
    clusters.unpersist()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "LeftAnti" in plan  # the hot-postings cap join
