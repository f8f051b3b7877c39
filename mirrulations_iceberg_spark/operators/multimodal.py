"""Multimodal columns: opaque binary payloads + typed metadata.

A training-data pipeline carries images/audio/video as ``binary``
columns with typed metadata structs. The real decode libraries are not
in this container, so the DECODE step is stubbed (deterministic fake
behind ``try: import``) — but everything Spark-side is real and tested:
schema, batch shape, Arrow transfer, partitioning, and the JVM-side
byte operators.

Fixture stand-in: ``documents.text`` encoded as UTF-8 bytes plays the
payload role, so every query is deterministic and (where the engines
share byte ops) DuckDB-oracle-checkable.

Operator design:

* **mm1 manifest** — pure built-ins over binary (`octet_length`, `md5`,
  `substring`): JVM-side, codegen'd, no Python in the hot path.
* **mm2 feature extraction** — ``mapInPandas``: payloads arrive as an
  Arrow batch, features computed vectorized per batch. This is the
  pattern for any real decoder (PIL/torchvision/ffmpeg): swap
  ``_extract_features`` and the plumbing is unchanged.
* **mm3 frame sampling** — byte-range frame extraction with
  ``F.substring`` on binary: pure JVM expressions; "frames" are fixed-
  stride byte windows, exactly how a real fixed-size-frame codec is
  strided.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table
from .dedup import parallelize_scan

try:  # real decoders are not shipped in this container
    import PIL.Image  # noqa: F401

    HAVE_IMAGE_LIBS = True
except ImportError:
    HAVE_IMAGE_LIBS = False

FRAME_BYTES = 64  # stand-in fixed frame stride for mm3
FRAME_SAMPLE_EVERY = 4


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → media rows: (media_id, kind, payload binary, meta).

    The kind is derived from the source column so the fixture exercises
    a mixed-modality table; meta is the typed struct a real pipeline
    stores next to the blob.
    """
    docs = parallelize_scan(load_table(spark, sf_dir, "documents"))
    payload = F.encode(F.col("text"), "UTF-8")
    kind_num = F.expr("CAST(substring(source, 4) AS INT) % 3")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(kind_num == 0, "image")
        .when(kind_num == 1, "video")
        .otherwise("audio")
        .alias("kind"),
        payload.alias("payload"),
        F.struct(
            F.col("lang").alias("container"),
            F.col("n_chars").cast("long").alias("declared_bytes"),
        ).alias("meta"),
    )


def mm1_media_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-kind manifest: counts, byte totals, distinct fingerprints —
    all JVM-side binary built-ins, one aggregate."""
    media = media_table(spark, sf_dir)
    return media.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.octet_length("payload").cast("long")).alias("total_bytes"),
        F.max(F.octet_length("payload")).alias("max_bytes"),
        F.countDistinct(F.md5("payload")).alias("n_distinct_payloads"),
    )


def _extract_features(payloads: pd.Series) -> pd.DataFrame:
    """STUB DECODE: deterministic per-payload byte statistics standing
    in for a real decoder's output. With image libs installed this is
    where PIL/torchvision decode the bytes; the surrounding Spark
    plumbing (Arrow batch in, feature frame out) stays identical."""
    import numpy as np

    n_bytes, mean_b, max_b, entropy = [], [], [], []
    for p in payloads:
        arr = np.frombuffer(p, dtype=np.uint8)
        n_bytes.append(len(arr))
        mean_b.append(float(arr.mean()) if len(arr) else 0.0)
        max_b.append(int(arr.max()) if len(arr) else 0)
        counts = np.bincount(arr, minlength=256) if len(arr) else np.zeros(256)
        probs = counts[counts > 0] / max(len(arr), 1)
        entropy.append(float(-(probs * np.log2(probs)).sum()) if len(arr) else 0.0)
    return pd.DataFrame(
        {
            "n_bytes": n_bytes,
            "mean_byte": mean_b,
            "max_byte": max_b,
            "byte_entropy": entropy,
        }
    )


def decode_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: one Arrow batch of payloads in,
    one feature frame out. Pure projection — no shuffle; parallelism is
    the scan's."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = _extract_features(pdf["payload"])
            out = pd.concat(
                [pdf[["media_id", "kind"]].reset_index(drop=True), feats], axis=1
            )
            yield out

    schema = (
        "media_id long, kind string, n_bytes long, mean_byte double, "
        "max_byte int, byte_entropy double"
    )
    return media.mapInPandas(run, schema)


def mm2_feature_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode (stub) every payload via mapInPandas, aggregate per kind.
    Oracle: a pure-SQL DuckDB twin of the byte statistics — the
    Python/Arrow path is differentially checked, not just smoke-run."""
    feats = decode_features(media_table(spark, sf_dir))
    return feats.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.avg("mean_byte"), 4).alias("avg_mean_byte"),
        F.round(F.avg("byte_entropy"), 4).alias("avg_entropy"),
    )


RESIZE_TARGET = (8, 8)


def _strided_thumbnail(p: bytes, n_out: int) -> bytes:
    """Deterministic stand-in thumbnail: a strided byte sample of the
    payload, always exactly ``n_out`` bytes."""
    import numpy as np

    arr = np.frombuffer(p, dtype=np.uint8)
    if len(arr) == 0:
        return bytes(n_out)
    idx = (np.arange(n_out) * len(arr)) // n_out
    return arr[idx].tobytes()


def _thumb_batch(payloads) -> list[bytes]:
    """One Arrow batch of payloads → fixed-size thumbnails.

    With PIL installed, decodable payloads decode → grayscale →
    resize → raw bytes (exactly ``h*w``); payloads PIL cannot parse
    (including this repo's UTF-8 fixture bytes) and PIL-less
    environments both take the deterministic strided sample, so output
    — and the DuckDB oracle — is identical with or without the
    library. Module-level so workers resolve it by import (fresh
    ``HAVE_IMAGE_LIBS`` probe per worker) and tests can drive both
    branches in-process.
    """
    h, w = RESIZE_TARGET
    n_out = h * w
    out = []
    if HAVE_IMAGE_LIBS:
        import io

        import PIL.Image
    for p in payloads:
        if HAVE_IMAGE_LIBS:
            try:
                img = PIL.Image.open(io.BytesIO(p))
                out.append(img.convert("L").resize((w, h)).tobytes())
                continue
            except Exception:  # noqa: BLE001 — not a decodable image
                pass
        out.append(_strided_thumbnail(p, n_out))
    return out


def resize_images(media: DataFrame) -> DataFrame:
    """Image resize via mapInPandas: binary in, fixed-size binary
    thumbnail + dims out (decode semantics in :func:`_thumb_batch`)."""
    h, w = RESIZE_TARGET

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "thumb": _thumb_batch(pdf["payload"]),
                    "thumb_h": h,
                    "thumb_w": w,
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(
        run, "media_id long, thumb binary, thumb_h int, thumb_w int"
    )


def mm5_resize_thumbs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image resize as a driver-checked pipeline stage: every 'image'
    payload through the mapInPandas resize (stub decode → fixed 8×8
    thumbnail, :func:`_thumb_batch`), then the THUMBNAIL BYTES are
    verified JVM-side — ``octet_length`` pins the exact h·w size
    contract and a position-weighted byte checksum pins the content —
    so the Arrow round trip of the produced binary itself is what the
    oracle checks, not a Python-side summary of it.

    Oracle: DuckDB reproduces the strided sample byte-for-byte via
    ``ord(substr(...))`` (1-byte-UTF-8 fixture text, the mm3
    assumption: byte and char indices agree). With PIL installed the
    stub branch never fires for real images; fixture payloads are not
    decodable images, so both environments take the deterministic
    strided path and the oracle holds either way.
    """
    h, w = RESIZE_TARGET
    n_out = h * w
    thumbs = resize_images(media_table(spark, sf_dir))
    checksum = F.expr(
        f"aggregate(sequence(1, {n_out}), CAST(0 AS BIGINT), (acc, i) -> "
        "acc + i * CAST(conv(hex(substring(thumb, i, 1)), 16, 10) AS BIGINT))"
    )
    return thumbs.select(
        "media_id",
        F.octet_length("thumb").alias("thumb_bytes"),
        checksum.alias("thumb_checksum"),
    )


def mm3_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample every k-th fixed-stride frame from 'video' payloads with
    JVM byte slicing (substring on binary) — no Python, no decode.
    Returns per-video sampled-frame fingerprints."""
    media = media_table(spark, sf_dir).filter(F.col("kind") == "video")
    n_frames = F.floor(F.octet_length("payload") / FRAME_BYTES).cast("int")
    frames = media.select(
        "media_id",
        n_frames.alias("n_frames"),
        F.posexplode(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.greatest(
                        F.ceil(n_frames / FRAME_SAMPLE_EVERY).cast("int") - 1, F.lit(0)
                    ),
                ),
                lambda i: F.substring(
                    F.col("payload"), i * FRAME_SAMPLE_EVERY * FRAME_BYTES + 1, FRAME_BYTES
                ),
            )
        ).alias("frame_idx", "frame"),
    )
    return frames.groupBy("media_id").agg(
        F.max("n_frames").alias("n_frames"),
        F.count(F.lit(1)).alias("n_sampled"),
        F.countDistinct(F.md5("frame")).alias("n_distinct_frames"),
    )


def mm4_audio_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature extraction (stub decode): treat each 'audio'
    payload as an 8-bit PCM waveform and compute per-64-byte-frame RMS
    energy — the frame-level feature a real pipeline derives after
    decoding. Arrow-batched ``mapInPandas`` with vectorized numpy
    (reshape + row sums), parallelism = the scan's.

    Oracle-checkable Python path: all accumulation is INTEGER (sums of
    squared byte values — exact in both engines), and the only float
    steps (one division, one sqrt, one round) are bit-identical, so a
    pure-SQL DuckDB twin reproduces every value. With audio libs
    installed the stub is where the real decoder goes; the plumbing
    (schema, batching, truncate-to-frames) is the production shape.
    """
    media = media_table(spark, sf_dir).filter(F.col("kind") == "audio")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [], "n_frames": [], "rms": [], "peak_frame_rms": []
            }
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                arr = np.frombuffer(p, dtype=np.uint8).astype(np.int64)
                n = (len(arr) // FRAME_BYTES) * FRAME_BYTES
                frames = arr[:n].reshape(-1, FRAME_BYTES)
                frame_sq_sums = (frames * frames).sum(axis=1)
                out["media_id"].append(mid)
                out["n_frames"].append(frames.shape[0])
                out["rms"].append(
                    round(float((int(frame_sq_sums.sum()) / n) ** 0.5), 4)
                    if n else 0.0
                )
                out["peak_frame_rms"].append(
                    round(
                        float((int(frame_sq_sums.max()) / FRAME_BYTES) ** 0.5), 4
                    )
                    if frames.shape[0] else 0.0
                )
            yield pd.DataFrame(out)

    return media.mapInPandas(
        run, "media_id long, n_frames int, rms double, peak_frame_rms double"
    )


MM6_CELLS = 64  # aHash grid: 64 strided sample cells -> 64 sign bits
#: Near-dup Hamming threshold over the 64-bit hash. A true re-encode
#: of the same image lands within a few bits (the pytest pins 0 for a
#: byte-identical copy and <= radius for a lightly-corrupted one);
#: the synthetic corpus has no re-encodes — its closest natural pairs
#: sit at h ≈ 10-13 — so the fixture radius is set to surface that
#: nearest tail and keep the driver row non-empty. Production tunes
#: this to 3-6; the banding guarantee (pigeonhole over MM6_BANDS
#: bands) holds for h <= MM6_BANDS - 1 at any setting.
MM6_RADIUS = 12
#: Band count for the Hamming-LSH candidate join. 8 bands of 8 bits
#: pigeonhole-guarantee every pair at Hamming <= 7 (ADVICE r13 raised
#: this from 4×16, which only guaranteed <= 3); pairs at 8..MM6_RADIUS
#: are best-effort recall — found iff some 8-bit band survives intact.
#: That residual gap is part of mm6's OUTPUT CONTRACT (see docstring).
MM6_BANDS = 8
MM6_BAND_BITS = 64 // MM6_BANDS
MM6_BAND_MOD = 1 << MM6_BAND_BITS


def _ahash_lanes(payloads: pd.Series) -> pd.DataFrame:
    """STUB DECODE for mm6: deterministic average-hash over a strided
    byte sample — the 8×8-luma-grid aHash shape with the real decoder
    swapped for the byte stream (with PIL installed, replace the cell
    extraction with `Image.resize((8, 8)).convert('L')` and the rest —
    packing, banding, Hamming — is unchanged). Cell i (1-based) is the
    byte at offset ((i−1)·n) // 64; a bit is set when its cell exceeds
    the integer-floor mean; bits pack 32 per positive BIGINT lane (the
    x22 layout, so the Hamming join reuses bit_count(XOR))."""
    s0s, s1s = [], []
    for p in payloads:
        n = len(p)
        if n == 0:
            s0s.append(0)
            s1s.append(0)
            continue
        cells = [p[((i - 1) * n) // MM6_CELLS] for i in range(1, MM6_CELLS + 1)]
        mf = sum(cells) // MM6_CELLS
        s0s.append(sum(1 << (i - 1) for i in range(1, 33) if cells[i - 1] > mf))
        s1s.append(sum(1 << (i - 33) for i in range(33, 65) if cells[i - 1] > mf))
    return pd.DataFrame({"s0": s0s, "s1": s1s})


def mm6_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-duplicate detection over the image payloads
    — the visual twin of d3's text MinHash: every production image
    corpus dedups by a perceptual hash (aHash/pHash/dHash), because
    byte-identical dedup (mm1's md5) misses re-encodes and resizes.

    Pipeline: stub decode → 64-bit aHash per image (mapInPandas, one
    Arrow batch in, two BIGINT lanes out — a pure projection, no
    shuffle); then the SCALE path: the hash splits into ``MM6_BANDS``
    (8) bands of 8 bits, and candidates come from band-value
    equi-joins, never an all-pairs product. By pigeonhole a pair
    within Hamming radius ``MM6_BANDS - 1`` (7) ALWAYS shares an
    intact band (≤7 differing bits corrupt ≤7 of 8 bands).

    OUTPUT CONTRACT (recall): pairs at Hamming ≤ 7 are EXHAUSTIVE;
    pairs at Hamming 8..``MM6_RADIUS`` (12) are BEST-EFFORT — emitted
    iff some 8-bit band survives intact, the standard LSH-for-Hamming
    trade (the recall/cost dial is the band count; 4×16 bands, the
    pre-r14 setting, only guaranteed radius 3 — ADVICE r13). Consumers
    needing exhaustive radius-12 recall must raise ``MM6_BANDS`` to 16
    (4-bit bands) and pay the larger candidate join.

    Identical hashes EXACT-COLLAPSE into clusters before anything
    quadratic runs (the d15b/d16 staging): re-uploads and replicas —
    the dominant duplication mode in a real image corpus — become one
    cluster row each, the band join sees only DISTINCT hashes (cost
    bounded by unique content, invariant under duplication), and
    exact Hamming (`bit_count(XOR)` per lane — integer codegen) keeps
    cluster pairs ≤ radius. Output: one self-row per exact-hash
    cluster of size > 1 (``media_id_a == media_id_b``, hamming 0,
    n = members) plus one row per near-dup CLUSTER pair with both
    member counts — replication-invariant where a per-image pair list
    is clone-quadratic (the naive shape measured 44.5× at
    100×-clones before this collapse); a consumer expands member
    pairs only where it must.

    Oracle: decode + hash + banding + Hamming replayed in DuckDB
    (`ord(substr(...))` strided cells — the mm5 byte-parity idiom —
    integer lane sums, `xor`/`bit_count`).
    """
    media = media_table(spark, sf_dir).filter(F.col("kind") == "image")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lanes = _ahash_lanes(pdf["payload"])
            yield pd.concat(
                [pdf[["media_id"]].reset_index(drop=True), lanes], axis=1
            )

    lanes = media.mapInPandas(run, "media_id long, s0 long, s1 long")
    # Exact-collapse FIRST (the d15b/d16 lesson): identical hashes —
    # which is what replicated/re-uploaded images are — collapse to
    # one cluster row before anything quadratic runs. The band join
    # then operates on DISTINCT hashes, so its cost is bounded by
    # unique content and is invariant under duplication; measured
    # 44.5× at 100×-clones for the naive per-image pair list vs ~1×
    # for this shape.
    clusters = (
        lanes.groupBy("s0", "s1")
        .agg(
            F.min("media_id").alias("rep"),
            F.count(F.lit(1)).alias("n"),
        )
        .cache()
    )
    self_rows = clusters.filter(F.col("n") > 1).select(
        F.col("rep").alias("media_id_a"),
        F.col("rep").alias("media_id_b"),
        F.lit(0).cast("long").alias("hamming"),
        F.col("n").alias("n_a"),
        F.col("n").alias("n_b"),
    )
    bands = clusters.select(
        "rep",
        "s0",
        "s1",
        "n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("bi"),
                        F.expr(
                            f"({lane} DIV {MM6_BAND_MOD ** (bi % (MM6_BANDS // 2))})"
                            f" % {MM6_BAND_MOD}"
                        ).alias("bv"),
                    )
                    for lane, base in (("s0", 0), ("s1", MM6_BANDS // 2))
                    for bi in range(base, base + MM6_BANDS // 2)
                ]
            )
        ).alias("b"),
    ).select(
        "rep", "s0", "s1", "n",
        F.col("b.bi").alias("bi"), F.col("b.bv").alias("bv"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.bi") == F.col("b.bi"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.rep") < F.col("b.rep")),
        )
        .select(
            F.col("a.rep").alias("id_a"),
            F.col("b.rep").alias("id_b"),
            F.col("a.s0").alias("a0"),
            F.col("a.s1").alias("a1"),
            F.col("b.s0").alias("b0"),
            F.col("b.s1").alias("b1"),
            F.col("a.n").alias("n_a"),
            F.col("b.n").alias("n_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    near_rows = (
        cand.withColumn(
            "hamming",
            F.bit_count(F.col("a0").bitwiseXOR(F.col("b0")))
            + F.bit_count(F.col("a1").bitwiseXOR(F.col("b1"))),
        )
        .filter(F.col("hamming") <= MM6_RADIUS)
        .select(
            F.col("id_a").alias("media_id_a"),
            F.col("id_b").alias("media_id_b"),
            F.col("hamming").cast("long").alias("hamming"),
            "n_a",
            "n_b",
        )
    )
    out = self_rows.unionByName(near_rows).orderBy(
        "media_id_a", "media_id_b"
    )
    from .util import materialize_release

    return materialize_release(spark, out, clusters)


#: mm7 tuning: minimum frame-set containment to report a pair, and the
#: hot-frame postings cap (a frame hash shared by more reps than this
#: — intros, black frames, test cards — is dropped from pairing, the
#: d2b hot-shingle discipline; deterministic, so the oracle replays it).
MM7_MIN_BP = 5000
MM7_MAX_POSTINGS = 64


def mm7_video_framesig_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video near-duplicate detection by FRAME-SIGNATURE containment —
    the modality-dedup matrix's third member (mm1 exact bytes, mm6
    image perceptual hash, mm7 video): a re-encoded/trimmed upload of
    the same footage shares most of its sampled frames, so videos pair
    when ``shared_frames / min(|A|, |B|)`` — set containment, robust
    to one side being a longer cut — exceeds ``MM7_MIN_BP``.

    Pipeline, every stage the 100 TB shape:

    1. frame sampling is mm3's: every ``FRAME_SAMPLE_EVERY``-th
       ``FRAME_BYTES`` stride of the payload, JVM byte slicing, hashed
       to a 128-bit md5 per frame — a pure projection, no Python, no
       shuffle; DISTINCT (video, frame-hash) gives set semantics.
    2. EXACT-COLLAPSE first (the mm6/d15b staging): videos with an
       identical full signature (md5 over the sorted frame-hash set)
       collapse to one representative before anything pairwise runs —
       re-uploads cost one cluster row, and pairing cost is bounded by
       distinct content.
    3. the pair generator is an inverted-index equi-join on frame
       hash — only reps sharing at least one frame ever meet, never an
       all-pairs product — with a deterministic hot-frame cap
       (``MM7_MAX_POSTINGS``): a frame hash present in more reps than
       the cap (station idents, black frames) is excluded from
       pairing, the d2b bounded-bucket discipline.

    Output: one self-row per exact-signature cluster of size > 1
    (containment 10000) plus one row per rep pair at containment ≥
    ``MM7_MIN_BP``, with both frame-set sizes and cluster sizes. On
    the fixture the byte-stub decode only aligns frames of exact text
    clones, so all pairs sit at 10000 — a real decoder's shot
    normalization is what produces the 5000..9999 band; the plumbing
    and arithmetic are identical (stub swap point = the frame hash).

    Oracle: the same sampling/md5/containment replayed over character
    arithmetic (the mm5 byte-parity idiom, guarded ASCII-only by
    ``tests/test_multimodal.py``).
    """
    media = media_table(spark, sf_dir).filter(F.col("kind") == "video")
    stride = FRAME_SAMPLE_EVERY * FRAME_BYTES
    n = F.octet_length("payload")
    raw_frames = media.filter(n >= FRAME_BYTES).select(
        "media_id",
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.floor((n - FRAME_BYTES) / stride).cast("int"),
                ),
                lambda i: F.md5(
                    F.substring(
                        F.col("payload"),
                        i * stride + 1,
                        FRAME_BYTES,
                    )
                ),
            )
        ).alias("fhash"),
    )
    out, clusters = signature_containment_pairs(
        raw_frames, MM7_MIN_BP, MM7_MAX_POSTINGS
    )
    from .util import materialize_release

    return materialize_release(spark, out, clusters)


def signature_containment_pairs(
    raw_frames: DataFrame,
    min_bp: int,
    max_postings: int,
    min_nf: int = 1,
    shared_col: str = "shared_frames",
) -> tuple[DataFrame, DataFrame]:
    """The containment-dedup machinery shared by mm7 (video frame
    hashes) and mm8 (audio fingerprint shingles): exact-signature
    collapse → inverted-index equi-join with the hot-postings cap →
    exact containment in basis points. Input is any (media_id, fhash)
    element stream; ``min_nf`` drops items whose signature set is too
    small to fingerprint reliably (mm8's gate — a 2-shingle clip
    "contains" anything by chance; mm7 passes 1). Returns (output,
    clusters-cache) — the caller releases via materialize_release.

    ONE exchange for the whole signature stage: collect_set gives
    SET semantics in the aggregate itself (map-side partials dedup
    before the shuffle), so no separate distinct() pass over the
    element stream — measured 2.5× vs DuckDB at 5M docs with the
    two-shuffle shape this replaced. Per-item sets are bounded by
    payload length / stride, so the arrays stay small.
    """
    per_item = (
        raw_frames.groupBy("media_id")
        .agg(F.collect_set("fhash").alias("fset"))
        .select(
            "media_id",
            F.size("fset").cast("long").alias("nf"),
            F.md5(F.array_join(F.array_sort("fset"), "")).alias("sig"),
            "fset",
        )
        .filter(F.col("nf") >= min_nf)
    )
    clusters = (
        per_item.groupBy("sig")
        .agg(
            F.min("media_id").alias("rep"),
            F.count(F.lit(1)).alias("n"),
            F.min("nf").alias("nf"),
            F.min_by("fset", "media_id").alias("fset"),
        )
        .cache()
    )
    self_rows = clusters.filter(F.col("n") > 1).select(
        F.col("rep").alias("media_id_a"),
        F.col("rep").alias("media_id_b"),
        F.col("nf").alias(shared_col),
        F.col("nf").alias("nf_a"),
        F.col("nf").alias("nf_b"),
        F.lit(10000).cast("long").alias("containment_bp"),
        F.col("n").alias("n_a"),
        F.col("n").alias("n_b"),
    )
    # postings explode only the |distinct signatures| rep rows — the
    # pair stage's input is bounded by unique content, not corpus size
    postings = clusters.select(
        F.col("rep").alias("media_id"),
        "nf",
        "n",
        F.explode("fset").alias("fhash"),
    )
    hot = (
        postings.groupBy("fhash")
        .agg(F.count(F.lit(1)).alias("__deg"))
        .filter(F.col("__deg") > max_postings)
        .select("fhash")
    )
    kept = postings.join(hot, "fhash", "left_anti")
    a, b = kept.alias("a"), kept.alias("b")
    near_rows = (
        a.join(
            b,
            (F.col("a.fhash") == F.col("b.fhash"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .groupBy(
            F.col("a.media_id").alias("media_id_a"),
            F.col("b.media_id").alias("media_id_b"),
            F.col("a.nf").alias("nf_a"),
            F.col("b.nf").alias("nf_b"),
            F.col("a.n").alias("n_a"),
            F.col("b.n").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).alias(shared_col))
        .withColumn(
            "containment_bp",
            F.expr(
                f"CAST((10000 * {shared_col}) DIV LEAST(nf_a, nf_b)"
                " AS BIGINT)"
            ),
        )
        .filter(F.col("containment_bp") >= min_bp)
        .select(
            "media_id_a",
            "media_id_b",
            shared_col,
            "nf_a",
            "nf_b",
            "containment_bp",
            "n_a",
            "n_b",
        )
    )
    out = self_rows.unionByName(near_rows).orderBy(
        "media_id_a", "media_id_b"
    )
    return out, clusters


#: mm8 audio fingerprint geometry. Analysis frame (bytes of "PCM"),
#: quantizer alphabet size and its CLAMP range — chosen for the ASCII
#: stub's energy band (measured sf0.1 frame square-sums: p1=135k,
#: p99=175k — a [130k, 180k) range spreads real frames over ~7 levels;
#: a real decoder quantizes chroma/mel bins instead, same plumbing).
#: Shingle width (consecutive quantized symbols per fingerprint
#: element — temporal structure, the Chromaprint idea), the minimum
#: signature size to participate in pairing (a 2-shingle clip
#: "contains" anything by chance; short audio is unfingerprint-able,
#: the Chromaprint minimum-duration stance), and mm7's containment
#: threshold / hot-postings cap.
MM8_FRAME = 16
MM8_LEVELS = 8
MM8_Q_LO = 130_000
MM8_Q_HI = 180_000
MM8_ALPHABET = "01234567"
MM8_SHINGLE = 4
MM8_MIN_SHINGLES = 8
MM8_MIN_BP = 5000
MM8_MAX_POSTINGS = 64


def _audio_symbols(payloads: pd.Series) -> list[str]:
    """STUB DECODE for mm8: per-frame energy quantized to a small
    alphabet — the Chromaprint shape (decode → per-frame feature →
    quantize → symbol string) with byte energy standing in for chroma
    features. Vectorized per payload: reshape to frames, integer
    square-sums (exact in both engines), clamp-then-divide quantizer
    (clamping FIRST keeps the division non-negative, so truncation is
    unambiguous across numpy / DuckDB). With audio libs installed the
    real decoder replaces THIS function; everything downstream
    (shingling, containment) is unchanged."""
    import numpy as np

    out = []
    for p in payloads:
        arr = np.frombuffer(p, dtype=np.uint8).astype(np.int64)
        n = (len(arr) // MM8_FRAME) * MM8_FRAME
        if n == 0:
            out.append("")
            continue
        sq = (arr[:n].reshape(-1, MM8_FRAME) ** 2).sum(axis=1)
        lev = (np.clip(sq, MM8_Q_LO, MM8_Q_HI - 1) - MM8_Q_LO) * MM8_LEVELS // (
            MM8_Q_HI - MM8_Q_LO
        )
        out.append("".join(MM8_ALPHABET[v] for v in lev))
    return out


def mm8_audio_fingerprint_neardup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Audio near-duplicate detection by FINGERPRINT-SHINGLE
    containment — the modality-dedup matrix's last cell (mm1 exact
    bytes, mm6 image perceptual hash, mm7 video frame signatures, mm8
    audio): a re-encoded/trimmed upload of the same recording shares
    most of its fingerprint shingles, so clips pair when
    ``shared_shingles / min(|A|, |B|)`` exceeds ``MM8_MIN_BP`` —
    containment, robust to one side being a longer cut, exactly mm7's
    criterion.

    Pipeline, Chromaprint-shaped end to end:

    1. DECODE+QUANTIZE (:func:`_audio_symbols`, Arrow ``mapInPandas``
       like mm4): per-``MM8_FRAME`` energy → clamp-quantize to
       ``MM8_LEVELS`` symbols → one symbol string per clip. Pure
       projection; the only Python in the operator, the mm2/mm4 stub
       swap point.
    2. SHINGLE (JVM): every ``MM8_SHINGLE``-symbol window, md5-hashed —
       temporal structure, so a reshuffled clip does NOT match (a bag
       of frame energies would). Clips with fewer than
       ``MM8_MIN_SHINGLES`` distinct shingles are dropped as
       unfingerprint-able (too short to assert anything — without the
       gate, 2-shingle clips "contain" by chance: measured 125 junk
       pairs at sf0.01, 4 with it).
    3. PAIR: :func:`signature_containment_pairs` — mm7's machinery
       verbatim (exact-signature collapse before anything pairwise,
       inverted-index equi-join, deterministic hot-postings cap,
       containment in integer basis points).

    Oracle: the same frame energies / quantizer / shingles / pairing
    replayed over character arithmetic (the mm4/mm7 byte-parity idiom,
    ASCII-guarded by ``tests/test_multimodal.py``).

    Reference anchor: the reference carries attachments as opaque
    blobs with no content screen (``convert_to_iceberg.py:956-1121``
    admits files by name); this is the audio admission gate of the
    north-star pipeline's modality matrix.
    """
    media = media_table(spark, sf_dir).filter(F.col("kind") == "audio")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "sym": _audio_symbols(pdf["payload"]),
                }
            )

    fp = media.mapInPandas(run, "media_id long, sym string")
    s = F.col("sym")
    shingles = F.transform(
        F.sequence(F.lit(1), F.length(s) - (MM8_SHINGLE - 1)),
        lambda i: F.md5(s.substr(i, F.lit(MM8_SHINGLE))),
    )
    raw = fp.filter(F.length(s) >= MM8_SHINGLE).select(
        "media_id", F.explode(shingles).alias("fhash")
    )
    out, clusters = signature_containment_pairs(
        raw,
        MM8_MIN_BP,
        MM8_MAX_POSTINGS,
        min_nf=MM8_MIN_SHINGLES,
        shared_col="shared_shingles",
    )
    from .util import materialize_release

    return materialize_release(spark, out, clusters)


QUERIES = {
    "mm1_media_manifest": mm1_media_manifest,
    "mm6_phash_neardup": mm6_phash_neardup,
    "mm7_video_framesig_neardup": mm7_video_framesig_neardup,
    "mm8_audio_fingerprint_neardup": mm8_audio_fingerprint_neardup,
    "mm2_feature_stats": mm2_feature_stats,
    "mm3_frame_sample": mm3_frame_sample,
    "mm4_audio_rms": mm4_audio_rms,
    "mm5_resize_thumbs": mm5_resize_thumbs,
}

_KIND = """
        CASE CAST(substring(source, 4) AS INT) % 3
             WHEN 0 THEN 'image' WHEN 1 THEN 'video' ELSE 'audio' END
"""

#: DuckDB twin of the Spark band explode — generated from the same
#: MM6_BANDS/MM6_BAND_MOD constants so the two sides cannot drift.
_MM6_BANDS_SQL = "\n            UNION ALL\n            ".join(
    f"SELECT rep, s0, s1, n, {bi} AS bi,"
    f" ({lane} // {MM6_BAND_MOD ** (bi % (MM6_BANDS // 2))})"
    f" % {MM6_BAND_MOD} AS bv FROM clusters"
    for lane, base in (("s0", 0), ("s1", MM6_BANDS // 2))
    for bi in range(base, base + MM6_BANDS // 2)
)

_MM7_STRIDE = FRAME_SAMPLE_EVERY * FRAME_BYTES

ORACLE = {
    # mm8: frame energies / clamp-quantizer / shingles / containment
    # replayed over character arithmetic — the mm4 integer-square-sum
    # idiom feeding mm7's pairing SQL (the two stages mm8 composes).
    # Multi-referenced CTEs are MATERIALIZED: DuckDB inlines a CTE per
    # reference, and the pairs self-join re-derives the whole energy
    # chain CONCURRENTLY on both sides — measured OOM at 500k docs
    # un-materialized, 6s materialized (the t17c CTE trap, memory
    # edition).
    "mm8_audio_fingerprint_neardup": f"""
        WITH media AS (
            SELECT doc_id AS media_id, text, LENGTH(text) AS n
            FROM documents
            WHERE {_KIND} = 'audio'
        ), fe AS (
            SELECT media_id, fr,
                   LEAST(GREATEST(
                       list_sum(list_transform(range(1, {MM8_FRAME + 1}), j ->
                           CAST(ord(substr(text,
                               CAST(fr * {MM8_FRAME} + j AS INT), 1)) AS BIGINT)
                           * ord(substr(text,
                               CAST(fr * {MM8_FRAME} + j AS INT), 1)))),
                       {MM8_Q_LO}), {MM8_Q_HI - 1}) AS sqc
            FROM media, UNNEST(range(0, n // {MM8_FRAME})) u(fr)
        ), sym AS (
            SELECT media_id,
                   string_agg(substr('{MM8_ALPHABET}',
                       CAST((sqc - {MM8_Q_LO}) * {MM8_LEVELS}
                            // {MM8_Q_HI - MM8_Q_LO} + 1 AS INT), 1),
                       '' ORDER BY fr) AS s
            FROM fe GROUP BY media_id
        ), sh AS MATERIALIZED (
            SELECT DISTINCT media_id,
                   md5(substr(s, CAST(i AS INT), {MM8_SHINGLE})) AS fhash
            FROM sym, UNNEST(range(1, len(s) - {MM8_SHINGLE} + 2)) u(i)
            WHERE len(s) >= {MM8_SHINGLE}
        ), pv AS (
            SELECT media_id, CAST(COUNT(*) AS BIGINT) AS nf,
                   md5(string_agg(fhash, '' ORDER BY fhash)) AS sig
            FROM sh GROUP BY 1
            HAVING COUNT(*) >= {MM8_MIN_SHINGLES}
        ), clusters AS MATERIALIZED (
            SELECT sig, MIN(media_id) AS rep,
                   CAST(COUNT(*) AS BIGINT) AS n, MIN(nf) AS nf
            FROM pv GROUP BY 1
        ), postings AS MATERIALIZED (
            SELECT c.rep AS media_id, f.fhash, c.nf, c.n
            FROM clusters c JOIN sh f ON f.media_id = c.rep
        ), deg AS (
            SELECT fhash FROM postings
            GROUP BY 1 HAVING COUNT(*) > {MM8_MAX_POSTINGS}
        ), kept AS MATERIALIZED (
            SELECT * FROM postings
            WHERE fhash NOT IN (SELECT fhash FROM deg)
        ), pairs AS (
            SELECT a.media_id AS media_id_a, b.media_id AS media_id_b,
                   CAST(COUNT(*) AS BIGINT) AS shared_shingles,
                   a.nf AS nf_a, b.nf AS nf_b, a.n AS n_a, b.n AS n_b
            FROM kept a JOIN kept b
              ON a.fhash = b.fhash AND a.media_id < b.media_id
            GROUP BY 1, 2, 4, 5, 6, 7
        )
        SELECT rep AS media_id_a, rep AS media_id_b,
               nf AS shared_shingles, nf AS nf_a, nf AS nf_b,
               CAST(10000 AS BIGINT) AS containment_bp, n AS n_a, n AS n_b
        FROM clusters WHERE n > 1
        UNION ALL
        SELECT media_id_a, media_id_b, shared_shingles, nf_a, nf_b,
               CAST((10000 * shared_shingles) // LEAST(nf_a, nf_b)
                    AS BIGINT),
               n_a, n_b
        FROM pairs
        WHERE (10000 * shared_shingles) // LEAST(nf_a, nf_b)
              >= {MM8_MIN_BP}
    """,
    "mm7_video_framesig_neardup": f"""
        WITH media AS (
            SELECT doc_id AS media_id, text, LENGTH(text) AS n
            FROM documents
            WHERE {_KIND} = 'video'
        ), fs AS (
            SELECT DISTINCT media_id,
                   md5(substr(text, CAST(i * {_MM7_STRIDE} AS INT) + 1,
                              {FRAME_BYTES})) AS fhash
            FROM media,
                 UNNEST(range(0, ((n - {FRAME_BYTES}) // {_MM7_STRIDE}) + 1))
                     u(i)
            WHERE n >= {FRAME_BYTES}
        ), pv AS (
            SELECT media_id, CAST(COUNT(*) AS BIGINT) AS nf,
                   md5(string_agg(fhash, '' ORDER BY fhash)) AS sig
            FROM fs GROUP BY 1
        ), clusters AS (
            SELECT sig, MIN(media_id) AS rep,
                   CAST(COUNT(*) AS BIGINT) AS n, MIN(nf) AS nf
            FROM pv GROUP BY 1
        ), postings AS (
            SELECT c.rep AS media_id, f.fhash, c.nf, c.n
            FROM clusters c JOIN fs f ON f.media_id = c.rep
        ), deg AS (
            SELECT fhash FROM postings
            GROUP BY 1 HAVING COUNT(*) > {MM7_MAX_POSTINGS}
        ), kept AS (
            SELECT * FROM postings
            WHERE fhash NOT IN (SELECT fhash FROM deg)
        ), pairs AS (
            SELECT a.media_id AS media_id_a, b.media_id AS media_id_b,
                   CAST(COUNT(*) AS BIGINT) AS shared_frames,
                   a.nf AS nf_a, b.nf AS nf_b, a.n AS n_a, b.n AS n_b
            FROM kept a JOIN kept b
              ON a.fhash = b.fhash AND a.media_id < b.media_id
            GROUP BY 1, 2, 4, 5, 6, 7
        )
        SELECT rep AS media_id_a, rep AS media_id_b,
               nf AS shared_frames, nf AS nf_a, nf AS nf_b,
               CAST(10000 AS BIGINT) AS containment_bp, n AS n_a, n AS n_b
        FROM clusters WHERE n > 1
        UNION ALL
        SELECT media_id_a, media_id_b, shared_frames, nf_a, nf_b,
               CAST((10000 * shared_frames) // LEAST(nf_a, nf_b)
                    AS BIGINT),
               n_a, n_b
        FROM pairs
        WHERE (10000 * shared_frames) // LEAST(nf_a, nf_b)
              >= {MM7_MIN_BP}
    """,
    "mm6_phash_neardup": f"""
        WITH media AS (
            SELECT doc_id AS media_id, text, LENGTH(text) AS n
            FROM documents
            WHERE {_KIND} = 'image'
        ), cells AS (
            SELECT media_id,
                   list_transform(range(1, {MM6_CELLS + 1}), i ->
                       ord(substr(text,
                           CAST(((i - 1) * n) // {MM6_CELLS} AS INT) + 1,
                           1))) AS c
            FROM media WHERE n > 0
        ), meaned AS (
            SELECT media_id, c, list_sum(c) // {MM6_CELLS} AS mf FROM cells
        ), lanes AS (
            SELECT media_id,
                   CAST(list_sum(list_transform(range(1, 33), i ->
                       CASE WHEN c[i] > mf THEN CAST(2 ** (i - 1) AS BIGINT)
                            ELSE 0 END)) AS BIGINT) AS s0,
                   CAST(list_sum(list_transform(range(33, 65), i ->
                       CASE WHEN c[i] > mf THEN CAST(2 ** (i - 33) AS BIGINT)
                            ELSE 0 END)) AS BIGINT) AS s1
            FROM meaned
            UNION ALL
            SELECT media_id, CAST(0 AS BIGINT), CAST(0 AS BIGINT)
            FROM media WHERE n = 0
        ), clusters AS (
            SELECT s0, s1, MIN(media_id) AS rep,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM lanes GROUP BY s0, s1
        ), bands AS (
            {_MM6_BANDS_SQL}
        ), cand AS (
            SELECT DISTINCT a.rep AS id_a, b.rep AS id_b,
                   a.s0 AS a0, a.s1 AS a1, b.s0 AS b0, b.s1 AS b1,
                   a.n AS n_a, b.n AS n_b
            FROM bands a JOIN bands b
              ON a.bi = b.bi AND a.bv = b.bv AND a.rep < b.rep
        )
        SELECT rep AS media_id_a, rep AS media_id_b,
               CAST(0 AS BIGINT) AS hamming, n AS n_a, n AS n_b
        FROM clusters WHERE n > 1
        UNION ALL
        SELECT id_a, id_b,
               CAST(bit_count(xor(a0, b0)) + bit_count(xor(a1, b1))
                    AS BIGINT), n_a, n_b
        FROM cand
        WHERE bit_count(xor(a0, b0)) + bit_count(xor(a1, b1))
              <= {MM6_RADIUS}
        ORDER BY media_id_a, media_id_b
    """,
    # mm5: the strided thumbnail reproduced byte-for-byte — thumb byte i
    # (1-based) samples source byte ((i-1)·n)//64; empty payloads yield
    # 64 zero bytes (checksum 0). Position weight i makes the checksum
    # order-sensitive, so a shuffled-but-same-multiset thumb cannot pass.
    "mm5_resize_thumbs": f"""
        WITH media AS (
            SELECT doc_id AS media_id, text, LENGTH(text) AS n
            FROM documents
            WHERE {_KIND} = 'image'
        )
        SELECT media_id,
               {RESIZE_TARGET[0] * RESIZE_TARGET[1]} AS thumb_bytes,
               CASE WHEN n > 0
                    THEN CAST(list_sum(list_transform(
                        range(1, {RESIZE_TARGET[0] * RESIZE_TARGET[1] + 1}), i ->
                        i * ord(substr(text,
                            CAST(((i - 1) * n) // {RESIZE_TARGET[0] * RESIZE_TARGET[1]}
                                 AS INT) + 1, 1))
                    )) AS BIGINT)
                    ELSE 0 END AS thumb_checksum
        FROM media
    """,
    "mm1_media_manifest": f"""
        WITH media AS (
            SELECT doc_id AS media_id, {_KIND} AS kind, text,
                   encode(text) AS payload
            FROM documents
        )
        SELECT kind, COUNT(*) AS n_items,
               CAST(SUM(octet_length(payload)) AS BIGINT) AS total_bytes,
               MAX(octet_length(payload)) AS max_bytes,
               COUNT(DISTINCT md5(text)) AS n_distinct_payloads
        FROM media GROUP BY kind
    """,
    # mm4: integer square-sums + one division/sqrt/round — every value
    # bit-identical across engines (see the mm4 docstring).
    "mm4_audio_rms": f"""
        WITH a AS (
            SELECT doc_id AS media_id, text,
                   CAST(FLOOR(LENGTH(text) / {FRAME_BYTES}) AS INT) AS n_frames
            FROM documents
            WHERE {_KIND} = 'audio'
        ), f AS (
            SELECT media_id, n_frames,
                   list_transform(range(0, n_frames), fr ->
                       list_sum(list_transform(range(1, {FRAME_BYTES + 1}), j ->
                           CAST(ord(substr(text,
                               CAST(fr * {FRAME_BYTES} + j AS INT), 1)) AS BIGINT)
                           * ord(substr(text,
                               CAST(fr * {FRAME_BYTES} + j AS INT), 1))
                       ))) AS frame_sq_sums
            FROM a
        )
        SELECT media_id, n_frames,
               CASE WHEN n_frames > 0
                    THEN ROUND(SQRT(CAST(list_sum(frame_sq_sums) AS DOUBLE)
                                    / (n_frames * {FRAME_BYTES})), 4)
                    ELSE 0.0 END AS rms,
               CASE WHEN n_frames > 0
                    THEN ROUND(SQRT(CAST(list_max(frame_sq_sums) AS DOUBLE)
                                    / {FRAME_BYTES}), 4)
                    ELSE 0.0 END AS peak_frame_rms
        FROM f
    """,
    # mm2: the stub decoder's features are deterministic byte stats
    # over the (ASCII) payload, so a pure-SQL twin reproduces the whole
    # Arrow/mapInPandas path — the strongest check available for a
    # Python-side operator.
    "mm2_feature_stats": f"""
        WITH d AS (
            SELECT doc_id, {_KIND} AS kind, LENGTH(text) AS n,
                   list_transform(range(1, LENGTH(text) + 1),
                                  i -> ord(substr(text, CAST(i AS INT), 1))) AS bs
            FROM documents
        ), f AS (
            SELECT kind,
                   CASE WHEN n > 0
                        THEN CAST(list_sum(bs) AS DOUBLE) / n
                        ELSE 0.0 END AS mean_byte,
                   CASE WHEN n > 0
                        THEN -list_sum(list_transform(list_distinct(bs), v ->
                            (CAST(len(list_filter(bs, x -> x = v)) AS DOUBLE) / n)
                            * log2(CAST(len(list_filter(bs, x -> x = v)) AS DOUBLE) / n)))
                        ELSE 0.0 END AS entropy
            FROM d
        )
        SELECT kind, COUNT(*) AS n_items,
               ROUND(AVG(mean_byte), 4) AS avg_mean_byte,
               ROUND(AVG(entropy), 4) AS avg_entropy
        FROM f GROUP BY kind
    """,
    # mm3: frame fingerprints need byte slicing DuckDB's substring does
    # on TEXT; with 1-byte UTF-8 fixture text the byte/char strides
    # agree, so the frame sample IS oracle-checkable:
    "mm3_frame_sample": f"""
        WITH media AS (
            SELECT doc_id AS media_id, text,
                   octet_length(encode(text)) AS n_bytes
            FROM documents
            WHERE {_KIND} = 'video'
        ), base AS (
            SELECT media_id, text,
                   CAST(FLOOR(n_bytes / {FRAME_BYTES}) AS INT) AS n_frames,
                   GREATEST(CAST(CEIL(CAST(FLOOR(n_bytes / {FRAME_BYTES}) AS DOUBLE)
                       / {FRAME_SAMPLE_EVERY}) AS INT) - 1, 0) AS max_i
            FROM media
        ), frames AS (
            SELECT media_id, n_frames,
                   md5(substring(text,
                       i * {FRAME_SAMPLE_EVERY * FRAME_BYTES} + 1,
                       {FRAME_BYTES})) AS fp
            FROM base CROSS JOIN range(0, 64) t(i)  -- fixture max_i ≤ 2
            WHERE i <= max_i
        )
        SELECT media_id, MAX(n_frames) AS n_frames,
               COUNT(*) AS n_sampled,
               COUNT(DISTINCT fp) AS n_distinct_frames
        FROM frames GROUP BY media_id
    """,
}
