#!/usr/bin/env python
"""Round benchmark: run the full SURVEY §2 query inventory and print ONE
JSON line the driver records as BENCH_r{N}.json.

Each query executes end-to-end into the `noop` sink — the full physical
plan runs (scan → shuffle → agg), nothing collects to the driver, and
Catalyst cannot short-circuit projections the way `count()` allows.

The run defends itself against host contention (VERDICT r5 item #3):
a fixed-cost probe job and the 1-min load average are recorded at
start and end, any query >50% slower than its prior BENCH_DETAIL value
is re-run once (better time recorded, pair annotated environment vs
confirmed), and the summary carries a `contaminated` flag so a noisy
run is visible instead of committed as clean.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS   (default 32 → master local[32]).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mirrulations_iceberg_spark.operators import collect_queries  # noqa: E402
from mirrulations_iceberg_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
_REPO = os.path.dirname(os.path.abspath(__file__))
#: Detail-sidecar location; overridable so sandboxed runs (tests, ad-hoc
#: sf sweeps) don't clobber the committed sf0.1 prior.
_DETAIL_PATH = os.environ.get(
    "SPARK_GRAFT_DETAIL_PATH", os.path.join(_REPO, "BENCH_DETAIL.json")
)


def _sf_label(sf_dir: str) -> float | str:
    tail = os.path.basename(sf_dir.rstrip("/"))
    if tail.startswith("sf"):
        try:
            return float(tail[2:])
        except ValueError:
            pass
    return tail


def _probe(spark) -> float:
    """Fixed-cost machine probe (VERDICT r5 item #3): one tiny
    constant-work job, best-of-3 so a single scheduler hiccup doesn't
    fake contention. If this number doubles between the start and end
    of the run, the HOST was busy — the run is flagged contaminated
    instead of silently committed as clean (round 5's bench recorded
    d-family +80-140% that isolated re-runs could not reproduce)."""
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        spark.range(1_000_000).selectExpr("sum(id) AS s").write.format(
            "noop"
        ).mode("overwrite").save()
        best = min(best, time.time() - t0)
    return round(best, 3)


def _load_avg() -> float:
    try:
        return round(os.getloadavg()[0], 2)
    except OSError:
        return -1.0


def _prior_timings(path: str | None = None) -> dict[str, float]:
    """Previous run's per-query numbers (same sf only) — the reference
    for the >50%-regression re-run rule. A shuffled-order run still
    compares against the CANONICAL prior (that cross-order comparison
    is the point of shuffle mode)."""
    try:
        with open(path or _DETAIL_PATH) as fh:
            prior = json.load(fh)
    except (OSError, ValueError):
        return {}
    if prior.get("sf") != _sf_label(SF_DIR):
        return {}
    return {
        n: t for n, t in prior.get("queries", {}).items()
        if isinstance(t, (int, float)) and t >= 0
    }


def main() -> None:
    # --shuffle-order <seed> (VERDICT r15 item #2): run the sweep in a
    # seeded-shuffled order instead of sorted. Banking one shuffled run
    # beside the canonical order makes POSITION effects (cache/GC
    # accumulation biasing late-alphabet queries) measurable forever:
    # a query slow in both orders is really slow; slow only when it
    # sits late is paying for session age. A shuffled run never
    # clobbers the canonical prior or the versioned round snapshot —
    # it writes BENCH_DETAIL_SHUFFLED.json unless the detail path is
    # explicitly overridden.
    shuffle_seed: int | None = None
    argv = sys.argv[1:]
    if "--shuffle-order" in argv:
        i = argv.index("--shuffle-order")
        try:
            shuffle_seed = int(argv[i + 1])
        except (IndexError, ValueError):
            print("bench: --shuffle-order requires an int seed", file=sys.stderr)
            raise SystemExit(2)
    global _DETAIL_PATH
    if shuffle_seed is not None and "SPARK_GRAFT_DETAIL_PATH" not in os.environ:
        _DETAIL_PATH = os.path.join(_REPO, "BENCH_DETAIL_SHUFFLED.json")

    spark = get_spark(app_name="bench")
    queries, _ = collect_queries()

    # Warm-up: first action pays JVM/codegen startup; don't bill it to q1.
    queries["a1_count_star"](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()

    load_start = _load_avg()
    probe_start = _probe(spark)
    prior = _prior_timings(
        os.path.join(_REPO, "BENCH_DETAIL.json")
        if shuffle_seed is not None and "SPARK_GRAFT_DETAIL_PATH" not in os.environ
        else None
    )

    # Single pass, one fresh session — the driver's own protocol. Each
    # per-query number includes ~0.5-1 s of one-time Catalyst/codegen
    # compile (measured: warm re-runs of the relational queries land at
    # 0.1-1 s); that driver-side constant amortizes to nothing on
    # minutes-long production queries. A second in-session "warm" pass
    # was tried and rejected: past ~100 actions a local-mode session
    # degrades (ContextCleaner is GC-driven, so shuffle/broadcast state
    # outlives its usefulness) and the numbers measure session age, not
    # the queries.
    # Per-query isolation: drop leftover caches after each query and
    # periodically force a JVM GC. Spark's ContextCleaner frees shuffle
    # files / broadcasts only when the JVM collects their references —
    # on a big heap that can be never, and ~90 queries of accumulated
    # state measurably degrades the tail (mm2 measured 2.5 s early in a
    # session vs 14 s late). Each query's own time still includes all
    # of its work; this only stops query N from paying for 1..N-1.
    # Contention defense (VERDICT r5 item #3): a query slower than its
    # prior BENCH_DETAIL value by >35% (with a 0.5 s absolute floor so
    # toy queries' jitter doesn't trigger) is re-run once and the pair
    # annotated "environment" (re-run back near prior level — transient
    # host noise) or "confirmed" (re-run still slow — a real plan/code
    # change worth reading).
    #
    # Threshold history (VERDICT r6 item #4): originally 50%; x6's r6
    # +42% on unchanged code slipped under it and was recorded without
    # annotation while PLANS cites 3.4 s isolated. 35% now catches that
    # class; the 0.5 s floor keeps sub-second queries out — and applies
    # to the VERDICT too, so a rerun within 0.5 s of prior is labeled
    # environment even if it nominally clears 35% (sub-second jitter is
    # not a confirmed plan change). Recording rule (ADVICE r6, refined):
    # min(first, rerun) is recorded uniformly — in the environment case
    # that IS the clean rerun sample (the trigger guarantees first >
    # rerun there), and in the confirmed case both samples exceeded the
    # threshold and either may itself be contended (observed: first
    # 2.6 s, rerun 11.8 s under a load spike), so the min of the two
    # slow samples is the honest current-cost estimate. A rerun that
    # itself CRASHES records verdict "rerun_failed" and keeps the first
    # sample — a crashed rerun is not evidence of a confirmed change.
    timings: dict[str, float] = {}
    reruns: dict[str, dict] = {}

    def _run_once(name: str, fn) -> float:
        t0 = time.time()
        try:
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            return round(time.time() - t0, 3)
        except Exception as exc:  # noqa: BLE001
            print(f"bench: {name} failed: {type(exc).__name__}: {exc}", file=sys.stderr)
            return -1.0
        finally:
            spark.catalog.clearCache()

    def _regressed(t: float, p: float) -> bool:
        # Absolute floor keeps sub-noise deltas from triggering reruns,
        # but a 0.5s floor on a 0.1s prior hides a genuine 5x
        # regression — so sub-0.5s priors use a 0.15s floor with a 2x
        # multiplicative bar (ADVICE r7, tuned: at the 0.2-0.4s scale,
        # 1.4-1.8x IS host jitter — measured t8/t9 0.38->0.63s swings
        # on unchanged code — while a real blow-up clears 2x easily).
        if p >= 0.5:
            return t > 1.35 * p and t - p > 0.5
        return t > 2.0 * p and t - p > 0.15

    ordered = sorted(queries.items())
    if shuffle_seed is not None:
        import random

        random.Random(shuffle_seed).shuffle(ordered)
    for i, (name, fn) in enumerate(ordered):
        t = _run_once(name, fn)
        p = prior.get(name)
        if t >= 0 and p is not None and _regressed(t, p):
            t2 = _run_once(name, fn)
            if t2 < 0:
                verdict = "rerun_failed"
            elif not _regressed(t2, p):
                verdict = "environment"
            else:
                verdict = "confirmed"
            reruns[name] = {
                "first": t,
                "rerun": t2,
                "prior": p,
                "verdict": verdict,
            }
            if t2 >= 0:
                t = min(t, t2)
        timings[name] = t
        if i % 10 == 9:
            spark.sparkContext._jvm.System.gc()
    total = round(sum(t for t in timings.values() if t >= 0), 3)

    probe_end = _probe(spark)
    load_end = _load_avg()
    # contaminated = the fixed-cost probe itself degraded across the
    # run: whole-run numbers are suspect and no per-query re-run can
    # correct that. Transient per-query contention that a re-run DID
    # correct is not contamination — it is visible (and already
    # repaired) in the reruns dict / n_env_reruns.
    contaminated = probe_end > 2 * probe_start
    # Per-query timings go on their own lines (and to BENCH_DETAIL.json)
    # BEFORE the summary: the round driver keeps only a ~2 KB tail of
    # stdout and parses the LAST line, so that line must stay small —
    # round 2's single ~2.1 KB line was truncated and recorded as
    # "parsed": null. The summary's "queries" dict therefore carries
    # per-family subtotals (14 keys) instead of all ~90 queries.
    for name in sorted(timings):
        print(f"bench.query {name} {timings[name]}")
    detail = {
        "metric": "per-query wall-clock (noop sink)",
        "unit": "sec",
        "sf": _sf_label(SF_DIR),
        "queries": timings,
        "failed": sorted(n for n, t in timings.items() if t < 0),
        "probe": {"start": probe_start, "end": probe_end},
        "load_avg_1min": {"start": load_start, "end": load_end},
        "reruns": reruns,
        "contaminated": contaminated,
        "order": "sorted" if shuffle_seed is None else f"shuffled:{shuffle_seed}",
    }
    if shuffle_seed is not None:
        # Per-query sweep position: the regression variable for the
        # position-effect analysis (time_shuffled/time_sorted vs
        # position delta).
        detail["positions"] = {name: i for i, (name, _) in enumerate(ordered)}
    try:
        with open(_DETAIL_PATH, "w") as fh:
            json.dump(detail, fh, indent=1, sort_keys=True)
    except OSError as exc:
        print(f"bench: could not write BENCH_DETAIL.json: {exc}", file=sys.stderr)
    # Version the detail snapshot per round (VERDICT r11 item #5):
    # BENCH_r{N}.json's summary aggregates per family, so round-over-
    # round per-query diffs need the detail file — and BENCH_DETAIL.json
    # alone is mutable (each run overwrites it). The upcoming round
    # number is 1 + the highest driver-committed BENCH_r*.json, so the
    # detail lands beside the summary the driver writes at round close.
    # Skip when SPARK_GRAFT_DETAIL_PATH is overridden: that override
    # exists precisely so sandboxed runs (tests/test_bench_contract.py
    # at sf0.001, ad-hoc sweeps) never clobber the committed bank —
    # the versioned snapshot must honor the same boundary (review r12).
    # Same for SPARK_GRAFT_SF_DIR: an sf0.001/sf0.01 sweep with only
    # the data dir overridden must not bank off-scale numbers as the
    # upcoming round's detail (ADVICE r12).
    try:
        if (
            "SPARK_GRAFT_DETAIL_PATH" not in os.environ
            and "SPARK_GRAFT_SF_DIR" not in os.environ
            and shuffle_seed is None  # shuffled runs never become the round detail
        ):
            import glob as _glob
            import re as _re

            rounds = [
                int(m.group(1))
                for p in _glob.glob(os.path.join(_REPO, "BENCH_r*.json"))
                if (m := _re.search(r"BENCH_r(\d+)\.json$", p))
            ]
            if rounds:
                versioned = os.path.join(
                    _REPO, f"BENCH_DETAIL_r{max(rounds) + 1:02d}.json"
                )
                with open(versioned, "w") as fh:
                    json.dump(detail, fh, indent=1, sort_keys=True)
    except OSError as exc:
        print(f"bench: could not version BENCH_DETAIL: {exc}", file=sys.stderr)

    # Reading the s-family subtotal across rounds (VERDICT r6 item #8):
    # the six streaming queries carry ~2-3 s EACH of fixed Structured
    # Streaming machinery — checkpoint dir setup, per-micro-batch
    # planning (AQE off in stateful workloads), state-store init, and
    # availableNow drain — independent of data volume (BENCH_r06: the
    # s-family was 23.6 s of the 151 s total at sf0.1, and s5 measured
    # 1.04× wall for 20× data in PLANS.md). A flat-ish s subtotal
    # across rounds is that fixed cost, not a regression; a real
    # streaming regression shows up as one query moving, not the
    # family floor.
    def _family(name: str) -> str:
        return "mm" if name.startswith("mm") else name[0]

    families: dict[str, float] = {}
    for name, t in timings.items():
        if t >= 0:
            families[_family(name)] = round(families.get(_family(name), 0.0) + t, 3)
    print(
        json.dumps(
            {
                "metric": "total wall-clock of SURVEY §2 query inventory (noop sink)",
                "value": total,
                "unit": "sec",
                "queries": families,
                "n_queries": len(timings),
                "n_failed": sum(1 for t in timings.values() if t < 0),
                "sf": _sf_label(SF_DIR),
                "probe_sec": {"start": probe_start, "end": probe_end},
                "load_avg_1min": {"start": load_start, "end": load_end},
                "n_reruns": len(reruns),
                "n_env_reruns": sum(
                    1 for r in reruns.values() if r["verdict"] == "environment"
                ),
                "contaminated": contaminated,
                "order": "sorted"
                if shuffle_seed is None
                else f"shuffled:{shuffle_seed}",
            }
        )
    )


if __name__ == "__main__":
    main()
