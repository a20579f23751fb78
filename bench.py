"""Benchmark harness: runs the registered query suite at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line: {"metric": ...,
"value": total_sec, "unit": "sec", "queries": {name: sec}, "runs": N,
"sf": ...}.

Each query is timed to full materialization (count() of a cache-free
plan — the whole pipeline runs, no driver-side row transfer).

Median-of-N protocol ($SPARK_GRAFT_BENCH_RUNS, default 3): the suite
runs as N complete PASSES (pass-level interleave, so host-load spikes
hit all queries of a pass rather than all runs of one query) and each
query reports its per-pass MEDIAN. Single-run timings on this host move
+-20-40% with no code change (r3's q01/q13 artifact drift), which made
round-over-round regression tables noise; medians make them signal.

r9 measurement-protocol changes (BASELINE.md "Bench protocol" section
has the full rationale; these are MEASUREMENT changes, not budget
changes):

1. Arrow warm-up: an untimed no-op mapInPandas pass runs immediately
   before timing any query in _ARROW_COHORT. The r8 root-cause: the
   FIRST Python-worker invocation after a long JVM-only stretch pays
   ~3.5 s of worker re-warm across the 32-way fanout, so in-suite
   medians of Arrow queries encoded SUITE POSITION, not query cost
   (media_frame_sample's budget drifted 1.044 -> 3.68 for this reason
   alone). The warm-up absorbs the re-warm outside the timed window.
2. Breach confirmation: any query reading >2x its frozen budget
   in-suite is re-run SOLO (3 reps, post-warm-up, same session) after
   the passes finish; the artifact records both readings plus
   breach_confirmed. This turns the recurring "in-suite contention"
   hypothesis (dsir r6-r8) into per-run data the gate can act on.
3. Cohort cadence: the CORE cohort (driver-checked window + watch-list
   + every budget >= 1.3 s + anything without a frozen budget yet) is
   timed every round; the long tail of sub-1.3 s entries joins on
   ODD rounds only ($SPARK_GRAFT_BENCH_TAIL=1/0 overrides, auto =
   parity of the next BENCH_r{N} artifact). At 145 queries x 3 passes
   the full suite's own warm-state perturbed what it measured; the
   tail is where regressions are least consequential and least likely
   (sub-second scan-bound plans). vs_suite_total / suite_breach are
   only reported on full-suite rounds — vs_budget_total is always
   apples-to-apples over whatever was timed.
"""

from __future__ import annotations

import glob
import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from asvsp_spark.plans.registry import DRIVER_CHECKED, all_queries  # noqa: E402
from asvsp_spark.session import get_session  # noqa: E402

_REPO = os.path.dirname(os.path.abspath(__file__))

# Registry entries whose plans cross into Python workers (pandas_udf /
# mapInPandas / applyInPandas / applyInPandasWithState / Python
# DataSource). These get the untimed Arrow warm-up. Static by design —
# sniffing the plan would require BUILDING it, and several entries
# train models at build time. Keep in sync when registering a new
# Arrow-path query (the cost of missing one is a noisy first-in-suite
# reading, caught by breach confirmation).
_ARROW_COHORT = {
    "cosine_dup_pairs", "lsh_topk",
    "ivf_topk", "ivf_topk_full_probe", "pq_rerank_topk",
    "ivfpq_rerank_topk", "semantic_dedup_report",
    "media_features", "media_image_decode", "media_frame_sample",
    "packing_bins", "packing_best_fit_bins",
    "heavy_hitters_users",
    "bpe_merge_table", "vocab_coverage",
    "stitch_report",
    "sq2c_stateful_trend",
    "http_collect_rollup",
}

# Always timed regardless of budget size: the entries with open perf
# findings or a history of in-suite drift (r8 verdict items 1-3).
# r10 retirements (verdict item 6, decision ledger): dsir_sample /
# dsir_weights left after two clean rounds under the breach-confirm
# protocol — their budgets were re-frozen at position-inclusive
# in-suite medians (BASELINE.md PROFILE rows) which keep both in the
# every-round core cohort on budget size; sq6b_attribution_left left
# after the unloadOnCommit fix held two rounds (1.22x r9, 1.28x r10 —
# its 3.827 budget keeps it always-timed anyway). media_frame_sample /
# bpe_merge_table stay one more round (sub-1.3 budgets: the watch-list
# is what keeps them timed on even rounds after their r9 re-freeze).
_WATCHLIST = {
    "media_frame_sample", "bpe_merge_table",
    "sq2_dominant_trend", "sq3_top_users", "sq7_dedup_hourly",
    "sq12_drift_hourly",
}


def _cpu_stat() -> tuple[int, int] | None:
    """(total_jiffies, steal_jiffies) from the aggregate `cpu` line of
    /proc/stat, or None where unavailable. The sandbox host gets
    multi-minute hypervisor steal bursts (7-18% of capacity) that
    inflate wall-clock up to 5-8x; recording steal before/after each
    pass makes a contention-contaminated run machine-detectable in the
    artifact instead of argued after the fact (r10 verdict item 1)."""
    try:
        with open("/proc/stat") as fh:
            parts = fh.readline().split()
        if parts[0] != "cpu":
            return None
        vals = [int(x) for x in parts[1:]]
        steal = vals[7] if len(vals) > 7 else 0
        return sum(vals), steal
    except (OSError, ValueError, IndexError):
        return None


def _steal_summary(marks: list[tuple[int, int] | None]) -> dict | None:
    """Per-interval steal percentages from the _cpu_stat() marks taken
    at pass boundaries. None when /proc/stat was unreadable at any
    mark (keeps the field honest rather than partially filled)."""
    if not marks or any(m is None for m in marks) or len(marks) < 2:
        return None
    pcts = []
    for (t0, s0), (t1, s1) in zip(marks, marks[1:]):
        dt = t1 - t0
        pcts.append(round(100.0 * (s1 - s0) / dt, 2) if dt > 0 else 0.0)
    total_d = marks[-1][0] - marks[0][0]
    steal_d = marks[-1][1] - marks[0][1]
    return {
        "pct_per_pass": pcts,
        "pct_overall": (round(100.0 * steal_d / total_d, 2)
                        if total_d > 0 else 0.0),
        "jiffies": steal_d,
    }


def _load_budgets() -> tuple[dict[str, float], float | None]:
    """(per-query budgets, frozen suite-total) parsed from BASELINE.md
    (the single source of truth: r1 medians for the original 50 queries,
    frozen r4-r9 medians for the rest; the SUITE_TOTAL_BUDGET line is
    the full-suite drift gate — per-query ratios catch 2x cliffs, the
    suite total catches slow suite-wide drift). Missing file or rows ->
    empty — budgets are a regression tripwire, never a reason bench
    can't run."""
    path = os.path.join(_REPO, "BASELINE.md")
    budgets: dict[str, float] = {}
    suite_total: float | None = None
    try:
        with open(path) as fh:
            for line in fh:
                m = re.match(r"\|\s*([a-z0-9_]+)\s*\|\s*0\.1\s*\|"
                             r"\s*([0-9.]+)\s*\|", line)
                if m:
                    budgets[m.group(1)] = float(m.group(2))
                    continue
                t = re.match(r"SUITE_TOTAL_BUDGET:\s*([0-9.]+)\s*sec", line)
                if t:
                    suite_total = float(t.group(1))
    except OSError:
        pass
    return budgets, suite_total


def _next_round() -> int:
    """Best-effort: the round this bench run will be recorded as —
    max N over the driver's BENCH_r{N}.json artifacts, plus one."""
    ns = []
    for f in glob.glob(os.path.join(_REPO, "BENCH_r*.json")):
        m = re.search(r"BENCH_r0*(\d+)\.json$", f)
        if m:
            ns.append(int(m.group(1)))
    return (max(ns) + 1) if ns else 1


def _timed_cohort(queries: dict,
                  budgets: dict[str, float]) -> tuple[set[str], str]:
    """(names to time this run, cohort label). Core = driver window +
    watch-list + budget >= 1.3 s + budget-less entries; the tail joins
    on ODD rounds (or SPARK_GRAFT_BENCH_TAIL=1)."""
    mode = os.environ.get("SPARK_GRAFT_BENCH_TAIL", "auto")
    names = set(queries)
    if mode == "1":
        return names, "core+tail"
    core = ((set(DRIVER_CHECKED) | _WATCHLIST
             | {n for n, b in budgets.items() if b >= 1.3}
             | {n for n in names if n not in budgets})
            & names)
    if mode == "0":
        return core, "core"
    if not budgets:          # no gate rows (non-sf0.1 run): time it all
        return names, "core+tail"
    return (names, "core+tail") if _next_round() % 2 == 1 else (core, "core")


def _arrow_warmup(spark, parts: int = 32) -> None:
    """Untimed no-op mapInPandas over one task per core: forces the
    Python worker pool + Arrow JVM machinery warm so the timed query
    measures the plan, not worker re-warm (~0.5 s warm, up to ~6 s
    when it is actually absorbing a re-warm — which is the point)."""
    def noop(it):
        yield from it

    spark.range(0, parts, 1, parts).mapInPandas(noop, "id long").count()


def _warm_streaming(spark) -> None:
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql import functions as F
    from asvsp_spark.streaming.source import drain

    d = tempfile.mkdtemp(prefix="bench-warm-")
    pq.write_table(pa.table({"ts": pa.array([0], pa.int64()),
                             "k": pa.array(["x"], pa.string())}),
                   f"{d}/w.parquet")
    s = (spark.readStream.schema("ts long, k string").parquet(d)
         .withColumn("ts", F.expr("timestamp_micros(ts)"))
         .withWatermark("ts", "1 hour")
         .groupBy("k").count())
    drain(s, spark).count()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_session("asvsp-bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    queries = all_queries()
    # the static cohort sets are maintained by hand; a renamed or
    # mistyped entry would otherwise be silently ignored (no warm-up /
    # no always-timed coverage) with no signal (r10 ADVICE finding).
    # Warn loudly AND surface it in the artifact — a hard assert would
    # cost the round's bench artifact over a label bug.
    unknown_cohort = sorted((_ARROW_COHORT | _WATCHLIST) - set(queries))
    if unknown_cohort:
        print(f"# bench: _ARROW_COHORT/_WATCHLIST names not in the "
              f"registry (stale after a rename?): {unknown_cohort}",
              file=sys.stderr)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    budgets, suite_total = (_load_budgets() if sf == "0.1"
                            else ({}, None))   # budgets are sf0.1
    cohort, cohort_label = _timed_cohort(queries, budgets)

    # JVM + codegen warmup on the smallest query so per-query numbers
    # measure the plan, not session startup; one tiny streaming drain so
    # the first sq* query doesn't absorb Structured Streaming's one-time
    # engine init (~2-3s of listener/checkpoint machinery); one Arrow
    # pass so the first _ARROW_COHORT query doesn't absorb the Python
    # worker cold start.
    try:
        queries[sorted(queries)[0]](spark, sf_dir).count()
        _warm_streaming(spark)
        _arrow_warmup(spark, parts=int(cpus) if cpus.isdigit() else 32)
    except Exception:
        pass

    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    parts = int(cpus) if cpus.isdigit() else 32
    samples: dict[str, list[float]] = {name: [] for name in cohort}
    steal_marks = [_cpu_stat()]
    for _ in range(n_runs):
        for name in sorted(cohort):
            if name in _ARROW_COHORT:
                try:
                    _arrow_warmup(spark, parts=parts)
                except Exception:
                    pass
            t0 = time.perf_counter()
            try:
                queries[name](spark, sf_dir).count()
                samples[name].append(round(time.perf_counter() - t0, 3))
            except Exception as exc:  # a failing query must not hide the rest
                samples[name].append(-1.0)
                print(f"# bench error in {name}: {exc}", file=sys.stderr)
        steal_marks.append(_cpu_stat())

    timings = {
        name: (-1.0 if any(t < 0 for t in ts)
               else round(statistics.median(ts), 3))
        for name, ts in samples.items()
    }

    # regression gate vs the frozen per-query budgets in BASELINE.md:
    # a query breaches at >2x its budget (the driver's own 2x rule
    # applied per-query); vs_budget_total is suite-level signal over
    # the timed cohort
    common = [n for n, t in timings.items() if t >= 0 and n in budgets]
    breaches = {
        n: {"sec": timings[n], "budget": budgets[n]}
        for n in common if timings[n] > 2.0 * budgets[n]
    }
    # breach confirmation (r9 protocol): adjudicate each in-suite
    # breach with a solo 3-rep median in the same session, warm-up
    # first, so "suite contention" vs "real regression" is data in the
    # artifact instead of a post-hoc triage note
    for n, row in sorted(breaches.items()):
        try:
            _arrow_warmup(spark, parts=parts)
            solos = []
            for _ in range(3):
                t0 = time.perf_counter()
                queries[n](spark, sf_dir).count()
                solos.append(round(time.perf_counter() - t0, 3))
            solo = round(statistics.median(solos), 3)
            row["solo_sec"] = solo
            row["solo_vs_budget"] = round(solo / row["budget"], 3)
            row["breach_confirmed"] = solo > 2.0 * row["budget"]
        except Exception as exc:
            # keep the row schema uniform: an unmeasurable breach stays
            # red, with null solo readings marking it unadjudicated
            row["solo_sec"] = None
            row["solo_vs_budget"] = None
            row["breach_confirmed"] = True   # cannot exonerate -> keep red
            print(f"# bench: solo confirm failed for {n}: {exc}",
                  file=sys.stderr)

    # steal covering the solo-confirm window separately from the passes:
    # an exonerating solo taken mid-burst would otherwise look clean
    confirm_steal = None
    if breaches:
        m0, m1 = steal_marks[-1], _cpu_stat()
        if m0 is not None and m1 is not None and m1[0] > m0[0]:
            confirm_steal = round(100.0 * (m1[1] - m0[1])
                                  / (m1[0] - m0[0]), 2)

    full_suite = cohort_label == "core+tail"
    total = round(sum(t for t in timings.values() if t >= 0), 3)
    vs_suite = (round(total / suite_total, 3)
                if (suite_total and full_suite) else None)
    result = {
        "metric": "asvsp_spark_query_suite",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "runs": n_runs,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # r9 protocol fields — see module docstring + BASELINE.md
        "protocol": "r9: arrow-warmup + breach-confirm + cohort cadence",
        # hypervisor-steal annotation (r11, additive-only): % of host
        # capacity stolen during each timed pass and overall; >~2%
        # sustained historically means wall-clock is contaminated
        "steal": _steal_summary(steal_marks),
        "steal_pct_confirm": confirm_steal,
        "unknown_cohort_names": unknown_cohort,
        "timed_cohort": cohort_label,
        "n_timed": len(cohort),
        "n_tail_skipped": len(queries) - len(cohort),
        "budgeted_queries": len(common),
        "vs_budget_total": (
            round(sum(timings[n] for n in common)
                  / max(sum(budgets[n] for n in common), 1e-9), 3)
            if common else None),
        "budget_breaches": breaches,
        # full-suite drift gate: whole-suite wall vs the frozen
        # SUITE_TOTAL_BUDGET line in BASELINE.md; breach past 1.25x
        # (noise band + margin); None on core-only rounds
        "vs_suite_total": vs_suite,
        "suite_breach": (vs_suite is not None and vs_suite > 1.25),
    }
    # The driver keeps only a bounded TAIL of this process's output, and
    # round 2's artifact lost the head of the (long) per-query line to
    # that buffer. Defend both ways: persist the complete result to
    # BENCH_LOCAL.json in the repo (survives regardless of buffering),
    # and print the mandated one-liner as the true last line — after
    # spark.stop(), maximally compact (no separator spaces, sorted keys).
    try:
        local = os.path.join(_REPO, "BENCH_LOCAL.json")
        with open(local, "w") as fh:
            json.dump(result, fh, indent=1, sort_keys=True)
            fh.write("\n")
    except OSError as exc:
        print(f"# bench: could not write BENCH_LOCAL.json: {exc}",
              file=sys.stderr)
    spark.stop()
    print(json.dumps(result, separators=(",", ":"), sort_keys=True),
          flush=True)


if __name__ == "__main__":
    main()
