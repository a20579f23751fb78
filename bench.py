"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "runs": N, "sf": ...}.

Each query is timed to full materialization (count of a cached-free plan —
we use a collect-less foreach-noop via count() to include the whole
pipeline but exclude driver-side row transfer).

Median-of-N protocol ($SPARK_GRAFT_BENCH_RUNS, default 3): the suite
runs as N complete PASSES (pass-level interleave, so host-load spikes
hit all queries of a pass rather than all runs of one query) and each
query reports its per-pass MEDIAN. Single-run timings on this host move
+-20-40% with no code change (r3's q01/q13 artifact drift), which made
round-over-round regression tables noise; medians make them signal.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from asvsp_spark.plans.registry import all_queries  # noqa: E402
from asvsp_spark.session import get_session  # noqa: E402


def _load_budgets() -> tuple[dict[str, float], float | None]:
    """(per-query budgets, frozen suite-total) parsed from BASELINE.md
    (the single source of truth: r1 medians for the original 50 queries,
    frozen r4-r8 medians for the rest; the SUITE_TOTAL_BUDGET line is
    the r8 drift gate — per-query ratios catch 2x cliffs, the suite
    total catches slow suite-wide drift). Missing file or rows -> empty
    — budgets are a regression tripwire, never a reason bench can't
    run."""
    import re
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BASELINE.md")
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
    # JVM + codegen warmup on the smallest query so per-query numbers
    # measure the plan, not session startup; plus one tiny streaming drain
    # so the first sq* query doesn't absorb Structured Streaming's
    # one-time engine init (~2-3s of listener/checkpoint machinery).
    try:
        queries[sorted(queries)[0]](spark, sf_dir).count()
        _warm_streaming(spark)
    except Exception:
        pass

    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    samples: dict[str, list[float]] = {name: [] for name in queries}
    for _ in range(n_runs):
        for name in sorted(queries):
            t0 = time.perf_counter()
            try:
                queries[name](spark, sf_dir).count()
                samples[name].append(round(time.perf_counter() - t0, 3))
            except Exception as exc:  # a failing query must not hide the rest
                samples[name].append(-1.0)
                print(f"# bench error in {name}: {exc}", file=sys.stderr)

    import statistics

    timings = {
        name: (-1.0 if any(t < 0 for t in ts)
               else round(statistics.median(ts), 3))
        for name, ts in samples.items()
    }

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # regression gate vs the frozen per-query budgets in BASELINE.md:
    # a query breaches at >2x its budget (the driver's own 2x rule
    # applied per-query); vs_budget_total is suite-level signal
    budgets, suite_total = (_load_budgets() if sf == "0.1"
                            else ({}, None))   # budgets are sf0.1
    common = [n for n, t in timings.items() if t >= 0 and n in budgets]
    breaches = {
        n: {"sec": timings[n], "budget": budgets[n]}
        for n in common if timings[n] > 2.0 * budgets[n]
    }
    total = round(sum(t for t in timings.values() if t >= 0), 3)
    vs_suite = (round(total / suite_total, 3) if suite_total else None)
    result = {
        "metric": "asvsp_spark_query_suite",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "runs": n_runs,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "budgeted_queries": len(common),
        "vs_budget_total": (
            round(sum(timings[n] for n in common)
                  / max(sum(budgets[n] for n in common), 1e-9), 3)
            if common else None),
        "budget_breaches": breaches,
        # r8 drift gate: whole-suite wall vs the frozen SUITE_TOTAL_BUDGET
        # line in BASELINE.md; breach past 1.25x (noise band + margin)
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
        local = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_LOCAL.json")
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
