"""Solo per-query probe: median-of-N wall time + formatted plan dump.

Usage: SPARK_GRAFT_CPUS=32 python tools/solo_probe.py q1 q2 ... [--reps 3]
Writes plans to /tmp/probe_plans/<name>.txt and prints one line per query.
Same warm-up protocol as bench.py (streaming + Arrow warm before timing).
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from asvsp_spark.plans.registry import all_queries  # noqa: E402
from asvsp_spark.session import get_session  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 3
    for a in sys.argv[1:]:
        if a.startswith("--reps="):
            reps = int(a.split("=")[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_session("solo-probe", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    import bench
    try:
        queries[sorted(queries)[0]](spark, sf_dir).count()
        bench._warm_streaming(spark)
        bench._arrow_warmup(spark, parts=int(cpus))
    except Exception as exc:  # noqa: BLE001
        print(f"# warmup failed: {exc}", file=sys.stderr)

    os.makedirs("/tmp/probe_plans", exist_ok=True)
    for name in args:
        fn = queries[name]
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            ts.append(round(time.perf_counter() - t0, 3))
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution
                .ExplainMode.fromString("formatted"))
            with open(f"/tmp/probe_plans/{name}.txt", "w") as fh:
                fh.write(plan)
        except Exception as exc:  # noqa: BLE001
            print(f"# plan dump failed for {name}: {exc}", file=sys.stderr)
        print(f"{name}: median={statistics.median(ts)} all={ts}")


if __name__ == "__main__":
    main()
