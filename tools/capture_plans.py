"""Capture .explain("formatted") output for registry queries.

Usage: python tools/capture_plans.py OUTDIR SUFFIX name1 name2 ...
       python tools/capture_plans.py OUTDIR SUFFIX --all

Writes OUTDIR/<name>_<SUFFIX>.txt for each query. Uses the same session
contract as bench.py ($SPARK_GRAFT_SF_DIR, local[$SPARK_GRAFT_CPUS]).
Plans only — nothing is executed (apart from any bounded model-training
collects a query performs at plan-build time).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from asvsp_spark.plans.registry import all_queries  # noqa: E402
from asvsp_spark.session import get_session  # noqa: E402


def main() -> None:
    outdir, suffix, *names = sys.argv[1:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_session("asvsp-plan-capture", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    if names == ["--all"]:
        names = sorted(queries)
    import contextlib
    import io
    for name in names:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            queries[name](spark, sf_dir).explain("formatted")
        plan = buf.getvalue()
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(f"captured {name}_{suffix}", file=sys.stderr)


if __name__ == "__main__":
    main()
