"""Dump the physical plan of ONE label-propagation round of
operators/components.connected_components — the loop runs eagerly at
query-build time, so the registry entry's final explain() only shows
the fixpoint read-back, not the per-round join the optimization
changed. This builds the round-1 `new_labels` frame exactly as the
r11 loop does (self-loops folded into sym; seed = the same aggregate
over sym; round = one join + one aggregate) and explains it.

Usage: python tools/capture_cc_round_plan.py OUT_FILE
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from asvsp_spark.session import get_session  # noqa: E402


def main() -> None:
    out_file = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_session("asvsp-cc-plan", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    from asvsp_spark.operators import dedup as D

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    edges = (D.jaccard_pairs(docs, threshold=0.3)
             .select("doc_a", "doc_b"))

    # replicate connected_components' preamble + round 1 faithfully
    # (source is the contract; this script only adds the explain)
    a = edges.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
    sym = a.unionByName(a.select(F.col("v").alias("u"),
                                 F.col("u").alias("v")))
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    sym = (sym.unionByName(sym.select(F.col("u").alias("u"),
                                      F.col("u").alias("v")))
           .repartition(n_parts, F.col("v"))
           .dropDuplicates(["u", "v"])
           .persist())
    sym.count()

    labels = (sym.groupBy(F.col("u").alias("vertex"))
              .agg(F.min("v").alias("label"))
              .persist())
    labels.count()

    new_labels = (sym.join(labels, sym.v == labels.vertex)
                  .groupBy(F.col("u").alias("vertex"))
                  .agg(F.min("label").alias("label")))

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        new_labels.explain("formatted")
    with open(out_file, "w") as fh:
        fh.write("# r11 round shape: self-loops in sym; round = "
                 "sym JOIN labels (both persisted, co-partitioned) "
                 "+ ONE groupBy(u).min(label) aggregate\n")
        fh.write(buf.getvalue())
    print(f"wrote {out_file}", file=sys.stderr)


if __name__ == "__main__":
    main()
