"""End-to-end materialized batch chain — the reference's layered
warehouse as one composable run (SURVEY §3.1: load -> daily -> monthly
-> annual + baselines, each layer durable partitioned parquet).

The reference materializes every layer to Parquet+Hive so streaming can
reuse the baselines (reference src/batch/process.sh:19-32); this engine
keeps that layering but each stage is a pure transform, so a single-
session caller may also fuse stages by skipping the writes.

Partition specs mirror SURVEY §1.1 (scaled to the events entity):
daily by (event_type, yr, mon), monthly by (event_type, yr), baselines
by event_type — so every downstream partition-key filter prunes at scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from asvsp_spark import tables
from asvsp_spark.operators import rollups as R
from asvsp_spark.sources.batch import write_partitioned


def run_batch_chain(spark: SparkSession, sf_dir: str,
                    out_dir: str) -> dict[str, DataFrame]:
    """Materialize the rollup hierarchy under ``out_dir`` and return
    readers over the written layers."""
    events = tables.load(spark, sf_dir, "events")

    daily = R.daily_rollup(events)
    write_partitioned(daily, f"{out_dir}/daily", ["event_type", "yr", "mon"])
    daily_r = spark.read.parquet(f"{out_dir}/daily")

    monthly = R.monthly_rollup(daily_r)
    write_partitioned(monthly, f"{out_dir}/monthly", ["event_type", "yr"])

    base = R.baselines(events)
    write_partitioned(base, f"{out_dir}/baselines", ["event_type"])

    return {
        "daily": daily_r,
        "monthly": spark.read.parquet(f"{out_dir}/monthly"),
        "baselines": spark.read.parquet(f"{out_dir}/baselines"),
    }
