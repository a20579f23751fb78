"""SparkSession factory with scale-sane defaults.

The reference hand-tunes ``spark.sql.shuffle.partitions=8`` for a 2-worker
laptop cluster (reference src/batch/process.sh:9-15). We instead lean on AQE
(on by default in Spark 3.2+) to coalesce shuffle partitions at runtime, and
parameterize everything that is cluster-size dependent so the same code runs
on local[32] tests and a 1000-executor cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONF: dict[str, str] = {
    # AQE: runtime re-planning (coalesce partitions, convert to broadcast
    # joins, split skewed partitions). Critical at 100TB where static
    # estimates are unreliable.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Deterministic timestamp semantics: parquet files carry naive
    # timestamps; pin the session to UTC so to_date/hour/dayofweek agree
    # with the DuckDB oracle regardless of host timezone.
    "spark.sql.session.timeZone": "UTC",
    # Arrow for pandas UDF / toPandas interchange (vector ops, multimodal).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # The driver's events.parquet stores TIMESTAMP(NANOS), which the Spark
    # parquet reader rejects outright; read as raw nanos longs and convert
    # in tables.load (integer division — nanos exceed double precision).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Joins (optimization guide §3.1/§9): two knobs with different risk
    # profiles. (1) preferSortMergeJoin=false lets the PLANNER pick
    # shuffled-hash when its size conditions are met — those conditions
    # are ESTIMATE-driven, so with stale/absent stats a post-filter side
    # can be mis-sized and an SHJ build cannot spill back to sort-merge:
    # on a cluster where estimates are unreliable and executors are
    # memory-tight, set SPARK_GRAFT_PREFER_SMJ=1 to restore the default
    # and rely solely on knob 2. (2) The AQE
    # maxShuffledHashJoinLocalMapThreshold converts planned sort-merge
    # to shuffled-hash AT RUNTIME from ACTUAL post-shuffle partition
    # sizes — that one only ever swaps a sort for an in-memory hash
    # build of an under-64MB partition and is the statistics-independent,
    # OOM-safe half. Measured r10: -10-20% on every join-bearing query
    # family at sf0.1 with plans otherwise unchanged
    # (OPTIMIZATION_r10.md "Join strategy").
    "spark.sql.join.preferSortMergeJoin":
        "true" if os.environ.get("SPARK_GRAFT_PREFER_SMJ") == "1"
        else "false",
    "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold":
        os.environ.get("SPARK_GRAFT_SHJ_LOCAL_MAP", "64m"),
    # Keep partition files readable in one task at test scale; at cluster
    # scale operators should override via SPARK_GRAFT_* env or builder conf.
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"),
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    # Silence the noisy SparkUI in CI-like environments.
    "spark.ui.enabled": "false",
}

# Cost-based optimization: off by default (it needs ANALYZE TABLE stats
# to do anything and silently no-ops without them), opt in with
# SPARK_GRAFT_CBO=1 or sources.catalog.enable_cbo(spark). With stats in
# the catalog, CBO fixes the JOIN ORDER before the first shuffle —
# complementary to AQE, which can only resize/convert what was already
# planned. The 100 TB payoff: a mis-ordered 3-way join shuffles the
# full fact table through an early join it should have seen last.
if os.environ.get("SPARK_GRAFT_CBO") == "1":
    DEFAULT_CONF.update({
        "spark.sql.cbo.enabled": "true",
        "spark.sql.cbo.joinReorder.enabled": "true",
        "spark.sql.statistics.histogram.enabled": "true",
    })


def get_session(app_name: str = "asvsp_spark", master: str | None = None,
                extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 4) so
    tests and bench share one knob; on a real cluster pass ``None`` after
    setting master via spark-submit.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "4")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(DEFAULT_CONF)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
