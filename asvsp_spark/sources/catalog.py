"""Catalog (metastore) table registration over parquet directories —
SURVEY §2.1 S4.

The reference registers each landed parquet directory as a partitioned
Hive external table and runs ``MSCK REPAIR TABLE`` after every append so
new partition directories become queryable (reference
src/batch/load_hourly.py:87-105). The Spark-first analogue needs no Hive
installation: ``CREATE TABLE ... USING PARQUET PARTITIONED BY ...
LOCATION ...`` against the session catalog, then
``spark.catalog.recoverPartitions`` — the exact MSCK-equivalent partition
discovery — after out-of-band appends.

Scale notes: registration reads only the parquet FOOTER schema (no data
scan); recoverPartitions lists partition directories (driver-side
listing, parallelized by the InMemoryFileIndex past
``spark.sql.sources.parallelPartitionDiscovery.threshold``). Catalog
tables buy partition pruning by name (``WHERE dt = ...`` never lists
other partitions) and shared visibility across sessions sharing the
metastore.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _quote_ident(name: str) -> str:
    """Backtick-quote an identifier for interpolation into DDL/utility
    SQL, doubling embedded backticks (Spark's escape inside a quoted
    identifier) so a hostile name cannot break out of the quoting."""
    return "`" + name.replace("`", "``") + "`"


def register_parquet_table(spark: SparkSession, name: str, path: str,
                           partition_cols: tuple[str, ...] = (),
                           replace: bool = False) -> DataFrame:
    """Register the parquet directory at ``path`` as an EXTERNAL catalog
    table ``name`` and return ``spark.table(name)``.

    The DDL schema is inferred from the parquet footers (partition
    columns are discovered from the directory layout by the same read),
    so the catalog entry always matches the files on disk at
    registration time. For partitioned layouts the partitions are
    recovered immediately — the table is queryable without a separate
    repair step.
    """
    inferred = spark.read.parquet(path).schema
    by_name = {f.name: f for f in inferred.fields}
    missing = [c for c in partition_cols if c not in by_name]
    if missing:
        raise ValueError(
            f"partition columns {missing} not present in parquet data at "
            f"{path} (found {sorted(by_name)})")
    data_cols = ", ".join(
        f"{_quote_ident(f.name)} {f.dataType.simpleString()}"
        for f in inferred.fields if f.name not in partition_cols)
    if replace:
        spark.sql(f"DROP TABLE IF EXISTS {_quote_ident(name)}")
    ddl = f"CREATE TABLE {_quote_ident(name)} ({data_cols}"
    if partition_cols:
        part_cols = ", ".join(
            f"{_quote_ident(c)} {by_name[c].dataType.simpleString()}"
            for c in partition_cols)
        ddl += f", {part_cols}) USING PARQUET PARTITIONED BY " \
               f"({', '.join(_quote_ident(c) for c in partition_cols)})"
    else:
        ddl += ") USING PARQUET"
    ddl += f" LOCATION '{path}'"
    spark.sql(ddl)
    if partition_cols:
        repair_table(spark, name)
    return spark.table(name)


def repair_table(spark: SparkSession, name: str) -> None:
    """MSCK REPAIR TABLE analogue: discover partition directories added
    to the table location out-of-band (a landing job writing straight to
    the filesystem) and add them to the catalog. Idempotent."""
    spark.catalog.recoverPartitions(name)


def analyze_table(spark: SparkSession, name: str,
                  columns: tuple[str, ...] = ()) -> dict[str, str]:
    """ANALYZE TABLE: compute table-level statistics (row count, size)
    and, when ``columns`` is given, per-column NDV/min/max/null-count —
    the inputs Spark's cost-based optimizer uses to choose join sides
    and orders (`spark.sql.cbo.enabled`). At 100 TB, stats are what let
    the planner broadcast a dimension it cannot see the size of at plan
    time (AQE fixes sizes at runtime; CBO fixes join ORDER before the
    first shuffle — they compose).

    Returns the table-level statistics line parsed from DESCRIBE
    EXTENDED, so callers (and tests) can assert the stats actually
    landed in the catalog.
    """
    # embedded backticks double inside a quoted identifier — bare
    # interpolation would let a hostile table/column name break out of
    # the quoting (identifier injection into ANALYZE/DESCRIBE)
    qname = _quote_ident(name)
    spark.sql(f"ANALYZE TABLE {qname} COMPUTE STATISTICS")
    if columns:
        cols = ", ".join(_quote_ident(c) for c in columns)
        spark.sql(f"ANALYZE TABLE {qname} COMPUTE STATISTICS "
                  f"FOR COLUMNS {cols}")
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {qname}").collect()
    return {r["col_name"]: r["data_type"] for r in rows
            if r["col_name"] in ("Statistics",)}


def enable_cbo(spark: SparkSession, join_reorder: bool = True) -> None:
    """Turn on Spark's cost-based optimizer for this session. CBO reads
    the ANALYZE TABLE statistics (``analyze_table`` above) from the
    catalog to estimate cardinalities; ``join_reorder`` additionally
    lets it re-order consecutive INNER joins by estimated cost — the
    at-scale win: the optimizer pushes the most selective dimension
    join first so the fact table is pruned before the expensive
    shuffles, regardless of how the SQL was written. No-ops (silently)
    on tables without stats, so enabling it is always safe.

    Requires catalog tables (not path-based reads): stats live in the
    metastore entry, and ANALYZE must have run after the last data
    change. Pair with ``analyze_table(spark, t, columns=join_keys)`` —
    join-key NDV is what the reorder cost model feeds on.
    """
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled",
                   "true" if join_reorder else "false")


def disable_cbo(spark: SparkSession) -> None:
    """Restore the default cost-model-free planning (tests use this to
    compare plans with and without statistics)."""
    spark.conf.set("spark.sql.cbo.enabled", "false")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
