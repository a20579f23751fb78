"""Ingest cleaning transforms — the reference's semantic cleaning rules
(SURVEY §1.4) as reusable, parameterized column transforms.

The reference bakes these into its CSV->hourly job:
1. column-name normalization, space -> underscore (load_hourly.py:31-34)
2. unit normalization, ppb -> ppm divide-by-1000 + label rewrite
   (load_hourly.py:38-41,76-79)
3. truncated-value repair via an 18-branch when-chain (load_hourly.py:44-65)
4. hour extraction from a "HH:MM" string (load_hourly.py:36)
5. typed projection with aliases (load_hourly.py:67-80)

All are single-pass column expressions — they fuse into the scan's
whole-stage codegen, adding zero extra passes at 100TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def normalize_column_names(df: DataFrame) -> DataFrame:
    """Space -> underscore on every column (load_hourly.py:31-34's loop),
    via a single toDF — one plan node instead of N renames."""
    return df.toDF(*[c.replace(" ", "_") for c in df.columns])


def repair_values(col: Column, repairs: dict[str, str]) -> Column:
    """Multi-branch when-chain repairing known-bad values (the truncated
    state names of load_hourly.py:44-65, e.g. 'Californi'->'California');
    unknown values pass through."""
    expr = col
    for bad, good in repairs.items():
        expr = F.when(col == bad, F.lit(good)).otherwise(expr)
    return expr


def normalize_units(value: Column, unit: Column,
                    conversions: dict[str, tuple[float, str]]) -> tuple[Column, Column]:
    """(value, unit) -> converted (value, unit). ``conversions`` maps a
    source unit label to (divisor, target label) — the reference divides
    ppb readings by 1000 and relabels to ppm (load_hourly.py:38-41,76-79).
    """
    v, u = value, unit
    for src, (divisor, target) in conversions.items():
        v = F.when(unit == src, value / divisor).otherwise(v)
        u = F.when(unit == src, F.lit(target)).otherwise(u)
    return v, u


def hour_from_time_string(time_col: Column) -> Column:
    """'HH:MM' -> int hour via substring (load_hourly.py:36)."""
    return F.substring(time_col, 1, 2).cast("int")


def typed_projection(df: DataFrame,
                     casts: dict[str, tuple[str, str]]) -> DataFrame:
    """Explicit cast-and-alias projection (load_hourly.py:67-80):
    ``casts`` maps source column -> (target type, alias)."""
    return df.select(*[
        F.col(src).cast(dtype).alias(alias)
        for src, (dtype, alias) in casts.items()
    ])
