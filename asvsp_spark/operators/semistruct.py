"""Semi-structured JSON processing on Spark 4's VARIANT type.

The engine's existing JSON edge (`from_json` with a declared struct —
streaming/queries.py sq3, S9 parity) requires the schema up front; real
event streams carry heterogeneous payloads where declaring every shape
is impossible. VARIANT is Spark's answer (SPARK-45891): `parse_json`
shreds the text ONCE into a binary-encoded value, then any number of
`variant_get` path extractions read it without re-parsing — at 100 TB
the parse cost is paid once per row instead of once per extracted
field, and the binary encoding pushes through shuffles ~40% smaller
than the text (the same property the exact-dedup store leans on with
md5 digests).

Semantics pinned here (each is a cross-engine landmine the oracle
checks):
- typed extraction: `variant_get(v, '$.k', 'long')` casts inside the
  decoder, no string detour;
- missing paths: `try_variant_get` returns NULL (never errors) for a
  path the document lacks;
- nested traversal: `$.m.t` walks object-in-object;
- inference: `schema_of_variant` reports the shredded type
  (OBJECT<k: BIGINT> for the events props), which is what a
  shredding-aware parquet writer would materialize as a typed column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def variant_props_rollup(events: DataFrame) -> DataFrame:
    """Per-event-type rollup where every grouping/measure column flows
    through a VARIANT decode rather than the raw columns:

    - the GROUP KEY `etype` is extracted from a nested synthetic
      document (`{"u": <user_id>, "m": {"t": "<event_type>"}}`,
      built with format_string — deterministic bytes, no engine JSON
      serializer involved) via the nested path `$.m.t`, so a traversal
      bug breaks the whole grouping, not a passive column;
    - `k_*` measures decode the REAL `props` payload via
      `variant_get($.k, 'long')`;
    - `n_missing_retry` counts `try_variant_get($.retry)` NULLs — the
      path never exists, so the count must equal n_events;
    - `props_schema` pins `schema_of_variant`'s inference output.

    Plan shape: one scan, all decodes in the projection (JVM-side
    variant kernels, no Python), one hash aggregate on a 5-value key.

    Malformed payloads: the REAL props decode is ``try_parse_json`` —
    a malformed document yields a NULL variant (NULL k/retry/schema,
    still counted in n_events), never a job abort; at 100 TB one bad
    crawl record must not kill the rollup (the read_jsonl PERMISSIVE
    posture; r10 events edge probe — parse_json FAILFAST aborted on
    'not json'). The engine-BUILT nested doc keeps strict parse_json:
    its bytes are deterministic, so a parse failure there is a bug
    that should be loud.
    """
    v = F.try_parse_json("props")
    nested = F.parse_json(F.format_string(
        '{"u": %d, "m": {"t": "%s"}}', F.col("user_id"),
        F.col("event_type")))
    d = events.select(
        # format_string renders a NULL event_type as the literal string
        # "null" inside the synthetic doc — guard so a NULL type groups
        # as NULL, not as a 'null' string key (r10 events edge probe)
        F.when(F.col("event_type").isNull(),
               F.lit(None).cast("string"))
         .otherwise(F.variant_get(nested, "$.m.t", "string"))
         .alias("etype"),
        F.variant_get(nested, "$.u", "long").alias("u"),
        F.variant_get(v, "$.k", "long").alias("k"),
        F.try_variant_get(v, "$.retry", "long").alias("retry"),
        F.schema_of_variant(v).alias("sch"),
    )
    return (
        d.groupBy("etype")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum("k").alias("k_sum"),
             F.max("k").alias("k_max"),
             F.count(F.when(F.col("k") != 0, True)).alias("k_nonzero"),
             (F.count(F.lit(1)) - F.count("retry")).alias("n_missing_retry"),
             F.countDistinct("u").alias("n_users"),
             F.max("sch").alias("props_schema"))
    )
