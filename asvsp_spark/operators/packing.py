"""Sequence packing: assign documents to fixed-token-budget training
windows ("bins") — the step between a cleaned corpus and a token stream,
where docs are concatenated and cut every ``budget`` tokens so no
compute is spent on padding (GPT-style document packing). Beyond-parity
extension; no reference analogue.

Scale design: a SINGLE global concatenation order is a serialization
point (one total order = one partition's worth of window state), so the
operator packs per SHARD — documents hash into ``n_shards`` independent
streams, each packed by a running token prefix-sum over (shard, doc_id)
order. Every shard's window is independent: the plan is one shuffle by
shard and scales with executors, and bin ids are (shard, bin) pairs. A
trainer consuming k data-parallel readers sets n_shards = k and each
reader streams its own shard's bins in order.

Contiguous packing semantics (docs straddle bin boundaries, exactly like
training-time concatenation): a doc's bin is the bin its FIRST token
lands in — floor(start_offset / budget) where start_offset is the sum of
all earlier docs' token counts in the shard. Fully expression-level
(window prefix sum), no UDF, oracle-checkable in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def pack_contiguous(documents: DataFrame, budget: int = 512,
                    n_shards: int = 4,
                    id_col: str = "doc_id",
                    text_col: str = "text",
                    shard_expr: F.Column | None = None) -> DataFrame:
    """Per-document packing assignment: (doc_id, shard, bin_id,
    n_tokens, start_offset). Whitespace token counts (the engine's
    standard tokenizer — swap in a BPE count column upstream for exact
    budgets); deterministic for a fixed (corpus, budget, n_shards).

    ``shard_expr`` overrides the default xxhash64 id-hash shard (any
    int expression over the row, e.g. a plain id modulus when the
    assignment must be reproducible outside Spark).
    """
    shard = (shard_expr if shard_expr is not None
             else F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards)))
    toked = documents.select(
        F.col(id_col),
        shard.cast("int").alias("shard"),
        F.size(F.split(F.trim(F.col(text_col)), r"\s+")).alias("n_tokens"))
    w = (Window.partitionBy("shard").orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    return (
        toked
        .withColumn("start_offset",
                    F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
        .withColumn("bin_id",
                    F.floor(F.col("start_offset") / budget).cast("long"))
        .select(id_col, "shard", "bin_id", "n_tokens", "start_offset")
    )


def packing_stats(documents: DataFrame, budget: int = 512,
                  n_shards: int = 4,
                  id_col: str = "doc_id",
                  text_col: str = "text",
                  shard_expr: F.Column | None = None) -> DataFrame:
    """Per-(shard, bin) packing report: docs starting in the bin, their
    token mass, and utilization = tokens starting here / budget (can
    exceed 1 when a long doc straddles into later bins — the tail bins
    it covers receive no starts, which is the contiguous-packing
    accounting). Rolls up pack_contiguous with one partial-aggregated
    shuffle onto (shard, bin) keys — bounded cardinality ~ total_tokens
    / budget.
    """
    from asvsp_spark.plans.base import round_fixed
    return (
        pack_contiguous(documents, budget, n_shards, id_col, text_col,
                        shard_expr=shard_expr)
        .groupBy("shard", "bin_id")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("n_tokens").alias("n_tokens"),
             F.min(id_col).alias("first_doc"))
        .withColumn("utilization",
                    round_fixed(F.col("n_tokens") / budget, 6))
    )
