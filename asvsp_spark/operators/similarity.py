"""Similarity search over embedding columns: brute-force cosine top-k
baseline plus an LSH-bucketed approximate variant for scale.

Scale design (100TB / billions of vectors):
- Brute force is the correctness baseline: broadcast the (small) query
  set, scan the corpus once, per-partition partial top-k via window rank.
  Works at any corpus size as long as |queries| x k fits on the driver.
- The LSH path buckets vectors by random-hyperplane sign sketches
  (deterministic hash-derived hyperplanes, expression-level); candidates
  only within matching buckets — sub-linear per query. Recall < 1 by
  construction, so it is registered as a rows-only check (no SQL oracle),
  with the bucket width as the recall/cost knob.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from asvsp_spark.functions.vectors import as_double, cosine, l2_norm
from asvsp_spark.plans.base import round_fixed


def embedding_stats(embeddings: DataFrame,
                    id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(id, dim, l2_norm) — cheap sanity scan, oracle-checkable."""
    v = as_double(F.col(vec_col))
    return embeddings.select(
        F.col(id_col),
        F.size(vec_col).alias("dim"),
        round_fixed(l2_norm(v), 6).alias("norm_l2"),
    )


def cosine_topk(embeddings: DataFrame, k: int = 5, n_queries: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Brute-force cosine top-k neighbors for the first n_queries vectors.

    The query side is tiny and explicitly broadcast; the corpus side
    streams through one scan — no shuffle of the corpus. Rank window
    partitions by query id (bounded cardinality).
    """
    q = embeddings.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos_sim",
                    round_fixed(cosine(as_double(F.col("q_vec")),
                                       as_double(F.col("c_vec"))), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored
        .withColumn("rnk", F.rank().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rnk")
    )


def lsh_bucketed_topk(embeddings: DataFrame, k: int = 5, n_queries: int = 10,
                      n_planes: int = 8,
                      id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: random-hyperplane sign LSH buckets, cosine only
    within the query's bucket (plus Hamming-1 probes via per-bit flips).

    Hyperplane j weight for dimension i is a deterministic pseudo-random
    +-1 from xxhash64(j, i) — expression-level, reproducible, no stored
    model. Sub-linear: each query scores only its bucket's members.
    """
    dim_idx = "sequence(0, size({v}) - 1)"

    def sketch(vec_col_name: str) -> F.Column:
        planes = []
        for j in range(n_planes):
            proj = (
                f"aggregate(zip_with({vec_col_name}, "
                f" transform({dim_idx.format(v=vec_col_name)},"
                f"  i -> IF((xxhash64({j}L, CAST(i AS LONG)) & 1L) = 1L, 1.0D, -1.0D)),"
                f" (x, w) -> CAST(x AS DOUBLE) * w), 0.0D, (acc, x) -> acc + x)")
            planes.append(f"IF({proj} > 0.0D, shiftleft(1L, {j}), 0L)")
        return F.expr(" | ".join(planes))

    sketched = embeddings.select(
        F.col(id_col), F.col(vec_col), sketch(vec_col).alias("bucket"))
    q = sketched.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"),
        F.col("bucket").alias("q_bucket"))
    # multi-probe: exact bucket + all Hamming-1 neighbors of the sketch
    probes = q.select(
        "query_id", "q_vec",
        F.explode(F.array(
            F.col("q_bucket"),
            *[F.col("q_bucket").bitwiseXOR(F.lit(1 << j)) for j in range(n_planes)],
        )).alias("bucket"))
    c = sketched.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"), "bucket")
    scored = (
        c.join(F.broadcast(probes), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("cos_sim",
                    round_fixed(cosine(as_double(F.col("q_vec")),
                                       as_double(F.col("c_vec"))), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.rank().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rnk")
    )
