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
from pyspark.sql import types as T

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


def cosine_dup_pairs(embeddings: DataFrame, threshold: float = 0.45,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-duplicate pairs (the vector leg of the dedup
    family): all (a, b) with a < b and cosine >= threshold.

    Execution: the exact brute-force baseline as a BLOCK-NESTED-LOOP in
    numpy — the full normalized index is broadcast to every executor, and
    ``mapInPandas`` scans the corpus once, multiplying each Arrow batch
    against the index (vectorized BLAS matmul, not per-row Python). One
    pass over the corpus, no shuffle; valid while n_vectors x dim fits in
    executor memory (same contract as any broadcast side). Past that, the
    LSH-bucketed variant (lsh_bucketed_topk's sketch scheme) is the
    sub-linear scale path.
    """
    import numpy as np

    spark = embeddings.sparkSession
    pdf = embeddings.select(id_col, vec_col).toPandas()
    ids = pdf[id_col].to_numpy()
    mat = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    index_bc = spark.sparkContext.broadcast((ids, mat))

    out_schema = T.StructType([
        T.StructField("id_a", T.LongType()),
        T.StructField("id_b", T.LongType()),
        T.StructField("cos_sim", T.DoubleType()),
    ])

    def scan(batches):
        import pandas as pd
        idx_ids, idx_mat = index_bc.value
        for pdf_batch in batches:
            b_ids = pdf_batch[id_col].to_numpy()
            b_mat = np.array([np.asarray(v, dtype=np.float64)
                              for v in pdf_batch[vec_col]])
            b_mat /= np.linalg.norm(b_mat, axis=1, keepdims=True)
            sims = b_mat @ idx_mat.T
            rows_i, cols_j = np.nonzero(
                (sims >= threshold) & (b_ids[:, None] < idx_ids[None, :]))
            yield pd.DataFrame({
                "id_a": b_ids[rows_i].astype("int64"),
                "id_b": idx_ids[cols_j].astype("int64"),
                "cos_sim": np.round(sims[rows_i, cols_j], 6),
            })

    return embeddings.select(id_col, vec_col).mapInPandas(scan, out_schema)


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


def quantize_int8(embeddings: DataFrame, id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """Symmetric int8 quantization per vector: scale = max|x| / 127,
    q_i = round(x_i / scale) clamped to [-127, 127]. The 4x storage/
    bandwidth reduction every billion-vector store takes before anything
    else; dot products on int8 with a per-vector scale reconstruct
    cosine to ~1e-2, which the IVF/LSH candidate stages don't notice
    (exact rescoring happens on the shortlist anyway).

    Pure column expressions (transform over the array) — quantization is
    a scan-speed map, no shuffle. Zero vectors get scale=0 and an all-
    zero code (guarded division).
    """
    x = as_double(F.col(vec_col))
    amax = F.array_max(F.transform(x, lambda v: F.abs(v)))
    scale = amax / F.lit(127.0)
    q = F.when(
        amax > 0,
        F.transform(x, lambda v:
                    F.greatest(F.lit(-127),
                               F.least(F.lit(127),
                                       F.round(v / scale, 0).cast("int"))))
    ).otherwise(F.transform(x, lambda v: F.lit(0)))
    return embeddings.select(
        F.col(id_col),
        q.alias("q8"),
        round_fixed(scale, 9).alias("scale"))


def ivf_topk(embeddings: DataFrame, k: int = 5, n_queries: int = 10,
             n_centroids: int | None = None, n_probe: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding",
             seed: int = 42) -> DataFrame:
    """IVF (inverted-file) approximate top-k: k-means coarse quantizer,
    exact cosine only inside the n_probe nearest centroid cells.

    The second scale path beside LSH (lsh_bucketed_topk): a TRAINED
    partition of the vector space instead of random hyperplanes — cells
    adapt to the data distribution, so the same probe budget buys higher
    recall on clustered corpora.

    Scale shape (billions of vectors): k-means training runs on a sample
    in practice (here: the corpus — it is the fixture); cell assignment is
    one distributed model.transform pass; the probe list per query is
    (query x centroid) — tiny, centroids live on the driver — and the
    candidate scan shuffles only the probed cells' members via a broadcast
    join on the cell id. n_centroids defaults to sqrt(N) (the standard
    IVF heuristic: cell size ~ sqrt(N) keeps scan cost ~ n_probe*sqrt(N)).

    With n_probe >= n_centroids every cell is probed and the result is
    EXACTLY cosine_topk (tested); with fewer probes recall < 1 by design,
    so the registered query is a rows-only check.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    spark = embeddings.sparkSession
    # cache: k-means makes maxIter+1 passes over the vectors, and the
    # count/fit/transform trio below would otherwise re-vectorize each pass
    emb = embeddings.select(
        F.col(id_col), F.col(vec_col),
        array_to_vector(as_double(F.col(vec_col))).alias("_fv")).cache()
    n = emb.count()
    kc = n_centroids or max(2, int(n ** 0.5))
    # a coarse quantizer needs rough cells, not converged ones — a few
    # Lloyd iterations buy the same recall at a fraction of the passes.
    # Train on a deterministic hash-sample when the corpus is large (the
    # standard IVF practice: centroids from a sample, assignment over
    # everything); ~40 points per centroid is plenty for coarse cells.
    train = emb
    target = 40 * kc
    if n > 2 * target:
        denom = max(2, n // target)
        train = emb.filter(
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(denom)) == 0)
    model = KMeans(k=kc, seed=seed, featuresCol="_fv", maxIter=5).fit(train)
    assigned = (model.transform(emb)
                .select(F.col(id_col), F.col(vec_col),
                        F.col("prediction").alias("cell")))

    centers = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        schema="cell int, c_vec array<double>")

    # probe list: each query's n_probe nearest cells by the quantizer's
    # own metric (euclidean — what k-means assigned by)
    q = assigned.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    sq_dist = F.aggregate(
        F.zip_with(as_double(F.col("q_vec")), F.col("c_vec"),
                   lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda acc, x: acc + x)
    w_probe = Window.partitionBy("query_id").orderBy(F.asc("d2"), F.asc("cell"))
    probes = (
        q.crossJoin(F.broadcast(centers))
        .withColumn("d2", sq_dist)
        .withColumn("pr", F.rank().over(w_probe))
        .filter(F.col("pr") <= n_probe)
        .select("query_id", "q_vec", "cell")
    )

    scored = (
        assigned.join(F.broadcast(probes), "cell")
        .filter(F.col(id_col) != F.col("query_id"))
        .withColumn("cos_sim",
                    round_fixed(cosine(as_double(F.col("q_vec")),
                                       as_double(F.col(vec_col))), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc(id_col))
    return (
        scored.withColumn("rnk", F.rank().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", F.col(id_col).alias("neighbor_id"),
                "cos_sim", "rnk")
    )
