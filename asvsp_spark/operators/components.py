"""Connected components over a pair/edge list — the clustering step of a
dedup pipeline: near-dup PAIRS (jaccard_pairs, minhash_lsh_pairs,
cosine_dup_pairs) become dedup CLUSTERS, and min-id-per-cluster picks the
canonical document to keep. The reference has no graph/iterative
operator of any kind; this is the §7.5 extension family's capstone.

Algorithm: iterative min-label propagation — every vertex repeatedly
adopts the smallest label among itself and its neighbors until fixpoint.
Deterministic (min is order-independent), so the result is oracle-
checkable (DuckDB recursive-CTE reachability computes the same min).

Scale notes (100TB): each round is one shuffle-by-vertex join + one
aggregate; rounds needed = graph diameter. Near-dup graphs are shallow
(clusters are cliques-ish from LSH band collisions), so a handful of
rounds converge; for adversarial long-chain graphs swap in the
large-star/small-star contraction (same join primitives, O(log n)
rounds — Kiveris et al., "Connected Components in MapReduce"). Lineage
is truncated every round with localCheckpoint (on a cluster, configure
``spark.checkpoint.dir`` and use checkpoint() for fault tolerance —
without truncation the plan doubles per round and the driver OOMs on
plan analysis long before data is the problem).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(edges: DataFrame, src: str = "doc_a",
                         dst: str = "doc_b", max_iter: int = 25) -> DataFrame:
    """(vertex, component) for every vertex appearing in ``edges``;
    component = min vertex id reachable over undirected edges."""
    a = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = a.unionByName(a.select(F.col("v").alias("u"), F.col("u").alias("v")))
    sym = sym.distinct().localCheckpoint(eager=True)

    labels = (sym.select(F.col("u").alias("vertex"))
              .distinct()
              .withColumn("label", F.col("vertex")))

    for _ in range(max_iter):
        neigh = (
            sym.join(labels, sym.v == labels.vertex)
            .groupBy(F.col("u").alias("vertex"))
            .agg(F.min("label").alias("n_min"))
        )
        # lazy localCheckpoint: the count() below materializes it, so each
        # round costs ONE job (eager=True + count was two)
        updated = (
            labels.join(neigh, "vertex", "left")
            .select("vertex",
                    F.least("label", F.coalesce("n_min", "label"))
                    .alias("label"),
                    (F.col("n_min") < F.col("label")).alias("_changed"))
        ).localCheckpoint(eager=False)
        changed = updated.filter(F.col("_changed")).count()
        labels = updated.drop("_changed")
        if changed == 0:
            break
    return labels.select("vertex", F.col("label").alias("component"))


def dedup_clusters(documents: DataFrame, edges: DataFrame,
                   id_col: str = "doc_id") -> DataFrame:
    """Cluster assignment for every document: near-dup cluster id (= min
    doc id in the component), cluster size, and whether this doc is the
    canonical keeper. Documents with no near-dup edge form singleton
    clusters of themselves.
    """
    cc = connected_components(edges)
    assigned = (
        documents.select(F.col(id_col).alias("doc_id"))
        .join(cc, F.col("doc_id") == cc.vertex, "left")
        .select("doc_id",
                F.coalesce("component", "doc_id").alias("cluster_id"))
    )
    sizes = assigned.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size"))
    return (
        assigned.join(sizes, "cluster_id")
        .select("doc_id", "cluster_id", "cluster_size",
                (F.col("doc_id") == F.col("cluster_id")).alias("is_keeper"))
    )
