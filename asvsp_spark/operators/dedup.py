"""Deduplication operators for training-data pipelines: exact, n-gram
Jaccard near-dup, MinHash+LSH, SimHash. Beyond-parity extension
(SURVEY §7.5) designed for 100TB corpora.

Scale design:
- Exact dedup is a hash-groupBy — one shuffle on a 16-byte digest, fully
  partial-aggregatable.
- Near-dup NEVER does an O(n^2) crossJoin. Exact Jaccard uses an inverted
  shingle index (explode -> self-join on shingle -> pair counts): cost is
  sum over shingles of df^2, which posting-list pruning keeps near-linear
  for natural corpora.
- MinHash-LSH is the sub-linear path: k hash functions -> b bands of r
  rows; candidate pairs only within equal band buckets, then verified
  with exact Jaccard. All hashing is expression-level (md5/conv), no
  Python in the loop.
- SimHash gives a 64-bit sketch per document via xxhash64 bit-voting —
  joinable on (near-)equal sketches; Hamming-close pairs via band keys.

Every operator is a pure DataFrame transform returning columns the
oracle can check (where SQL-expressible).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from asvsp_spark.functions.text import fingerprint
from asvsp_spark.plans.base import round_fixed


def exact_dedup(documents: DataFrame,
                id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Canonical-text exact dedup: one row per distinct fingerprint with
    the smallest id as the keeper and the duplicate count."""
    return (
        documents
        .select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keeper_id"),
             F.count(F.lit(1)).alias("n_copies"))
    )


def shingled(documents: DataFrame, n: int = 3,
             id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, shingles array<string>) with distinct word n-gram shingles.

    Expression-level shingling: transform over an index sequence — stays
    in codegen. Documents shorter than n words get zero shingles.
    """
    idx = ", ".join(f"toks[i+{k}]" for k in range(n))
    return (
        documents
        .withColumn("toks", F.split(F.trim(F.col(text_col)), r"\s+"))
        .withColumn(
            "shingles",
            F.expr(
                f"array_distinct(transform(sequence(0, greatest(size(toks) - {n}, -1)),"
                f" i -> concat_ws(' ', {idx})))"))
        .select(F.col(id_col).alias("doc"), "shingles")
        .filter(F.size("shingles") > 0)
    )


def jaccard_pairs(documents: DataFrame, n: int = 3, threshold: float = 0.5,
                  id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact n-gram Jaccard near-duplicate pairs via inverted shingle
    index (no crossJoin): pairs sharing >= 1 shingle are candidates;
    jaccard = |intersection| / |union| from exact integer counts."""
    sh = shingled(documents, n, id_col, text_col)
    sizes = sh.select("doc", F.size("shingles").alias("n_sh"))
    posting = sh.select("doc", F.explode("shingles").alias("sh"))
    a, b = posting.alias("a"), posting.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh"))
               & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn("jaccard",
                    F.col("n_inter")
                    / (F.col("n_a") + F.col("n_b") - F.col("n_inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_inter", "n_a", "n_b",
                round_fixed(F.col("jaccard"), 6).alias("jaccard"))
    )


def minhash_signatures(sh: DataFrame, num_hashes: int = 16) -> DataFrame:
    """k minhash values per doc, via deterministic md5-based hash family
    h_i(s) = int(md5(i || ':' || s)[:12], 16). Pure expressions."""
    sig_cols = [
        F.expr(
            "array_min(transform(shingles,"
            f" s -> conv(substring(md5(concat('{i}:', s)), 1, 12), 16, 10)))"
        ).cast("long").alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    return sh.select("doc", "shingles", *sig_cols)


def minhash_lsh_pairs(documents: DataFrame, n: int = 3, threshold: float = 0.5,
                      num_hashes: int = 16, bands: int = 8,
                      id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """MinHash-LSH candidate generation + exact-Jaccard verification.

    bands x rows = num_hashes; a pair collides if any band's row-slice of
    the signature matches. Collision probability 1-(1-j^r)^b — with 16
    hashes / 8 bands (r=2), j=0.5 pairs are caught w.p. ~0.9. Verified
    pairs are a (high-recall) subset of jaccard_pairs' output; the final
    jaccard is exact, so no false positives.
    """
    rows = num_hashes // bands
    sh = shingled(documents, n, id_col, text_col)
    sig = minhash_signatures(sh, num_hashes)
    band_cols = [
        F.concat_ws("_", F.lit(bi),
                    *[F.col(f"mh_{bi * rows + r}") for r in range(rows)])
        .alias("band_key")
        for bi in range(bands)
    ]
    buckets = sig.select(
        "doc", F.explode(F.array(*band_cols)).alias("band_key"))
    a, b = buckets.alias("a"), buckets.alias("b")
    candidates = (
        a.join(b, (F.col("a.band_key") == F.col("b.band_key"))
               & (F.col("a.doc") < F.col("b.doc")))
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )
    # exact verification on candidates only
    sh_a = sh.select(F.col("doc").alias("doc_a"), F.col("shingles").alias("sh_a"))
    sh_b = sh.select(F.col("doc").alias("doc_b"), F.col("shingles").alias("sh_b"))
    return (
        candidates.join(sh_a, "doc_a").join(sh_b, "doc_b")
        .withColumn("n_inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn("n_union", F.size(F.array_union("sh_a", "sh_b")))
        .withColumn("jaccard", F.col("n_inter") / F.col("n_union"))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", round_fixed(F.col("jaccard"), 6).alias("jaccard"))
    )


def simhash64(documents: DataFrame,
              id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash per document: xxhash64 each token, vote per bit,
    pack the sign vector. Expression-level fold (aggregate + transform);
    no Python in the loop.

    Output: (doc_id, simhash long). Near-dups have small Hamming
    distance; pair generation joins on 4x16-bit band keys (any equal
    band => candidate), the standard <=3-bit-error trick scaled to 64
    bits.
    """
    votes = F.expr(
        "aggregate(toks, array_repeat(0, 64), (acc, t) ->"
        " zip_with(acc, transform(sequence(0, 63),"
        "   b -> CASE WHEN (shiftright(xxhash64(t), b) & 1L) = 1L THEN 1 ELSE -1 END),"
        " (x, y) -> x + y))")
    pack = F.expr(
        "aggregate(transform(sequence(0, 63),"
        " b -> IF(votes[b] > 0, shiftleft(1L, b), 0L)), 0L, (acc, x) -> acc | x)")
    return (
        documents
        .withColumn("toks", F.split(F.trim(F.col(text_col)), r"\s+"))
        .withColumn("votes", votes)
        .withColumn("simhash", pack)
        .select(F.col(id_col), "simhash")
    )


def simhash_pairs(documents: DataFrame, max_hamming: int = 3,
                  id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Hamming-close pairs via 4x16-bit SimHash bands: pairs within
    Hamming distance 3 must share at least one of 4 bands."""
    sig = simhash64(documents, id_col, text_col)
    bands = sig.select(
        F.col(id_col).alias("doc"), "simhash",
        F.explode(F.array(*[
            F.concat_ws("_", F.lit(i),
                        F.shiftright("simhash", i * 16)
                        .bitwiseAND(F.lit(0xFFFF).cast("long")))
            for i in range(4)
        ])).alias("band_key"))
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(b, (F.col("a.band_key") == F.col("b.band_key"))
               & (F.col("a.doc") < F.col("b.doc")))
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"),
                F.col("a.simhash").alias("sim_a"), F.col("b.simhash").alias("sim_b"))
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
