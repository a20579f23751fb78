"""Model-based quality filtering — the fasttext/logistic-regression
classifier stage of the classic LLM data pipeline (GPT-3's LR over
hashed n-grams scoring CommonCrawl against a curated positive set;
LLaMA/RefinedWeb use the same shape): train a linear classifier on
labeled good/bad documents, then score the whole corpus and gate on the
probability.

Parity note: the reference has no learned components; this is
beyond-parity surface alongside the heuristic gates (quality_filter,
token_entropy) — the learned gate is what production pipelines use once
heuristics stop separating.

Shape, at 100 TB:

- Features are hashed unigram+bigram counts (``HashingTF`` — murmur3
  mod 2^18, no vocabulary to build or ship), so featurization is one
  stateless row-local projection: no shuffle, no fit step, no driver
  state, identical at any corpus size.
- Training (``pyspark.ml`` LogisticRegression, L-BFGS) is a handful of
  treeAggregate passes over the LABELED subset — which in practice is
  thousands-to-millions of rows, not the corpus. Each pass reduces one
  (2^18)-dim gradient per partition; cost is linear in labeled rows.
- Scoring broadcasts the coefficient vector (2^18 doubles ≈ 2 MB) and
  is a row-local dot product over the hashed features — embarrassingly
  parallel, JVM-side (Scala transform, not a Python UDF), one corpus
  scan. Gate + write can pipeline in the same stage.
- Determinism: hashing is seedless murmur3; L-BFGS from the fixed zero
  initial point over a deterministic aggregation tree converges to the
  same coefficients for the same input split — predictions are
  reproducible (pinned in tests).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from asvsp_spark.functions import text as TX
from asvsp_spark.operators.relevance import bigrams
from asvsp_spark.plans.base import round_fixed

DEFAULT_N_FEATURES = 1 << 18


def _gram_features(text_col: Column) -> Column:
    """Unigrams + adjacent bigrams as one token array (the fasttext
    wordNgrams=2 feature space); row-local, no vocabulary."""
    return F.concat(TX.tokens(text_col), bigrams(text_col))


def train_quality_classifier(labeled: DataFrame, text_col: str = "text",
                             label_col: str = "label",
                             n_features: int = DEFAULT_N_FEATURES,
                             max_iter: int = 30, reg_param: float = 0.01):
    """Fit the linear quality model on ``labeled`` (text + 0/1 label).
    Returns a fitted PipelineModel (HashingTF -> LogisticRegression);
    pass it to :func:`score_quality`. The labeled frame is the curated
    sample, not the corpus — train cost never scales with corpus size.
    """
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF

    feats = labeled.withColumn("_grams", _gram_features(F.col(text_col)))
    tf = HashingTF(inputCol="_grams", outputCol="_features",
                   numFeatures=n_features)
    # a small L2 default keeps L-BFGS convergent on linearly-separable
    # labels (unregularized weights diverge and the line search fails)
    lr = LogisticRegression(featuresCol="_features", labelCol=label_col,
                            maxIter=max_iter, regParam=reg_param,
                            standardization=False)
    return Pipeline(stages=[tf, lr]).fit(feats)


def score_quality(docs: DataFrame, model, text_col: str = "text",
                  id_col: str = "doc_id",
                  keep_cols: tuple[str, ...] = ()) -> DataFrame:
    """(id, p_good, predicted) for every document: the broadcast-weights
    corpus scan. ``p_good`` is the class-1 probability rounded via the
    round_fixed contract; gate with ``p_good >= tau`` (GPT-3 used a
    Pareto-resampled tau, RefinedWeb a fixed one)."""
    from pyspark.ml.functions import vector_to_array

    feats = docs.withColumn("_grams", _gram_features(F.col(text_col)))
    scored = model.transform(feats)
    return scored.select(
        id_col, *keep_cols,
        round_fixed(vector_to_array(F.col("probability"))[1], 6)
        .alias("p_good"),
        F.col("prediction").cast("int").alias("predicted"))


def nb_quality_scores(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", vocab_size: int = 2048,
                      scale: int = 1000,
                      train_cap: int = 10_000) -> DataFrame:
    """Exact-integer linear quality scores — the oracle-pairable twin
    of the mllib path above (r8 verdict item 5): train a multinomial
    Naive-Bayes-weighted linear classifier (the NB feature weighting
    of NBSVM, Wang & Manning 2012 — fasttext's classic baseline) on
    the heuristic-extreme labels, calibrate the decision threshold on
    the labeled scores, then score EVERY document with the broadcast
    weight table. Every number is integer or engine-stable-rounded, so
    DuckDB replays training, calibration AND scoring bit-identically:

    - Features: unigram+bigram token counts — no murmur3 HashingTF,
      whose hash DuckDB cannot reproduce; instead an explicit bounded
      vocabulary. (Counts, not binarized presence: the bootstrap label
      is rate-based — length + stopword ratio — and presence features
      measured coin-flip agreement on the fixture where counts reach
      0.93-1.0.)
    - Vocabulary: top ``vocab_size`` grams by labeled occurrence
      count, ties to the lexicographically smaller gram —
      TakeOrderedAndProject (distributed top-k, never a global sort).
    - Weight per gram: the exact-rational centered class-rate odds
      ``scale * ((a+1)(B+V) - (b+1)(A+V)) / ((a+1)(B+V) + (b+1)(A+V))``
      (a/b = gram occurrences in pos/neg, A/B = class totals, V =
      vocab size as the smoothing mass) rounded HALF AWAY in pure
      int64 (the _round_half_away formula, similarity.py) — a monotone
      transform of the smoothed multinomial odds ratio into
      [-scale, scale] that avoids transcendental log entirely, so no
      ulp can drift between engines.
    - Decision: ``predicted = score_micro > cut`` where ``cut`` is the
      k-th smallest labeled score (k = #negative-labeled docs, ties by
      doc id) — standard threshold calibration on the training slice,
      fixing the predicted-positive rate to the labeled rate. Exact
      integer comparison, no sigmoid.

    Scale shape: training runs on a bounded deterministic md5-hash
    sample of the labeled slice (``train_cap`` docs — the ANN family's
    _md5_sample_gate trade: centroids/weights from a sample, scoring
    over everything; gate fires past 2x the cap, replayed by the
    oracle with the shared md5-slice construction), then one
    labeled-scan for counts, top-k to a driver-bounded vocab, one
    corpus scan joined against the BROADCAST weight table, doc-keyed
    partial agg — the same single-corpus-scan cost as the mllib
    scorer. The calibration rank sorts only the labeled-sample's
    (int64 score, id) pairs; past ~1e9 labeled docs swap it for a
    fixed or approx-quantile cut, the same documented trade as DSIR's
    global rank. The class-totals probe is a bounded collect that
    doubles as the LOUD int64 overflow guard (numpy/JVM wrap silently
    where DuckDB promotes to HUGEINT — the similarity.py lesson)."""
    from pyspark.sql import Window

    from asvsp_spark.plans.base import md5_slice_long

    docs = docs.filter(F.col(text_col).isNotNull())
    if "lang" not in docs.columns:   # the heuristic_labels default
        docs = docs.withColumn("lang", F.lit("all"))

    # cache + explicit unpersist (the ivf_topk convention): the
    # labeled lineage (corpus scan + per-lang exact-percentile shuffle)
    # feeds four actions below — count, the totals probe, the model
    # collect and the calibration scan — and every derived artifact is
    # materialized before the return, so the cache never leaks into
    # the returned plan
    labeled_all = heuristic_labels(docs, text_col=text_col).cache()
    n_lab = labeled_all.count()
    labeled = labeled_all
    if n_lab > 2 * train_cap:
        denom = max(2, n_lab // train_cap)
        labeled = labeled_all.filter(
            F.pmod(md5_slice_long(F.col(id_col).cast("string")),
                   F.lit(denom)) == 0)
    inst = labeled.select(
        F.col("label"), F.col(id_col),
        F.explode(_gram_features(F.col(text_col))).alias("term"))
    # driver-ok: three scalars; doubles as the loud overflow guard
    tot = inst.agg(
        F.sum(F.when(F.col("label") == 1, 1).otherwise(0))
        .cast("long").alias("ta"),
        F.sum(F.when(F.col("label") == 0, 1).otherwise(0))
        .cast("long").alias("tb"),
        F.countDistinct(F.when(F.col("label") == 0, F.col(id_col)))
        .cast("long").alias("n_neg_docs")).collect()[0]
    ta, tb = int(tot["ta"] or 0), int(tot["tb"] or 0)
    n_neg_docs = int(tot["n_neg_docs"] or 0)
    # headroom: the rounding expression computes 2*s + d with
    # |s| <= worst and d <= 2*worst/scale, so admitting worst up to
    # 2^62 would let the SUM wrap for small `scale` — cap at 2^61
    # (2*worst <= 2^62 and d adds at most another 2*worst, total
    # always < 2^63 whatever scale >= 1)
    worst = scale * (max(ta, tb) + 1) * (max(ta, tb) + vocab_size)
    if worst >= 2 ** 61:
        raise ValueError(
            f"nb_quality_scores: class token totals ({ta}, {tb}) "
            "overflow the exact-int64 weight identity (JVM wraps "
            "silently; the SQL twin promotes to HUGEINT, so results "
            "would silently diverge). Lower `scale` or `train_cap`.")

    counts = inst.groupBy("term").agg(
        F.sum(F.when(F.col("label") == 1, 1).otherwise(0))
        .cast("long").alias("a"),
        F.sum(F.when(F.col("label") == 0, 1).otherwise(0))
        .cast("long").alias("b"))
    vocab = (counts.orderBy(F.desc(F.col("a") + F.col("b")),
                            F.asc("term"))
             .limit(vocab_size))
    s = (F.lit(int(scale))
         * ((F.col("a") + 1) * F.lit(tb + vocab_size)
            - (F.col("b") + 1) * F.lit(ta + vocab_size)))
    d = ((F.col("a") + 1) * F.lit(tb + vocab_size)
         + (F.col("b") + 1) * F.lit(ta + vocab_size))
    # integer round-half-away: s >= 0 -> (2s+d) div (2d); else the
    # mirrored non-negative form (both DIV operands positive in each
    # branch, so Spark's truncating div == DuckDB's flooring //)
    # driver-ok: <= vocab_size rows (the ivf cents.collect precedent) —
    # materializing the model here frees the labeled cache before the
    # returned plan ever executes
    w_rows = (vocab.withColumn("s", s).withColumn("d", d).selectExpr(
        "term",
        "CASE WHEN s >= 0 THEN (2*s + d) DIV (2*d) "
        "ELSE -((-2*s + d) DIV (2*d)) END AS w")).collect()
    weights = docs.sparkSession.createDataFrame(
        w_rows, "term string, w long")

    doc_terms = docs.select(
        F.col(id_col),
        F.explode(_gram_features(F.col(text_col))).alias("term"))
    scored = (doc_terms.join(F.broadcast(weights), "term")
              .groupBy(id_col)
              .agg(F.sum("w").alias("score_micro"),
                   F.count("*").cast("long").alias("n_hits")))
    all_scores = (docs.select(id_col, "lang")
                  .join(scored, id_col, "left")
                  .select(id_col, "lang",
                          F.coalesce("n_hits", F.lit(0)).cast("long")
                          .alias("n_hits"),
                          F.coalesce("score_micro", F.lit(0))
                          .cast("long").alias("score_micro")))

    if n_neg_docs == 0:
        # degenerate corpus: no negative evidence — the calibrated
        # predicted-positive rate is the labeled rate, i.e. 100%
        # (oracle mirror: cut coalesces to int64-min, score > cut
        # always holds)
        labeled_all.unpersist()
        return all_scores.withColumn("predicted", F.lit(1).cast("int"))
    # cut: k-th smallest labeled score, k = #neg (driver-ok: 1 scalar).
    # The rank sorts only the labeled sample's (int64, id) pairs.
    # Score the LABELED SLICE directly instead of semi-joining the
    # corpus-wide scoring frame: the semi-join formulation executed the
    # full corpus explode+join+agg ONCE HERE (the collect below) and
    # again when the returned plan runs — at 100 TB that is a second
    # complete corpus scan spent ranking a bounded training sample
    # (optimization guide §1.2 "don't compute things you throw away").
    # The labeled slice is cached and train_cap-bounded; per-doc scores
    # are identical to the corpus frame's rows for those ids (same
    # text, same broadcast weights), so `cut` is unchanged — pinned by
    # the oracle hash and tests/test_classify.py.
    lab_terms = labeled.select(
        F.col(id_col),
        F.explode(_gram_features(F.col(text_col))).alias("term"))
    lab_scored = (lab_terms.join(F.broadcast(weights), "term")
                  .groupBy(id_col)
                  .agg(F.sum("w").alias("_s")))
    lab_scores = (labeled.select(id_col)
                  .join(lab_scored, id_col, "left")
                  .select(id_col,
                          F.coalesce("_s", F.lit(0)).cast("long")
                          .alias("score_micro")))
    w_rank = Window.orderBy("score_micro", id_col)
    cut_rows = (lab_scores
                .withColumn("r", F.row_number().over(w_rank))
                .filter(F.col("r") == n_neg_docs)
                .select("score_micro").collect())
    labeled_all.unpersist()
    cut = int(cut_rows[0][0])   # rank k <= n labeled always exists
    return all_scores.withColumn(
        "predicted",
        (F.col("score_micro") > F.lit(cut)).cast("int"))


def heuristic_labels(docs: DataFrame, text_col: str = "text",
                     frac: float = 0.25) -> DataFrame:
    """Bootstrap labels when no curated set exists (the standard
    cold-start: label the heuristically-best ``frac`` of each language 1
    and the worst ``frac`` 0, leave the ambiguous middle out of
    training). Uses the same quality score as the heuristic gate, so
    the classifier learns to generalize the heuristic beyond its
    hand-picked features (the exact shared formula —
    functions/text.py quality_score_expr — so gate and bootstrap can
    never drift). One scan + per-language exact percentiles (broadcast
    thresholds). A corpus without a ``lang`` column is treated as one
    language; zero-token docs score NULL and are left unlabeled."""
    if "lang" not in docs.columns:
        docs = docs.withColumn("lang", F.lit("all"))
    scored = (docs
              .withColumn("_toks", TX.tokens(F.col(text_col)))
              .withColumn("_n", F.size("_toks"))
              .withColumn("_q", round_fixed(TX.quality_score_expr(
                  F.col("_n"), TX.stopword_count("_toks")), 6))
              .drop("_toks"))
    th = scored.groupBy("lang").agg(
        F.percentile("_q", frac).alias("_lo"),
        F.percentile("_q", 1.0 - frac).alias("_hi"))
    return (scored.join(F.broadcast(th), "lang")
            .withColumn("label", F.when(F.col("_q") >= F.col("_hi"), 1)
                        .when(F.col("_q") <= F.col("_lo"), 0))
            .filter(F.col("label").isNotNull())
            .drop("_n", "_q", "_lo", "_hi"))
