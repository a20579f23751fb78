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
