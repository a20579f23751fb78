"""BPE vocabulary learning (operators/vocab.py): the learner against a
pure-Python textbook reference under hypothesis-randomized corpora, the
rank-priority application semantics, and the entropy / cohort edge
cases the fixtures never hit."""

from __future__ import annotations

import collections
import math

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from asvsp_spark.functions import text as TX
from asvsp_spark.operators.vocab import (bpe_apply, bpe_merge_table,
                                         word_frequencies)

SET = settings(max_examples=6, deadline=None,
               suppress_health_check=[HealthCheck.function_scoped_fixture,
                                      HealthCheck.too_slow])


def _ref_bpe(words: list[str], num_merges: int, min_count: int):
    """Textbook BPE: argmax adjacent-pair count (ties: count DESC, then
    (left, right) ASC), greedy left-to-right non-overlapping rewrite."""
    vocab: dict[tuple[str, ...], int] = collections.Counter()
    for w in words:
        vocab[tuple(w)] += 1
    out = []
    for rank in range(1, num_merges + 1):
        pc: collections.Counter = collections.Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += c
        pc = {k: v for k, v in pc.items() if v >= min_count}
        if not pc:
            break
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((rank, a, b, a + b, cnt))
        nv: collections.Counter = collections.Counter()
        for syms, c in vocab.items():
            res: list[str] = []
            for x in syms:
                if res and res[-1] == a and x == b:
                    res[-1] = a + b
                else:
                    res.append(x)
            nv[tuple(res)] += c
        vocab = dict(nv)
    return out


@given(docs=st.lists(
    st.lists(st.text(alphabet="abc", min_size=1, max_size=5),
             min_size=1, max_size=8).map(" ".join),
    min_size=1, max_size=6))
@SET
def test_bpe_matches_reference(spark, docs):
    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    got = [tuple(r) for r in
           bpe_merge_table(df, num_merges=6, min_pair_count=2).collect()]
    words = [w for d in docs for w in d.split()]
    assert got == _ref_bpe(words, 6, 2)


@given(docs=st.lists(
    st.lists(st.text(alphabet="abc", min_size=1, max_size=5),
             min_size=1, max_size=8).map(" ".join),
    min_size=1, max_size=5))
@settings(max_examples=4, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
def test_bpe_local_equals_distributed(spark, docs):
    """The driver-local merge loop (default) and the distributed
    explode/fold iteration (max_local_vocab=0) are the same algorithm —
    identical merge tables under randomized corpora, including
    tie-break order and early stop. This keeps the DISTRIBUTED path
    (the production path past the vocabulary cap) under hypothesis
    coverage now that every other BPE test exercises the local
    default."""
    df = spark.createDataFrame(list(enumerate(docs)),
                               "doc_id long, text string")
    local = [tuple(r) for r in
             bpe_merge_table(df, num_merges=5, min_pair_count=2).collect()]
    dist = [tuple(r) for r in
            bpe_merge_table(df, num_merges=5, min_pair_count=2,
                            max_local_vocab=0).collect()]
    assert local == dist


def test_bpe_early_stop_below_min_count(spark):
    """Every pair unique -> no merge reaches min_pair_count=2."""
    df = spark.createDataFrame([(1, "ab cd ef")], "doc_id long, text string")
    assert bpe_merge_table(df, num_merges=4, min_pair_count=2).count() == 0


def test_bpe_apply_rank_priority(spark):
    """Application is rank-priority, not replay-in-order: with merges
    1=(b,c) and 2=(a,b), 'abc' must merge (b,c) FIRST (a+bc stays two
    tokens) — replay-in-order would also give 2, but 'abcbc' separates
    the semantics: rank-priority gives a,bc,bc = 3."""
    docs = spark.createDataFrame(
        [(1, "abcbc abc"), (2, "")], "doc_id long, text string")
    merges = spark.createDataFrame(
        [(1, "b", "c", "bc", 9), (2, "a", "b", "ab", 5)],
        "rank int, left string, right string, merged string, pair_count bigint")
    rows = {r["doc_id"]: r for r in bpe_apply(docs, merges).collect()}
    assert rows[1]["n_words"] == 2
    # 'abcbc' -> a,bc,bc (3); 'abc' -> a,bc (2)
    assert rows[1]["n_bpe_tokens"] == 5
    assert rows[2]["n_words"] == 0 and rows[2]["n_bpe_tokens"] == 0


def test_word_frequencies_drops_empty(spark):
    df = spark.createDataFrame(
        [(1, "a a b"), (2, ""), (3, None)], "doc_id long, text string")
    got = {r["word"]: r["freq"] for r in word_frequencies(df).collect()}
    assert got == {"a": 2, "b": 1}


@given(toks=st.lists(st.sampled_from("abcd"), min_size=0, max_size=12))
@SET
def test_token_entropy_matches_reference(spark, toks):
    text = " ".join(toks)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string") \
        .select(TX.tokens(F.col("text")).alias("toks"))
    got = df.select(F.round(TX.token_entropy("toks"), 9).alias("h")) \
        .collect()[0]["h"]
    # split(trim('')) yields [''] in both engines: one empty token
    eff = toks or [""]
    n = len(eff)
    counts = collections.Counter(eff)
    exp = math.log(n) - sum(c * math.log(c) for c in counts.values()) / n
    assert abs(got - exp) < 1e-9


def test_cli_bpe_learn_and_apply(spark, tmp_path, capsys):
    """CLI round-trip: learn a merge table, apply it back, and check the
    segmented counts agree with bpe_apply on the learned table."""
    from asvsp_spark.cli import main
    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, "lowest lowest newest widest" if i % 2 else "low new wide")
         for i in range(8)],
        "doc_id long, text string").write.parquet(src)
    out = str(tmp_path / "merges")
    seg = str(tmp_path / "seg")
    assert main(["bpe", src, out, "--num-merges", "6",
                 "--apply-out", seg]) == 0
    assert "learned" in capsys.readouterr().out
    merges = spark.read.parquet(out)
    assert 0 < merges.count() <= 6
    got = spark.read.parquet(seg)
    assert got.count() == 8
    exp = {r["doc_id"]: r["n_bpe_tokens"] for r in bpe_apply(
        spark.read.parquet(src), merges).collect()}
    assert {r["doc_id"]: r["n_bpe_tokens"] for r in got.collect()} == exp


def test_corpus_pipeline_entropy_gate_and_bpe_stage(spark, tmp_path):
    """min_norm_entropy drops low-entropy docs before the quality gate
    (funnel stays monotone) and bpe_merges lands a learned merge table
    beside the corpus, trained on exactly the written survivors."""
    from asvsp_spark.pipeline import run_corpus_pipeline
    from tests.conftest import SF_DIR
    out = str(tmp_path / "clean")
    counts = run_corpus_pipeline(spark, SF_DIR, out,
                                 min_norm_entropy=0.2, bpe_merges=4)
    assert counts["raw"] >= counts["quality_gated"] >= counts["written"] > 0
    merges = spark.read.parquet(f"{out}/bpe_merges")
    assert counts["bpe_merges"] == merges.count() <= 4
    exp = bpe_merge_table(spark.read.parquet(f"{out}/corpus"),
                          num_merges=4)
    assert sorted(map(tuple, merges.collect())) == \
        sorted(map(tuple, exp.collect()))


def test_cohort_retention_first_month_is_one(spark):
    """Every cohort's months_since=0 row has retention exactly 1.0, and
    a customer ordering in months 0 and 2 lands in offsets {0, 2}."""
    from asvsp_spark.plans.registry import all_queries
    import pyspark.sql.functions as SF
    out = all_queries()["cohort_retention"](spark, "/root/testdata/sf0.001")
    first = out.filter(SF.col("months_since") == 0)
    assert first.count() > 0
    assert first.filter(SF.col("retention") != 1.0).count() == 0
    assert out.filter(SF.col("retention") > 1.0).count() == 0
