"""Adversarial cross-engine regex parity (hypothesis) — r9 verdict
item 5 generalized: the r9 review found two empirically-divergent
Java-vs-RE2 classes ('$' before a final \\r; Java-\\s containing VT) by
hand; this suite searches for the rest mechanically. Strings are built
from fragments heavy in control characters, Unicode line terminators,
exotic case mappings and PII-shaped runs, then every oracle-paired
regex surface is compared against its DuckDB twin:

- the registered doc-profile entries end-to-end against their REAL
  oracle SQL (tokens split, fingerprint canonicalization, gopher line
  rules, C4 line-keep + page gates, language ID),
- the PII patterns (counts + sequential scrub) and the BPE
  pre-tokenizer against test-local DuckDB twins built from the same
  shared pattern constants the engine uses.

First catch (r10, before this file was committed): Java toLowerCase
applies contextual/multi-codepoint case rules (final sigma, Turkish İ)
where DuckDB's utf8proc maps 1:1 — fingerprint() and C4's has_lorem
diverged on such text. Fixed by ASCII-only case folding (lower_ascii /
translate) on both sides; the FRAGMENTS list keeps those trigger
strings so the suite re-proves the fix every run.
"""

from __future__ import annotations

import datetime
import os
import shutil
import tempfile

import duckdb
import pytest  # noqa: F401
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from tests.conftest import compare_frames_hashed

SET_HEAVY = settings(max_examples=6, deadline=None,
                     suppress_health_check=[
                         HealthCheck.function_scoped_fixture,
                         HealthCheck.too_slow])
SET_LIGHT = settings(max_examples=20, deadline=None,
                     suppress_health_check=[
                         HealthCheck.function_scoped_fixture,
                         HealthCheck.too_slow])

# words / case traps / digits / PII shapes / punctuation / bullets /
# ellipses / braces / control chars and Unicode terminators
FRAGMENTS = [
    "the", "a", "of", "word", "Alpha", "naïve", "β", "数",
    "İstanbul", "ΣΙΓΜΑΣ", "STRASSE ß", "ĲSSel", "ﬁne",
    "LOREM İPSUM", "lorem ipsum", "Lorem Ipsum dolor",
    "123", "4567", "12345678901",
    "a@b.co", "x.y+z@mail.example.com", "not@at",
    "123-45-6789", "555-123-4567", "+1 555-123-4567",
    "1.555-123-4567", "1.2.3.4", "10.0.0.255", "1.234.567.8901",
    ".", "!", "?", "...", "…", "....", "\"", "'", "'s", "'ll",
    "{", "}", "-", "*", "•", "#", "- item", "* bullet",
    " ", "  ", "\t", "\n", "\r", "\r\n", "\x0b", "\f",
    "\x85", " ", " ", " ", "　",
    "ends with ...", "five words on this line.",
]

adversarial_text = st.lists(
    st.sampled_from(FRAGMENTS), min_size=0, max_size=30).map("".join)

# the registered doc-profile entries whose oracles carry regex logic
# and whose outputs are integers/strings or single-division rounds (ANY
# text is in-contract; float-FOLD entries like token_entropy are out of
# the regex-parity charter — their FP summation order legitimately
# differs between engines below the rounding contract)
ENTRIES = ("gopher_quality_report", "c4_quality_report",
           "doc_fingerprint", "text_profile", "lang_id",
           "token_length_histogram", "text_quality", "doc_repetition",
           "top_bigrams", "chunk_documents")


def _compare_corpus_entries(spark, docs, entry_names):
    """Write (doc_id, text) docs as a documents.parquet corpus, run
    each registered entry against its real DuckDB oracle, and
    hash-compare via the shared driver-style comparator. Temp corpus
    and connection cleaned up per call (they leaked per hypothesis
    example before the r10 review)."""
    from asvsp_spark.plans.registry import all_oracle_sql, all_queries

    d = tempfile.mkdtemp(prefix="regexprop-")
    con = duckdb.connect()
    try:
        (spark.createDataFrame(list(enumerate(docs)),
                               "doc_id long, text string")
         .withColumn("lang", F.lit("en"))
         .withColumn("source", F.lit("prop"))
         .withColumn("n_chars", F.length("text").cast("long"))
         .coalesce(1).write.mode("overwrite")
         .parquet(os.path.join(d, "documents.parquet")))
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM parquet_scan("
            f"'{os.path.join(d, 'documents.parquet')}/*.parquet')")
        qs, osql = all_queries(), all_oracle_sql()
        for name in entry_names:
            compare_frames_hashed(
                qs[name](spark, d), con.sql(osql[name]),
                context=f"{name} on {docs!r}")
    finally:
        con.close()
        shutil.rmtree(d, ignore_errors=True)


@given(texts=st.lists(adversarial_text, min_size=1, max_size=5))
@SET_HEAVY
def test_doc_entries_cross_engine_on_adversarial_text(spark, texts):
    _compare_corpus_entries(spark, texts, ENTRIES)


# the dedup/near-dup family: shingle construction, md5 banding,
# winnowing fingerprints, span windows — all token-regex consumers with
# integer/string outputs. Near-dup structure is injected (some docs are
# perturbed copies of earlier ones) so the pair operators emit real
# candidates instead of vacuously-empty frames.
ENTRIES_DEDUP = ("dedup_exact", "jaccard_pairs", "minhash_lsh_pairs",
                 "simhash_pairs", "winnow_pairs", "dup_spans",
                 "line_dedup_docs", "paragraph_dedup_docs",
                 "decontaminate_report", "doc_length_histogram")


@given(texts=st.lists(st.one_of(adversarial_text, st.none()),
                      min_size=2, max_size=5),
       copies=st.lists(st.tuples(st.integers(0, 4), adversarial_text),
                       min_size=0, max_size=4))
@pytest.mark.slow  # 30s+: builder certification only (pytest.ini)
@SET_HEAVY
def test_dedup_entries_cross_engine_on_adversarial_text(
        spark, texts, copies):
    docs = list(texts)   # may contain NULL texts (pinned semantics:
    for src_idx, suffix in copies:   # test_null_and_empty_text_...)
        src = docs[src_idx % len(texts)]
        docs.append(src + suffix if src is not None else suffix)
    _compare_corpus_entries(spark, docs, ENTRIES_DEDUP)


@given(texts=st.lists(adversarial_text, min_size=1, max_size=8))
@SET_LIGHT
def test_pii_patterns_cross_engine_adversarial(spark, texts):
    """Per-kind match counts and the sequential scrub must agree with
    DuckDB built from the SAME pattern constants (pii_replacement's
    re2 templates exist for exactly this)."""
    from asvsp_spark.functions.text import (PII_PATTERNS, pii_counts,
                                            pii_replacement, pii_scrub)

    df = spark.createDataFrame(list(enumerate(texts)),
                               "id long, text string")
    got = df.select(
        "id",
        *[c.alias(k) for k, c in pii_counts(F.col("text")).items()],
        pii_scrub(F.col("text")).alias("redacted")).collect()

    con = duckdb.connect()
    for r in got:
        text = texts[r["id"]]
        for kind, pat in PII_PATTERNS.items():
            n = con.execute(
                "SELECT len(regexp_extract_all(?, ?))",
                [text, pat]).fetchone()[0]
            assert r[f"n_{kind}"] == n, (kind, text)
        red = text
        for _ in range(2):   # pii_scrub's default two passes
            for kind, pat in PII_PATTERNS.items():
                red = con.execute(
                    "SELECT regexp_replace(?, ?, ?, 'g')",
                    [red, pat, pii_replacement(kind, "re2")]).fetchone()[0]
        assert r["redacted"] == red, text


@given(texts=st.lists(adversarial_text, min_size=1, max_size=8))
@SET_LIGHT
def test_bpe_pretokens_cross_engine_adversarial(spark, texts):
    """The GPT-2-style pre-tokenizer pattern (shared constant) must
    extract identical token sequences in Java regex and RE2 — it feeds
    bpe_merge_table / vocab_coverage whose oracles replay it."""
    from asvsp_spark.functions.text import BPE_PRETOKEN_PATTERN

    df = spark.createDataFrame(list(enumerate(texts)),
                               "id long, text string")
    got = {r["id"]: list(r["pre"]) for r in df.select(
        "id", F.regexp_extract_all(
            "text", F.lit(BPE_PRETOKEN_PATTERN), 0).alias("pre"))
        .collect()}
    con = duckdb.connect()
    for i, text in enumerate(texts):
        want = con.execute("SELECT regexp_extract_all(?, ?)",
                           [text, BPE_PRETOKEN_PATTERN]).fetchone()[0]
        assert got[i] == list(want), text


@given(texts=st.lists(adversarial_text, min_size=1, max_size=8))
@SET_LIGHT
def test_tokens_and_fingerprint_cross_engine_adversarial(spark, texts):
    """The two most-shared primitives, compared directly: the explicit
    Java∩RE2 whitespace split against RE2's '\\s+', and the fingerprint
    canonicalization (trim -> collapse -> ASCII case fold -> md5)."""
    from asvsp_spark.functions.text import fingerprint, tokens

    df = spark.createDataFrame(list(enumerate(texts)),
                               "id long, text string")
    got = {r["id"]: (list(r["toks"]), r["fp"]) for r in df.select(
        "id", tokens(F.col("text")).alias("toks"),
        fingerprint(F.col("text")).alias("fp")).collect()}
    con = duckdb.connect()
    for i, text in enumerate(texts):
        toks, fp = con.execute(
            r"""SELECT regexp_split_to_array(trim(?, ' '), '\s+'),
                 md5(translate(regexp_replace(trim(?, ' '), '\s+', ' ', 'g'),
                     'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                     'abcdefghijklmnopqrstuvwxyz'))""",
            [text, text]).fetchone()
        assert got[i][0] == list(toks), text
        assert got[i][1] == fp, text


# ---- events-corpus fuzz: randomized NULL-bearing event tables ----
# The r10 edge-corpus pins freeze six crafted corpora; this property
# keeps GENERATING new ones. Fields are independently nullable, values
# come from a fixed decimal-safe pool (the centi-rounding contract
# covers them; free-form floats would fuzz IEEE formatting, not engine
# semantics), timestamps include leap-day and year-end-microsecond
# boundaries plus NULL (the r10 NULL-event-time contract), and props
# mixes valid / malformed / NULL JSON.

_EVT_TS = st.one_of(
    st.none(),
    st.sampled_from([
        datetime.datetime(2024, 2, 29, 0, 0, 0),
        datetime.datetime(2024, 12, 31, 23, 59, 59, 999999),
        datetime.datetime(2024, 1, 1, 0, 0, 0),
    ]),
    st.integers(0, 365 * 24 * 3600 - 1).map(
        lambda s: datetime.datetime(2024, 1, 1) +
        datetime.timedelta(seconds=s)),
)
_EVT_ROW = st.tuples(
    _EVT_TS,
    st.one_of(st.none(), st.integers(0, 4)),                 # user_id
    st.one_of(st.none(), st.sampled_from(
        ["click", "view", "error", "signup", "purchase", "weird"])),
    st.one_of(st.none(), st.sampled_from(
        [0.0, -0.005, 0.005, 185.22, -5.5, 1e7, -1e7, 50.0,
         49.995, 123.456])),                                  # value
    st.one_of(st.none(), st.sampled_from(
        ['{"k": 1}', '{"k": 7}', '{"k": null}', "{}", "not json",
         '{"k": 1, "retry": 2}'])),                           # props
)

EVENT_ENTRIES = ("rollup_daily_events", "rollup_monthly_events",
                 "baselines_events", "distinct_users_daily",
                 "user_day_bookends", "sessionize_users",
                 "heavy_hitters_users", "key_skew_report",
                 "pivot_daily_type", "unpivot_daily_type",
                 "distribution_drift_daily", "variant_props_decode",
                 "scd2_user_state", "sketch_value_percentiles")


@pytest.mark.slow  # 30s+: builder certification only (pytest.ini)
@given(rows=st.lists(_EVT_ROW, min_size=1, max_size=10))
@SET_HEAVY
def test_events_entries_cross_engine_on_fuzzed_corpora(spark, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from asvsp_spark.plans.registry import all_oracle_sql, all_queries

    d = tempfile.mkdtemp(prefix="evtprop-")
    con = duckdb.connect()
    try:
        pq.write_table(pa.table({
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "value": pa.array([r[3] for r in rows], pa.float64()),
            "props": pa.array([r[4] for r in rows], pa.string()),
        }), os.path.join(d, "events.parquet"))
        con.execute(
            "CREATE VIEW events AS SELECT * FROM parquet_scan("
            f"'{os.path.join(d, 'events.parquet')}')")
        qs, osql = all_queries(), all_oracle_sql()
        for name in EVENT_ENTRIES:
            compare_frames_hashed(
                qs[name](spark, d), con.sql(osql[name]),
                context=f"{name} on {rows!r}")
    finally:
        con.close()
        shutil.rmtree(d, ignore_errors=True)
