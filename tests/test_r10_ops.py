"""Round-10 regression tests.

- sq15 oracle NULL-text branch: the engine keys NULL-text docs as
  'e'||doc_id (with_doc_band_key's r9 fix); the DuckDB oracle must do
  the same instead of silently dropping the doc (r10 ADVICE finding —
  latent because the fixture corpus has no NULL-text docs).
"""

from __future__ import annotations

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from tests.conftest import compare_frames


def test_sq15_oracle_keeps_null_text_docs(spark, tmp_path):
    """Cross-engine parity of sq15 on a crafted corpus containing a
    NULL-text doc (plus an exact dup, a sub-3-token doc, and normal
    docs): before the r10 fix the oracle's len(shingles)=0 branch
    matched neither arm for NULL shingles and the doc vanished from
    the oracle while the engine kept it under 'e'||doc_id."""
    from asvsp_spark.plans.oracle_ext import ORACLE_EXT
    from asvsp_spark.streaming.queries import sq15_neardup_dedup

    texts = {
        0: "alpha beta gamma delta epsilon zeta eta theta",
        1: "one two three four five six seven eight nine",
        2: "alpha beta gamma delta epsilon zeta eta theta",  # exact dup
        3: "two tokens",                                      # no shingles
        4: None,                                              # NULL text
        5: "iota kappa lambda mu nu xi omicron pi rho sigma",
    }
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    pq.write_table(pa.table({
        "doc_id": pa.array(sorted(texts), pa.int64()),
        "text": pa.array([texts[i] for i in sorted(texts)], pa.string()),
    }), f"{sf}/documents.parquet")

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"parquet_scan('{sf}/documents.parquet')")

    spark_df = sq15_neardup_dedup(spark, sf)
    duck_rel = con.sql(ORACLE_EXT["sq15_neardup_dedup"])
    compare_frames(spark_df, duck_rel, context="sq15 NULL-text corpus")

    # the NULL-text doc must actually be REPRESENTED on both sides:
    # total kept across batch 1 = distinct content keys (4 distinct
    # texts key by signature/e-key; doc 2 collapses into doc 0) + the
    # NULL-text doc's e-key = 5, plus 1 sentinel, plus batch-3 re-emits
    total_kept = sum(r["n_kept"] for r in spark_df.collect())
    oracle_kept = con.sql(
        "SELECT sum(n_kept) FROM (" + ORACLE_EXT["sq15_neardup_dedup"]
        + ")").fetchone()[0]
    assert total_kept == oracle_kept
    # batch-1 keys: 3 signature keys + e3 + e4 = 5 (not 4 — the NULL
    # doc survives)
    n_batch1 = 5
    assert total_kept >= n_batch1 + 1  # + sentinel (+ any re-emits)


def test_null_and_empty_text_cross_engine_parity(spark, tmp_path):
    """NULL-text and empty-text docs through every text-consuming
    oracle pair on one crafted corpus (r10 NULL probe, promoted to a
    pin): NULL text must flow with null-UNSAFE join semantics (a NULL
    fingerprint never matches a store — always fresh, never known),
    rewrites must pass NULL docs through as NULL with exact row
    cardinality (the length-filter projection trick silently DROPPED
    them until r10), and empty docs must rebuild to '' in both engines
    (DuckDB's array_to_string on [] is NULL — oracle-trap #8)."""
    import duckdb

    from asvsp_spark.plans.registry import all_oracle_sql, all_queries
    from tests.conftest import compare_frames_hashed

    docs = [(0, "alpha beta gamma delta epsilon zeta eta theta"),
            (1, None),
            (2, "alpha beta gamma delta epsilon zeta eta theta"),
            (3, None),
            (4, "one two three four five six seven eight nine ten"),
            (5, "")]
    d = str(tmp_path)
    (spark.createDataFrame(docs, "doc_id long, text string")
     .withColumn("lang", F.lit("en"))
     .withColumn("source", F.lit("p"))
     .withColumn("n_chars", F.length("text").cast("long"))
     .coalesce(1).write.mode("overwrite")
     .parquet(os.path.join(d, "documents.parquet")))
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM parquet_scan("
                f"'{os.path.join(d, 'documents.parquet')}/*.parquet')")
    qs, osql = all_queries(), all_oracle_sql()
    for name in ("dedup_exact", "jaccard_pairs", "minhash_lsh_pairs",
                 "simhash_pairs", "winnow_pairs", "dup_spans",
                 "line_dedup_docs", "paragraph_dedup_docs",
                 "decontaminate_report", "doc_length_histogram",
                 "chunk_documents", "dedup_substring_removed",
                 "dedup_spans_removed", "dedup_components",
                 "dedup_representative", "incremental_dedup_report",
                 "doc_repetition", "text_profile", "lang_id",
                 "doc_fingerprint", "corpus_datacard",
                 "leakage_split_report", "dup_substring_runs",
                 "dup_substring_table", "incremental_substring_runs",
                 "incremental_paragraph_report",
                 "boundary_overlap_pairs", "gopher_quality_report",
                 "c4_quality_report", "quality_classifier_scores"):
        n_rows = compare_frames_hashed(qs[name](spark, d),
                                       con.sql(osql[name]),
                                       context=f"NULL-corpus {name}")
        if name in ("dedup_substring_removed", "dedup_spans_removed",
                    "line_dedup_docs"):
            # the rewrite entries keep corpus cardinality: one row per
            # input doc, NULL docs included (no plan re-execution — the
            # count comes from the compare's collect)
            assert n_rows == len(docs), name


def test_events_edge_corpus_cross_engine_parity(spark, tmp_path):
    """NULL values / NULL event_type / NULL user_id / malformed and
    NULL JSON props / single-event groups / leap-day and year-end
    timestamps through 27 events-based oracle pairs (r10 events edge
    probe, promoted to a pin). The probe found and fixed: count(*) vs
    count(value) in the daily/baseline oracles (an all-NULL-value
    group has n = 0 in both engines), the heavy-hitters oracle
    counting the NULL key its engine contract excludes, the unpivot
    oracle emitting the NULL cells Spark's UNPIVOT drops, FAILFAST
    parse_json aborting both variant entries on one malformed record
    (now try_parse_json: NULL decodes, still counted), format_string
    rendering NULL event_type as a literal 'null' group key, and the
    sq3 oracle's unguarded json_extract erroring where the engine's
    from_json is PERMISSIVE."""
    import datetime

    import duckdb

    from asvsp_spark.plans.registry import all_oracle_sql, all_queries
    from tests.conftest import compare_frames_hashed

    TS = datetime.datetime
    rows = [
        # single-event day+type group; n=1 stddev -> NULL in both
        (0, TS(2024, 1, 1, 0, 0, 1), 1, "error", 185.22, '{"k": 1}'),
        # two identical values (stddev exactly 0)
        (1, TS(2024, 1, 2, 5, 0, 0), 2, "signup", 10.0, '{"k": 2}'),
        (2, TS(2024, 1, 2, 6, 0, 0), 3, "signup", 10.0, '{"k": 3}'),
        # NULL value / NULL event_type / NULL user_id
        (3, TS(2024, 1, 3, 1, 0, 0), 4, "purchase", None, '{"k": 4}'),
        (4, TS(2024, 1, 3, 2, 0, 0), 5, None, 7.25, '{"k": 5}'),
        (5, TS(2024, 1, 3, 3, 0, 0), None, "view", 1.0, '{"k": 6}'),
        # leap day midnight; year-end microsecond boundary
        (6, TS(2024, 2, 29, 0, 0, 0), 6, "view", 2.5, '{"k": 7}'),
        (7, TS(2024, 12, 31, 23, 59, 59, 999999), 7, "view", 3.75,
         '{"k": 8}'),
        # negative and huge values
        (8, TS(2024, 3, 1, 12, 0, 0), 8, "error", -50.5, '{"k": 9}'),
        (9, TS(2024, 3, 1, 13, 0, 0), 8, "error", 1e7, '{"k": 10}'),
        # malformed and NULL props
        (10, TS(2024, 3, 2, 9, 0, 0), 9, "view", 4.0, 'not json'),
        (11, TS(2024, 3, 2, 10, 0, 0), 9, "view", 5.0, None),
    ]
    d = str(tmp_path)
    pq.write_table(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
        "props": pa.array([r[5] for r in rows], pa.string()),
    }), os.path.join(d, "events.parquet"))
    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM parquet_scan("
                f"'{os.path.join(d, 'events.parquet')}')")
    qs, osql = all_queries(), all_oracle_sql()
    for name in ("rollup_daily_events", "rollup_monthly_events",
                 "baselines_events", "distinct_users_daily",
                 "funnel_daily", "user_day_bookends",
                 "sessionize_users", "heavy_hitters_users",
                 "key_skew_report", "gapfill_daily_values",
                 "gapfill_weekly_values", "gapfill_hourly_interp",
                 "sketch_value_percentiles", "pivot_daily_type",
                 "unpivot_daily_type", "type_correlation",
                 "distribution_drift_daily", "variant_props_decode",
                 "sq16_variant_hourly", "sq1_vs_baseline",
                 "sq2_dominant_trend", "sq3_top_users",
                 "sq5_rank_anomaly", "sq7_dedup_hourly",
                 "sq12_drift_hourly", "sq13_contract_hourly",
                 "sq14_value_percentiles_hourly"):
        compare_frames_hashed(qs[name](spark, d), con.sql(osql[name]),
                              context=f"events-edge {name}")


def test_edge_vectors_cross_engine_parity(spark, tmp_path):
    """Edge vectors through the embedding/ANN oracle pairs (r10 probe,
    promoted to a pin): zero vectors, an exact duplicate, and
    magnitude-1e-8 vectors must hash-match the DuckDB twins end to end
    (zero-norm guards, int8 amax gate, cosine/IVF/PQ paths), and a
    1e8-magnitude vector must trip the r9 dimension-aware int64
    overflow guard LOUDLY at the entry level rather than silently
    diverge."""
    import duckdb

    import numpy as np
    import pytest

    from asvsp_spark.plans.registry import all_oracle_sql, all_queries
    from tests.conftest import compare_frames_hashed

    rng = np.random.RandomState(7)
    dim = 64
    vecs = [(i, [float(x) for x in rng.randn(dim).astype("float32") * 0.1],
             int(i % 8)) for i in range(40)]
    vecs += [(40, [0.0] * dim, 1),        # zero vector
             (41, vecs[0][1], 2),         # exact duplicate of vec 0
             (42, [1e-8] * dim, 4),       # tiny magnitude
             (43, [0.0] * dim, 5)]        # second zero vector
    d = str(tmp_path)

    def write(rows, path):
        pq.write_table(pa.table({
            "vec_id": pa.array([v[0] for v in rows], pa.int64()),
            "embedding": pa.array([v[1] for v in rows],
                                  pa.list_(pa.float32())),
            "label": pa.array([v[2] for v in rows], pa.int32())}), path)

    write(vecs, os.path.join(d, "embeddings.parquet"))
    con = duckdb.connect()
    con.execute("CREATE VIEW embeddings AS SELECT * FROM parquet_scan("
                f"'{os.path.join(d, 'embeddings.parquet')}')")
    qs, osql = all_queries(), all_oracle_sql()
    for name in ("embedding_stats", "embedding_quantize_int8",
                 "cosine_topk", "cosine_dup_pairs", "jl_projection",
                 "label_centroids", "lsh_topk", "ivf_topk",
                 "ivfpq_rerank_topk", "pq_rerank_topk",
                 "semantic_dedup_report", "ivf_topk_full_probe"):
        compare_frames_hashed(qs[name](spark, d), con.sql(osql[name]),
                              context=f"edge-vec {name}")

    # a huge-magnitude vector overflows the exact-int64 distance
    # identity; the guard must refuse loudly, never wrap
    d2 = str(tmp_path / "overflow")
    os.makedirs(d2)
    write(vecs + [(44, [1e8] * dim, 3)],
          os.path.join(d2, "embeddings.parquet"))
    with pytest.raises(ValueError, match="overflow the exact-int64"):
        qs["ivf_topk"](spark, d2).collect()


def test_nb_quality_sampled_path_oracle_parity(spark, duck):
    """The md5 training-sample gate path (labeled extremes > 2x
    train_cap), previously only reachable at >20k labeled docs: with
    train_cap=60 the sf0.001 fixture fires it, and the engine must
    stay bit-identical to the parameterized oracle replay — training,
    calibration AND scoring all run off the SAMPLED labeled slice."""
    import duckdb

    from asvsp_spark.operators.classify import (heuristic_labels,
                                                nb_quality_scores)
    from asvsp_spark.plans.oracle_text import _nb_quality_sql
    from asvsp_spark.tables import load
    from tests.conftest import SF_DIR, compare_frames, duck_with_views

    cap = 60
    docs = load(spark, SF_DIR, "documents").filter(
        "text IS NOT NULL").select("doc_id", "text", "lang")
    n_lab = heuristic_labels(docs).count()
    assert n_lab > 2 * cap, "fixture must fire the gate for this test"

    duck_with_views(duck, SF_DIR)
    # the md5-slice replay: the sampled slice the engine trains on
    denom = max(2, n_lab // cap)
    n_sampled = duck.sql(f"""
        SELECT count(*) FROM documents
        WHERE text IS NOT NULL
          AND ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
              % {denom} = 0""").fetchone()[0]
    # the bound train_cap exists to enforce: the sampled slice is
    # ~n_lab/denom <= ~cap, never the full labeled set
    assert 0 < n_sampled < n_lab

    got = nb_quality_scores(docs, train_cap=cap)
    want = duck.sql(_nb_quality_sql(train_cap=cap))
    compare_frames(got, want, context="nb sampled path")


def test_pipeline_classifier_gate_sampled_path_funnel_exact(
        spark, tmp_path):
    """End-to-end: stage 2e with a train_cap small enough that the md5
    gate fires on the fixture — the funnel must stay monotone and the
    drop audit exact (one row per raw doc, per-stage audit counts ==
    funnel diffs, kept == written) even when the classifier trained on
    a sampled labeled slice."""
    from asvsp_spark.pipeline import run_corpus_pipeline
    from tests.conftest import SF_DIR

    out = str(tmp_path / "out")
    counts = run_corpus_pipeline(spark, SF_DIR, out, classifier_gate=True,
                                 classifier_train_cap=60, audit=True)
    assert counts["raw"] >= counts["quality_gated"] \
        >= counts["classifier_gated"] >= counts["exact_deduped"] \
        >= counts["near_deduped"] >= counts["rebalanced"] \
        == counts["written"] > 0
    audit = spark.read.parquet(f"{out}/drop_audit")
    rows = audit.groupBy("dropped_at").count().collect()
    by_stage = {r["dropped_at"]: r["count"] for r in rows}
    assert sum(by_stage.values()) == counts["raw"]
    assert by_stage.get("kept", 0) == counts["written"]
    assert by_stage.get("classifier_gate", 0) \
        == counts["quality_gated"] - counts["classifier_gated"]
    assert by_stage.get("exact_dedup", 0) \
        == counts["classifier_gated"] - counts["exact_deduped"]


def test_ingest_gate_refuses_offsetless_checkpoint_on_used_sink(
        spark, tmp_path):
    """Widened r9 silent-skip guard (r10 ADVICE finding): passing an
    explicit but FRESH/mismatched checkpoint_dir (no recorded offsets)
    against a staged sink with committed batches must refuse exactly
    like the checkpoint_dir=None case — Spark would otherwise skip
    'already committed' batch 0 and silently drop every new arrival.
    The legitimate recovery path (the ORIGINAL checkpoint, which has
    offsets) must still pass."""
    import pytest

    from asvsp_spark.pipeline import streaming_ingest_dedup
    from tests.test_r9_ops import BASE_US, _doc_text, _write_arrivals

    ingest = tmp_path / "arrivals"
    ingest.mkdir()
    staged = str(tmp_path / "staged")
    ckpt = str(tmp_path / "ckpt")
    _write_arrivals(str(ingest / "b0.parquet"),
                    [(1, _doc_text(1), "en", BASE_US)])
    assert streaming_ingest_dedup(spark, str(ingest), staged,
                                  checkpoint_dir=ckpt).count() == 1

    _write_arrivals(str(ingest / "b1.parquet"),
                    [(2, _doc_text(2), "en", BASE_US)])
    # a brand-new checkpoint path (never created) -> refuse
    with pytest.raises(ValueError, match="no recorded offsets"):
        streaming_ingest_dedup(spark, str(ingest), staged,
                               checkpoint_dir=str(tmp_path / "ckpt2"))
    # an existing-but-empty checkpoint dir -> refuse
    (tmp_path / "ckpt3").mkdir()
    with pytest.raises(ValueError, match="no recorded offsets"):
        streaming_ingest_dedup(spark, str(ingest), staged,
                               checkpoint_dir=str(tmp_path / "ckpt3"))
    # the original checkpoint (has offsets): incremental drain works
    out = streaming_ingest_dedup(spark, str(ingest), staged,
                                 checkpoint_dir=ckpt)
    assert {r.doc_id for r in out.select("doc_id").collect()} == {1, 2}
    # the CONVERSE mismatch: a used checkpoint against a fresh sink
    # would resume past recorded batches and silently never write them
    with pytest.raises(ValueError,
                       match="committed batches but staged sink"):
        streaming_ingest_dedup(spark, str(ingest),
                               str(tmp_path / "staged2"),
                               checkpoint_dir=ckpt)


def test_relevance_sampling_edge_corpus_cross_engine_parity(
        spark, tmp_path):
    """NULL lang / NULL source / NULL+empty text / single-token,
    zero-entropy and frequency-tie docs through 28 relevance + sampling
    + packing oracle pairs, plus a crafted embeddings table (NULL
    vector, empty vector, NULL label, near-zero norm) through
    label_centroids (r10 relevance/sampling edge probe, promoted to a
    pin). The probe found and fixed two engine bugs: (1) dsir's
    is_target predicate stayed NULL for NULL-lang docs, so any hash
    bucket fed only by such docs got c_tgt = sum(all-NULL) = NULL,
    NULLing its log-ratio and corrupting the weight of EVERY doc
    touching the bucket (doc-5 weight became NULL, doc-12 silently
    skipped buckets — at corpus scale a NULL-lang subpopulation poisons
    its neighbors' weights); (2) token_budget_stats' count()-visibility
    filter `n_subword_tokens >= 0` silently dropped NULL-text docs —
    the same projection-trick row-loss the r10 NULL-text pin closed
    elsewhere."""
    import duckdb

    from asvsp_spark.plans.registry import all_oracle_sql, all_queries
    from tests.conftest import compare_frames_hashed

    docs = [
        (0, "the cat sat on the mat and the cat sat again", "en", "web"),
        (1, None, "en", "web"),
        (2, "", "en", "books"),
        (3, "spark spark spark spark spark", "en", "web"),
        (4, "one", "en", "books"),
        (5, "the quick brown fox jumps over the lazy dog", None, "web"),
        (6, "alpha beta gamma alpha beta gamma alpha beta", "de", None),
        (7, "tie tie bird bird", "de", "web"),
        (8, "zebra yak xylophone wombat vulture unicorn", "fr", "news"),
        (9, "the cat sat on the mat and the dog sat too", "en", "news"),
        (10, "a b c d e f g h i j k l m n o p q r s t", "fr", "news"),
        (11, "supercalifragilisticexpialidocious", "en", "web"),
        (12, "the the the cat cat dog", None, None),
        (13, "query terms cat dog fox present here", "en", "web"),
    ]
    d = str(tmp_path)
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in docs], pa.int64()),
        "text": pa.array([r[1] for r in docs], pa.string()),
        "lang": pa.array([r[2] for r in docs], pa.string()),
        "source": pa.array([r[3] for r in docs], pa.string()),
        "n_chars": pa.array([len(r[1]) if r[1] is not None else None
                             for r in docs], pa.int64()),
    }), os.path.join(d, "documents.parquet"))
    emb = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),
        (1, [0.0, 1.0, 0.0, 0.0], 0),
        (2, [0.0, 0.0, 1.0, 0.0], 1),
        (3, None, 1),
        (4, [0.5, 0.5, 0.5, 0.5], None),
        (5, [], 2),
        (6, [-1.0, -1.0, 1.0, 1.0], 2),
        (7, [1e-30, 0.0, 0.0, 0.0], 2),
    ]
    pq.write_table(pa.table({
        "vec_id": pa.array([r[0] for r in emb], pa.int64()),
        "embedding": pa.array([r[1] for r in emb],
                              pa.list_(pa.float32())),
        "label": pa.array([r[2] for r in emb], pa.int32()),
    }), os.path.join(d, "embeddings.parquet"))
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM parquet_scan("
            f"'{os.path.join(d, t + '.parquet')}')")
    qs, osql = all_queries(), all_oracle_sql()
    for name in ("text_quality", "token_length_histogram",
                 "top_terms_per_lang", "top_bigrams", "tfidf_top_terms",
                 "bm25_search", "token_entropy", "unigram_logprob_score",
                 "bigram_backoff_score", "quality_filter_report",
                 "token_budget_stats", "pmi_collocations",
                 "vocab_coverage", "bpe_merge_table", "label_centroids",
                 "sample_k_per_group", "stratified_sample_docs",
                 "weighted_sample_docs", "curriculum_shards",
                 "token_budget_mixing_plan", "mixture_rebalance",
                 "source_overlap_matrix", "packing_bins",
                 "packing_best_fit_bins", "shard_assignments",
                 "shard_manifest_lpt", "dsir_weights", "dsir_sample"):
        n = compare_frames_hashed(qs[name](spark, d),
                                  con.sql(osql[name]),
                                  context=f"relevance-edge {name}")
        if name == "token_budget_stats":
            # NULL-text docs must be KEPT (one row per input doc)
            assert n == len(docs), name
