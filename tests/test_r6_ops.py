"""Round-6 operators: paragraph-level corpus dedup with rebuild, and
boundary-overlap (crawl-stitching) pair detection — constructed-fixture
semantics pinned independently of the DuckDB oracle."""

from __future__ import annotations

import pytest

from asvsp_spark.operators.dedup import boundary_overlap_pairs, paragraph_dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_paragraph_dedup_keep_first_and_rebuild(spark):
    docs = _docs(spark, [
        (1, "alpha beta\n\nshared block\n\ngamma"),
        (2, "shared block\n\ndelta"),          # repeat: dropped here
        (3, "shared block"),                    # all segments repeats -> ''
        (4, "  \n\n  "),                        # whitespace only -> no segs
    ])
    out = {r["doc_id"]: r for r in paragraph_dedup(docs).collect()}
    assert out[1]["text"] == "alpha beta\n\nshared block\n\ngamma"
    assert (out[1]["n_segments"], out[1]["n_removed"]) == (3, 0)
    assert out[2]["text"] == "delta"
    assert (out[2]["n_segments"], out[2]["n_removed"]) == (2, 1)
    assert out[3]["text"] == ""
    assert (out[3]["n_segments"], out[3]["n_removed"]) == (1, 1)
    assert out[4]["text"] == ""
    assert (out[4]["n_segments"], out[4]["n_removed"]) == (0, 0)


def test_paragraph_dedup_within_doc_repeat_and_order(spark):
    # the SECOND occurrence inside the same doc is also a repeat, and
    # the rebuild preserves original segment order
    docs = _docs(spark, [(7, "x\n\ny\n\nx\n\nz")])
    row = paragraph_dedup(docs).collect()[0]
    assert row["text"] == "x\n\ny\n\nz"
    assert (row["n_segments"], row["n_removed"]) == (4, 1)


def test_paragraph_dedup_first_is_smallest_doc_then_pos(spark):
    # keep-first is global (doc_id, position) argmin — doc 10 wins over
    # doc 20 even though doc 20's occurrence is at an earlier position
    docs = _docs(spark, [
        (20, "dup\n\nother"),
        (10, "lead\n\ndup"),
    ])
    out = {r["doc_id"]: r for r in paragraph_dedup(docs).collect()}
    assert out[10]["text"] == "lead\n\ndup"
    assert out[20]["text"] == "other"


def test_boundary_overlap_detects_stitch_and_ignores_short(spark):
    docs = _docs(spark, [
        (1, "a b c d e f"),       # tail = "d e f"
        (2, "d e f g h"),         # head = "d e f"  -> pair (1, 2)
        (3, "x y"),               # shorter than k=3: no boundary
        (4, "q r s t"),           # unrelated
    ])
    pairs = {(r["left_id"], r["right_id"], r["boundary_text"])
             for r in boundary_overlap_pairs(docs, k=3).collect()}
    assert pairs == {(1, 2, "d e f")}


def test_boundary_overlap_self_pair_excluded(spark):
    # a doc whose own head equals its own tail must not pair with itself
    docs = _docs(spark, [(5, "m n o m n o")])
    assert boundary_overlap_pairs(docs, k=3).count() == 0


def test_boundary_overlap_df_cap_drops_hot_boundary(spark):
    # 5 docs all starting with the same 3 tokens: with max_df=4 the hot
    # head hash is chrome, so the tail that matches it yields no pairs;
    # raising the cap restores all 5
    rows = [(i, f"h h h tail{i} x y z") for i in range(10, 15)]
    rows.append((1, "a b c h h h"))  # tail matches the hot head
    docs = _docs(spark, rows)
    assert boundary_overlap_pairs(docs, k=3, max_df=4).count() == 0
    capped = boundary_overlap_pairs(docs, k=3, max_df=64)
    assert {r["right_id"] for r in capped.collect()} == {10, 11, 12, 13, 14}


def test_incremental_paragraph_bootstrap_equals_global(spark, tmp_path):
    from asvsp_spark.operators.dedup import incremental_paragraph_dedup
    docs = _docs(spark, [
        (1, "alpha\n\nshared\n\nbeta"),
        (2, "shared\n\ngamma"),
        (3, "gamma\n\ngamma"),
    ])
    inc, counts = incremental_paragraph_dedup(
        spark, docs, str(tmp_path / "seg"))
    glob = paragraph_dedup(docs)
    assert sorted(map(tuple, inc.collect())) == \
        sorted(map(tuple, glob.collect()))
    # 7 occurrences over 4 distinct segments (alpha, shared, beta, gamma)
    assert counts == {"n_segments": 7, "within_batch_repeats": 3,
                      "known_segments": 0, "fresh_segments": 4}


def test_incremental_paragraph_two_batch_funnel(spark, tmp_path):
    from asvsp_spark.operators.dedup import incremental_paragraph_dedup
    store = str(tmp_path / "seg")
    b1 = _docs(spark, [(1, "boiler\n\nfresh one")])
    b2 = _docs(spark, [(2, "boiler\n\nnew stuff\n\nnew stuff")])
    _, c1 = incremental_paragraph_dedup(spark, b1, store)
    out2, c2 = incremental_paragraph_dedup(spark, b2, store)
    assert c1 == {"n_segments": 2, "within_batch_repeats": 0,
                  "known_segments": 0, "fresh_segments": 2}
    # 'boiler' is known from batch 1; 'new stuff' repeats within batch 2
    assert c2 == {"n_segments": 3, "within_batch_repeats": 1,
                  "known_segments": 1, "fresh_segments": 1}
    row = out2.collect()[0]
    assert row["text"] == "new stuff"
    assert (row["n_segments"], row["n_removed"]) == (3, 2)
    # third batch: everything known, store accumulated across batches
    b3 = _docs(spark, [(3, "boiler\n\nnew stuff\n\nfresh one")])
    out3, c3 = incremental_paragraph_dedup(spark, b3, store)
    assert c3 == {"n_segments": 3, "within_batch_repeats": 0,
                  "known_segments": 3, "fresh_segments": 0}
    assert out3.collect()[0]["text"] == ""


def test_pipeline_paragraph_stage(spark, tmp_path):
    """Opt-in paragraph-dedup stage: funnel key present and monotone,
    audit attributes emptied docs to the stage, and the written corpus
    carries no corpus-wide repeated segment."""
    from pyspark.sql import functions as F
    from asvsp_spark.pipeline import run_corpus_pipeline
    from tests.conftest import SF_DIR
    out = str(tmp_path / "corpus_out")
    counts = run_corpus_pipeline(
        spark, SF_DIR, out, paragraph_delimiter=r"\s+the\s+", audit=True)
    assert counts["paragraph_deduped"] <= counts["quality_gated"]
    assert counts["exact_deduped"] <= counts["paragraph_deduped"]
    written = spark.read.parquet(f"{out}/corpus")
    dup_segs = (written
                .select(F.explode(F.split("text", r"\s+the\s+")).alias("s"))
                .filter(F.trim("s") != "")
                .groupBy("s").count().filter(F.col("count") > 1).count())
    assert dup_segs == 0
    audit = spark.read.parquet(f"{out}/drop_audit")
    stages = {r["dropped_at"] for r in audit.select("dropped_at").distinct().collect()}
    assert "kept" in stages


def test_vocab_coverage_exact_boundaries(spark):
    from asvsp_spark.operators.vocab import vocab_coverage
    # freq: a=6, b=3, c=1 -> total 10
    docs = _docs(spark, [(1, "a a a b b c"), (2, "a a a b")])
    out = {r["pct"]: (r["vocab_size"], r["tokens_covered"],
                      r["total_tokens"])
           for r in vocab_coverage(docs).collect()}
    assert out[50] == (1, 6, 10)    # 'a' alone reaches 50%
    assert out[90] == (2, 9, 10)    # a+b == exactly 90%
    assert out[95] == (3, 10, 10)   # 9 < 9.5: needs the full vocab
    assert out[99] == (3, 10, 10)


def test_vocab_coverage_tiebreak_word_asc(spark):
    from asvsp_spark.operators.vocab import vocab_coverage
    # z and m tie at freq 2: rank must be (m, z), so pct=50 needs both
    # words only if the first alone (m, 2 of 4 = exactly 50%) fails —
    # it doesn't; pct=75 needs rank 2
    docs = _docs(spark, [(1, "z m z m")])
    out = {r["pct"]: r["vocab_size"]
           for r in vocab_coverage(docs, pcts=(50, 75)).collect()}
    assert out[50] == 1
    assert out[75] == 2


@pytest.mark.slow  # 30s+: builder certification only (pytest.ini)
def test_jl_project_distortion_and_plan(spark):
    """JL with Rademacher signs: projected cosine/distance structure is
    approximately preserved (loose bound at out_dim=32), the plan has no
    Exchange (zero shuffles beyond the fanout guard), and the output is
    deterministic across invocations."""
    import math
    import random
    from asvsp_spark.operators.similarity import jl_project
    rng = random.Random(7)
    rows = [(i, [rng.gauss(0, 1) for _ in range(64)]) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = jl_project(emb, in_dim=64, out_dim=32, seed=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
    got = {r["vec_id"]: r["proj"] for r in out.collect()}
    # pairwise distance preservation on a sample of pairs: JL with
    # out_dim=32 keeps squared distances within ~2x whp — loose gate,
    # tight enough to catch a broken sign matrix or missing scale
    orig = {i: v for i, v in rows}
    for a, b in [(0, 1), (2, 3), (10, 30), (5, 25)]:
        d_o = sum((x - y) ** 2 for x, y in zip(orig[a], orig[b]))
        d_p = sum((x - y) ** 2 for x, y in zip(got[a], got[b]))
        # scale correction: components divide by sqrt(out_dim) so the
        # projected squared distance estimates d_o * (1/1) after the
        # 1/sqrt(k) normalization... verify ratio in [0.4, 2.5]
        assert 0.4 < d_p / d_o < 2.5, (a, b, d_p, d_o)
    again = {r["vec_id"]: r["proj"]
             for r in jl_project(emb, in_dim=64, out_dim=32, seed=1).collect()}
    assert again == got


def test_minhash_calibration_perfect_and_partial(spark):
    """A verbatim duplicate pair lands in decile 9 with est 1.0 and zero
    error; a constructed half-overlap pair lands in the decile of its
    exact Jaccard with the estimate within the binomial envelope."""
    from asvsp_spark.operators.dedup import minhash_calibration
    # doc 1 == doc 2 verbatim; docs 3/4 share half their 3-shingles
    common = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    docs = _docs(spark, [
        (1, common), (2, common),
        (3, common + " x1 x2 x3 x4 x5 x6 x7 x8"),
        (4, common + " y1 y2 y3 y4 y5 y6 y7 y8"),
    ])
    out = {r["j_bucket"]: r for r in minhash_calibration(
        docs, num_hashes=16, bands=8).collect()}
    top = out[9]
    assert top["avg_est"] >= 0.99 and top["avg_exact"] >= 0.99
    assert top["avg_abs_err"] <= 0.01
    # the 3/4 pair: 8 shared + 2x8 unique 3-shingles -> J = 8/24 = 1/3
    # (docs 1,2 also pair with 3,4 at J = 8/16 = 0.5)
    partial = [r for b, r in out.items() if b in (3, 4, 5)]
    assert partial, f"expected mid-decile pairs, got {sorted(out)}"
    for r in partial:
        assert abs(r["avg_est"] - r["avg_exact"]) <= 0.35  # 16 hashes


def test_cli_datacard_and_paragraph_store(spark, tmp_path, capsys):
    """CLI round-trip for the r6 surface: datacard prints and writes the
    table; dedup-incremental --paragraph advances a segment-hash store
    across two deltas (second delta's repeat segments stripped)."""
    from asvsp_spark.cli import main
    from tests.conftest import SF_DIR

    out = str(tmp_path / "card")
    assert main(["datacard", f"{SF_DIR}/documents.parquet",
                 "--out", out]) == 0
    printed = capsys.readouterr().out
    assert "dup_rate=" in printed and "quality=" in printed
    card = spark.read.parquet(out)
    assert card.count() > 0 and "p95_tokens" in card.columns

    d1 = str(tmp_path / "d1")
    d2 = str(tmp_path / "d2")
    spark.createDataFrame([(1, "boiler\n\nfresh")],
                          "doc_id long, text string").write.parquet(d1)
    spark.createDataFrame([(2, "boiler\n\nmore")],
                          "doc_id long, text string").write.parquet(d2)
    store = str(tmp_path / "segstore")
    out2 = str(tmp_path / "clean2")
    assert main(["dedup-incremental", d1, "--store", store,
                 "--paragraph", r"\n{2,}"]) == 0
    assert "fresh_segments" in capsys.readouterr().out
    assert main(["dedup-incremental", d2, "--store", store,
                 "--paragraph", r"\n{2,}", "--out", out2]) == 0
    row = spark.read.parquet(out2).collect()[0]
    assert row["text"] == "more" and row["n_removed"] == 1


def test_gapfill_hourly_locf_semantics(spark):
    """Dense spine over the global hour range; gaps carry the last
    observation forward per group; hours before a group's first
    observation stay NULL; locf=False leaves raw NULLs."""
    import datetime as dt
    from asvsp_spark.operators.asof import gapfill_hourly
    t0 = dt.datetime(2024, 1, 1, 0, 30)
    rows = [
        ("A", t0, 10.0),
        ("A", t0 + dt.timedelta(hours=3), 20.0),
        ("B", t0 + dt.timedelta(hours=2), 5.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double")
    out = {(r["event_type"], r["hour"].hour): r
           for r in gapfill_hourly(ev).collect()}
    assert len(out) == 8  # 4 hours x 2 groups
    assert out[("A", 0)]["avg_value"] == 10.0
    assert out[("A", 1)]["avg_value"] == 10.0 and out[("A", 1)]["filled"]
    assert out[("A", 2)]["avg_value"] == 10.0 and out[("A", 2)]["filled"]
    assert out[("A", 3)]["avg_value"] == 20.0 and not out[("A", 3)]["filled"]
    assert out[("B", 0)]["avg_value"] is None and out[("B", 0)]["filled"]
    assert out[("B", 2)]["avg_value"] == 5.0
    assert out[("B", 3)]["avg_value"] == 5.0 and out[("B", 3)]["filled"]
    lin = {(r["event_type"], r["hour"].hour): r
           for r in gapfill_hourly(ev, fill="interpolate").collect()}
    # A: hours 1,2 interpolate between 10 (h0) and 20 (h3)
    assert abs(lin[("A", 1)]["avg_value"] - 13.3333) < 1e-9
    assert abs(lin[("A", 2)]["avg_value"] - 16.6667) < 1e-9
    # outside B's observed range: NULL before AND after
    assert lin[("B", 0)]["avg_value"] is None
    assert lin[("B", 3)]["avg_value"] is None
    assert lin[("B", 2)]["avg_value"] == 5.0
    raw = {(r["event_type"], r["hour"].hour): r
           for r in gapfill_hourly(ev, fill="null").collect()}
    assert raw[("A", 1)]["avg_value"] is None
    assert raw[("B", 3)]["avg_value"] is None


def test_gapfill_day_grain(spark):
    """Day grain: dense daily spine, LOCF across missing days, bucket
    column named after the grain."""
    import datetime as dt
    from asvsp_spark.operators.asof import gapfill
    rows = [("A", dt.datetime(2024, 1, 1, 5), 10.0),
            ("A", dt.datetime(2024, 1, 4, 9), 40.0)]
    ev = spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double")
    out = {r["day"].day: r for r in gapfill(ev, grain="day").collect()}
    assert sorted(out) == [1, 2, 3, 4]
    assert out[2]["avg_value"] == 10.0 and out[2]["filled"]
    assert out[3]["avg_value"] == 10.0 and out[3]["filled"]
    assert out[4]["avg_value"] == 40.0 and not out[4]["filled"]
    import pytest
    with pytest.raises(ValueError, match="grain"):
        gapfill(ev, grain="fortnight")


def test_incremental_paragraph_store_width_guard(spark, tmp_path):
    """A store written with a different hash width must fail loudly —
    anti-joining 32-char hashes against 16-char rows would silently
    re-admit every known segment forever."""
    import pytest
    from asvsp_spark.operators.dedup import incremental_paragraph_dedup
    store = str(tmp_path / "oldstore")
    spark.createDataFrame([("aabbccdd11223344", 1)],
                          "h string, keeper_id long") \
        .write.parquet(store)
    docs = _docs(spark, [(9, "x\n\ny")])
    with pytest.raises(ValueError, match="16-char"):
        incremental_paragraph_dedup(spark, docs, store)


def test_stitch_documents_chains_and_refusals(spark):
    """A->B->C stitches in order with overlaps dropped; an ambiguous
    fork does not stitch; a pure 2-cycle is dropped (no head)."""
    from asvsp_spark.operators.dedup import stitch_documents
    docs = _docs(spark, [
        (1, "w1 w2 w3 a b c"),          # head: tail 'a b c'
        (2, "a b c w4 w5 d e f"),       # middle
        (3, "d e f w6 w7"),             # tail fragment
        # ambiguous fork: two docs start with 4's tail
        (4, "q1 q2 x y z"),
        (5, "x y z q3"),
        (6, "x y z q4"),
        # true 2-cycle: 7 tail == 8 head AND 8 tail == 7 head
        (7, "p q r mid1 u v w"),
        (8, "u v w mid2 p q r"),
    ])
    out = {r["chain_id"]: r for r in stitch_documents(docs, k=3).collect()}
    assert set(out) == {1}
    r = out[1]
    assert r["doc_ids"] == "1,2,3"
    assert r["text"] == "w1 w2 w3 a b c w4 w5 d e f w6 w7"
    assert r["n_docs"] == 3


def test_stitch_documents_max_chain_boundary(spark):
    from asvsp_spark.operators.dedup import stitch_documents
    # a 4-doc chain: max_chain=3 emits a refused flag row (r7 — one
    # pathological chain must not kill the job), max_chain=4 assembles
    rows = []
    for i in range(4):
        head = f"h{i} h{i} h{i}"
        tail = f"h{i+1} h{i+1} h{i+1}"
        rows.append((i, f"{head} mid{i} {tail}"))
    docs = _docs(spark, [(i, t.replace("h0 h0 h0", "s s s") if i == 0 else t)
                         for i, t in rows])
    flagged = stitch_documents(docs, k=3, max_chain=3).collect()
    assert len(flagged) == 1 and flagged[0]["refused"]
    assert flagged[0]["doc_ids"] == "0,1,2,3"   # full membership kept
    assert flagged[0]["text"] == "" and flagged[0]["n_docs"] == 4
    ok = stitch_documents(docs, k=3, max_chain=4).collect()
    assert len(ok) == 1 and ok[0]["n_docs"] == 4 and not ok[0]["refused"]


def test_stitch_documents_string_ids(spark):
    """ADVICE r6: chain_id must carry the INPUT id type — string doc
    ids assemble without Arrow conversion errors."""
    from asvsp_spark.operators.dedup import stitch_documents
    docs = spark.createDataFrame([
        ("docB", "w1 w2 w3 a b c"),
        ("docC", "a b c w4 w5 d e f"),
        ("docA", "d e f w6 w7"),
    ], "doc_id string, text string")
    out = stitch_documents(docs, k=3).collect()
    assert len(out) == 1
    r = out[0]
    assert r["chain_id"] == "docB"            # head of the walk
    assert r["doc_ids"] == "docB,docC,docA"
    assert r["text"] == "w1 w2 w3 a b c w4 w5 d e f w6 w7"
    assert r["n_docs"] == 3 and not r["refused"]
    # unsupported id types fail loudly, not at Arrow conversion
    import pytest
    from pyspark.sql import functions as F
    bad = docs.withColumn("doc_id", F.to_date(F.lit("2026-01-01")))
    with pytest.raises(ValueError, match="integral and string"):
        stitch_documents(bad, k=3)


def test_cli_gapfill_roundtrip(spark, tmp_path, capsys):
    from asvsp_spark.cli import main
    from tests.conftest import SF_DIR
    out = str(tmp_path / "filled")
    assert main(["gapfill", f"{SF_DIR}/events.parquet", "--grain", "hour",
                 "--fill", "interpolate", "--out", out]) == 0
    assert "rows to" in capsys.readouterr().out
    filled = spark.read.parquet(out)
    assert {"event_type", "hour", "avg_value", "n_events",
            "filled"} <= set(filled.columns)
    assert filled.count() > 0
    assert main(["gapfill", f"{SF_DIR}/events.parquet",
                 "--limit", "3"]) == 0
    assert "filled=" in capsys.readouterr().out
