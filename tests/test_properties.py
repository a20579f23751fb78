"""Property-based tests (hypothesis) for the operators whose contracts
are easiest to get subtly wrong: the as-of join's backward-inclusive
semantics, Z-value bijectivity, Jaccard scoring against a brute-force
reference, and mixture-quota arithmetic. Each property runs a handful of
randomized examples against a pure-Python reference implementation —
the cross-check the DuckDB oracle can't give for operator EDGE cases the
fixtures never hit (ties, empty groups, singleton strata).

Examples are kept small (Spark jobs per example) and counts low; the
suite stays in seconds.
"""

from __future__ import annotations

import math

import pytest

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

SET = settings(max_examples=10, deadline=None,
               suppress_health_check=[HealthCheck.function_scoped_fixture,
                                      HealthCheck.too_slow])


@given(
    left=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 50)),
                  min_size=1, max_size=15),
    right=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 50),
                             st.integers(-100, 100)),
                   min_size=0, max_size=15),
)
@SET
def test_asof_join_matches_reference(spark, left, right):
    """For every left row: the payload of the LATEST right row of the
    same key with right_ts <= left_ts (ties broken toward the larger
    right_ts; equal right_ts rows — the dedup inside asof keeps one
    deterministically), else NULL."""
    from asvsp_spark.operators.asof import asof_join
    # de-dup right on (key, ts): the operator's window carries ONE struct
    # per instant; a reference with duplicate instants is ill-defined
    seen = {}
    for k, t, v in right:
        seen[(k, t)] = v
    right = [(k, t, v) for (k, t), v in seen.items()]

    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)],
        "lid long, k long, lt long")
    rdf = spark.createDataFrame(
        right or [(None, None, None)],
        "k long, rt long, v long").filter(F.col("k").isNotNull())
    got = {r.lid: r.v
           for r in asof_join(ldf, rdf, on="k", left_ts="lt",
                              right_ts="rt").collect()}
    for i, (k, t) in enumerate(left):
        cands = [(rt, v) for (rk, rt, v) in right if rk == k and rt <= t]
        want = max(cands)[1] if cands else None
        assert got[i] == want, (i, k, t, cands, got[i])


@given(pairs=st.lists(st.tuples(st.integers(0, 255), st.integers(0, 255)),
                      min_size=1, max_size=50, unique=True))
@SET
def test_zvalue_is_injective_and_bounded(spark, pairs):
    from asvsp_spark.sources.layout import zvalue
    df = spark.createDataFrame(pairs, "a long, b long").select(
        "a", "b", zvalue(F.col("a"), F.col("b"), bits=8).alias("z"))
    rows = df.collect()
    zs = [r.z for r in rows]
    assert len(set(zs)) == len(set(pairs)), "interleave must be injective"
    assert all(0 <= z < (1 << 16) for z in zs)


@given(
    texts=st.lists(
        st.lists(st.sampled_from("abcdefg"), min_size=0, max_size=12)
        .map(lambda ws: " ".join(ws)),
        min_size=2, max_size=8),
    threshold=st.sampled_from([0.2, 0.5, 0.8]),
)
@SET
def test_jaccard_pairs_matches_bruteforce(spark, texts, threshold):
    """Every emitted pair's score equals brute-force set Jaccard over
    distinct word trigrams, and no qualifying pair is missed (max_df
    high enough that the cap never fires)."""
    from asvsp_spark.operators.dedup import jaccard_pairs
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string")
    got = {(r.doc_a, r.doc_b): r.jaccard
           for r in jaccard_pairs(docs, threshold=threshold).collect()}

    def shingles(t: str) -> set:
        toks = t.strip().split()
        return {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}

    want = {}
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            sa, sb = shingles(texts[a]), shingles(texts[b])
            if not sa or not sb:
                continue
            inter = len(sa & sb)
            if inter == 0:
                continue
            j = inter / len(sa | sb)
            if j >= threshold:
                want[(a, b)] = round(j * 1e6) / 1e6
    assert got == want


@given(
    sizes=st.lists(st.integers(1, 40), min_size=1, max_size=4),
    weights=st.lists(st.integers(1, 10), min_size=4, max_size=4),
)
@SET
def test_mixture_rebalance_quota_invariants(spark, sizes, weights):
    """Quotas: every stratum keeps exactly floor(M * t_s) with
    M = min(n_s / t_s); kept counts never exceed stratum sizes and the
    binding stratum keeps all (or all-but-floor-rounding) of its rows."""
    from asvsp_spark.operators.sampling import mixture_rebalance
    langs = ["aa", "bb", "cc", "dd"][:len(sizes)]
    w = weights[:len(sizes)]
    tot = sum(w)
    targets = {l: wi / tot for l, wi in zip(langs, w)}
    rows, nid = [], 0
    for l, n in zip(langs, sizes):
        for _ in range(n):
            rows.append((nid, l))
            nid += 1
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    out = mixture_rebalance(docs, targets=targets).collect()
    kept = {l: 0 for l in langs}
    for r in out:
        kept[r.lang] += 1
    m = min(n / targets[l] for l, n in zip(langs, sizes))
    for l, n in zip(langs, sizes):
        assert kept[l] == math.floor(m * targets[l])
        assert kept[l] <= n


@given(
    series=st.dictionaries(
        st.sampled_from(["N_A", "N_B", "N_C"]),
        st.lists(st.integers(1, 5), min_size=1, max_size=14),
        min_size=1, max_size=3),
)
@SET
def test_q10_gaps_and_islands_matches_reference(spark, series):
    """SURVEY §7.4 item 4: random monthly revenue patterns through the
    REAL q10 pipeline vs a pure-Python longest-declining-streak
    reference (row-consecutive semantics, earliest streak on ties,
    rank with ties kept)."""
    from asvsp_spark.plans.queries import q10_improvement_streaks
    import datetime
    nations_list = sorted(series)
    nation = spark.createDataFrame(
        [(i, n) for i, n in enumerate(nations_list)],
        "n_nationkey long, n_name string")
    customer = spark.createDataFrame(
        [(100 + i, i) for i in range(len(nations_list))],
        "c_custkey long, c_nationkey long")
    rows, ok = [], 0
    for i, n in enumerate(nations_list):
        for m, price in enumerate(series[n]):
            yr, mon = 1995 + m // 12, m % 12 + 1
            rows.append((ok, 100 + i, float(price),
                         datetime.date(yr, mon, 5), "1-URGENT"))
            ok += 1
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_totalprice double,"
              "o_orderdate date, o_orderpriority string")
    got = sorted((r.nation, r.longest_streak, r.streak_start, r.rnk)
                 for r in q10_improvement_streaks(
                     orders, customer, nation).collect())

    # pure-Python reference over the same monthly series
    best = {}
    for i, n in enumerate(nations_list):
        vals = series[n]
        runs = []          # (len, start_month_index)
        cur, start = 0, None
        for m in range(1, len(vals)):
            if vals[m] < vals[m - 1]:
                if cur == 0:
                    start = m
                cur += 1
                runs.append((cur, start))
            else:
                cur = 0
        if runs:
            mx = max(l for l, _ in runs)
            starts = [s for l, s in runs if l == mx]
            sm = min(starts)
            yr, mon = 1995 + sm // 12, sm % 12 + 1
            best[n] = (mx, yr * 100 + mon)
    # q10's rank window orders by (streak desc, nation asc): the nation
    # tiebreak makes the order total, so rank == position
    ranked = sorted(best.items(), key=lambda kv: (-kv[1][0], kv[0]))
    want = [(n, mx, start, pos + 1)
            for pos, (n, (mx, start)) in enumerate(ranked)
            if pos + 1 <= 15]
    assert got == sorted(want)


@given(
    vecs=st.lists(
        st.one_of(
            st.lists(st.integers(-3, 3).map(float), min_size=4, max_size=4),
            st.just([0.0, 0.0, 0.0, 0.0]),        # zero-norm vectors
            st.just([1.0, 2.0, 2.0, 0.0]),        # forced duplicates
        ),
        min_size=1, max_size=12),
    threshold=st.sampled_from([0.3, 0.7, 0.95]),
)
@pytest.mark.slow  # 30s+: builder certification only (pytest.ini)
@SET
def test_blocked_cosine_pairs_block_count_invariant(spark, vecs, threshold):
    """cosine_dup_pairs' blocked all-pairs decomposition is an execution
    detail: the result set must be IDENTICAL for any block count — one
    block (everything in the diagonal group), two, and more blocks than
    vectors (empty blocks, every pair off-diagonal) — and must match a
    pure-Python exact reference. Zero-norm vectors contribute similarity
    0 (never cross a positive threshold); duplicate vectors under
    distinct ids emit one canonical (min_id, max_id) pair."""
    from asvsp_spark.operators.similarity import cosine_dup_pairs

    n = len(vecs)
    emb = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>")

    def ref_pairs():
        out = set()
        for a in range(n):
            for b in range(a + 1, n):
                na = math.sqrt(sum(x * x for x in vecs[a]))
                nb = math.sqrt(sum(x * x for x in vecs[b]))
                sim = (sum(x * y for x, y in zip(vecs[a], vecs[b]))
                       / (na * nb)) if na > 0 and nb > 0 else 0.0
                if round(sim, 6) >= threshold:
                    out.add((a, b))
        return out

    want = ref_pairs()
    for n_blocks in (1, 2, n + 3):
        got = {(r.id_a, r.id_b)
               for r in cosine_dup_pairs(emb, threshold=threshold,
                                         n_blocks=n_blocks).collect()}
        assert got == want, (n_blocks, sorted(got), sorted(want))


@given(
    counts=st.lists(st.integers(1, 40), min_size=1, max_size=8),
    parts=st.sampled_from([1, 2, 5, 17]),
    s_num=st.sampled_from([5, 10, 20]),
)
@SET
def test_heavy_hitters_matches_reference(spark, counts, parts, s_num):
    """Pigeonhole-pruned heavy hitters == brute-force reference for any
    key-frequency profile, partition count, and threshold share — the
    pruning may never lose a qualifying key nor admit extra ones."""
    from asvsp_spark.operators.sketches import heavy_hitters
    rows = [(f"k{i}",) for i, c in enumerate(counts) for _ in range(c)]
    n = len(rows)
    df = spark.createDataFrame(rows, "k string").repartition(parts)
    got = {(r.k, r.n_occurrences)
           for r in heavy_hitters(df, ["k"], s_num=s_num,
                                  s_den=100).collect()}
    want = {(f"k{i}", c) for i, c in enumerate(counts)
            if c * 100 >= n * s_num}
    assert got == want


@given(
    toks=st.lists(st.integers(1, 9), min_size=1, max_size=20),
    budget=st.sampled_from([1, 4, 16]),
)
@SET
def test_pack_contiguous_matches_reference(spark, toks, budget):
    """Single-shard packing == the running prefix-sum reference: bin of
    doc i is floor(sum of earlier docs' tokens / budget), in id order."""
    from asvsp_spark.operators.packing import pack_contiguous
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * t)) for i, t in enumerate(toks)],
        "doc_id long, text string")
    got = {r.doc_id: (r.bin_id, r.n_tokens, r.start_offset)
           for r in pack_contiguous(docs, budget=budget, n_shards=1,
                                    shard_expr=F.lit(0)).collect()}
    off = 0
    for i, t in enumerate(toks):
        assert got[i] == (off // budget, t, off), (i, got[i], off)
        off += t


@given(
    sizes=st.lists(st.integers(1, 30), min_size=1, max_size=25),
    budget=st.integers(5, 20),
    method=st.sampled_from(["best_fit", "first_fit"]),
)
@SET
def test_pack_whole_docs_invariants(spark, sizes, budget, method):
    """Whole-doc packing under random sizes/budgets/methods: every doc
    assigned exactly once, no bin over budget (except a dedicated
    oversize-doc bin), and best-fit never uses more bins than the
    theoretical minimum times two (first-fit-family guarantee)."""
    from asvsp_spark.operators.packing import pack_whole_docs
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * s)) for i, s in enumerate(sizes)],
        "doc_id long, text string")
    rows = pack_whole_docs(docs, budget=budget, n_shards=1, method=method,
                           shard_expr=F.lit(0)).collect()
    assert sorted(r.doc_id for r in rows) == list(range(len(sizes)))
    per_bin: dict = {}
    for r in rows:
        assert r.n_tokens == sizes[r.doc_id]
        per_bin.setdefault(r.bin_id, []).append(r.n_tokens)
    for toks in per_bin.values():
        assert sum(toks) <= budget or (len(toks) == 1 and toks[0] >= budget)
    fitting = [s for s in sizes if s < budget]
    oversize = len(sizes) - len(fitting)
    lower = math.ceil(sum(fitting) / budget) if fitting else 0
    assert len(per_bin) <= 2 * lower + 1 + oversize


@given(
    n_docs=st.integers(1, 25),
    edge_pairs=st.lists(st.tuples(st.integers(0, 24), st.integers(0, 24)),
                        max_size=15),
)
@pytest.mark.slow  # 30s+: builder certification only (pytest.ini)
@SET
def test_leakage_split_never_straddles(spark, n_docs, edge_pairs):
    """Random doc sets and edge lists (self-loops, out-of-range ids,
    duplicates included): connected docs always share cluster AND
    split; every doc is assigned exactly once."""
    from asvsp_spark.operators.splits import leakage_safe_split
    docs = spark.createDataFrame(
        [(i, f"body of document {i}") for i in range(n_docs)],
        "doc_id long, text string")
    edges = spark.createDataFrame(
        edge_pairs or [(None, None)],
        "doc_a long, doc_b long").na.drop()
    out = {r.doc_id: (r.cluster_id, r.split)
           for r in leakage_safe_split(docs, edges).collect()}
    assert sorted(out) == list(range(n_docs))
    for a, b in edge_pairs:
        if a < n_docs and b < n_docs:
            assert out[a] == out[b], (a, b, out[a], out[b])


@given(
    n_toks=st.lists(st.integers(1, 40), min_size=1, max_size=8),
    chunk=st.integers(3, 12),
    overlap=st.integers(0, 5),
)
@SET
def test_chunk_documents_reconstruction(spark, n_toks, chunk, overlap):
    """Random doc lengths / window sizes: chunk 0 plus every later
    chunk's post-overlap tail reconstructs the document exactly, chunk
    sizes never exceed the window, and starts advance by the stride."""
    from asvsp_spark.operators.chunking import chunk_documents
    overlap = min(overlap, chunk - 1)
    docs = spark.createDataFrame(
        [(i, " ".join(f"d{i}w{j}" for j in range(n)))
         for i, n in enumerate(n_toks)],
        "doc_id long, text string")
    rows = chunk_documents(docs, chunk_tokens=chunk,
                           overlap=overlap).collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert sorted(by_doc) == list(range(len(n_toks)))
    stride = chunk - overlap
    for i, n in enumerate(n_toks):
        cs = sorted(by_doc[i], key=lambda r: r.chunk_id)
        rebuilt = cs[0].chunk_text.split()
        for prev, r in zip(cs, cs[1:]):
            assert r.start_tok == prev.start_tok + stride
            toks = r.chunk_text.split()
            assert toks[:overlap] == rebuilt[r.start_tok:
                                             r.start_tok + overlap]
            rebuilt.extend(toks[overlap:])
        assert all(r.n_tokens <= chunk for r in cs)
        assert rebuilt == [f"d{i}w{j}" for j in range(n)]


@given(
    n_shared=st.integers(0, 40),
    n_only_a=st.integers(0, 25),
    n_only_b=st.integers(0, 25),
)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@pytest.mark.slow  # 30s+: builder certification only (pytest.ini)
def test_incremental_minhash_decision_matches_estimator(
        spark, tmp_path_factory, n_shared, n_only_a, n_only_b):
    """The store-side drop decision of incremental_minhash_dedup equals
    the analytically-derived reference on RANDOM doc pairs with known
    Jaccard: drop iff (some LSH band of the two signatures collides) AND
    (the component-agreement estimate >= threshold). Both sides are
    recomputed from minhash_signatures directly, so the property pins
    the banding arithmetic and the estimator wiring deterministically —
    no statistical tolerance involved. The raw estimate is additionally
    bounded against true J at 6 sigma (binomial, 64 independent hashes),
    which the r4-era correlated double-hashing family failed by a mile.
    """
    from asvsp_spark.operators.dedup import (
        incremental_minhash_dedup, minhash_signatures, shingle_posting)

    if n_shared + n_only_a == 0 or n_shared + n_only_b == 0:
        return                      # a doc must have at least one word
    a_words = [f"s{i:03d}" for i in range(n_shared)] \
        + [f"a{i:03d}" for i in range(n_only_a)]
    b_words = [f"s{i:03d}" for i in range(n_shared)] \
        + [f"b{i:03d}" for i in range(n_only_b)]
    true_j = n_shared / (n_shared + n_only_a + n_only_b)
    num_hashes, bands, threshold = 64, 32, 0.5
    rows = num_hashes // bands

    docs = spark.createDataFrame(
        [(1, " ".join(a_words)), (2, " ".join(b_words))],
        "doc_id long, text string")
    sig = {r.doc: [r[f"mh_{i}"] for i in range(num_hashes)]
           for r in minhash_signatures(
               shingle_posting(docs, n=1), num_hashes).collect()}
    est = sum(x == y for x, y in zip(sig[1], sig[2])) / num_hashes
    sigma = math.sqrt(max(true_j * (1 - true_j), 1e-9) / num_hashes)
    assert abs(est - true_j) <= max(6 * sigma, 2.0 / num_hashes), \
        (est, true_j)
    band_hit = any(
        sig[1][b * rows:(b + 1) * rows] == sig[2][b * rows:(b + 1) * rows]
        for b in range(bands))
    want_drop = band_hit and est >= threshold

    store = str(tmp_path_factory.mktemp("mh_prop") / "sig_store")
    _, c1 = incremental_minhash_dedup(
        spark, docs.filter("doc_id = 1"), store, n=1, threshold=threshold,
        num_hashes=num_hashes, bands=bands)
    assert c1["fresh"] == 1
    fresh2, c2 = incremental_minhash_dedup(
        spark, docs.filter("doc_id = 2"), store, n=1, threshold=threshold,
        num_hashes=num_hashes, bands=bands)
    got_drop = c2["known_near_dupes"] == 1
    assert got_drop == want_drop, (true_j, est, band_hit, c2)


@given(
    docs=st.lists(
        st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=14),
        min_size=1, max_size=6),
    window=st.integers(2, 4),
)
@SET
def test_dup_spans_matches_bruteforce_reference(spark, docs, window):
    """dup_spans == a pure-Python reference over a tiny alphabet (which
    generates plenty of cross-doc window collisions): flag every
    position whose window text occurs in >= 2 distinct docs, merge
    positions whose gap <= window into islands, report (start, end =
    max_pos + w - 1, n_windows) per island."""
    from collections import defaultdict

    from asvsp_spark.operators.dedup import dup_spans
    w = window
    texts = [" ".join(toks) for toks in docs]
    # reference
    owners = defaultdict(set)
    for i, toks in enumerate(docs):
        for p in range(len(toks) - w + 1):
            owners[tuple(toks[p:p + w])].add(i)
    expected = set()
    for i, toks in enumerate(docs):
        flagged = sorted(p + 1 for p in range(len(toks) - w + 1)
                         if len(owners[tuple(toks[p:p + w])]) >= 2)
        island: list[int] = []
        for p in flagged + [None]:
            if island and (p is None or p - island[-1] > w):
                expected.add((i, island[0], island[-1] + w - 1, len(island)))
                island = []
            if p is not None:
                island.append(p)
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string")
    got = {(r.doc_id, r.span_start, r.span_end, r.n_windows)
           for r in dup_spans(df, window=w).collect()}
    assert got == expected


@given(
    rows=st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(0, 5)),     # k: dup-prone
            st.one_of(st.none(), st.integers(-20, 20)),  # x: range check
        ),
        min_size=0, max_size=25),
    lo=st.integers(-10, 0), hi=st.integers(1, 10),
)
@SET
def test_check_suite_matches_python_reference(spark, rows, lo, hi):
    """check_suite's metrics equal a pure-Python reference on random
    frames — nulls, duplicates, empty tables, boundary values. The
    fraction semantics under test: not_null over ALL rows; unique and
    in_range over NON-NULL values only; range bounds inclusive."""
    from asvsp_spark.operators.validate import check_suite
    df = spark.createDataFrame(rows, "k int, x int") if rows else \
        spark.createDataFrame([], "k int, x int")
    rep = {r["check"]: r["metric"] for r in check_suite(df, "t", [
        {"check": "not_null", "column": "k"},
        {"check": "unique", "column": "k"},
        {"check": "in_range", "column": "x", "lo": lo, "hi": hi},
        {"check": "min_rows", "threshold": 1},
    ]).collect()}

    ks = [k for k, _ in rows]
    xs = [x for _, x in rows if x is not None]
    nn = [k for k in ks if k is not None]

    def frac(v, d):
        return round(v / d, 6) if d else 0.0

    assert rep["not_null(k)"] == frac(sum(k is None for k in ks),
                                      len(rows))
    assert rep["unique(k)"] == frac(len(nn) - len(set(nn)), len(nn))
    assert rep[f"in_range(x,{lo},{hi})"] == frac(
        sum(x < lo or x > hi for x in xs), len(xs))
    assert rep["min_rows"] == float(len(rows))


@given(
    children=st.lists(st.one_of(st.none(), st.integers(0, 8)),
                      min_size=0, max_size=20),
    parents=st.lists(st.integers(0, 8), min_size=0, max_size=10),
)
@SET
def test_foreign_key_check_matches_python_reference(spark, children,
                                                    parents):
    """FK orphan fraction == python reference: NULL children excluded,
    duplicate parents collapse, empty child side -> 0.0 (min_rows is
    the emptiness check)."""
    from asvsp_spark.operators.validate import check_suite
    child = (spark.createDataFrame([(c,) for c in children], "fk int")
             if children else spark.createDataFrame([], "fk int"))
    parent = (spark.createDataFrame([(p,) for p in parents], "pk int")
              if parents else spark.createDataFrame([], "pk int"))
    rep = check_suite(child, "c", [
        {"check": "foreign_key", "column": "fk",
         "ref": parent, "ref_column": "pk"},
    ]).collect()[0]
    nn = [c for c in children if c is not None]
    pset = set(parents)
    expect = round(sum(c not in pset for c in nn) / len(nn), 6) \
        if nn else 0.0
    assert rep["metric"] == expect


@given(st.lists(st.integers(min_value=-10**7, max_value=10**7),
                min_size=1, max_size=60),
       st.sampled_from([1, 2, 3]))
@SET
def test_value_histogram_percentile_is_exact_rank_bucket(spark, cents,
                                                         prefix_digits):
    """For ANY signed value multiset and prefix width, the sketch
    percentile equals the decimal bucket lower bound of the exact rank
    statistic (first bucket reaching ceil(P%·n) cumulative count holds
    the r-th smallest value), and bucket counts are exact."""
    import math

    from asvsp_spark.operators.sketches import sketch_percentiles

    from tests.conftest import py_bucket_lo

    def py_lo(c: int) -> int:
        return py_bucket_lo(c, prefix_digits)

    vals = [c / 100.0 for c in cents]
    df = spark.createDataFrame([("g", v) for v in vals],
                               "k string, value double")
    row = sketch_percentiles(df, "value", ["k"], (50, 90, 99),
                             prefix_digits).collect()[0]
    ordered = sorted(cents)
    assert row.n_values == len(cents)
    for pct in (50, 90, 99):
        exact = ordered[math.ceil(pct * len(cents) / 100) - 1]
        assert row[f"p{pct}_cents"] == py_lo(exact), (
            pct, row[f"p{pct}_cents"], exact, prefix_digits)


@given(
    docs=st.lists(
        st.lists(st.sampled_from(["aa", "bb", "cc", "dd", "e e"]),
                 min_size=0, max_size=5),
        min_size=1, max_size=8),
)
@SET
def test_paragraph_dedup_matches_reference(spark, docs):
    """Corpus-wide keep-first over random segment sequences from a tiny
    pool (collisions guaranteed): every distinct segment survives exactly
    once, at its smallest (doc_id, pos), and rebuilds preserve order."""
    from asvsp_spark.operators.dedup import paragraph_dedup
    rows = [(i, "\n\n".join(segs)) for i, segs in enumerate(docs)]
    # pure-Python reference
    seen: set[str] = set()
    expect = {}
    for i, segs in enumerate(docs):
        kept = []
        n_nonempty = 0
        for s in segs:
            if not s.strip():
                continue
            n_nonempty += 1
            if s not in seen:
                seen.add(s)
                kept.append(s)
        expect[i] = ("\n\n".join(kept), n_nonempty,
                     n_nonempty - len(kept))
    frame = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["text"], r["n_segments"], r["n_removed"])
           for r in paragraph_dedup(frame).collect()}
    assert got == expect


@given(
    docs=st.lists(
        st.lists(st.sampled_from(list("abc")), min_size=0, max_size=7),
        min_size=1, max_size=8),
    k=st.integers(2, 3),
)
@SET
def test_boundary_overlap_matches_reference(spark, docs, k):
    """Every ordered pair whose tail-k tokens equal another doc's head-k
    tokens — brute force over random short token lists (3-symbol
    alphabet makes overlaps common), high df cap so nothing is dropped."""
    from asvsp_spark.operators.dedup import boundary_overlap_pairs
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    expect = set()
    for i, a in enumerate(docs):
        if len(a) < k:
            continue
        for j, b in enumerate(docs):
            if i == j or len(b) < k:
                continue
            if a[-k:] == b[:k]:
                expect.add((i, j, " ".join(a[-k:])))
    frame = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["left_id"], r["right_id"], r["boundary_text"])
           for r in boundary_overlap_pairs(frame, k=k,
                                           max_df=10_000).collect()}
    assert got == expect


@given(
    words=st.lists(st.sampled_from(list("abcdef")), min_size=1,
                   max_size=40),
    pcts=st.sets(st.integers(1, 100), min_size=1, max_size=4),
)
@SET
def test_vocab_coverage_matches_reference(spark, words, pcts):
    """Coverage curve against a brute-force reference: rank by
    (freq DESC, word ASC), find the minimal prefix whose cumulative
    count clears ceil(pct% of total) under exact integer comparison."""
    from collections import Counter
    from asvsp_spark.operators.vocab import vocab_coverage
    freq = Counter(words)
    ranked = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(freq.values())
    expect = {}
    for pct in pcts:
        cum = 0
        for i, (_, f) in enumerate(ranked, start=1):
            cum += f
            if cum * 100 >= pct * total:
                expect[pct] = (i, cum, total)
                break
    docs = spark.createDataFrame([(1, " ".join(words))],
                                 "doc_id long, text string")
    got = {r["pct"]: (r["vocab_size"], r["tokens_covered"],
                      r["total_tokens"])
           for r in vocab_coverage(docs, pcts=tuple(pcts)).collect()}
    assert got == expect
