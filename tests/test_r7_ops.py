"""Round-7 operators: variable-length exact-substring dedup
(dup_substring_runs / dup_substring_table — the Lee-et-al cluster
complement of dup_spans)."""

from __future__ import annotations

import pyspark.sql.functions as F  # noqa: F401
from hypothesis import HealthCheck, given, settings, strategies as st

SET = settings(max_examples=15, deadline=None,
               suppress_health_check=[HealthCheck.function_scoped_fixture,
                                      HealthCheck.too_slow])


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _brute_runs(rows, w, min_count):
    """Brute-force reference: window occurrence counting on the window
    TEXT itself (no hashing), strictly-consecutive run merging, run
    text fingerprint = the text (compared directly)."""
    occ: dict[str, int] = {}
    per_doc: dict[int, list[str]] = {}
    for d, text in rows:
        toks = text.strip().split()
        per_doc[d] = toks
        for i in range(len(toks) - w + 1):
            key = " ".join(toks[i:i + w])
            occ[key] = occ.get(key, 0) + 1
    runs = []
    for d, toks in per_doc.items():
        flagged = [i + 1 for i in range(len(toks) - w + 1)
                   if occ[" ".join(toks[i:i + w])] >= min_count]
        start = prev = None
        for p in flagged + [None]:
            if prev is not None and p is not None and p == prev + 1:
                prev = p
                continue
            if start is not None:
                runs.append((d, start, prev + w - 1,
                             " ".join(per_doc[d][start - 1:prev + w - 1])))
            start = prev = p
    return runs


def _brute_table(rows, w, min_count):
    from collections import Counter
    runs = _brute_runs(rows, w, min_count)
    c = Counter(r[3] for r in runs)
    docs: dict[str, set] = {}
    for d, _, _, t in runs:
        docs.setdefault(t, set()).add(d)
    return {t: (len(t.split()), len(docs[t]), n)
            for t, n in c.items() if n >= min_count}


def test_dup_substring_runs_fixture(spark):
    """Hand-checked fixture: a 10-token block at 4 sites across 3 docs
    (twice within doc 4) yields 4 aligned occurrences sharing one
    fingerprint; the cluster table reports exactly that."""
    from asvsp_spark.operators.dedup import (dup_substring_runs,
                                             dup_substring_table)
    block = "the quick brown fox jumps over the lazy dog again"
    rows = [
        (1, f"intro words here now {block} tail one two three"),
        (2, f"other start {block} different ending text goes here"),
        (3, "completely unrelated text with no duplication at all "
            "whatsoever today"),
        (4, f"within doc repeat {block} middle pad1 pad2 pad3 pad4 pad5 "
            f"pad6 {block} end"),
    ]
    runs = dup_substring_runs(_docs(spark, rows), window=8).collect()
    assert len(runs) == 4
    assert len({r["fp"] for r in runs}) == 1
    assert all(r["n_tokens"] == 10 for r in runs)
    spans = {(r["doc_id"], r["span_start"], r["span_end"]) for r in runs}
    assert (4, 4, 13) in spans and (4, 21, 30) in spans   # within-doc x2
    tab = dup_substring_table(_docs(spark, rows), window=8).collect()
    assert len(tab) == 1
    assert (tab[0]["n_tokens"], tab[0]["n_docs"],
            tab[0]["n_occurrences"]) == (10, 3, 4)


def test_dup_substring_runs_vs_brute(spark):
    """Deterministic mixed corpus against the brute-force reference:
    runs (positions + extents) and the cluster table must agree
    exactly, including docs shorter than the window (no rows) and a
    min_count=3 threshold."""
    import hashlib
    from asvsp_spark.operators.dedup import (dup_substring_runs,
                                             dup_substring_table)
    blk_a = " ".join(f"a{i}" for i in range(12))
    blk_b = " ".join(f"b{i}" for i in range(9))
    rows = [
        (1, f"x1 x2 {blk_a} y1 y2 y3 {blk_b}"),
        (2, f"{blk_a} mid {blk_b} z9"),
        (3, f"{blk_b} solo padding words q1 q2 q3 q4"),
        (4, "tiny doc"),                         # shorter than window
        (5, f"w1 w2 w3 w4 w5 {blk_a}"),
        (6, "nothing shared here with anything else at all really truly"),
    ]
    for mc in (2, 3):
        got = {(r["doc_id"], r["span_start"], r["span_end"], r["n_tokens"])
               for r in dup_substring_runs(
                   _docs(spark, rows), window=8, min_count=mc).collect()}
        want = {(d, s, e, e - s + 1)
                for d, s, e, _ in _brute_runs(rows, 8, mc)}
        assert got == want, f"min_count={mc}"
        gtab = {r["fp"]: (r["n_tokens"], r["n_docs"], r["n_occurrences"])
                for r in dup_substring_table(
                    _docs(spark, rows), window=8, min_count=mc).collect()}
        wtab = {hashlib.md5(t.encode()).hexdigest(): v
                for t, v in _brute_table(rows, 8, mc).items()}
        assert gtab == wtab, f"min_count={mc}"


@given(docs_toks=st.lists(
    st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=14),
    min_size=1, max_size=8))
@SET
def test_dup_substring_runs_property(spark, docs_toks):
    """Property: over a tiny 3-token alphabet (duplication everywhere,
    runs break and merge in adversarial ways), the operator equals the
    brute-force reference for window=3."""
    from asvsp_spark.operators.dedup import dup_substring_runs
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs_toks)]
    rows = [(d, t) for d, t in rows if t] or [(0, "a")]
    got = {(r["doc_id"], r["span_start"], r["span_end"])
           for r in dup_substring_runs(
               _docs(spark, rows), window=3).collect()}
    want = {(d, s, e) for d, s, e, _ in _brute_runs(rows, 3, 2)}
    assert got == want
