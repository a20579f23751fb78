"""Byte-pair-encoding vocabulary learning — the tokenizer-training step
of an LLM data pipeline (Sennrich et al., "Neural Machine Translation of
Rare Words with Subword Units", ACL'16). Beyond-parity extension in the
SURVEY §7.5 family (the reference has no text surface at all).

The decomposition is the classical one and is what makes BPE tractable
at 100 TB: ONE corpus-scale pass aggregates (word, freq) — explode +
map-side-combining groupBy, corpus-sized shuffle of vocabulary-sized
output — and every merge iteration after that runs on the vocabulary
table only (unique words × frequency), which is corpus-BOUNDED, not
corpus-sized (web-scale corpora plateau around 10^7-10^8 unique
pre-tokens however many PB of text they hold).

Merge training itself is a strictly sequential argmax loop over that
bounded table, so the engine picks between two executions of the SAME
algorithm (identical counts, tie-breaks, and greedy merge scan —
pinned equal by tests/test_vocab.py):

- **local** (default when the vocabulary fits ``max_local_vocab``
  rows): collect (word, freq) once and run the merge loop on the
  driver. This is how every production tokenizer is trained on
  web-scale corpora (SentencePiece / HF tokenizers train on word
  counts on one machine); it removes the per-iteration Spark job
  latency that otherwise dominates — num_merges jobs become one
  bounded collect.
- **distributed** (vocabulary above the cap, or ``max_local_vocab=0``):
  each iteration is one vocabulary-sized explode + partial-aggregating
  count + a single-row argmax collect (the same bounded-metadata
  pattern as operators/components.py's convergence check), then a pure
  array-fold projection rewrites the symbol sequences — no Python in
  any per-row path.

Determinism: the argmax tie-breaks (count DESC, left ASC, right ASC),
and the within-word merge is the standard greedy left-to-right
non-overlapping scan, expressed as an ``aggregate`` fold whose
replacement can never re-trigger on its own output (the merged symbol
equals the left symbol only if the right were empty). The whole learner
is therefore deterministic and DuckDB-oracle-checkable: the oracle
replays the identical iterations with a single-row recursive CTE over
the vocabulary list (plans/oracle_text.py ``bpe_merge_table``).

Applying a learned merge table to new text (``bpe_apply``) is the one
place Python is the right tool: real tokenizers apply merges with a
rank-priority scan per word, which is data-dependent branching no fixed
SQL expression tree reproduces for an arbitrary merge table — it runs
as an Arrow-batched mapInPandas with the merge table broadcast by
closure (tiny: num_merges rows), one pass, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from asvsp_spark.functions import text as TX
from asvsp_spark.plans.base import fanout


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over whitespace tokens — the single corpus-scale
    pass; everything downstream is vocabulary-sized."""
    return (
        fanout(docs.select(F.explode(TX.tokens(F.col(text_col)))
                           .alias("word")))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _merge_fold(left: str, right: str) -> F.Column:
    """Greedy left-to-right non-overlapping merge of the adjacent symbol
    pair (left, right) in the ``syms`` array, as a pure fold: append
    each symbol, but when the running tail is `left` and the incoming
    symbol is `right`, replace the tail with the merged symbol. The
    merged symbol can never equal `left` (right is non-empty), so a
    replacement never re-triggers on itself — exactly the textbook
    scan."""
    merged = F.lit(left + right)

    def step(acc: F.Column, x: F.Column) -> F.Column:
        hit = ((F.size(acc) > 0)
               & (F.element_at(acc, -1) == F.lit(left))
               & (x == F.lit(right)))
        return (F.when(hit,
                       F.concat(F.slice(acc, 1, F.size(acc) - 1),
                                F.array(merged)))
                .otherwise(F.concat(acc, F.array(x))))

    return F.aggregate("syms", F.array().cast("array<string>"), step)


def _train_merges_local(words: list[tuple[str, int]], num_merges: int,
                        min_pair_count: int
                        ) -> list[tuple[int, str, str, str, int]]:
    """Driver-local merge loop over the collected (word, freq) table —
    byte-for-byte the distributed algorithm: count EVERY adjacent
    symbol position (overlaps included), argmax by (count DESC, left
    ASC, right ASC), then the greedy left-to-right non-overlapping
    merge scan (the exact fold `_merge_fold` runs executor-side).

    Symbol split is per code point (``list(word)``), matching Spark's
    ``split(word, '')`` for all BMP text; the corpus passes are ASCII/
    BMP throughout this repo. Cost is O(vocab × avg_len) per merge —
    microseconds at real tokenizer-training vocabulary sizes."""
    vocab: list[tuple[list[str], int]] = [(list(w), f) for w, f in words]
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, num_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for syms, freq in vocab:
            for pair in zip(syms, syms[1:]):
                counts[pair] = counts.get(pair, 0) + freq
        eligible = [(cnt, l, r) for (l, r), cnt in counts.items()
                    if cnt >= min_pair_count]
        if not eligible:
            break
        cnt, l, r = min(eligible, key=lambda t: (-t[0], t[1], t[2]))
        merges.append((rank, l, r, l + r, cnt))
        merged = l + r
        for i, (syms, freq) in enumerate(vocab):
            out: list[str] = []
            for x in syms:
                if out and out[-1] == l and x == r:
                    out[-1] = merged
                else:
                    out.append(x)
            vocab[i] = (out, freq)
    return merges


def bpe_merge_table(docs: DataFrame, num_merges: int = 16,
                    min_pair_count: int = 2, text_col: str = "text",
                    checkpoint_every: int = 8,
                    max_local_vocab: int = 2_000_000) -> DataFrame:
    """Learn the top ``num_merges`` BPE merges over the corpus; returns
    (rank, left, right, merged, pair_count), rank 1 = first merge.

    Stops early when no adjacent pair reaches ``min_pair_count``.
    The (word, freq) pass is always distributed; merge training runs
    driver-local when the vocabulary has at most ``max_local_vocab``
    rows — pulled as an Arrow ``toPandas`` of two narrow columns
    (tens of MB at the 2M default; per-object Row collection would
    cost ~10× that in Python heap, which is why it is not used), the
    same bounded-metadata contract as centroid tables — else falls
    back to the distributed iteration below. ``max_local_vocab=0``
    forces the distributed path. Both paths are the same algorithm and
    produce identical tables (pinned by tests/test_vocab.py, both as a
    fixed fixture and under hypothesis-randomized corpora).

    Distributed path: driver involvement per iteration is ONE
    single-row collect (the argmax). Wall-clock is per-iteration job
    latency × num_merges — inherent to textbook BPE's strictly
    sequential merges, and independent of corpus size once the
    (word, freq) pass is done. The vocabulary frame is
    localCheckpoint-ed every ``checkpoint_every`` merges: between
    checkpoints each argmax recomputes a few pure array folds over the
    vocabulary-sized frame (cheap), while every checkpoint costs a
    materialization — 8 balanced best locally and bounds plan depth
    for the analyzer either way."""
    spark = docs.sparkSession
    freqs = word_frequencies(docs, text_col)
    schema = ("rank int, left string, right string, merged string, "
              "pair_count bigint")

    if max_local_vocab:
        # One corpus pass: pull at most cap+1 vocabulary rows; a full
        # cap+1 batch means the vocabulary exceeds the cap -> fall
        # through to the distributed loop (the collect stays bounded
        # either way).
        head = freqs.limit(max_local_vocab + 1).toPandas()
        if len(head) <= max_local_vocab:
            words = [(w, int(f)) for w, f in
                     zip(head["word"].tolist(), head["freq"].tolist())]
            return spark.createDataFrame(
                _train_merges_local(words, num_merges, min_pair_count),
                schema)

    vocab = (freqs
             .select(F.split("word", "").alias("syms"), "freq")
             .localCheckpoint(eager=False))

    pair_struct = F.expr(
        "transform(sequence(0, size(syms) - 2), "
        "i -> struct(syms[i] AS l, syms[i + 1] AS r))")
    merges: list[tuple[int, str, str, str, int]] = []
    pending = 0
    for rank in range(1, num_merges + 1):
        best = (
            vocab.filter(F.size("syms") >= 2)
            .select(F.explode(pair_struct).alias("p"), "freq")
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").alias("cnt"))
            .filter(F.col("cnt") >= min_pair_count)
            .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect())
        if not best:
            break
        l, r, cnt = best[0]["l"], best[0]["r"], int(best[0]["cnt"])
        merges.append((rank, l, r, l + r, cnt))
        vocab = vocab.withColumn("syms", _merge_fold(l, r))
        pending += 1
        if pending >= checkpoint_every:
            vocab = vocab.localCheckpoint(eager=False)
            pending = 0

    return spark.createDataFrame(merges, schema)


def bpe_apply(docs: DataFrame, merges: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """Segment each document with a learned merge table: returns
    (id_col, n_words, n_bpe_tokens). Rank-priority application (always
    merge the lowest-rank applicable pair first), matching how trained
    BPE tokenizers run — NOT the same as replaying merges in order on a
    single word, when later merges enable earlier ones.

    The merge table is num_merges rows — collected once and shipped by
    closure into an Arrow-batched mapInPandas (see module docstring for
    why this application step is the one justified Python boundary)."""
    ranks = {(row["left"], row["right"]): int(row["rank"])
             for row in merges.collect()}

    def segment(word: str) -> int:
        syms = list(word)
        while len(syms) >= 2:
            cand = [(ranks.get((a, b)), i)
                    for i, (a, b) in enumerate(zip(syms, syms[1:]))
                    if (a, b) in ranks]
            if not cand:
                break
            _, i = min(cand)
            syms[i:i + 2] = [syms[i] + syms[i + 1]]
        return len(syms)

    out_schema = f"{id_col} long, n_words int, n_bpe_tokens int"

    def run(batches):
        for pdf in batches:
            words = pdf[text_col].fillna("").str.split()
            yield type(pdf)({
                id_col: pdf[id_col],
                "n_words": words.str.len().astype("int32"),
                "n_bpe_tokens": words.map(
                    lambda ws: sum(segment(w) for w in ws)
                ).astype("int32"),
            })

    return fanout(docs.select(id_col, text_col)).mapInPandas(
        run, schema=out_schema)


def vocab_coverage(docs: DataFrame, pcts: tuple[int, ...] = (50, 90, 95, 99),
                   text_col: str = "text") -> DataFrame:
    """Tokenizer-design coverage curve: for each target percentage, the
    MINIMAL frequency-ranked vocabulary size whose words cover at least
    that share of all token occurrences, plus the exact occurrences it
    covers. Output: (pct, vocab_size, tokens_covered, total_tokens) —
    the "how big must the word-level vocab be" table that sizes BPE
    merge counts and OOV budgets before training a tokenizer.

    Determinism: words rank by (freq DESC, word ASC) — the tiebreak
    makes vocab_size reproducible across engines. The coverage
    comparison is exact integer math (cum·100 ≥ pct·total), never a
    float ratio, so the boundary word is bit-identical in DuckDB
    (cum ≤ total tokens ≈ 1e13 at 100 TB, ·100 far under long range).

    Shape, at 100 TB: one corpus-scale pass (word_frequencies'
    explode+groupBy); everything after is VOCABULARY-sized — the global
    rank window sorts distinct words, not occurrences (natural-language
    vocabularies are millions of rows where the corpus is trillions).
    At extreme vocabulary scale, pre-filter freq ≥ 2 and fold the
    singleton tail into a single correction row before the window —
    singletons can never appear before the last rank of any pct < 100
    cutoff, so the curve is unchanged.
    """
    from pyspark.sql import Window

    freq = word_frequencies(docs, text_col=text_col)
    order = Window.orderBy(F.desc("freq"), F.asc("word"))
    ranked = freq.select(
        "freq",
        F.row_number().over(order).alias("rank"),
        F.sum("freq").over(
            order.rowsBetween(Window.unboundedPreceding,
                              Window.currentRow)).alias("cum"))
    total = freq.agg(F.sum("freq").alias("total_tokens"))
    levels = docs.sparkSession.createDataFrame(
        [(int(p),) for p in pcts], "pct int")
    return (ranked.crossJoin(F.broadcast(total))
            .crossJoin(F.broadcast(levels))
            .filter(F.col("cum") * 100 >= F.col("pct") * F.col("total_tokens"))
            .groupBy("pct")
            .agg(F.min("rank").alias("vocab_size"),
                 F.min_by("cum", "rank").alias("tokens_covered"),
                 F.first("total_tokens").alias("total_tokens"))
            .select("pct", F.col("vocab_size").cast("int"),
                    "tokens_covered", "total_tokens"))
