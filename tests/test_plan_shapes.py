"""Physical-plan regression tests: the scale posture (broadcast the
dimensions, push filters to the scan, aggregate partially before any
shuffle) is asserted on the actual executed plans, so a refactor that
silently degrades a plan — a broadcast that becomes a sort-merge + full
shuffle, a filter that stops reaching parquet — fails CI, not the
100TB run.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from asvsp_spark import tables
from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_dimension_joins_broadcast(spark):
    """q01's orders->customer->nation enrichment must broadcast both
    dimension sides — no shuffle of the fact table for a join."""
    from asvsp_spark.plans.base import nation_orders
    plan = _plan(nation_orders(tables.load(spark, SF_DIR, "orders"),
                               tables.load(spark, SF_DIR, "customer"),
                               tables.load(spark, SF_DIR, "nation")))
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_filter_pushed_to_parquet_scan(spark):
    """A column filter must reach the parquet reader as PushedFilters and
    the scan must prune to the projected columns (ReadSchema)."""
    orders = tables.load(spark, SF_DIR, "orders")
    q = (orders.filter(F.col("o_orderpriority") == "1-URGENT")
         .select("o_orderkey", "o_totalprice"))
    plan = _plan(q)
    assert "PushedFilters: [IsNotNull(o_orderpriority), EqualTo(o_orderpriority,1-URGENT)" in plan
    # schema pruning: scan reads only the filter + projection columns
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "o_orderdate" not in read and "o_custkey" not in read


def test_rollup_aggregates_partially_before_shuffle(spark):
    """daily_rollup must plan partial_* aggregate functions below the
    exchange (map-side combine) — the property that makes low-cardinality
    group-bys shuffle groups, not rows."""
    from asvsp_spark.operators.rollups import daily_rollup
    plan = _plan(daily_rollup(tables.load(spark, SF_DIR, "events")))
    partial, final = plan.find("partial_"), plan.find("Exchange")
    assert partial != -1 and final != -1
    # the string prints top-down: final agg, exchange, partial agg —
    # so 'partial_' must appear AFTER 'Exchange' in text order
    assert partial > final


def test_range_join_has_equality_key_not_nested_loop(spark):
    """events_after_order must use the user equality key for the join
    (hash or sort-merge), never BroadcastNestedLoopJoin/cartesian."""
    from asvsp_spark.operators.ranges import events_after_order
    plan = _plan(events_after_order(tables.load(spark, SF_DIR, "orders"),
                                    tables.load(spark, SF_DIR, "events")))
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_whole_stage_codegen_covers_rollup(spark):
    """The rollup pipeline must run inside WholeStageCodegen spans (no
    interpreted expression islands in the hot path). Codegen spans only
    appear in the FINAL adaptive plan, so execute first."""
    from asvsp_spark.operators.rollups import daily_rollup
    df = daily_rollup(tables.load(spark, SF_DIR, "events"))
    df.collect()  # count() would spawn a separate query execution
    plan = _plan(df)
    assert "isFinalPlan=true" in plan
    # '*(n)' prefixes mark operators fused into WholeStageCodegen stage n
    assert "*(1)" in plan and "*(2)" in plan


def test_stream_static_join_broadcasts_static_side(spark):
    """sq1's baseline join must broadcast the (tiny) static side so the
    stream never shuffles for the join. Asserted on the batch twin of the
    joined plan (the streaming plan chooses the same strategy)."""
    from asvsp_spark.operators.rollups import baselines, centi_avg, value_centi
    events = tables.load(spark, SF_DIR, "events")
    agg = (events.groupBy(F.window("ts", "1 hour").alias("window"), "event_type")
           .agg(F.sum(value_centi(F.col("value"))).alias("v_sum"),
                F.count(F.lit(1)).alias("n_events")))
    base = F.broadcast(baselines(events))
    joined = (agg.withColumn("hr", F.hour("window.start"))
              .withColumn("mon", F.month("window.start"))
              .withColumn("is_weekend",
                          F.dayofweek(F.to_date("window.start")).isin(1, 7))
              .join(base, ["event_type", "mon", "hr", "is_weekend"], "left"))
    plan = _plan(joined)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q11_shipdate_filter_reaches_lineitem_scan(spark):
    """The TPC-H-Q1-shaped scan must push the shipdate predicate to
    parquet and partially aggregate before the exchange — one scan,
    groups-not-rows shuffle."""
    from asvsp_spark.plans.lineitem_queries import q11_pricing_summary
    plan = _plan(q11_pricing_summary(tables.load(spark, SF_DIR, "lineitem")))
    assert "LessThanOrEqual(l_shipdate" in plan
    partial, exch = plan.find("partial_"), plan.find("Exchange")
    assert partial != -1 and exch != -1 and partial > exch


def test_q12_join_prunes_projections(spark):
    """The big-to-big join must shuffle pruned projections (keys +
    dates), never full rows: lineitem's scan reads 3 columns."""
    from asvsp_spark.plans.lineitem_queries import q12_late_shipments
    plan = _plan(q12_late_shipments(tables.load(spark, SF_DIR, "lineitem"),
                                    tables.load(spark, SF_DIR, "orders")))
    li_read = [seg.splitlines()[0] for seg in plan.split("ReadSchema:")[1:]
               if "l_orderkey" in seg.splitlines()[0]][0]
    for dropped in ("l_partkey", "l_suppkey", "l_quantity", "l_returnflag"):
        assert dropped not in li_read, f"{dropped} not pruned: {li_read}"


def test_q13_aggregates_fact_before_dimension_join(spark):
    """Top-k supplier margin must aggregate the fact table BEFORE the
    broadcast name joins — the text plan shows the supplier join above
    the TakeOrdered(limit), which is above the lineitem aggregate."""
    from asvsp_spark.plans.lineitem_queries import q13_supplier_margin_topk
    plan = _plan(q13_supplier_margin_topk(
        tables.load(spark, SF_DIR, "lineitem"),
        tables.load(spark, SF_DIR, "supplier"),
        tables.load(spark, SF_DIR, "nation")))
    join_pos = plan.find("BroadcastHashJoin")
    topk_pos = plan.find("TakeOrderedAndProject")
    agg_pos = plan.rfind("HashAggregate")
    assert join_pos != -1 and topk_pos != -1
    # top-down print: joins first, then TakeOrdered, then the aggregate
    assert join_pos < topk_pos < agg_pos


def test_doc_repetition_is_single_scan_no_shuffle(spark):
    """The repetition signals are one projection over the scan — any
    Exchange appearing means someone turned a per-row feature into an
    aggregation."""
    from asvsp_spark.plans.registry import all_queries
    plan = _plan(all_queries()["doc_repetition"](spark, SF_DIR))
    assert "Exchange" not in plan


def test_funnel_two_aggregation_levels_only(spark):
    """funnel_daily: exactly the (user, day) agg and the day rollup —
    two exchanges, no joins, column-pruned scan."""
    from asvsp_spark.plans.registry import all_queries
    plan = _plan(all_queries()["funnel_daily"](spark, SF_DIR))
    assert plan.count("Exchange") == 2
    assert "Join" not in plan
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "props" not in read and "value" not in read


def test_mixture_rebalance_broadcasts_quotas(spark):
    """The quota/threshold tables must broadcast — the corpus shuffles
    once for the per-stratum rank, never for the quota join."""
    from asvsp_spark.plans.registry import all_queries
    plan = _plan(all_queries()["mixture_rebalance"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_quality_gate_broadcasts_thresholds(spark):
    from asvsp_spark.plans.registry import all_queries
    plan = _plan(all_queries()["quality_filter_report"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_pack_contiguous_single_shuffle_pruned_scan(spark):
    """Packing is one Exchange (hashpartitioning by shard for the
    window) over a column-pruned scan — no joins, no second shuffle."""
    from asvsp_spark.operators.packing import pack_contiguous
    from asvsp_spark import tables
    docs = tables.load(spark, SF_DIR, "documents")
    plan = _plan(pack_contiguous(docs, budget=256, n_shards=4))
    assert plan.count("Exchange") == 1
    assert "Join" not in plan
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "lang" not in read and "source" not in read


def test_decontaminate_corpus_never_shuffles_on_shingle(spark):
    """decontaminate_report: the benchmark side reaches the corpus via
    broadcast — no sort-merge join, no Exchange keyed by the shingle."""
    from asvsp_spark.operators.dedup import decontaminate_report
    from asvsp_spark import tables
    from pyspark.sql import functions as F
    docs = tables.load(spark, SF_DIR, "documents")
    corpus = docs.filter(F.col("doc_id") % 37 != 0)
    bench = docs.filter(F.col("doc_id") % 37 == 0)
    plan = _plan(decontaminate_report(corpus, bench))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # exactly one shingle-keyed Exchange: the BENCHMARK side's own tiny
    # distinct (under its BroadcastExchange); the corpus posting list
    # itself must never repartition by shingle
    assert plan.count("hashpartitioning(sh") == 1


def test_leakage_split_single_shuffle_window_min(spark):
    """The exact-cluster leakage split plans ONE Exchange (hash by
    fingerprint for the window-min); the split assignment itself is
    narrow — no second shuffle, no join."""
    from asvsp_spark.operators.splits import leakage_safe_split
    plan = _plan(leakage_safe_split(tables.load(spark, SF_DIR, "documents")))
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Join" not in plan


def test_pack_whole_docs_single_shard_shuffle(spark):
    """Whole-doc packing shuffles once on the shard key into the
    per-shard applyInPandas — same single-Exchange envelope as the
    contiguous packer."""
    from asvsp_spark.operators.packing import pack_whole_docs
    plan = _plan(pack_whole_docs(tables.load(spark, SF_DIR, "documents")))
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "FlatMapGroupsInPandas" in plan or "ArrowEvalPython" in plan


def test_fanout_spreads_only_undersplit_input(spark):
    """fanout(): repartitions a 1-partition frame up to the session's
    default parallelism, leaves an already-wide frame UNTOUCHED (same
    plan object — it must never add an Exchange at production partition
    counts), and is a no-op passthrough for streaming frames."""
    from asvsp_spark.plans.base import fanout
    docs = tables.load(spark, SF_DIR, "documents")
    target = spark.sparkContext.defaultParallelism
    narrow = docs.coalesce(1)
    assert fanout(narrow).rdd.getNumPartitions() == target
    wide = docs.repartition(target + 4)
    assert fanout(wide) is wide
    stream = (spark.readStream.format("rate").option("rowsPerSecond", 1)
              .load())
    assert fanout(stream) is stream


def test_token_entropy_is_shuffle_free(spark):
    """The entropy quality signal must stay a single projection over the
    scan — zero Exchange nodes — or the 'parquet-scan-speed corpus pass'
    claim is gone."""
    from asvsp_spark.plans.registry import all_queries
    plan = _plan(all_queries()["token_entropy"](spark, SF_DIR))
    assert "Exchange" not in plan


def test_key_skew_report_single_corpus_pass(spark):
    """key_skew_report must scan events ONCE: the per-key count table is
    key-cardinality-sized, so everything downstream (global stats, top-k)
    must hang off that aggregate, not rescan the fact parquet."""
    from asvsp_spark.plans.registry import all_queries
    plan = _plan(all_queries()["key_skew_report"](spark, SF_DIR))
    assert plan.count("events.parquet") <= 1
    # the map-side combine before the key shuffle
    partial, exchange = plan.find("partial_"), plan.find("Exchange")
    assert partial != -1 and exchange != -1 and partial > exchange


def test_check_suite_partial_agg_and_fk_broadcast(spark):
    """The data-quality suite's scale posture: all scan checks ride one
    partially-aggregated pass (HashAggregate before AND after the
    single-row exchange), and the FK parent side broadcasts — the
    child fact table is never shuffled for referential integrity."""
    from asvsp_spark.operators.validate import check_suite
    orders = tables.load(spark, SF_DIR, "orders")
    customer = tables.load(spark, SF_DIR, "customer")
    rep = check_suite(orders, "orders", [
        {"check": "not_null", "column": "o_custkey"},
        {"check": "in_set", "column": "o_orderstatus",
         "allowed": ["O", "F", "P"]},
        {"check": "min_rows", "threshold": 1},
        {"check": "foreign_key", "column": "o_custkey",
         "ref": customer, "ref_column": "c_custkey"},
    ])
    rep.collect()   # AQE: finalize the adaptive plan before asserting
    # an executed AdaptiveSparkPlan prints Final AND Initial sections;
    # count scans only in the final one
    plan = _plan(rep).split("== Initial Plan ==")[0]
    # scan checks: partial -> final aggregation, one orders scan for
    # the whole scan-check suite (the FK child select is a second,
    # single-column scan)
    assert "partial_" in plan or "partial" in plan.lower()
    assert plan.count("FileScan parquet") <= 3
    # FK join: distinct parent keys broadcast onto the child stream
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_runtime_bloom_filter_prunes_fact_side(spark):
    """The 100 TB scan-pruning lever beyond static pushdown: when a
    selective dimension filter feeds a SHUFFLE join, Catalyst injects a
    runtime Bloom filter (bloom_filter_agg on the creation side,
    might_contain on the fact scan) so non-joining fact rows die before
    the shuffle. The engine's session keeps the feature on (Spark 4
    default); this pins that a conf regression or a plan change that
    breaks injection fails CI. Thresholds are lowered only because test
    tables are KB-sized — at production scale the defaults fire."""
    saved = {k: spark.conf.get(k, None) for k in (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "spark.sql.optimizer.runtime.bloomFilter.enabled")}
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter."
                       "applicationSideScanSizeThreshold", "0")
        li = tables.load(spark, SF_DIR, "lineitem")
        orders = tables.load(spark, SF_DIR, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT")

        def optimized():
            j = (li.join(orders, li.l_orderkey == orders.o_orderkey)
                 .groupBy("o_orderpriority").count())
            return j._jdf.queryExecution().optimizedPlan().toString()

        plan = optimized()
        assert "might_contain" in plan and "bloom_filter_agg" in plan
        # negative control: with the feature off the filter must vanish,
        # proving the assertion above detects the conf, not a coincidence
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
        assert "might_contain" not in optimized()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_paragraph_dedup_keeper_partial_aggregates(spark):
    """The keep-first argmin must partially aggregate BEFORE its
    exchange (partial_min map-side), so a boilerplate segment occurring
    a billion times combines locally instead of concentrating on one
    reducer — the reason it is an aggregate, not a row_number window."""
    from asvsp_spark.operators.dedup import paragraph_dedup
    docs = tables.load(spark, SF_DIR, "documents")
    plan = _plan(paragraph_dedup(docs, delimiter=r"\s+the\s+"))
    assert "partial_min" in plan
    # and no window sort over the segment hash anywhere in the plan
    assert "Window" not in plan


def test_dup_substring_runs_broadcasts_and_stays_banded(spark):
    """r7 substring dedup: the hot-window membership must be a
    broadcast LEFT SEMI (never a shuffled join of the occurrence
    stream), the run-text extraction join must broadcast the runs side,
    and nothing in the plan may be a cartesian/nested-loop product —
    the no-all-pairs guarantee asserted structurally."""
    from asvsp_spark.operators.dedup import dup_substring_runs
    docs = tables.load(spark, SF_DIR, "documents")
    plan = _plan(dup_substring_runs(docs))
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # occurrence counting partially aggregates before its exchange
    assert "partial_count" in plan


def test_line_dedup_is_single_projection_no_shuffle(spark):
    """r7 within-doc line dedup must run at scan speed: ONE projection,
    no aggregate, no join, and no exchange beyond the small-file fanout
    guard's round-robin."""
    from asvsp_spark.operators.dedup import line_dedup_docs
    docs = tables.load(spark, SF_DIR, "documents")
    plan = _plan(line_dedup_docs(docs, delimiter=r"\s+the\s+"))
    assert "Join" not in plan and "HashAggregate" not in plan
    assert "Window" not in plan
    # at most the fanout round-robin exchange, never a hash/range one
    assert "hashpartitioning" not in plan and "rangepartitioning" not in plan
