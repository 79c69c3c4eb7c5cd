"""Physical-plan property tests: the 100 TB design contract, pinned.

Each assertion encodes a scale invariant from SURVEY.md: filters reach the
scan, scans are column-pruned, dim joins broadcast, aggregations have
map-side partials, the flagship query shuffles exactly once.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from caffeonspark_spark.operators import relational as R
from caffeonspark_spark.operators import similarity as S
from caffeonspark_spark.plans.inspect import (
    has_broadcast_join,
    has_partial_aggregation,
    physical_plan,
    pushed_filters,
    read_schema_columns,
    shuffle_count,
)


def test_filter_pushdown(spark, sf_smoke):
    df = R.scan_filter_project(spark, sf_smoke)
    pushed = " ".join(pushed_filters(df))
    assert "l_quantity" in pushed and "l_returnflag" in pushed


def test_column_pruning(spark, sf_smoke):
    df = R.scan_filter_project(spark, sf_smoke)
    scans = read_schema_columns(df)
    assert len(scans) == 1
    # only the 4 projected + 2 filter columns may be read, never all 11
    assert scans[0] <= {
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag"
    }


def test_q1_single_shuffle_partial_agg(spark, sf_smoke):
    df = R.pricing_summary(spark, sf_smoke)
    assert has_partial_aggregation(df)
    # one exchange for the groupBy, one for the final orderBy (tiny, 6 rows)
    assert shuffle_count(df) <= 2


def test_dim_join_broadcasts(spark, sf_smoke):
    df = R.broadcast_dim_join(spark, sf_smoke)
    assert has_broadcast_join(df)
    plan = physical_plan(df)
    # the fact (customer) side must NOT be exchanged before the join
    assert "SortMergeJoin" not in plan


def test_multiway_join_dims_broadcast(spark, sf_smoke):
    assert has_broadcast_join(R.multiway_join(spark, sf_smoke))


def test_topk_is_take_ordered(spark, sf_smoke):
    plan = physical_plan(R.topk_orderby_limit(spark, sf_smoke))
    # top-k must not globally sort: TakeOrderedAndProject does per-partition
    # heaps + a k-row driver merge
    assert "TakeOrderedAndProject" in plan


def test_cosine_topk_broadcasts_query(spark, sf_smoke):
    df = S.cosine_topk_query0(spark, sf_smoke)
    plan = physical_plan(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_bucketed_join_has_no_shuffle(spark, sf_smoke):
    """X2-at-scale: same-key bucketed tables join with zero exchanges —
    the write-once-shuffle-never-again contract bucketing buys at 100 TB."""
    from caffeonspark_spark.catalog import load_table
    from caffeonspark_spark.operators.partitioning import (
        bucketed_equi_join,
        write_bucketed,
    )
    from caffeonspark_spark.plans.inspect import shuffle_count

    orders = load_table(spark, sf_smoke, "orders").select("o_orderkey", "o_totalprice")
    li = load_table(spark, sf_smoke, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    write_bucketed(orders, "b_orders", "o_orderkey", n_buckets=4)
    write_bucketed(li, "b_lineitem", "o_orderkey", n_buckets=4)
    joined = bucketed_equi_join(spark, "b_orders", "b_lineitem", "o_orderkey")
    assert shuffle_count(joined) == 0
    assert joined.count() > 0
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_window_suite_single_shuffle(spark, sf_smoke):
    """All five window functions share one window spec → exactly one
    exchange (hash on o_custkey), one Window operator."""
    import re

    df = R.window_functions(spark, sf_smoke)
    assert shuffle_count(df) == 1
    # exactly ONE Window node (detail headers; >=1 on the raw string could
    # never fail when a refactor split the spec into several Window ops)
    assert len(re.findall(r"\(\d+\) Window", physical_plan(df))) == 1


def test_pack_documents_hierarchical_plan(spark, sf_smoke):
    """Sequence packing must never hand one task a whole source: the bulk
    window partitions by (source, sub-shard); only the metadata-sized
    offset table gets a per-source window; offsets come back via broadcast.
    And the two-level cumsum must equal the flat per-source running sum."""
    from pyspark.sql.window import Window

    from caffeonspark_spark.operators import textops as TX

    df = TX.pack_documents(spark, sf_smoke, subshard_width=32)
    plan = physical_plan(df)
    # the row-scale window is keyed by (source, _sub)
    assert "_sub" in plan and plan.count("Window") >= 2
    assert has_broadcast_join(df)

    # semantics: identical to the flat single-window form
    from caffeonspark_spark.catalog import load_table

    docs = load_table(spark, sf_smoke, "documents")
    n_tok = F.size(F.filter(F.split(F.lower(F.col("text")), " "), lambda t: t != F.lit("")))
    w = Window.partitionBy("source").orderBy(F.asc("doc_id"))
    flat = (
        docs.select("doc_id", "source", n_tok.alias("n_tokens"))
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .withColumn(
            "pack_id",
            F.floor((F.col("cum_tokens") - F.col("n_tokens")) / F.lit(512)).cast("long"),
        )
    )
    got = {r["doc_id"]: (r["cum_tokens"], r["pack_id"]) for r in df.collect()}
    expect = {r["doc_id"]: (r["cum_tokens"], r["pack_id"]) for r in flat.collect()}
    assert got == expect


def test_range_join_broadcasts_bands(spark, sf_smoke):
    """The 5-row band table must broadcast (nested-loop on ranges); the
    orders side must not exchange before the join."""
    df = R.range_join_bands(spark, sf_smoke)
    plan = physical_plan(df)
    assert "BroadcastNestedLoopJoin" in plan
    assert has_partial_aggregation(df)


def test_scalar_subquery_broadcasts(spark, sf_smoke):
    df = R.scalar_subquery(spark, sf_smoke)
    plan = physical_plan(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_all_queries_scan_pruned(spark, sf_smoke):
    """Global column-pruning audit: NO query may scan ≥8 columns of any
    table (the widest legitimate need is Q1's 7 of lineitem's 16). Catches
    accidental SELECT * plumbing anywhere in the query surface."""
    import importlib.util
    import sys

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    entry = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("__spark_entry__", entry)
    spec.loader.exec_module(entry)
    offenders = {}
    for name, fn in entry.queries().items():
        widths = [len(s) for s in read_schema_columns(fn(spark, sf_smoke))]
        if any(w >= 8 for w in widths):
            offenders[name] = widths
    assert not offenders, f"unpruned scans: {offenders}"


def test_ann_index_partition_pruned_lookup(spark, sf_smoke, tmp_path_factory):
    """The materialized LSH index must answer lookups by scanning ONLY the
    probe buckets (partition pruning) and agree with the in-memory ANN."""
    from pyspark.sql import functions as F  # noqa: F811
    from caffeonspark_spark.catalog import load_table
    from caffeonspark_spark.operators.similarity import (
        ann_lsh_topk,
        build_ann_index,
        query_ann_index,
    )

    emb = load_table(spark, sf_smoke, "embeddings")
    path = str(tmp_path_factory.mktemp("annidx") / "lsh")
    build_ann_index(emb, path, dim=64)
    q = emb.where(F.col("vec_id") == 0)
    got = query_ann_index(spark, path, q, dim=64, k=10)
    plan = physical_plan(got)
    assert "PartitionFilters" in plan and "bucket" in plan
    got_ids = [r["vec_id"] for r in got.collect()]
    mem_ids = [r["vec_id"] for r in ann_lsh_topk(emb, q, dim=64, k=10).collect()]
    assert got_ids == mem_ids


def test_runtime_bloom_filter_injection(spark, sf_smoke):
    """A selective dim-side filter must inject a runtime bloom filter into
    the fact-side scan when broadcast is off (the shuffle-join pre-filter
    that cuts fact rows before the exchange at 100 TB)."""
    from caffeonspark_spark.catalog import load_table

    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "50MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = load_table(spark, sf_smoke, "orders").where(F.col("o_orderpriority") == "1-URGENT")
        li = load_table(spark, sf_smoke, "lineitem")
        j = li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_orderstatus").count()
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom" in plan.lower()
        assert j.count() > 0
    finally:
        spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
        spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_shipping_priority_plan(spark, sf_smoke):
    """Q3 shape: date filters reach both fact scans; top-10 is
    TakeOrderedAndProject (no global sort)."""
    df = R.shipping_priority(spark, sf_smoke)
    plan = physical_plan(df)
    assert "TakeOrderedAndProject" in plan
    pushed = pushed_filters(df)
    assert any("o_orderdate" in p for p in pushed), pushed
    assert any("l_shipdate" in p for p in pushed), pushed


def test_above_nation_avg_decorrelated(spark, sf_smoke):
    """The correlated scalar subquery must run as ONE tiny agg + broadcast
    join back — not a per-row re-evaluation."""
    df = R.above_nation_avg(spark, sf_smoke)
    assert has_broadcast_join(df)
    assert shuffle_count(df) <= 1


def test_disjunctive_predicate_pushes_single_side_bounds(spark, sf_smoke):
    """Q19 shape: even though the OR spans both join sides, Catalyst must
    extract each side's implied bounds into the scans (l_quantity on
    lineitem, p_size/p_brand on part)."""
    df = R.disjunctive_predicate_join(spark, sf_smoke)
    pushed = " ".join(pushed_filters(df))
    assert "l_quantity" in pushed, pushed
    assert "p_size" in pushed or "p_brand" in pushed, pushed


def test_cluster_by_write_produces_disjoint_file_ranges(spark, sf_smoke, tmp_path):
    """Write-side clustering: each output file must cover a non-overlapping
    l_orderkey slice (checked from real parquet footer stats), which is
    what lets a selective scan prune whole files."""
    import pyarrow.parquet as pq
    import glob

    from caffeonspark_spark.catalog import load_table
    from caffeonspark_spark.operators.partitioning import cluster_by_write

    li = load_table(spark, sf_smoke, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    out = str(tmp_path / "clustered")
    cluster_by_write(li, out, ["l_orderkey"], n_files=6)

    ranges = []
    for f in glob.glob(f"{out}/part-*.parquet"):
        meta = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(meta.num_row_groups):
            col = meta.row_group(rg).column(0)
            assert col.path_in_schema == "l_orderkey"
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        ranges.append((min(mins), max(maxs)))
    assert len(ranges) >= 4
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping file ranges {(lo1, hi1)} vs {(lo2, hi2)}"

    # the clustered copy stays row-identical to the source
    assert spark.read.parquet(out).count() == li.count()


def test_order_priority_check_semi_join(spark, sf_smoke):
    """Q4 shape: the EXISTS must compile to a LEFT SEMI join (each order
    tested once, no duplicate explosion) with the quarter filter pushed to
    the orders scan."""
    df = R.order_priority_check(spark, sf_smoke)
    plan = physical_plan(df)
    assert "LeftSemi" in plan, plan
    assert any("o_orderdate" in p for p in pushed_filters(df))


def test_local_supplier_volume_broadcasts_dims(spark, sf_smoke):
    """Q5 shape: nation/region resolve as broadcasts; the year filter
    reaches the orders scan; exactly one shuffle for the final group."""
    df = R.local_supplier_volume(spark, sf_smoke)
    assert has_broadcast_join(df)
    assert any("o_orderdate" in p for p in pushed_filters(df))
    assert has_partial_aggregation(df)


def test_waiting_suppliers_semi_and_anti(spark, sf_smoke):
    """Q21 shape: EXISTS -> LEFT SEMI, NOT EXISTS -> LEFT ANTI, both on
    l_orderkey with residual supplier-inequality conditions; top-100 is
    TakeOrderedAndProject, and the status filter reaches the orders scan."""
    df = R.waiting_suppliers(spark, sf_smoke)
    plan = physical_plan(df)
    assert "LeftSemi" in plan, plan
    assert "LeftAnti" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert any("o_orderstatus" in p for p in pushed_filters(df))


def test_small_quantity_revenue_decorrelated(spark, sf_smoke):
    """Q17 shape: the per-part average runs once and joins back broadcast —
    no per-row subquery re-evaluation; part filters reach the part scan."""
    df = R.small_quantity_revenue(spark, sf_smoke)
    assert has_broadcast_join(df)
    pushed = " ".join(pushed_filters(df))
    assert "p_brand" in pushed or "p_type" in pushed, pushed


def test_ngram_lm_score_plan(spark, sf_smoke):
    """The vocab scalar must ride a broadcast (nested-loop on one row),
    never a CartesianProduct over data; the doc scan is column-pruned to
    (doc_id, text)."""
    from caffeonspark_spark.operators import textops as TX

    df = TX.ngram_lm_score(spark, sf_smoke)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    for scan in read_schema_columns(df):
        assert scan <= {"doc_id", "text"}, scan


def test_keep_best_duplicate_window_partitioned(spark, sf_smoke):
    """The ranking window must partition by the fingerprint (hash-partition
    sort), not collapse to a single global partition."""
    from caffeonspark_spark.operators import dedup as D

    plan = physical_plan(D.keep_best_duplicate(spark, sf_smoke))
    assert "Window" in plan
    # the window spec must carry the fp partition key (a partition-less
    # window would render windowspecdefinition(n_chars ... ) with no fp)
    assert "windowspecdefinition(fp" in plan, plan


def test_min_cost_supplier_single_window_shuffle(spark, sf_smoke):
    """Q2 shape: the correlated min decorrelates into a window sharing the
    offer agg's p_partkey hashpartitioning — at most 2 shuffles total (agg
    + final ordering path), every dim broadcast, top-100 as
    TakeOrderedAndProject (no global sort)."""
    from caffeonspark_spark.operators import relational as R

    plan = physical_plan(R.min_cost_supplier(spark, sf_smoke))
    assert plan.count("Exchange hashpartitioning") <= 2, plan
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, plan


def test_important_stock_no_double_sum(spark, sf_smoke):
    """Q11 shape: the global total must come from its own decimal-grid agg
    over the joined fact (broadcast back), not a float re-sum of per-part
    doubles; part is a broadcast dim."""
    from caffeonspark_spark.operators import relational as R

    plan = physical_plan(R.important_stock(spark, sf_smoke))
    assert "BroadcastHashJoin" in plan
    # the 1-row global total joins back as a broadcast nested loop (the
    # only legal shape for a join with no key), never a cartesian product
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    # the only hash-shuffle is the per-part aggregation
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_interval_overlap_bucketized_equijoin_plan(spark, sf_smoke):
    """The scale twin of the interval-overlap join must be a pure
    equi-join on the hour bucket: no nested-loop/range probe, no
    cartesian — the property that lets an unbroadcastable interval set
    scale (SCALE.md). The broadcast form, by contrast, IS the
    nested-loop range probe."""
    from caffeonspark_spark.operators import temporal as TP

    plan = physical_plan(TP.interval_overlap_bucketized(spark, sf_smoke))
    assert "CartesianProduct" not in plan, plan
    # the only BroadcastNestedLoopJoin allowed is the 1-row avg threshold
    # stats join inside _hot_hours; the session×hot join itself must key
    # on the exploded hour bucket (formatted plans print each node twice
    # — tree + detail — so count the "(n) Node" detail lines)
    assert plan.count(") BroadcastNestedLoopJoin") <= 1, plan
    assert "hr" in plan and "Join" in plan
    broad = physical_plan(TP.interval_overlap_sessions(spark, sf_smoke))
    assert broad.count(") BroadcastNestedLoopJoin") >= 2, broad


def test_interval_overlap_bucketized_bitequal(spark, sf_smoke):
    """Bucketized and broadcast forms must agree bit-for-bit — same rows,
    same overlap counts (they share one DuckDB oracle)."""
    from caffeonspark_spark.operators import temporal as TP

    a = sorted(
        map(tuple, TP.interval_overlap_sessions(spark, sf_smoke).collect())
    )
    b = sorted(
        map(tuple, TP.interval_overlap_bucketized(spark, sf_smoke).collect())
    )
    assert a and a == b


def test_codegen_spans_on_hot_aggregation(spark, sf_smoke):
    """The '.explain discipline' promise: the flagship grouped aggregation
    runs inside whole-stage codegen. Codegen ids exist only in the FINAL
    adaptive plan, so the helper legitimately reports 0 before execution
    and >=1 after — pinning both the helper's contract and the plan
    property (the pre-fix helper counted a string formatted explain never
    prints and always returned 0, making any such assertion vacuous)."""
    from caffeonspark_spark.plans.inspect import wholestage_codegen_ops

    df = R.pricing_summary(spark, sf_smoke)
    assert wholestage_codegen_ops(df) == 0  # AQE plan not finalized yet
    df.collect()
    assert wholestage_codegen_ops(df) >= 1


def test_pushed_filters_survive_complex_entries(spark, sf_smoke):
    """Balance-aware parsing: an IN filter (nested brackets) must come back
    as ONE intact entry and must not swallow the filters after it."""
    from caffeonspark_spark.catalog import load_table

    df = (
        load_table(spark, sf_smoke, "embeddings")
        .where(F.col("vec_id").isin(1, 2, 3))
        .where(F.col("label") > 0)
        .select("vec_id", "label")
    )
    pushed = pushed_filters(df)
    assert any(p.startswith("In(vec_id") and p.endswith(")") for p in pushed)
    assert any("GreaterThan(label" in p for p in pushed)
    # column after an array-typed column is not dropped from the read set
    emb = load_table(spark, sf_smoke, "embeddings").select(
        "vec_id", "embedding", "label"
    )
    [cols] = read_schema_columns(emb)
    assert cols == {"vec_id", "embedding", "label"}


def test_cosine_range_search_plan(spark, sf_smoke):
    """Radius search must be a broadcast nested-loop over the corpus scan
    (the only legal shape for a tiny probe set) with NO shuffle and NO
    cartesian product, and the corpus scan must read only the two needed
    columns."""
    df = S.cosine_range_query(spark, sf_smoke)
    plan = physical_plan(df)
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert shuffle_count(df) == 0, plan
    assert {"vec_id", "embedding"} in read_schema_columns(df)


def test_cohort_retention_plan(spark, sf_smoke):
    """One full-data exchange (the user_id window) + one partial-agg
    exchange; the scan reads only ts and user_id."""
    from caffeonspark_spark.operators import temporal as TP

    df = TP.cohort_retention_query(spark, sf_smoke)
    assert shuffle_count(df) <= 2, physical_plan(df)
    assert has_partial_aggregation(df)
    assert read_schema_columns(df) == [{"ts", "user_id"}]


def test_embedding_gram_plan(spark, sf_smoke):
    """The Gram aggregation must run with map-side partials so the
    (i,j)-keyed exchange is d²-sized, and only the embedding column is
    scanned."""
    from caffeonspark_spark.operators import vectorops as V

    df = V.embedding_gram(spark, sf_smoke)
    assert has_partial_aggregation(df)
    assert {"embedding"} in read_schema_columns(df)


def test_gapfill_hourly_single_scan_single_event_shuffle(spark, sf_smoke):
    """The 100 TB invariant the round-8 ADVICE found broken in the first
    (grid-join) form: the event volume must be SCANNED once and SHUFFLED
    once — into the (event_type, hour) hash agg with map-side partials —
    and every gap-filling step after it (lag, LOCF windows, sequence
    explode) must run over the rollup. No second events subtree, no
    grid⋈rollup join."""
    from caffeonspark_spark.operators import temporal as TP

    df = TP.gapfill_hourly(spark, sf_smoke)
    plan = physical_plan(df)
    # exactly one scan of the events table (formatted plans print each node
    # twice — tree + detail; count the "(n) Node" detail lines)
    assert plan.count(") Scan parquet") == 1, plan
    assert has_partial_aggregation(df)
    # agg exchange (event-volume) + window exchange (rollup-sized): 2 total
    assert shuffle_count(df) <= 2, plan
    # gapfill is derived from the rollup — there is no join at all
    assert "Join" not in plan, plan
    assert ") Generate" in plan and "explode" in plan, plan
    assert read_schema_columns(df) == [{"ts", "event_type", "value"}]


def test_edit_distance_pairs_blocked_plan(spark, sf_smoke):
    """The blocking contract that bounds the quadratic at 100 TB: the
    hot-block drop is a BROADCAST left-anti (the hot list is tiny by
    construction), the candidate join is a pure equi-join on the 8-char
    block key, and nothing degenerates into a cartesian product."""
    from caffeonspark_spark.operators import dedup as D

    df = D.edit_distance_dup_pairs_docs(spark, sf_smoke)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    # hot-block drop: broadcast anti-join against the over-cap block list
    assert "BroadcastHashJoin LeftAnti BuildRight" in plan, plan
    # candidate generation: a HASH equi-join keyed on blk (broadcast at
    # smoke scale, shuffled-hash/SMJ at 100 TB — never a range/theta join)
    assert "blk" in plan, plan
    assert "HashJoin Inner" in plan or "SortMergeJoin" in plan, plan
    # the banded (threshold) levenshtein, not the full DP
    assert "levenshtein" in plan, plan


def test_topk_per_group_map_side_limit(spark, sf_smoke):
    """Per-group top-k must NOT full-sort every group: the rank filter
    triggers InferWindowGroupLimit and a PARTIAL WindowGroupLimit runs
    below the exchange (map tasks keep ≤k rows per group), the per-group
    analogue of TakeOrderedAndProject."""
    from caffeonspark_spark.operators import relational as R

    df = R.topk_per_group(spark, sf_smoke)
    plan = physical_plan(df)
    # Partial (below exchange) + Final (above) — two detail nodes
    assert plan.count(") WindowGroupLimit") == 2, plan
    assert shuffle_count(df) == 1, plan
    assert read_schema_columns(df) == [{"source", "doc_id", "n_chars"}]


def test_kmv_overlap_sketch_plan(spark, sf_smoke):
    """The KMV sketch build is itself a per-group top-k: the corpus-sized
    side must cross its exchange already limited (partial WindowGroupLimit
    ahead of the source-keyed shuffle), the pair enumeration is the only
    nested-loop (sources × sources metadata rows), and nothing degenerates
    into a cartesian product."""
    from caffeonspark_spark.operators import sampling as SA

    df = SA.kmv_source_overlap(spark, sf_smoke)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    # the corpus-side sketch window + the pair-merged union window both
    # carry group limits, each partial+final
    assert plan.count(") WindowGroupLimit") >= 4, plan
    # only the text+source columns are ever read
    for scan in read_schema_columns(df):
        assert scan <= {"source", "text"}, scan


def test_hard_negatives_broadcast_rank_plan(spark, sf_smoke):
    """The triplet-mining scale contract: anchors go BROADCAST (the corpus
    never shuffles at corpus size), the rank-1 filter runs as a partial
    WindowGroupLimit below the exchange (map tasks keep 1 row per
    anchor×class), and only (vec_id, label, embedding) is ever read."""
    from caffeonspark_spark.operators.similarity import hard_negative_mining_query

    df = hard_negative_mining_query(spark, sf_smoke)
    plan = physical_plan(df)
    assert ") BroadcastNestedLoopJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    # partial (below the exchange) + final — two detail nodes
    assert plan.count(") WindowGroupLimit") == 2, plan
    # window exchange (≤2 rows per anchor per task) + pivot agg, plus the
    # r17 scale_out round-robin rebalance of the narrow corpus rows — the
    # rebalance only exists because THIS scan is single-split (it is a
    # no-op on a multi-split production scan, so the at-scale contract
    # stays 2 exchanges, neither corpus-sized)
    assert shuffle_count(df) == 3, plan
    assert "REPARTITION_BY_NUM" in plan or "RoundRobinPartitioning" in plan, plan
    for scan in read_schema_columns(df):
        assert scan == {"vec_id", "label", "embedding"}, plan


def test_event_sequences_single_shuffle_pruned(spark, sf_smoke):
    """Sequence-example generation is ONE user_id shuffle + one window sort;
    lag() needs no frame accumulation, and the scan must prune value/props
    (the widest events columns) away."""
    from caffeonspark_spark.operators.temporal import event_sequence_examples_query

    df = event_sequence_examples_query(spark, sf_smoke)
    plan = physical_plan(df)
    assert shuffle_count(df) == 1, plan
    assert plan.count(") Window") == 1, plan
    assert plan.count(") Scan parquet") == 1, plan
    assert read_schema_columns(df) == [{"user_id", "event_id", "ts", "event_type"}]


def test_zscore_single_fused_window(spark, sf_smoke):
    """Both trailing frame sums AND the row_number share one partitioning +
    ordering, so Catalyst must fuse them into a SINGLE Window over a single
    Exchange+Sort — a refactor that splits the frames (second sort, second
    shuffle of the event volume) is the regression this pins."""
    from caffeonspark_spark.operators.temporal import rolling_zscore_query

    df = rolling_zscore_query(spark, sf_smoke)
    plan = physical_plan(df)
    assert shuffle_count(df) == 1, plan
    assert plan.count(") Window") == 1, plan
    assert plan.count(") Sort") == 1, plan
    assert read_schema_columns(df) == [{"event_id", "ts", "event_type", "value"}]


def test_zscore_bucketized_fine_keyed_windows(spark, sf_smoke):
    """The scale twin's whole point: NO event-sized window may partition by
    event_type alone (the coarse form's single-task-per-key bottleneck).
    Both event-volume windows — the per-bucket tail rank and the frame
    sums — must key on (event_type, bucket); the only per-type-only
    windows run over the metadata-sized per-bucket counts (the running
    total and the bounded following-horizon window that replaced the r11
    range self-join — the plan's ONLY join is now the broadcast of the
    carry map into the main pass; a SortMergeJoin anywhere means the
    metadata stopped being treated as metadata, a second join means the
    quadratic self-join came back)."""
    import re

    from caffeonspark_spark.operators.temporal import (
        rolling_zscore_bucketized_query,
    )

    df = rolling_zscore_bucketized_query(spark, sf_smoke)
    plan = physical_plan(df)
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    event_sized = [s for s in specs if "ts#" in s]
    assert event_sized, plan
    assert all("_bkt" in s for s in event_sized), plan
    assert "SortMergeJoin" not in plan, plan
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan, plan
    # node counts from the "(N) OpName" detail headers (tree lines repeat)
    join_nodes = re.findall(r"\(\d+\) (\w*Join\w*)", plan)
    assert join_nodes == ["BroadcastHashJoin"], plan
    # pruning: the main pass reads 4 columns, the metadata counts pass
    # reads ONLY (ts, event_type) — at 100 TB that scan is 2 columns wide
    assert set(map(frozenset, read_schema_columns(df))) == {
        frozenset({"event_id", "ts", "event_type", "value"}),
        frozenset({"ts", "event_type"}),
    }, read_schema_columns(df)


def test_image_dhash_pairs_equi_join_only_plan(spark, sf_smoke):
    """The image near-dup pair phase must be banding equi-joins + the
    Hamming filter: NO cartesian/nested-loop join (the all-pairs failure
    mode banding exists to avoid), no window, and the hash table cached
    once (InMemoryRelation) instead of recomputing the per-doc hash fold
    for each of its five plan subtrees."""
    from caffeonspark_spark.multimodal.imagehash import (
        image_dhash_pairs_portable,
    )

    df = image_dhash_pairs_portable(spark, sf_smoke)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert ") Window" not in plan, plan
    assert "InMemoryRelation" in plan or "InMemoryTableScan" in plan, plan
    assert read_schema_columns(df) == [{"doc_id", "text"}], read_schema_columns(df)


def test_video_dup_pairs_equi_join_only_plan(spark, sf_smoke):
    """The video near-dup pair phase is the image contract with frame_idx
    widening every key: banding equi-joins + per-position Hamming + one
    matched-frame agg — NO cartesian/nested-loop join, no window, the
    frame-hash table cached once (InMemoryRelation) for its five plan
    subtrees, and the documents scan pruned to (doc_id, text)."""
    from caffeonspark_spark.multimodal.av import video_dup_pairs_portable

    df = video_dup_pairs_portable(spark, sf_smoke)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert ") Window" not in plan, plan
    assert "InMemoryRelation" in plan or "InMemoryTableScan" in plan, plan
    assert read_schema_columns(df) == [{"doc_id", "text"}], read_schema_columns(df)


def test_audio_dup_pairs_equi_join_only_plan(spark, sf_smoke):
    """The audio near-dup pair phase shares the image contract: banding
    equi-joins + the Hamming filter — NO cartesian/nested-loop join, no
    window, the fingerprint table cached once (InMemoryRelation) for its
    five plan subtrees, and the documents scan pruned to (doc_id, text)."""
    from caffeonspark_spark.multimodal.av import audio_dup_pairs_portable

    df = audio_dup_pairs_portable(spark, sf_smoke)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert ") Window" not in plan, plan
    assert "InMemoryRelation" in plan or "InMemoryTableScan" in plan, plan
    assert read_schema_columns(df) == [{"doc_id", "text"}], read_schema_columns(df)


def test_audio_dup_native_scan_pruned_plan(spark, sf_smoke):
    """The planted-family native path must feed the synth pass from a
    doc_id-ONLY documents scan (text never decodes into the clip
    generator) and keep the pair phase equi-join-only."""
    from caffeonspark_spark.multimodal.av import audio_dup_pairs_native

    df = audio_dup_pairs_native(spark, sf_smoke)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert read_schema_columns(df) == [{"doc_id"}], read_schema_columns(df)


def test_cluster_prototypes_map_only_assign_plan(spark, sf_smoke):
    """Cluster-balanced prototype selection must be: ONE corpus scan, a
    map-only literal-centroid assignment (no join anywhere), and the
    per-cluster rank filter as a partial WindowGroupLimit below the single
    exchange — the corpus never shuffles at corpus size."""
    from caffeonspark_spark.operators.similarity import cluster_prototypes_query

    df = cluster_prototypes_query(spark, sf_smoke)
    plan = physical_plan(df)
    assert plan.count(") Scan parquet") == 1, plan
    assert "Join" not in plan, plan
    assert plan.count(") WindowGroupLimit") == 2, plan
    assert shuffle_count(df) == 1, plan
    assert read_schema_columns(df) == [{"vec_id", "embedding"}]


def test_image_corpus_dedup_bipartite_plan(spark, sf_smoke):
    """The batch-vs-corpus image dedup must stay bipartite banding
    equi-joins: NO cartesian/nested-loop join, both hash tables cached
    once (InMemoryRelation), and each documents scan pruned to
    (doc_id, source, text) — source only for the split predicate."""
    from caffeonspark_spark.multimodal.imagehash import (
        image_dedup_against_corpus_query,
    )

    df = image_dedup_against_corpus_query(spark, sf_smoke)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert ") Window" not in plan, plan
    assert "InMemoryRelation" in plan or "InMemoryTableScan" in plan, plan
    for cols in read_schema_columns(df):
        assert cols == {"doc_id", "source", "text"}, read_schema_columns(df)


def test_video_dedup_map_staged_plan(spark, sf_smoke):
    """The composed clip dedup map: NO cartesian/nested-loop join
    anywhere (exact pass and banding are groupBy/equi-join only), both
    multi-consumer tables (frame hashes, exact reps) cached once, and the
    documents scan pruned to (doc_id, text)."""
    from caffeonspark_spark.multimodal.av import video_dedup_map_query

    df = video_dedup_map_query(spark, sf_smoke)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "InMemoryRelation" in plan or "InMemoryTableScan" in plan, plan
    assert read_schema_columns(df) == [{"doc_id", "text"}], read_schema_columns(df)


def test_image_dup_native_scan_pruned_plan(spark, sf_smoke):
    """The planted-family image native path must feed the PGM generator
    from a doc_id-ONLY documents scan and keep the pair phase
    equi-join-only (the audio native plan contract)."""
    from caffeonspark_spark.multimodal.imagehash import image_dhash_pairs_native

    df = image_dhash_pairs_native(spark, sf_smoke)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert read_schema_columns(df) == [{"doc_id"}], read_schema_columns(df)


def test_video_dup_native_scan_pruned_plan(spark, sf_smoke):
    """Same contract for the planted-family video native path."""
    from caffeonspark_spark.multimodal.av import video_dup_pairs_native

    df = video_dup_pairs_native(spark, sf_smoke)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert read_schema_columns(df) == [{"doc_id"}], read_schema_columns(df)


def test_audio_dedup_map_staged_plan(spark, sf_smoke):
    """The composed audio dedup map shares image_dedup's contract: NO
    cartesian/nested-loop join, multi-consumer tables cached once, and
    the documents scan pruned to (doc_id, text)."""
    from caffeonspark_spark.multimodal.av import audio_dedup_map_query

    df = audio_dedup_map_query(spark, sf_smoke)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "InMemoryRelation" in plan or "InMemoryTableScan" in plan, plan
    assert read_schema_columns(df) == [{"doc_id", "text"}], read_schema_columns(df)


def test_audio_corpus_dedup_bipartite_plan(spark, sf_smoke):
    """The batch-vs-corpus audio dedup shares the image bipartite
    contract: banding equi-joins only, both fingerprint tables cached
    once, each documents scan pruned to (doc_id, source, text)."""
    from caffeonspark_spark.multimodal.av import (
        audio_dedup_against_corpus_query,
    )

    df = audio_dedup_against_corpus_query(spark, sf_smoke)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert ") Window" not in plan, plan
    assert "InMemoryRelation" in plan or "InMemoryTableScan" in plan, plan
    for cols in read_schema_columns(df):
        assert cols == {"doc_id", "source", "text"}, read_schema_columns(df)


def test_video_corpus_dedup_bipartite_plan(spark, sf_smoke):
    """The batch-vs-corpus video dedup: position-keyed banding equi-joins
    only, both frame-hash tables cached once, each documents scan pruned
    to (doc_id, source, text)."""
    from caffeonspark_spark.multimodal.av import (
        video_dedup_against_corpus_query,
    )

    df = video_dedup_against_corpus_query(spark, sf_smoke)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert ") Window" not in plan, plan
    assert "InMemoryRelation" in plan or "InMemoryTableScan" in plan, plan
    for cols in read_schema_columns(df):
        assert cols == {"doc_id", "source", "text"}, read_schema_columns(df)


def test_lmdb_scan_agg_plan(spark, sf_smoke):
    """The LMDB scan query: the custom source surfaces as a planned
    BatchScan (leaf-range partitions, not a parallelized collect), the
    per-row checksum is ONE Arrow-batched MapInPandas, and the rollup
    keeps map-side partials around a single group-by exchange (the
    second exchange is the 10-row orderBy)."""
    from caffeonspark_spark.sources.lmdb import lmdb_scan_agg

    df = lmdb_scan_agg(spark, sf_smoke)
    plan = physical_plan(df)
    tree = plan.split("\n\n")[0]  # formatted plans repeat nodes in details
    assert "BatchScan cos_lmdb" in tree, plan
    assert tree.count("MapInPandas") == 1, plan
    # min/max on string ids pick SortAggregate; partial+final = 2 nodes
    assert tree.count("SortAggregate") == 2 or has_partial_aggregation(df)
    assert shuffle_count(df) <= 2, plan
    assert "CartesianProduct" not in plan, plan


def test_minhash_planted_scan_pruned_plan(spark, sf_smoke):
    """The planted minhash native feeds its Catalyst text generator from
    a doc_id-ONLY documents scan and keeps the pair phase equi-join-only
    (the image/video/audio native plan contract)."""
    from caffeonspark_spark.operators.dedup import minhash_lsh_pairs_planted

    df = minhash_lsh_pairs_planted(spark, sf_smoke)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert read_schema_columns(df) == [{"doc_id"}], read_schema_columns(df)


def test_seqfile_scan_agg_plan(spark, sf_smoke):
    """The SequenceFile scan query: the custom source surfaces as a
    planned BatchScan over sync-split byte ranges (not a parallelized
    collect), the per-row checksum is ONE Arrow-batched MapInPandas, and
    the rollup keeps map-side partials around a single group-by exchange
    (the second exchange is the 10-row orderBy)."""
    from caffeonspark_spark.sources.seqfile import seqfile_scan_agg

    df = seqfile_scan_agg(spark, sf_smoke)
    plan = physical_plan(df)
    tree = plan.split("\n\n")[0]
    assert "BatchScan cos_seqfile" in tree, plan
    assert tree.count("MapInPandas") == 1, plan
    assert tree.count("SortAggregate") == 2 or has_partial_aggregation(df)
    assert shuffle_count(df) <= 2, plan


def test_seqfile_snappy_and_uri_scan_plans(spark, sf_smoke):
    """r16: the snappy and URI scan variants keep the exact plan shape of
    the plain scan — same BatchScan source, one Arrow MapInPandas, ≤2
    exchanges; the codec/filesystem change lives entirely inside the
    source, invisible to Catalyst."""
    from caffeonspark_spark.sources.seqfile import (
        seqfile_snappy_scan,
        seqfile_uri_scan,
    )

    for fn in (seqfile_snappy_scan, seqfile_uri_scan):
        df = fn(spark, sf_smoke)
        plan = physical_plan(df)
        tree = plan.split("\n\n")[0]
        assert "BatchScan cos_seqfile" in tree, plan
        assert tree.count("MapInPandas") == 1, plan
        assert shuffle_count(df) <= 2, plan


def test_seqfile_pruned_metadata_plan(spark, sf_smoke):
    """The pruned SequenceFile scan: the BatchScan's output is the
    4-column pruned schema (data never reaches the plan), and the rollup
    is a single group-by exchange plus the 10-row orderBy."""
    from caffeonspark_spark.sources.seqfile import seqfile_pruned_metadata

    df = seqfile_pruned_metadata(spark, sf_smoke)
    plan = physical_plan(df)
    tree = plan.split("\n\n")[0]
    assert "BatchScan cos_seqfile" in tree, plan
    assert "data" not in read_schema_columns(df)[0], read_schema_columns(df)
    assert "MapInPandas" not in tree, plan  # pure Catalyst rollup
    assert shuffle_count(df) <= 2, plan


def test_lmdb_pruned_lookup_plan(spark, sf_smoke):
    """The pruned lookup keeps the lmdb_scan_agg shape (planned BatchScan,
    one MapInPandas, one global agg — zero group-by exchange beyond the
    single-row agg) with the id range filter in the plan; the leaf-level
    pruning itself is pinned at the reader level in test_lmdb."""
    from caffeonspark_spark.sources.lmdb import lmdb_pruned_lookup

    df = lmdb_pruned_lookup(spark, sf_smoke)
    plan = physical_plan(df)
    tree = plan.split("\n\n")[0]
    assert "BatchScan cos_lmdb" in tree, plan
    assert tree.count("MapInPandas") == 1, plan
    assert "Filter" in tree, plan
    assert shuffle_count(df) <= 1, plan


def test_semantic_corpus_dedup_cluster_local_plan(spark, sf_smoke):
    """The bipartite SemDeDup must stay cluster-local: the pair phase is
    an equi-join on centroid_id (no cartesian/BNLJ between the embedding
    sides — the centroid literals themselves ride a broadcast), and both
    sides' scans are pruned to (vec_id, embedding, label)."""
    from caffeonspark_spark.operators.similarity import (
        semantic_dedup_against_corpus_query,
    )

    df = semantic_dedup_against_corpus_query(spark, sf_smoke)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    for cols in read_schema_columns(df):
        assert cols <= {"vec_id", "embedding", "label"}, cols
