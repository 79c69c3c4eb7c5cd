"""Physical-plan property tests: the 100 TB design contract, pinned.

Each assertion encodes a scale invariant from SURVEY.md: filters reach the
scan, scans are column-pruned, dim joins broadcast, aggregations have
map-side partials, the flagship query shuffles exactly once.
"""

from __future__ import annotations

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
