"""Plan-shape assertions for the session-3 TPC-H queries (Q4..Q22): the
decorrelation strategies must compile to the join operators they were
designed for — semi/anti hash joins, broadcast dims, TakeOrdered top-k —
not to nested-loop or single-partition fallbacks."""

from __future__ import annotations

from bigdata_meteo_datalake_spark.plans.explain import n_nodes, plan_string
from bigdata_meteo_datalake_spark.queries import queries

from .conftest import SF0001

QS = queries()


def test_q4_exists_compiles_to_semi_join(spark):
    plan = plan_string(QS["q4_priority_check"](spark, SF0001))
    assert "LeftSemi" in plan
    # the non-equi shipdate predicate must ride the equi join as a residual,
    # never force a nested-loop join
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q21_not_exists_compiles_to_anti_join(spark):
    plan = plan_string(QS["q21_waiting_suppliers"](spark, SF0001))
    assert "LeftAnti" in plan
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_q22_no_recent_orders_is_anti_join(spark):
    plan = plan_string(QS["q22_sales_opportunity"](spark, SF0001))
    assert "LeftAnti" in plan


def test_q19_disjunction_keeps_hash_join(spark):
    """The cross-table OR must not defeat the equi-join: partkey stays the
    hash key and the disjunction evaluates as a post-join filter."""
    plan = plan_string(QS["q19_disjunctive_revenue"](spark, SF0001))
    assert n_nodes(QS["q19_disjunctive_revenue"](spark, SF0001), "BroadcastHashJoin") == 1
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q18_topk_is_take_ordered(spark):
    assert n_nodes(QS["q18_large_volume_customers"](spark, SF0001), "TakeOrderedAndProject") == 1


def test_q10_style_topk_in_new_queries(spark):
    assert n_nodes(QS["q21_waiting_suppliers"](spark, SF0001), "TakeOrderedAndProject") == 1


def test_q8_q14_dims_broadcast(spark):
    # Q8: part, supplier->nation, customer->nation->region chains broadcast;
    # only lineitem x orders shuffles
    df = QS["q8_market_share"](spark, SF0001)
    plan = plan_string(df)
    assert plan.count("BroadcastHashJoin") >= 4
    df14 = QS["q14_promo_revenue"](spark, SF0001)
    assert n_nodes(df14, "BroadcastHashJoin") == 1
