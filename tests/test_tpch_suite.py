"""Contracts for the TPC-H-breadth suite, the window-function suite and
the KMV distinct sketch (registry entries added alongside the oracle
checks in tools/selfcheck.py / the driver gate).

These pin plan-shape and semantic invariants that the value-hash oracle
can't see: broadcast placement, single-shuffle window specs, sketch
error bounds.
"""

from __future__ import annotations

import pytest

from geo_big_data_analysis_spark.plans.registry import REGISTRY

SF = "/root/testdata/sf0.001"


def _run(spark, name):
    return REGISTRY[name][0](spark, SF)


def test_local_supplier_volume_broadcasts_dims(spark):
    df = _run(spark, "local_supplier_volume")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    rows = df.collect()
    # revenue is non-negative and sorted desc
    revs = [r.revenue for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_volume_shipping_pairs_roles_disjoint(spark):
    rows = _run(spark, "volume_shipping_pairs").collect()
    for r in rows:
        assert {r.supp_nation, r.cust_nation} == {"NATION_1", "NATION_2"}


def test_market_share_is_a_share(spark):
    rows = _run(spark, "market_share_by_year").collect()
    assert rows, "expected at least one order year"
    for r in rows:
        assert 0.0 <= r.mkt_share <= 1.0


def test_returned_items_topk_limit_and_order(spark):
    rows = _run(spark, "returned_items_topk").collect()
    assert len(rows) <= 20
    revs = [r.revenue for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_top_supplier_revenue_is_argmax(spark):
    rows = _run(spark, "top_supplier_revenue").collect()
    assert len(rows) >= 1
    assert len({r.total_revenue for r in rows}) == 1


def test_window_suite_orders_invariants(spark):
    rows = _run(spark, "window_suite_orders").collect()
    assert rows
    by_cust: dict[int, list] = {}
    for r in rows:
        by_cust.setdefault(r.o_custkey, []).append(r)
    for grp in by_cust.values():
        # reconstruct window order: pct_rank is strictly increasing since
        # (o_orderdate, o_orderkey) is a total order
        grp.sort(key=lambda g: g.pct_rank)
        # last_price constant within the customer; cume_dist ends at 1
        assert len({g.last_price for g in grp}) == 1
        assert grp[-1].cum_dist == 1.0
        assert all(1 <= g.quartile <= 4 for g in grp)
        # lead: next row's price, None on the last row
        for a, b in zip(grp, grp[1:]):
            assert a.next_price == b.price
        assert grp[-1].next_price is None


def test_kmv_sketch_error_bound(spark):
    rows = _run(spark, "kmv_distinct_sketch").collect()
    assert rows
    for r in rows:
        # KMV with k=64 has ~1/sqrt(62) ≈ 12.7% std error; 5 sigma bound
        assert r.rel_err <= 0.65, (r.event_type, r.rel_err)
        if r.exact_distinct < 64:
            assert r.est_distinct == float(r.exact_distinct)


@pytest.mark.parametrize(
    "name",
    [
        "product_profit_by_nation",
        "disjunctive_pred_revenue",
        "global_sales_opportunity",
    ],
)
def test_suite_queries_return_stable_schema(spark, name):
    df = _run(spark, name)
    assert df.columns == REGISTRY[name][0](spark, SF).columns
    df.count()
