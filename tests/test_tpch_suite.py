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


def test_forecast_revenue_change_pushes_filters(spark):
    df = _run(spark, "forecast_revenue_change")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # Q6's whole predicate should reach the parquet scan
    assert "PushedFilters: [" in plan
    assert "l_quantity" in plan.split("PushedFilters")[1][:400]
    row = df.collect()[0]
    assert row.n_rows > 0 and row.revenue_delta > 0


def test_priority_by_returnflag_partitions_counts(spark):
    rows = _run(spark, "priority_by_returnflag").collect()
    assert [r.l_returnflag for r in rows] == sorted(r.l_returnflag for r in rows)
    for r in rows:
        assert r.l_returnflag in ("A", "N")
        assert r.high_line_count >= 0 and r.low_line_count >= 0
        assert r.high_line_count + r.low_line_count > 0


def test_min_cost_supplier_is_per_part_min(spark):
    rows = _run(spark, "min_cost_supplier").collect()
    assert 0 < len(rows) <= 100
    # all rows for one part carry the identical (min) unit_cost
    per_part = {}
    for r in rows:
        per_part.setdefault(r.p_partkey, set()).add(r.unit_cost)
    assert all(len(v) == 1 for v in per_part.values())


def test_important_part_value_threshold_and_order(spark):
    rows = _run(spark, "important_part_value").collect()
    assert rows
    vals = [r.part_value for r in rows]
    assert vals == sorted(vals, reverse=True)


def test_supplier_cnt_bounded_by_supplier_dim(spark):
    rows = _run(spark, "supplier_cnt_by_part").collect()
    assert rows
    n_supp = spark.read.parquet(f"{SF}/supplier.parquet").count()
    assert all(0 < r.supplier_cnt <= n_supp for r in rows)


def test_excess_stock_suppliers_sorted_distinct(spark):
    rows = _run(spark, "excess_stock_suppliers").collect()
    keys = [r.s_suppkey for r in rows]
    assert keys == sorted(set(keys))


def test_late_shippers_match_bruteforce(spark):
    """Decorrelated Q21 ≡ the naive per-row EXISTS/NOT EXISTS, at sf0.001."""
    import pandas as pd

    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    supplier = pd.read_parquet(f"{SF}/supplier.parquet")
    fkeys = set(orders.loc[orders.o_orderstatus == "F", "o_orderkey"])
    li_f = li[li.l_orderkey.isin(fkeys)]
    counts = {}
    grouped = {k: g for k, g in li.groupby("l_orderkey")}
    for r in li_f.itertuples():
        g = grouped[r.l_orderkey]
        others = g[g.l_suppkey != r.l_suppkey]
        if len(others) == 0:
            continue
        if (others.l_shipdate > r.l_shipdate).any():
            continue
        counts[r.l_suppkey] = counts.get(r.l_suppkey, 0) + 1
    name_of = dict(zip(supplier.s_suppkey, supplier.s_name))
    by_name = {}
    for k, v in counts.items():
        by_name[name_of[k]] = by_name.get(name_of[k], 0) + v
    expected = sorted(by_name.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [(r.s_name, r.numwait) for r in _run(spark, "late_shipper_suppliers").collect()]
    assert got == expected
