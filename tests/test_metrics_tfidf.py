"""Contracts for the ranking-metric (AUC) and TF-IDF queries, plus the
left-outer streaming interval join's closed-region invariants.
"""

from __future__ import annotations

from geo_big_data_analysis_spark.plans.registry import REGISTRY

SF = "/root/testdata/sf0.001"


def test_auc_matches_direct_pairwise(spark):
    row = REGISTRY["auc_rank_metric"][0](spark, SF).collect()[0]
    assert 0.0 <= row.auc <= 1.0
    assert row.n_pos > 0 and row.n_neg > 0

    # direct O(n^2)-free check on the collected rows: recompute AUC from
    # the raw scores with numpy-style rank logic
    import pandas as pd
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    pdf = li.select(
        F.round(
            1.0
            / (
                1.0
                + F.exp(
                    -(F.col("l_discount") * 10.0 - 0.5 + (F.col("l_quantity") - 25.0) / 50.0)
                )
            ),
            9,
        ).alias("score"),
        (F.col("l_returnflag") == "R").cast("int").alias("pos"),
    ).toPandas()
    ranks = pd.Series(pdf["score"]).rank(method="average")
    n_pos = int(pdf["pos"].sum())
    n_neg = len(pdf) - n_pos
    auc = (ranks[pdf["pos"] == 1].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)
    assert abs(auc - row.auc) < 1e-6


def test_tfidf_top_terms_contract(spark):
    rows = REGISTRY["tfidf_top_terms"][0](spark, SF).collect()
    assert rows
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for grp in by_doc.values():
        assert [g.rnk for g in grp] == list(range(1, len(grp) + 1))
        scores = [g.tfidf for g in grp]
        assert scores == sorted(scores, reverse=True)
        assert all(g.df >= 1 for g in grp)


def test_streaming_click_nopurchase_counts_consistent(spark):
    rows = REGISTRY["streaming_click_nopurchase"][0](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_converted + r.n_unconverted == r.n_rows
        assert r.n_unconverted >= 0


def test_gap_fill_dense_calendar(spark):
    rows = REGISTRY["gap_fill_daily_revenue"][0](spark, SF).collect()
    assert rows
    days = [r.day for r in rows]
    assert len(set(days)) == len(days)
    # dense: consecutive days differ by exactly 1 day
    for a, b in zip(days, days[1:]):
        assert (b - a).total_seconds() == 86400
    # forward fill: gap rows carry the previous non-gap revenue
    last_rev = 0.0
    for r in rows:
        if r.is_gap:
            assert r.n_orders == 0 and r.revenue == 0.0
            assert r.filled_revenue == last_rev
        else:
            last_rev = r.revenue
            assert r.filled_revenue == r.revenue


def test_funnel_stages_monotone(spark):
    row = REGISTRY["funnel_conversion"][0](spark, SF).collect()[0]
    assert row.n_view >= row.n_click_after_view >= row.n_purchase_after_click
    assert 0.0 <= row.view_to_click <= 1.0


def test_cohort_retention_offsets(spark):
    rows = REGISTRY["cohort_retention"][0](spark, SF).collect()
    assert rows
    # offset 0 of each cohort is its largest cell (everyone is active in
    # their first week by construction of first-seen cohorting)
    by_cohort: dict = {}
    for r in rows:
        assert r.week_offset >= 0
        by_cohort.setdefault(r.cohort_week, {})[r.week_offset] = r.n_active
    for cells in by_cohort.values():
        assert 0 in cells
        assert cells[0] == max(cells.values())
