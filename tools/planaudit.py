"""Physical-plan audit: flags scale anti-patterns in every registry query.

Red flags:
- CartesianProduct / BroadcastNestedLoopJoin — quadratic at scale
  (allowed only where a query intentionally broadcasts a tiny side
  against a non-equi condition; those are allowlisted with a reason).
- BatchEvalPython — row-at-a-time Python UDF in the plan (the slow
  path; engine policy is built-ins or Arrow-batched pandas UDFs only).
- InMemoryTableScan absent + repeated exchanges is NOT flagged (AQE
  handles reuse), but >6 Exchanges hints at a missed reuse.

Usage: python tools/planaudit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geo_big_data_analysis_spark.plans.registry import REGISTRY  # noqa: E402
from geo_big_data_analysis_spark.session import get_spark  # noqa: E402

# name -> reason a nested-loop/cartesian is acceptable there
ALLOWLIST_NLJ = {
    "session_drilldown": "J8 time-range join: few broadcast periods vs events",
    "percentile_filter_orders": "scalar threshold broadcast against orders",
    "knn_embeddings": "brute-force baseline variant is intentionally O(n*q) with tiny q",
    "dsir_select_docs": "1-row totals broadcast (n_c/n_t/V) into the per-token scorer",
    "pq_adc_topk_embeddings": "ADC probe: 32-query broadcast over the code table — the PQ-indexed scan shape (codes are m small ints per row, not vectors)",
    "embedding_near_dup": "exact-baseline pairs on tiny doc count; LSH variant is the scale path",
    "kdist_curve_stats": "500-point eps-tuning sample, driver-bounded",
    # single-row global-stat broadcasts (μ/σ/total thresholds): the NLJ
    # side is exactly 1 row, so the 'nested loop' is a plain O(n) map —
    # keeping it a join (vs collect+literal) keeps the whole pipeline
    # one lazy DAG with no driver round-trip
    "pareto_user_share": "1-row total broadcast for share-of-total",
    "temperature_mix_docs": "1-row token/sqrt-total broadcast for the tempered shares",
    "kn_bigram_ppl_docs": "1-row N1+(··) broadcast into the per-bigram KN scorer",
    "high_density_hours": "1-row mu/sigma broadcast threshold",
    "lisa_moran_events": "1-row mean/std broadcast for z-standardization",
    "lab1_noise_pipeline": "1-row mu/sigma broadcast threshold (via high_density_hours)",
    "hot_cold_grid_cells": "1-row q75/q25 broadcast threshold over cell counts",
    "ann_recall": "exact brute-force baseline (tiny query set) + 1-row hit/count crossJoins",
    "ivfpq_recall": "exact brute-force grading baseline (tiny query set) + 1-row hit/count crossJoins",
    "global_sales_opportunity": "Q22 scalar subquery: 1-row avg-balance broadcast threshold",
    "tfidf_top_terms": "1-row corpus-size broadcast for the idf denominator",
    "streaming_click_nopurchase": "1-row watermark-horizon broadcast over the drained batch",
    "important_part_value": "Q11 scalar subquery: 1-row global-sum broadcast threshold",
    "heavy_hitter_brands": "1-row total-count broadcast for the support threshold (frequent_items)",
    "ks_statistic_values": "1-row group-totals broadcast for CDF normalization",
    "rfm_segments": "two 1-row broadcasts: corpus max date + the 9 quartile thresholds",
    "mean_shift_scan": "1-row global-total broadcast against the daily prefix sums",
    "benford_first_digit": "1-row total broadcast for digit shares",
    "seasonal_index_dow": "1-row overall-mean broadcast for the index denominator",
    "spend_quartile_migration": "two 1-row per-year quartile-threshold broadcasts",
    "share_of_parent_rollup": "1-row grand-total broadcast over the rollup levels",
    "user_survival_curve": "tiny horizons table (7 rows) + 1-row corpus-end broadcast",
    "ab_test_conversion": "1-row per-arm aggregates joined (two single-row sides)",
    "centroid_separation": "10x10 centroid pair matrix (non-equi < join over |labels| rows)",
    "silhouette_by_label": "points x 10-row centroid broadcast (deliberate |labels|-fold expansion)",
    "backlog_age_at_month_end": "calendar-bounded probe snapshots crossed with open intervals",
    "referential_integrity_audit": "1-row orphan-count aggregates joined per relationship",
    "unigram_logprob_docs": "1-row corpus-totals broadcast for smoothing denominators",
    "chi2_type_dow": "1-row grand-total broadcast for the independence expectation",
    "kmv_overlap_sketch": "1-row sketch-estimate broadcasts (four tiny sides)",
    "rolling_active_users": "1-row observed-span broadcast clamping WAU to full-history days",
    "global_moran_events": "1-row global-stat broadcasts (mean, pair aggs, Σdeg²) combined into the Moran/Geary scalars",
    "ripley_k_events": "1-row broadcasts: n_pts × all-radii pair counts combined into K(r)",
    "emerging_hotspots": "1-row q75/q25 broadcast threshold over cell totals",
    "mrl_truncation_recall": "exact brute-force baseline (32-query broadcast) at each truncation width + 1-row n_queries broadcast",
    "trajectory_hausdorff": "6-user pair roster (u < v non-equi self-join over the distinct-user list); cells reached via equi-joins on user id",
    "sampled_quantile_bands": "1-row sample-quantiles x 1-row exact-quantiles broadcast combine",
    "k_anonymity_audit": "1-row (total, k_min, suppression) broadcast over the 4-row band histogram",
    "l_diversity_audit": "1-row (l_min, fail, total) broadcast over the 5-row l histogram",
    "scc_mod": "1-row singleton-census broadcast over the 4-row non-singleton SCC table",
    "holt_trend_revenue": "1-row SSE broadcast over the ~80-row state table + 1-row sorted-series agg",
    "sentiment_pattern_docs": "1-row bucketed-lexicon broadcast (plan stays O(1) in lexicon size)",
    "lab4_sentiment_golden": "1-row bucketed-lexicon broadcast (plan stays O(1) in lexicon size)",
    "bm25_retrieval_docs": "1-row (N, avgdl) corpus-stats broadcast into the 3-term tf fact",
    "zonal_polygon_coverage": "1-row grand-totals broadcast (crossJoin(F.broadcast(totals))) for coverage shares",
    "kaplan_meier_users": "1-row observation-span broadcast clamping censoring at the corpus end",
    "ppl_bucket_census": "1-row tercile-threshold broadcast over per-doc perplexities",
    "hard_negative_mining": "bounded probe broadcast (vec_id % 211) against the partitioned base — the knn_embeddings brute-force shape",
    "hard_negative_mining_ivf": "exact ANCHOR keeps the bounded probe broadcast for recall grading; the graded IVF paths are cell equi-joins + 1-row stat broadcasts",
    "rrf_hybrid_retrieval": "4-probe broadcast on the dense side; lexical side is an inverted-index equi-join",
    "domain_mix_budget": "two 1-row broadcasts: corpus totals + water-filling redistribution terms",
}


# name -> reason an unpartitioned (single-partition) Window is acceptable:
# only over pre-aggregated bounded-cardinality inputs (SCALE.md).
ALLOWLIST_GLOBAL_WINDOW = {
    "sentiment_source_ranks": "sorts per-source aggregates (#sources rows)",
    "lab1_noise_pipeline": "keyless sessionization over anomalous hourly buckets (time-span-bounded)",
    "trailing_7day_revenue": "RANGE frame over the daily pre-aggregate (time-span-bounded, ~2.4k rows/7y)",
    "auc_rank_metric": "cumulative counts over distinct-score groups (~550 rows, domain-bounded)",
    "gap_fill_daily_revenue": "forward-fill over the daily pre-aggregate (time-span-bounded, ~2.4k rows/7y)",
    "rolling_anomaly_days": "trailing-7-day frame over the daily pre-aggregate (time-span-bounded)",
    "ks_statistic_values": "cumulative counts over 2dp value groups (domain-bounded <=1e5 rows, the AUC pattern)",
    "rolling_correlation_days": "trailing-14-day moment sums over the daily pre-aggregate (time-span-bounded)",
    "mean_shift_scan": "prefix sums over the daily pre-aggregate (time-span-bounded)",
    "max_open_orders": "sweep-line running sum over day-granular deltas (calendar-bounded)",
    "sql_frontend_revenue": "share-of-total window over the per-nation aggregate (#nations rows)",
    "ewma_daily_revenue": "21-lag weighted window over the daily pre-aggregate (time-span-bounded)",
    "autocorrelation_daily": "7 lag columns over the daily pre-aggregate (time-span-bounded)",
    "seasonal_naive_eval": "lag-7 window over the daily pre-aggregate (time-span-bounded)",
    "kaplan_meier_users": "KM product-limit runs over day-grouped event rows bounded by the observation span (~2.4k rows/7y); at larger horizons bucket by year and stitch",
}


def _unpartitioned_windows(df) -> int:
    """Count WindowExec nodes with an empty partitionSpec (the
    move-everything-to-one-partition shape) via a py4j tree walk."""
    n = 0
    stack = [df._jdf.queryExecution().executedPlan()]
    while stack:
        node = stack.pop()
        cls = node.getClass().getSimpleName()
        if cls == "WindowExec" and node.partitionSpec().isEmpty():
            n += 1
        if cls == "AdaptiveSparkPlanExec":
            # AQE root is a leaf until executed — descend into its
            # initial plan explicitly
            stack.append(node.initialPlan())
            continue
        children = node.children()
        for i in range(children.size()):
            stack.append(children.apply(i))
    return n


def audit(sf_dir: str, only: list[str] | None = None) -> int:
    spark = get_spark("planaudit")
    bad = 0
    for name, (fn, _) in REGISTRY.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {type(e).__name__}: {str(e)[:120]}")
            bad += 1
            continue
        flags = []
        if "CartesianProduct" in plan:
            flags.append("CartesianProduct")
        if "BroadcastNestedLoopJoin" in plan and name not in ALLOWLIST_NLJ:
            flags.append("BroadcastNestedLoopJoin")
        if "BatchEvalPython" in plan:
            flags.append("row-at-a-time PythonUDF")
        try:
            n_gw = _unpartitioned_windows(df)
        except Exception as e:  # noqa: BLE001 — py4j API drift
            print(f"WARN {name}: window walk failed ({type(e).__name__}) — check skipped")
            n_gw = 0
        if n_gw and name not in ALLOWLIST_GLOBAL_WINDOW:
            flags.append(f"{n_gw} unpartitioned Window (single-partition sort)")
        n_ex = plan.count("Exchange ") + plan.count("Exchange\n")
        if flags:
            print(f"FLAG {name}: {', '.join(flags)}")
            bad += 1
        else:
            note = f" [allowlisted NLJ: {ALLOWLIST_NLJ[name]}]" if (
                "BroadcastNestedLoopJoin" in plan and name in ALLOWLIST_NLJ
            ) else ""
            print(f"ok   {name}: exchanges~{n_ex}{note}")
    print("FLAGS:", bad)
    return 1 if bad else 0


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    sys.exit(audit(sf, sys.argv[2:] or None))
