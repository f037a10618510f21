"""Package-wide physical-plan lint over the ENTIRE driver registry.

PLANS.md hand-audits the most expensive plans; this test turns the two
invariants every audit asserts into a machine-checked contract over the
ENTIRE registry at once:

* no ``CartesianProduct`` anywhere — a shuffle cartesian is O(n·m) with
  no size bound and is never the intended plan shape in this engine;
* no ``BatchEvalPython`` anywhere — row-at-a-time Python UDFs are banned
  package-wide (SURVEY §2.10); the only sanctioned Python stages are the
  Arrow-vectorized ones (``ArrowEvalPython`` / ``MapInPandas`` /
  ``FlatMapGroupsInPandas``);
* ``BroadcastNestedLoopJoin`` only where the broadcast side is a bounded
  aggregate (1-row corpus totals / thresholds, k-row codebooks or
  centroid tables) — the explicit allowlist below. A new query that
  introduces a BNLJ must be added here deliberately, with the bound that
  justifies it; that turns the implicit "small side" assumption into a
  reviewed contract (VERDICT r3 item 8).

The lint builds (but does not execute) every registered plan at
sf0.001; queries whose CONSTRUCTION runs a driver-side calibration pass
(two-pass samplers etc.) execute only that tiny pass.
"""

from __future__ import annotations

import os

SF_DIR = os.environ.get("SPARK_GRAFT_SF_TINY", "/root/testdata/sf0.001")

# Queries whose plan legitimately contains BroadcastNestedLoopJoin(s):
# every entry is a crossJoin(F.broadcast(<bounded aggregate>)) — 1-row
# global totals/thresholds, k-row codebooks (pq_codes), k-row centroid /
# shard tables (ivf_*, kmeans, text_clusters), or a groups-row centroid
# table (embedding_drift). Bounds are asserted per-family in
# tests/test_broadcast_budget.py and documented in COVERAGE.md.
BNLJ_ALLOWED = {
    "ab_strata",
    "ari",
    "balance_classes",
    "benford",
    "bigram_logprob",
    "bm25_scores",
    "chi2_features",
    "naive_bayes",  # 1-row vocab/doc totals + classes-row model broadcasts
    "conformal",
    "cramers_v",
    "cuped",
    "distinct_sketch",
    "diversified_topk",
    "dsir_weights",
    "eb_shrinkage",
    "embedding_audit",
    "embedding_drift",
    "embedding_near_dup_lsh",
    "export_normalize",
    "hll_distinct",
    "ivf_recall",
    "ivf_topk",
    "ivf_topk_sharded",
    "kendall_tau",
    "key_skew_report",
    "ljung_box",  # 1-row (n, S) totals broadcast into the calendar frame
    "churn_labels",  # 1-row max-day broadcast into the per-event frame
    "qini_curve",  # 1-row max-day / N totals broadcasts into the user/ranked frames
    "anderson_darling",  # 1-row (N, n_a) totals broadcast into the distinct-value frame
    "fk_orphan_audit",  # 1-row orphan-count broadcasts joined to 1-row base counts
    "coldstart_coverage",  # 1-row max-day broadcast per entity dimension
    "capture_recapture",  # 1-row corpus-vocab total broadcast into the per-source frame
    "minhash_recall",  # 1-row candidate-count broadcast joined to the 1-row hit aggregate
    "rfm_segments",  # 1-row max-date / N-users totals broadcasts into the user frame
    "standardized_rate",  # 1-row tercile cuts + 1-row corpus-size broadcasts
    "bowker_symmetry",  # classes^2-bounded confusion pair frame
    "gumbel",  # 1-row moment aggregate of the block-maxima frame
    "return_levels",  # same 1-row gumbel aggregate + literal quantile factors
    "huber_location",  # 1-row-per-group median/MAD broadcasts
    "tail_dependence",  # two 1-row q90 thresholds broadcast into the day frame
    "peaks_over_threshold",  # 1-row q90 threshold broadcast into the day frame
    "mean_residual_life",  # 5-row decile-threshold frame broadcast into the day frame
    "silhouette",  # k-row centroid table broadcast into the point frame
    "tost_mde",  # single 1-row moment aggregate (no join at all; listed for the cross-join-free check)
    "cliffs_delta_groups",  # 1-row totals on the distinct-value frame
    "kendalls_w",  # friedman pivot machinery (1-row aggregates)
    "by_fdr",  # m-row p-frame windows + 1-row harmonic total
    "cohort_retention_calendar",  # 1-row cohort-size broadcasts
    "availability_gaps",  # 1-row p99 aggregate joined to the 1-row totals
    "dunn",  # k-row group frame pairs + 1-row (N, T) totals broadcasts
    "user_funnel",  # three 1-row stage-count aggregates joined
    "runs_test",  # 1-row lower-median broadcast into the series frame
    "mood_median",  # 1-row grand-median + 1-row totals broadcasts
    "burrows_delta",  # 1-row corpus totals + bounded top-m word grid broadcasts
    "cochran_q",  # 1-row block totals broadcast
    "durbin_watson",  # 1-row (n, S) totals broadcast into the calendar frame
    "gk_gamma",  # 36-cell contingency self-join + 1-row totals
    "jonckheere",  # 1-row null moments + (k*V)-bounded pair frame broadcasts
    "pacf2",  # 1-row (n, S) totals broadcast into the calendar frame
    "newey_west",  # 1-row (n, S) totals broadcast into the calendar frame
    "hurst",  # 1-row min-day + 1-row level aggregates broadcasts
    "moran_geary",  # 1-row node totals + 1-row sum(u^2) broadcasts
    "nb_quality",  # classes-bounded mass frames + 1-row MCC aggregate
    "retrieval_metrics",  # 1-row per-query aggregate joins (queries-bounded)
    "lorenz_revenue",  # 1-row (N, total) broadcast into the user frame
    "important_stock",  # 1-row (total, count) broadcast into the part frame
    "fairness_audit",  # 1-row best-keep-rate broadcast into the source frame
    "keyness_g2",  # 1-row (na, nb) corpus-totals broadcast into the word frame
    "kmeans_clusters",
    "kneser_ney",
    "kruskal_wallis",
    "label_stats",
    "lateness_audit",
    "mann_kendall",
    "seasonal_mann_kendall",  # 1-row S/ties/n crossJoins (MK convention)
    "markov_loglik",
    "mcnemar",
    "mi_features",
    "mixture_apply",
    "mixture_plan",
    "modularity",  # 1-row total-mass M broadcast into the per-community frame
    "t_closeness",  # 1-row corpus-total N broadcast into the cells frame
    "jackknife_ratio",  # two 1-row totals broadcasts into the cluster frame
    "lift_table",  # 1-row (N, P) totals broadcast into the ranked frame
    "breusch_pagan",  # 1-row 5-moment stats broadcast
    "kupiec_pof",  # 1-row threshold broadcast
    "lorenz_asymmetry",  # 1-row (n, total) broadcast
    "rosner_esd",  # k 1-row round-stat broadcasts (k=3 unrolled)
    "ols_fit_predict",
    "ols_influence",  # 1-row 5-moment stats + 1-row s^2 broadcasts
    "peak_concurrency",
    "permutation_test",
    "perplexity_prune",
    "pit_staleness",
    "pmi_collocations",
    "pq_codes",
    "psi_drift",
    "quantile_bins",
    "quantile_normalize",
    "rbo",
    "recency_scores",
    "robust_zscore",
    "pca_power",
    "rrf_fusion",
    "sales_opportunity",
    "source_js",
    "source_kl",
    "source_minhash_sim",
    "source_mix",
    "srm_check",
    "temperature_mix",
    "text_clusters",
    "tfidf_cosine_pairs",
    "tfidf_top_terms",
    "triple_barrier_vol_scaled",
    "unigram_logprob",
    "v_measure",
    "wilcoxon_signed",
    "winsorize",
    "zorder_curve",
}


def test_no_forbidden_nodes_in_any_registered_plan(spark):
    from pyspark.sql import types as T

    from feature_extractor_mbo_lob_spark.plans.driver_queries import QUERIES

    failures: list[str] = []
    for name, fn in QUERIES.items():
        df = fn(spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        if "CartesianProduct" in plan:
            failures.append(f"{name}: CartesianProduct")
        if "BatchEvalPython" in plan:
            failures.append(f"{name}: BatchEvalPython (row-at-a-time UDF)")
        if "BroadcastNestedLoopJoin" in plan and name not in BNLJ_ALLOWED:
            failures.append(
                f"{name}: BroadcastNestedLoopJoin not in allowlist — if the "
                "broadcast side is a bounded aggregate, add it to "
                "BNLJ_ALLOWED with its bound"
            )
        # Driver-canon-safe output contract (VERDICT r4 #1): the driver's
        # canonicalizer pandas-sorts and hashes every output column, and
        # dies on unhashable container values. Every driver-facing final
        # select must therefore be atomic-typed only — flatten arrays with
        # array_join / posexplode before returning.
        for field in df.schema.fields:
            if isinstance(
                field.dataType, (T.ArrayType, T.MapType, T.StructType)
            ):
                failures.append(
                    f"{name}: output column `{field.name}` is "
                    f"{field.dataType.simpleString()} — driver canon cannot "
                    "hash container types; flatten to atomic columns"
                )
    assert not failures, "plan lint failures:\n" + "\n".join(failures)
