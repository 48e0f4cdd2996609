"""Repo-wide physical-plan scale tripwires, one plan build per query.

1. No registered query may plan an UNBOUNDED single-partition window
   (``WindowExec`` with empty partitionSpec over data-sized input).
   The boundedness rule lives in ``plan_walkers`` (shared with
   test_distributed_windows): only a Limit or a ``__gpid``-keyed
   offsets aggregate below the window sanctions it — aggregates on
   arbitrary keys and 1-row scalars do NOT, because the
   pre-migration scale-killers (global ranks over per-key aggregate
   tables, usually crossJoined with a broadcast scalar) had exactly
   those shapes (r06 review hardening). Two queries window over
   genuinely bounded non-pid aggregates and are allowlisted by exact
   count.

2. Nested-loop-join RATCHET: every CartesianProduct /
   BroadcastNestedLoopJoin in the registry is pinned per-qid at its
   audited count (all are bounded broadcasts: 1-row ``crossJoin(
   broadcast(agg))`` scalars, |langs|/|centroids|-bounded grids, and
   q_sim_search's sanctioned exact-baseline BNLJ). A NEW nested loop
   anywhere — or one more in an audited query — fails; when a
   refactor removes one, ratchet the number DOWN here.

Builder errors fail loudly — a query these tests cannot plan is not
covered (r06 review)."""

from __future__ import annotations

import pytest
from plan_walkers import (
    cartesian_product_count,
    nested_loop_join_count,
    unbounded_global_windows_in,
)

from metoffice_spark.registry import all_queries

# qid -> required substring per justified global window, matched
# against the walker's '<node> over <first agg head below>'
# descriptor: the allowlist pins WHICH bounded table the window runs
# over, so swapping it for a data-sized input trips the test even at
# an unchanged count (r06 review hardening)
_WINDOW_ALLOWLIST = {
    # cumulative offsets over the systematic-sampling bucket table:
    # bucket count is the fixed sampling constant, not data-sized
    "q_sample_weighted": ["keys=[bucket"],
    # cumulative hazard over the per-day risk table: bounded by the
    # calendar span of the dataset, which grows with time, not volume
    "q_survival_hazard": ["keys=[d#"],
}

# qid -> audited nested-loop-join count (see module docstring)
_NLJ_RATCHET = {
    "q_benford_test": 1,
    "q_bpe_train": 4,
    "q_chi2_terms": 1,
    # r10: n_orders folded from a collect() scalar into the 1-row
    # broadcast crossJoin house pattern — BNLJ side is a single
    # aggregate row, bounded by construction
    "q_collab_filter": 1,
    "q_drift_chi2": 3,
    "q_er_blocking": 4,
    "q_eval_calibration": 1,
    "q_eval_multiclass": 2,
    "q_eval_pr": 1,
    "q_forecast_snaive": 1,
    "q_graph_assortativity": 1,
    "q_graph_modularity": 1,
    # r14 optimization round: the edge-iterator rewrite computes
    # n_nodes/n_edges/n_wedges in ONE ungrouped aggregate over the
    # adjacency table — the only 1-row crossJoin left pairs it with
    # the triangle aggregate (ratchet tightened again, 2 → 1)
    "q_graph_triangles": 1,
    "q_hard_negatives": 1,
    "q_heavy_hitters_mg": 1,
    "q_jackknife_var": 1,
    "q_join_salted": 1,
    "q_join_theta_range": 1,
    "q_kmeans_step": 1,
    "q_kmeans_train": 3,
    "q_knn_classify": 2,
    "q_link_editdist": 1,
    "q_mix_rebalance": 1,
    "q_mix_temperature": 2,
    "q_nb_langid": 4,
    "q_negative_sample": 1,
    "q_olap_avg_balance": 1,
    "q_pca_power": 10,
    "q_pipeline_e2e": 1,
    "q_pmi_collocations": 1,
    "q_pseudonymize": 1,
    "q_rare_label_encode": 1,
    "q_sample_weighted": 1,
    "q_sim_search": 1,
    "q_simpson_check": 1,
    "q_sketch_hll": 1,
    "q_sketch_hll_merge": 4,
    # r13 optimization round: the single-pass rewrite replaced the
    # three per-pair 1-row crossJoins with a pair-spine left join —
    # zero NLJs left (ratchet tightened, not widened)
    "q_sketch_setops": 0,
    "q_skew_diag": 2,
    "q_split_temporal": 1,
    "q_target_encoding": 1,
    "q_tfidf": 1,
    "q_time_travel": 1,
    "q_ts_seasonal_profile": 1,
}


@pytest.fixture(scope="module")
def registry_plans(spark, sf_smoke):
    """One physical plan per registered query (streaming excluded:
    building one RUNS the replay, and its sink-read plan is a bare
    parquet scan). Builder failures fail here, visibly."""
    plans, errors = {}, {}
    for qid, fn in all_queries().items():
        if qid.startswith("q_stream_"):
            continue
        try:
            plans[qid] = fn(spark, sf_smoke)._jdf.queryExecution().sparkPlan()
        except Exception as e:  # noqa: BLE001 - report, don't skip
            errors[qid] = f"{type(e).__name__}: {e}"
    assert errors == {}, f"builders failed to plan: {errors}"
    return plans


def test_no_registered_query_plans_an_unbounded_global_window(registry_plans):
    offenders = {}
    for qid, plan in registry_plans.items():
        bad = unbounded_global_windows_in(plan)
        allowed = _WINDOW_ALLOWLIST.get(qid, [])
        ok = len(bad) == len(allowed) and all(
            any(marker in d for d in bad) for marker in allowed
        )
        if not ok:
            offenders[qid] = bad
    assert offenders == {}


def test_no_cartesian_product_at_smoke_sf(registry_plans):
    offenders = {
        qid: n
        for qid, plan in registry_plans.items()
        if (n := cartesian_product_count(plan))
    }
    assert offenders == {}


def test_no_cartesian_product_at_bench_sf(spark):
    """Join strategies are SIZE-ESTIMATE-dependent: a crossJoin whose
    tiny side Catalyst cannot size (a filter on a derived column, a
    groupBy that tracks the scan) broadcasts at sf0.001 but FLIPS to
    a partition-multiplying CartesianProduct at sf0.1 — q_skew_diag
    scheduled 32^4 = ~1M tasks exactly this way (r06). Re-plan every
    registered query against the bench-scale data and require zero."""
    offenders, errors = {}, {}
    for qid, fn in all_queries().items():
        if qid.startswith("q_stream_"):
            continue
        try:
            plan = fn(spark, "/root/testdata/sf0.1")._jdf.queryExecution().sparkPlan()
        except Exception as e:  # noqa: BLE001 - report, don't skip
            errors[qid] = f"{type(e).__name__}: {e}"
            continue
        n = cartesian_product_count(plan)
        if n:
            offenders[qid] = n
    assert errors == {}, f"builders failed to plan at sf0.1: {errors}"
    assert offenders == {}


def test_entry_flagship_passes_the_same_tripwires(spark):
    """The driver-smoked flagship (``__spark_entry__.entry``) through
    the identical three tripwires (VERDICT r06 stretch item 7): it is
    the wow_payload chain — same code path as q_sink_http_form, whose
    sf0.1 flip coverage lives in test_no_cartesian_product_at_bench_sf
    — but entry() itself was never plan-walked."""
    import __spark_entry__ as e

    plan = e.entry(spark)._jdf.queryExecution().sparkPlan()
    assert unbounded_global_windows_in(plan) == []
    assert cartesian_product_count(plan) == 0
    assert nested_loop_join_count(plan) == 0


def test_nested_loop_join_ratchet(registry_plans):
    offenders = {}
    for qid, plan in registry_plans.items():
        n = nested_loop_join_count(plan)
        if n != _NLJ_RATCHET.get(qid, 0):  # EXACT pin: a silent drop
            # would leave headroom that later masks a real regression
            offenders[qid] = n
    assert offenders == {}, (
        "nested-loop count changed (audit, then fix the plan or "
        f"re-pin the ratchet consciously): {offenders}"
    )


def test_no_quadratic_unbounded_following_frame(registry_plans):
    """(X, UNBOUNDED FOLLOWING) frames with X != UNBOUNDED PRECEDING
    are the ONE Spark window shape with no running accumulator:
    UnboundedFollowingWindowFunctionFrame re-evaluates its aggregate
    from each row to the partition end — O(n^2) per partition. Found
    by the r12 tshorizon probe (q_ts_interpolate's forward endpoint
    carry ran an hour on a 3.5M-slot century grid); the O(n) spelling
    is last(...) over the DESC sort's UNBOUNDED PRECEDING frame. The
    FULL frame (unboundedpreceding -> unboundedfollowing) is computed
    once per partition and stays allowed (q_win_analytic)."""
    import re

    pat = re.compile(
        r"specifiedwindowframe\((?:Row|Range)Frame,"
        r" (?!unboundedpreceding)[^,]*, unboundedfollowing",
        re.IGNORECASE,
    )
    offenders = {
        qid: m
        for qid, plan in registry_plans.items()
        if (m := pat.findall(plan.toString()))
    }
    assert offenders == {}
