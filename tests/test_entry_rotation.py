"""Driver-window rotation guard: the correctness driver evaluates only
the FIRST 50 entries of ``queries()`` in dict order, so slot membership
IS coverage policy.  This test pins exactly which names occupy slots
1-50 this round (ADVICE r4: the declared-aged comment had drifted from
the actual cutoff) and sanity-checks the rotation invariants."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry

# the round-5 window, slot by slot (kept in lockstep with _PRIORITY's
# comment — a drift here is the bug this test exists to catch)
EXPECTED_FIRST_50 = [
    # 18 r02-aged
    "join_inner", "join_left_outer", "join_full_outer", "join_semi",
    "join_anti", "join_broadcast_dim", "join_asof", "join_cross",
    "join_range_theta", "scalar_subquery",
    "window_rank_topk", "window_rank_dense", "window_lag_lead",
    "window_running_sum",
    "agg_rollup", "agg_cube", "agg_grouping_sets",
    "agg_approx_count_distinct",
    # 19 new in r5
    "ann_ivf_upsert", "embed_pq_codes", "ann_ivfpq_topk",
    "ann_ivfpq_indexed", "ann_ivfpq_residual", "ann_ivfpq_upsert",
    "text_bpe_token_counts", "pipeline_curate_mix",
    "crawl_rank_frontier", "agg_approx_percentile",
    "ann_recall_eval", "graph_triangle_count",
    "window_ntile_cume", "unpivot_metrics",
    "agg_histogram", "orders_sessionize", "window_first_last",
    "ann_ivf_compacted", "events_resample_ffill",
    # 8 code/oracle changed in r5
    "events_funnel", "text_quality_filter_chain", "eval_decontaminate",
    "ann_ivf_topk", "ann_ivf_indexed", "ann_ivf_trained",
    "embed_kmeans_iter", "embed_kmeans_train",
    # 5 r03-aged fills
    "dedup_cluster_cc", "dedup_minhash_lsh_pairs", "dedup_ngram_jaccard",
    "dedup_embedding_cosine", "dedup_semantic_clusters",
]


def test_first_50_slots_are_exactly_the_declared_window():
    assert len(EXPECTED_FIRST_50) == 50
    got = list(entry.queries())[:50]
    assert got == EXPECTED_FIRST_50, [
        (i, a, b) for i, (a, b) in enumerate(zip(got, EXPECTED_FIRST_50))
        if a != b]


def test_priority_names_all_exist_and_are_unique():
    qs = entry.queries()
    assert len(set(entry._PRIORITY)) == len(entry._PRIORITY)
    missing = [n for n in entry._PRIORITY if n not in qs]
    assert not missing, missing


def test_readme_counts_match_registry():
    """README's operator-inventory counts must be generated-from, not
    remembered-about, the registry (VERDICT r4 'What's wrong' #2)."""
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    readme = open(os.path.join(here, "README.md")).read()
    n_q, n_o = len(entry.queries()), len(entry.oracle_sql())
    assert f"{n_q} named operators" in readme, n_q
    assert f"({n_o} of {n_q}" in readme, (n_o, n_q)
    assert f"all {n_q} operators" in readme, n_q


def test_window_leads_with_stalest_evidence():
    """Never-evaluated queries and the stalest evidence must sit inside
    the window: nothing with r02-or-older newest evidence (per the
    checked-in CORRECTNESS history) may fall past slot 50."""
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    newest = {}
    for r in (1, 2, 3, 4):
        path = os.path.join(here, f"CORRECTNESS_r0{r}.json")
        for k in json.load(open(path)):
            newest[k] = r
    window = set(list(entry.queries())[:50])
    for name in entry.queries():
        age = newest.get(name)
        if age is None or age <= 2:
            assert name in window, (name, age)
