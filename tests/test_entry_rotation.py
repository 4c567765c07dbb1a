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

# the round-6 window, slot by slot (kept in lockstep with _PRIORITY's
# comment — a drift here is the bug this test exists to catch)
EXPECTED_FIRST_50 = [
    # 26 whose plans changed in the round-6 optimization pass
    "dedup_minhash_signatures", "dedup_minhash_lsh_pairs",
    "dedup_ngram_jaccard", "dedup_cluster_cc", "dedup_semantic_clusters",
    "dedup_simhash", "pipeline_curate_mix",
    "graph_pagerank", "graph_hits", "graph_bfs_depth",
    "graph_triangle_count", "crawl_rank_frontier",
    "crawl_extract_text", "crawl_link_graph", "husker_scrape_fields",
    "embed_kmeans_train", "ann_ivf_trained",
    "text_bpe_token_counts",
    "ann_ivf_upsert", "ann_ivfpq_upsert", "ann_ivf_compacted",
    "icebergish_time_travel",
    "embed_pq_codes", "ann_ivfpq_topk", "ann_ivfpq_indexed",
    "ann_ivfpq_residual",
    # 24 r03-aged refreshes
    "dedup_lines_boilerplate",
    "text_tfidf_topk", "text_ngram_topk", "text_unigram_ppl",
    "text_chunk_split", "text_model_score", "text_repetition_filter",
    "embed_centroids", "multimodal_frame_sample",
    "crawl_host_rollup", "crawl_sitemaps", "tumbling_window",
    "date_trunc_agg", "datediff_extract",
    "parse_url_host", "percentile_prices", "pivot_segments",
    "regexp_ops", "session_window", "set_union_intersect_except",
    "sliding_window", "sort_limit_topn", "string_funcs",
    "window_range_frame",
]

# the only r03-aged rows deliberately left outside the window (both
# trivial / rows-only with dedicated local twins)
ALLOWED_STALE_OUTSIDE = {"hash_xxhash64", "distinct_rows",
                         "explode_words", "hash_md5", "json_extract",
                         "math_funcs", "array_ops"}


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
    the window: nothing with r03-or-older newest evidence (per the
    checked-in CORRECTNESS history) may fall past slot 50, except the
    documented trivial rows."""
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    newest = {}
    for r in (1, 2, 3, 4, 5):
        path = os.path.join(here, f"CORRECTNESS_r0{r}.json")
        for k in json.load(open(path)):
            newest[k] = r
    window = set(list(entry.queries())[:50])
    for name in entry.queries():
        age = newest.get(name)
        if (age is None or age <= 3) and name not in ALLOWED_STALE_OUTSIDE:
            assert name in window, (name, age)
