"""Driver-contract bench: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus a fixed-size crawl
round over a synthetic page corpus.

Prints exactly ONE JSON line on stdout:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}
plus supplementary keys (urls_per_sec, rows). All logs go to stderr.

The two-parallelism scaling evidence (BASELINE.md) is produced separately
by bench/crawl_bench.py at two masters — see BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# headline queries: one per operator family (SURVEY §2.B) + the
# training-data ops that matter at 100 TB
HEADLINE = [
    "agg_pricing_summary",     # TPC-H Q1 shape: scan-heavy agg
    "join_inner",              # large equi join
    "join_asof",               # as-of (range + window top-1)
    "window_rank_topk",        # per-group top-k (politeness pattern)
    "agg_rollup",              # multi-level agg
    "dedup_exact",             # content-hash dedup
    "dedup_minhash_lsh_pairs", # shingle→minhash→band→self-join
    "dedup_simhash",           # bit-vote simhash
    "ann_bruteforce_topk",     # embedding cosine top-k
    "text_token_counts",       # regex tokenization
    "text_quality_score",      # string-builtin quality signals
    "crawl_extract_text",      # Arrow-UDF husk path
    "crawl_topk_per_host",     # salted politeness window
    # round-3 additions (appended — earlier shapes stay frozen verbatim)
    "dedup_cluster_cc",        # CC over LSH pairs (iterative join+agg)
    "graph_pagerank",          # 3 PageRank rounds over the husked graph
    "text_repetition_filter",  # Gopher repetition gates
    "text_tfidf_topk",         # tf-idf + two-phase top-k window
    "ann_ivf_topk",            # IVF coarse-quantizer ANN
    "join_bucketed_colocated", # exchange-free co-located SMJ
    "source_warcish_reader",   # WARC-style archive parse round-trip
    # round-4 additions (appended — earlier shapes stay frozen verbatim)
    "embed_kmeans_train",      # 3-step k-means loop (localCheckpoint/round)
    "ann_ivf_indexed",         # ANN served from the persisted pruned index
    "ann_ivf_trained",         # train→serve composition (fitted quantizer)
    "text_dataset_mix",        # per-lang hash-rate mixture rebalancing
    "dedup_span_winnow",       # cross-doc verbatim-span evidence
    "crawl_recrawl_topk",      # stalest-first politeness re-fetch batch
    "graph_hits",              # 2-round hubs/authorities over husked links
    "embed_standardize",       # per-dim whitening, broadcast-stats in-row
    "events_funnel",           # view→click→purchase staged conversion
    # round-5 additions (appended — earlier shapes stay frozen verbatim)
    "ann_ivf_upsert",          # partition-granular index merge + serve
    "embed_pq_codes",          # trained PQ encoding (broadcast codebooks)
    "ann_ivfpq_topk",          # ADC serve over codes (no vectors moved)
    "ann_ivfpq_indexed",       # ADC from the persisted pruned code table
    "ann_ivfpq_residual",      # Faiss-style residual encoding + ADC
    "ann_ivfpq_upsert",        # partition-granular merge of the code table
    "text_bpe_token_counts",   # in-row greedy subword tokenization
    "pipeline_curate_mix",     # composed curation funnel + mix
    "crawl_rank_frontier",     # PageRank x staleness re-crawl batches
]


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("sparkcrawl-bench")
        .config("spark.sql.shuffle.partitions", str(max(2 * int(CPUS), 16)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.files.maxPartitionBytes", str(32 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_BENCH_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from sparkcrawl.registry import QUERIES, load_all
    load_all()

    sf_label = SF_DIR.rstrip("/").split("/")[-1]
    timings: dict = {}
    rows: dict = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        t0 = time.time()
        try:
            n = fn(spark, SF_DIR).count()
            timings[name] = round(time.time() - t0, 3)
            rows[name] = n
            log(f"{name}: {n} rows in {timings[name]}s")
        except Exception as ex:  # a failing query must not kill the bench
            timings[name] = -1.0
            rows[name] = -1
            log(f"{name}: FAILED {type(ex).__name__}: {str(ex)[:200]}")

    # crawl throughput probes.  Shapes are FROZEN so rounds compare:
    # * crawl_3rounds_20k — round-1 shape, identical config (AQE on),
    #   kept verbatim as the r1→rN regression signal.
    # * crawl_4rounds_120k — the standing headline probe (≥100k pages),
    #   run with the engine's production config (AQE OFF for
    #   micro-batches — measured rule, see CLAUDE.md).  urls_per_sec is
    #   reported from THIS probe.
    from sparkcrawl import corpus
    from sparkcrawl.rounds import CrawlEngine
    from sparkcrawl.schemas import ROBOTS

    def settle() -> None:
        """Quiesce before a timed probe: drop cached SQL plans/blocks
        from the query suite and flush dirty pages — writeback from the
        preceding queries' scratch writes otherwise stalls the probe's
        first round (measured 34.7 s → 112 s on the 20k probe)."""
        spark.catalog.clearCache()
        os.sync()

    def crawl_probe(tag: str, n_pages: int, n_seeds: int, budget: int,
                    rounds: int, fat: int, aqe: bool,
                    base: str = "/tmp") -> tuple:
        wd = f"{base}/sparkcrawl_bench_{tag}"
        shutil.rmtree(wd, ignore_errors=True)
        os.makedirs(wd)
        settle()
        spark.conf.set("spark.sql.adaptive.enabled", str(aqe).lower())
        try:
            t0 = time.time()
            eng = CrawlEngine(
                spark, wd,
                pages=corpus.pages_df(spark, n_pages, fat=fat),
                robots=spark.createDataFrame(corpus.robots_rows(), ROBOTS),
                budget_per_host=budget, n_buckets=32, salt_buckets=8)
            eng.init([corpus.page_url(i) for i in range(n_seeds)])
            summaries = eng.run(rounds, stop_when_idle=True)
            secs = round(time.time() - t0, 3)
            extracted = sum(s["urls_extracted"] for s in summaries)
            log(f"crawl[{tag}]: {extracted} pages in {secs}s")
            return secs, extracted
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", "true")
            shutil.rmtree(wd, ignore_errors=True)

    # r1 shape verbatim (n_buckets was 16 in r1 — kept)
    wd = "/tmp/sparkcrawl_bench_entry"
    shutil.rmtree(wd, ignore_errors=True)
    os.makedirs(wd)
    settle()
    t0 = time.time()
    eng = CrawlEngine(
        spark, wd,
        pages=corpus.pages_df(spark, 20000, fat=20),
        robots=spark.createDataFrame(corpus.robots_rows(), ROBOTS),
        budget_per_host=8000, n_buckets=16, salt_buckets=8)
    eng.init([corpus.page_url(i) for i in range(4000)])
    summaries = eng.run(3, stop_when_idle=True)
    crawl_secs = round(time.time() - t0, 3)
    extracted_20k = sum(s["urls_extracted"] for s in summaries)
    timings["crawl_3rounds_20k"] = crawl_secs
    log(f"crawl: {extracted_20k} pages in {crawl_secs}s")
    shutil.rmtree(wd, ignore_errors=True)

    big_secs, big_extracted = crawl_probe(
        "120k", n_pages=120000, n_seeds=30000, budget=40000,
        rounds=4, fat=20, aqe=False)
    timings["crawl_4rounds_120k"] = big_secs

    # same frozen shape with state on tmpfs: the disk-noise-free
    # compute headline (the sandbox's single shared disk swings the
    # /tmp probes ±30% between identical runs on a bad day; /dev/shm
    # isolates the engine from that).  urls_per_sec_shm reports it.
    shm_secs, shm_extracted = crawl_probe(
        "120kshm", n_pages=120000, n_seeds=30000, budget=40000,
        rounds=4, fat=20, aqe=False, base="/dev/shm")
    timings["crawl_4rounds_120k_shm"] = shm_secs

    total = round(sum(v for v in timings.values() if v > 0), 3)
    print(json.dumps({
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_label,
        "rows": rows,
        "crawl_urls_extracted": big_extracted,
        "crawl_urls_per_sec": round(big_extracted / big_secs, 1),
        "crawl_urls_per_sec_shm": round(shm_extracted / shm_secs, 1),
        "crawl20k_urls_extracted": extracted_20k,
        "crawl20k_urls_per_sec": round(extracted_20k / crawl_secs, 1),
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
