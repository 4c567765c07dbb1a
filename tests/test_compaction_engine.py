"""Auto-compaction keeps the frontier at one data dir without changing
crawl semantics (content equality vs the model oracle)."""

from sparkcrawl import corpus, model_crawler
from sparkcrawl.rounds import CrawlEngine
from sparkcrawl.schemas import ROBOTS

N, BUDGET, ROUNDS = 120, 3, 4


def test_compact_every_preserves_semantics(spark, tmp_path):
    eng = CrawlEngine(
        spark, str(tmp_path / "wd"),
        pages=corpus.pages_df(spark, N),
        robots=spark.createDataFrame(corpus.robots_rows(), ROBOTS),
        budget_per_host=BUDGET, n_buckets=8, salt_buckets=4,
        compact_every=2)
    eng.init(corpus.seed_urls(N, 5))
    eng.run(ROUNDS, stop_when_idle=False)

    # after round 4 (a compaction round) the frontier is one snapshot dir
    assert len(eng.frontier.current_manifest()["data_dirs"]) == 1

    model = model_crawler.crawl(
        corpus.pages_dict(N), corpus.seed_urls(N, 5),
        {h: r for h, _, r in corpus.robots_rows()}, BUDGET, ROUNDS)
    eng_seen = {r["url_hash"] for r in
                eng.frontier.read(spark).select("url_hash").collect()}
    assert eng_seen == set(model.frontier.keys())

    # resume still works from a compacted checkpoint
    resumed = CrawlEngine(
        spark, str(tmp_path / "wd"),
        pages=corpus.pages_df(spark, N),
        robots=spark.createDataFrame(corpus.robots_rows(), ROBOTS),
        budget_per_host=BUDGET, n_buckets=8, salt_buckets=4,
        compact_every=2)
    assert resumed.resume() == ROUNDS
    resumed.run_round()
