"""Engine-level cuckoo-backend check: same crawl, seen_filter='cuckoo'
must produce the identical seen-set/selected sets as the model oracle
(the filter is an optimization — semantics must not depend on backend)."""

from sparkcrawl import corpus, model_crawler
from sparkcrawl.rounds import CrawlEngine
from sparkcrawl.schemas import ROBOTS

N, BUDGET, ROUNDS = 120, 3, 3


def test_cuckoo_backend_parity(spark, tmp_path):
    eng = CrawlEngine(
        spark, str(tmp_path / "wd"),
        pages=corpus.pages_df(spark, N),
        robots=spark.createDataFrame(corpus.robots_rows(), ROBOTS),
        budget_per_host=BUDGET, n_buckets=8, salt_buckets=4,
        seen_filter="cuckoo")
    eng.init(corpus.seed_urls(N, 5))
    eng.run(ROUNDS, stop_when_idle=False)

    model = model_crawler.crawl(
        corpus.pages_dict(N), corpus.seed_urls(N, 5),
        {h: r for h, _, r in corpus.robots_rows()}, BUDGET, ROUNDS)

    eng_seen = {r["url_hash"] for r in
                eng.frontier.read(spark).select("url_hash").collect()}
    assert eng_seen == set(model.frontier.keys())

    flog = eng.fetchlog.read(spark).collect()
    eng_sel = {}
    for row in flog:
        if row["status"] != "ROBOTS_DENIED":
            eng_sel.setdefault(row["round"], set()).add(row["url_hash"])
    for rs in model.rounds:
        assert eng_sel.get(rs["round"], set()) == set(rs["selected_hashes"])


def test_cuckoo_overflow_degrades_not_dies(spark, tmp_path):
    """A bucket whose cuckoo filter saturates must become a SATURATED
    marker (n_items = -1) routing its candidates through the exact
    anti-join — NOT raise OverflowError mid-crawl.  Crawl results stay
    identical to the model oracle (filters are an optimization)."""
    eng = CrawlEngine(
        spark, str(tmp_path / "wd"),
        pages=corpus.pages_df(spark, N),
        robots=spark.createDataFrame(corpus.robots_rows(), ROBOTS),
        budget_per_host=BUDGET, n_buckets=2, salt_buckets=4,
        seen_filter="cuckoo",
        bloom_capacity_per_bucket=8)  # ~32-slot filters: guaranteed overflow
    eng.init(corpus.seed_urls(N, 5))
    eng.run(ROUNDS, stop_when_idle=False)  # must not raise

    seen_rows = eng.seen.read(spark).collect()
    assert any(r["n_items"] < 0 for r in seen_rows), \
        "expected at least one saturated bucket at capacity 8"

    model = model_crawler.crawl(
        corpus.pages_dict(N), corpus.seed_urls(N, 5),
        {h: r for h, _, r in corpus.robots_rows()}, BUDGET, ROUNDS)
    eng_seen = {r["url_hash"] for r in
                eng.frontier.read(spark).select("url_hash").collect()}
    assert eng_seen == set(model.frontier.keys())
