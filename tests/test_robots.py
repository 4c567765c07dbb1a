"""A6 robots.txt evaluation."""

import pandas as pd

from sparkcrawl.robots import allowed, allowed_series

DENY_PRIVATE = "User-agent: *\nDisallow: /private/\n"
DENY_ALL = "User-agent: *\nDisallow: /\n"
ALLOW_ALL = "User-agent: *\nDisallow:\n"


def test_allowed():
    assert allowed(DENY_PRIVATE, "http://h.example/p/1")
    assert not allowed(DENY_PRIVATE, "http://h.example/private/1")
    assert not allowed(DENY_ALL, "http://h.example/anything")
    assert allowed(ALLOW_ALL, "http://h.example/private/1")
    assert allowed(None, "http://h.example/x")         # no robots.txt
    assert allowed("", "http://h.example/x")
    assert allowed("garbage\x00not robots", "http://h.example/x")


def test_vectorized_matches_scalar():
    rules = pd.Series([DENY_PRIVATE, DENY_ALL, ALLOW_ALL, None, DENY_PRIVATE])
    urls = pd.Series(["http://h/private/1", "http://h/x", "http://h/private/2",
                      "http://h/y", "http://h/p/1"])
    out = allowed_series(rules, urls)
    assert out.tolist() == [allowed(r, u) for r, u in zip(rules, urls)]


def test_crawl_delay_parse():
    """Frozen spec: group-aware, float-valued, named group beats '*',
    first group wins per specificity level, junk values ignored."""
    from sparkcrawl.robots import crawl_delay
    assert crawl_delay(None) is None
    assert crawl_delay("") is None
    assert crawl_delay("User-agent: *\nDisallow: /x\n") is None
    assert crawl_delay("User-agent: *\nCrawl-delay: 2\n") == 2.0
    assert crawl_delay("User-agent: *\nCrawl-delay: 0.25\n") == 0.25
    # named group (substring of our agent) beats the wildcard
    assert crawl_delay(
        "User-agent: *\nCrawl-delay: 5\n\n"
        "User-agent: sparkcrawl\nCrawl-delay: 1\n") == 1.0
    assert crawl_delay(
        "User-agent: sparkcrawl\nCrawl-delay: 1\n\n"
        "User-agent: *\nCrawl-delay: 5\n") == 1.0
    # a group for someone else doesn't apply
    assert crawl_delay("User-agent: otherbot\nCrawl-delay: 9\n") is None
    # stacked agent lines share one group
    assert crawl_delay(
        "User-agent: otherbot\nUser-agent: *\nCrawl-delay: 3\n") == 3.0
    # unparseable value ignored; comments stripped
    assert crawl_delay(
        "User-agent: *\nCrawl-delay: fast\n") is None
    assert crawl_delay(
        "User-agent: *  # everyone\nCrawl-delay: 2  # two\n") == 2.0
