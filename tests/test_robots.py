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
