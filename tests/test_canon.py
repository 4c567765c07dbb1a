"""A2 canonicalization — property tests (SURVEY §5.2) + frozen-spec cases."""

from hypothesis import given, settings
from hypothesis import strategies as st

from sparkcrawl.canon import canonicalize, url_hash, url_host

_hosts = st.from_regex(r"[a-zA-Z][a-zA-Z0-9\-]{0,10}(\.[a-zA-Z]{2,5}){1,2}",
                       fullmatch=True)
_paths = st.from_regex(r"(/[a-zA-Z0-9._~%\-]{0,8}){0,4}/?", fullmatch=True)
_query = st.from_regex(r"([a-z]{1,5}=[a-zA-Z0-9]{0,6}&?){0,3}", fullmatch=True)
_frag = st.from_regex(r"[a-zA-Z0-9]{0,8}", fullmatch=True)
_urls = st.builds(
    lambda h, p, q, f, s: f"{s}://{h}{p}" + (f"?{q}" if q else "") + (f"#{f}" if f else ""),
    _hosts, _paths, _query, _frag, st.sampled_from(["http", "https", "HTTP", "Https"]),
)


@settings(max_examples=300, deadline=None)
@given(_urls)
def test_idempotent(u):
    c = canonicalize(u)
    assert canonicalize(c) == c


@settings(max_examples=200, deadline=None)
@given(_hosts, _paths)
def test_case_insensitive_scheme_host(h, p):
    assert canonicalize(f"HTTP://{h.upper()}{p}") == canonicalize(f"http://{h.lower()}{p}")


@settings(max_examples=200, deadline=None)
@given(_urls, _frag)
def test_fragment_stripped(u, frag):
    base = u.split("#", 1)[0]
    assert canonicalize(base + "#" + frag) == canonicalize(base)


@settings(max_examples=200, deadline=None)
@given(_urls)
def test_stable_hash(u):
    assert url_hash(canonicalize(u)) == url_hash(canonicalize(u))


def test_frozen_spec_cases():
    assert canonicalize("HTTP://Host0.Example:80/p/1") == "http://host0.example/p/1"
    assert canonicalize("https://h.example:443/x") == "https://h.example/x"
    assert canonicalize("https://h.example:8443/x") == "https://h.example:8443/x"
    assert canonicalize("http://h.example") == "http://h.example/"
    assert canonicalize("http://h.example/a/../b/./c") == "http://h.example/b/c"
    assert canonicalize("http://h.example/p?utm_source=x&b=2&a=1") == \
        "http://h.example/p?a=1&b=2"
    assert canonicalize("http://h.example/p?b=&a=1") == "http://h.example/p?a=1&b="
    assert canonicalize("http://h.example/p#frag") == "http://h.example/p"
    assert canonicalize("http://h.example/%7Euser/%41") == "http://h.example/~user/A"
    assert canonicalize("http://h.example./p") == "http://h.example/p"
    assert canonicalize("http://h.example/a/") == "http://h.example/a/"
    assert url_host("http://UPPER.Example:99/p") == "upper.example"
    # unparseable input comes back stripped but unbroken
    assert canonicalize("  not a url  ") == "not a url"


def test_tracking_params_dropped():
    assert canonicalize("http://h.example/?utm_campaign=a&fbclid=b&gclid=c&x=1") == \
        "http://h.example/?x=1"


def test_reserved_escapes_stay_encoded():
    """Spec item 4: %2F must never become a path separator (decoding it
    conflates distinct URLs) and escape hex is uppercased; unreserved
    escapes decode; encoded dot-segments resolve per RFC 3986 §6.2.2.3."""
    assert canonicalize("http://h.example/a%2Fb") == "http://h.example/a%2Fb"
    assert canonicalize("http://h.example/a%2fb") == "http://h.example/a%2Fb"
    assert canonicalize("http://h.example/a%3Fq") == "http://h.example/a%3Fq"
    assert canonicalize("http://h.example/%2E%2E/x") == "http://h.example/x"
    # distinctness: the encoded-slash URL differs from the real two-segment one
    assert canonicalize("http://h.example/a%2Fb") != \
        canonicalize("http://h.example/a/b")
    # raw disallowed characters get quoted
    assert canonicalize("http://h.example/a b") == "http://h.example/a%20b"
