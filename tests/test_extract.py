"""A11/A12/A14 golden extraction tests (SURVEY §5.1) — the byte-identical
invariant surface [BASELINE.json:15], asserted both in-process and through
the Arrow-UDF path."""

import glob
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sparkcrawl.extract import (extract_links, extract_text, husk_frame,
                                resolve_links)

GOLDENS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")
CASES = sorted(os.path.basename(p)[:-5] for p in glob.glob(f"{GOLDENS}/*.html"))


def _load(name):
    with open(f"{GOLDENS}/{name}.html", "rb") as f:
        html = f.read()
    with open(f"{GOLDENS}/{name}.txt", "rb") as f:
        expected = f.read()
    with open(f"{GOLDENS}/{name}.links") as f:
        links = [line for line in f.read().split("\n") if line]
    return html, expected, links


def test_goldens_exist():
    assert len(CASES) >= 12


@pytest.mark.parametrize("name", CASES)
def test_golden_inprocess(name):
    html, expected, links = _load(name)
    assert extract_text(html).encode("utf-8") == expected
    assert extract_links(html) == links


def test_goldens_through_arrow_udf(spark):
    """The same bytes through the distributed path must be byte-identical."""
    rows = []
    for name in CASES:
        html, expected, _ = _load(name)
        rows.append((name, f"http://{name}.example/x", bytearray(html),
                     expected.decode("utf-8")))
    df = spark.createDataFrame(
        rows, "name string, url string, html binary, expected string")
    husk_udf = F.pandas_udf(husk_frame, T.StructType([
        T.StructField("text", T.StringType()),
        T.StructField("links", T.ArrayType(T.StringType()))]))
    out = df.withColumn("h", husk_udf("url", "html")).collect()
    for row in out:
        assert row["h"]["text"] == row["expected"], row["name"]


def test_resolve_links_table():
    base = "http://h.example/a/b/page.html"
    cases = [
        ("http://x.example/abs", "http://x.example/abs"),
        ("/root", "http://h.example/root"),
        ("rel.html", "http://h.example/a/b/rel.html"),
        ("../up.html", "http://h.example/a/up.html"),
        ("./same.html", "http://h.example/a/b/same.html"),
        ("//other.example/proto", "http://other.example/proto"),
        ("?q=1", "http://h.example/a/b/page.html?q=1"),
        ("#frag", "http://h.example/a/b/page.html#frag"),
    ]
    assert resolve_links(base, [h for h, _ in cases]) == [e for _, e in cases]
    # dropped: non-http(s), empty, whitespace
    assert resolve_links(base, ["javascript:void(0)", "mailto:a@b", "", "  ",
                                "ftp://f.example/x"]) == []


def test_extract_never_raises_on_garbage():
    for garbage in (b"\x00\xff\xfe<<<", b"<a href=", b"&#xFFFFFFF;",
                    b"<" * 1000, "日本語".encode("utf-16"), None):
        text = extract_text(garbage)
        assert isinstance(text, str)


def test_sniff_charset_table():
    """Frozen spec step 1: BOM > meta declaration > UTF-8 fallback."""
    from sparkcrawl.extract import sniff_charset
    cases = [
        (b"\xef\xbb\xbfhello", ("utf-8", 3)),
        ("x".encode("utf-16"), ("utf-16-le", 2)),
        (b"\xfe\xff\x00x", ("utf-16-be", 2)),
        (b"\xff\xfe\x00\x00abcd", ("utf-32-le", 4)),
        (b'<meta charset="GB2312">', ("gbk", 0)),          # WHATWG quirk
        (b"<meta charset=latin-1>", ("windows-1252", 0)),  # WHATWG quirk
        (b'<META CHARSET="Shift_JIS">', ("shift_jis", 0)),
        (b'<meta http-equiv="Content-Type" content="text/html; '
         b'charset=euc-jp">', ("euc-jp", 0)),
        # ASCII-readable meta can't be in a real UTF-16/32 doc (those
        # carry a BOM) — WHATWG maps the labels to utf-8, else the page
        # would deterministically decode to mojibake
        (b'<meta charset="utf-16">', ("utf-8", 0)),
        (b"<meta charset=UTF-16LE>", ("utf-8", 0)),
        (b'<meta charset="utf-32">', ("utf-8", 0)),
        (b'<meta charset="not-a-codec">', ("utf-8", 0)),
        (b"<p>plain</p>", ("utf-8", 0)),
        # declaration beyond the 1024-byte sniff window is ignored
        (b" " * 1100 + b'<meta charset="gbk">', ("utf-8", 0)),
    ]
    for raw, want in cases:
        assert sniff_charset(raw) == want, raw[:40]


def test_decode_non_utf8_pages_roundtrip():
    from sparkcrawl.extract import extract_text
    body = '<meta charset="iso-8859-1"><p>café — naïve</p>'
    assert extract_text(body.encode("windows-1252")) == "café — naïve"
    gbk = '<meta charset=gb2312><p>中文内容</p>'.encode("gbk")
    assert extract_text(gbk) == "中文内容"
