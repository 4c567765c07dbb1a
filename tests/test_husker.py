"""§2.C Husker selection semantics on fixture snippets (the reference's
test strategy, SURVEY §5)."""

import pytest

from sparkcrawl.husker import (HuskerMismatch, HuskerNotUnique, parse)

DOC = b"""
<html><body>
  <h1 id="title">Main  Title</h1>
  <div class="nav"><a href="/a">A</a><a href="/b">B</a></div>
  <div class="body">
    <p class="lead">Lead &amp; para</p>
    <p>Second</p>
    <span data-x="1">inline</span>
  </div>
  <script>var x = "<p>fake</p>";</script>
</body></html>
"""


def test_one():
    doc = parse(DOC)
    assert doc.one("h1").text == "Main Title"
    assert doc.one("#title").text == "Main Title"
    assert doc.one("p.lead").text == "Lead & para"
    assert doc.one("span[data-x=1]").text == "inline"


def test_one_errors():
    doc = parse(DOC)
    with pytest.raises(HuskerMismatch):
        doc.one("h2")
    with pytest.raises(HuskerNotUnique):
        doc.one("p")


def test_some():
    doc = parse(DOC)
    assert doc.some("h2") is None
    assert doc.some("h1").text == "Main Title"
    with pytest.raises(HuskerNotUnique):
        doc.some("a")


def test_all_any_first_last():
    doc = parse(DOC)
    assert [a["href"] for a in doc.all("a")] == ["/a", "/b"]
    assert doc.any("h2") == []
    with pytest.raises(HuskerMismatch):
        doc.all("h2")
    assert doc.first("p").text == "Lead & para"
    assert doc.last("p").text == "Second"


def test_descendant_chain_and_attrib():
    doc = parse(DOC)
    assert [a["href"] for a in doc.any("div.nav a[href]")] == ["/a", "/b"]
    assert doc.one("div.body p.lead").attrib("class") == "lead"
    assert doc.one("h1").attrib("missing", "dflt") == "dflt"


def test_text_excludes_script_and_decodes_entities():
    doc = parse(DOC)
    assert "fake" not in doc.one("body").text
    assert "&" in doc.one("p.lead").text


def test_regex_sub_selection():
    doc = parse(DOC)
    assert doc.one("h1").sub(r"Main (\w+)", 1) == "Title"
    assert doc.one("h1").sub(r"nope") is None


def test_malformed_never_raises():
    doc = parse(b"<div><b>unclosed <i>x</div><p>y</b>")
    assert doc.any("p")  # still findable
    doc2 = parse(b"\x00\xff<not html")
    assert doc2.any("p") == []


def test_subtree_text_matches_extract_spec():
    """Husker .text on <body> == extract.extract_text for body content."""
    from sparkcrawl.extract import extract_text
    body_text = parse(DOC).one("body").text
    assert body_text == extract_text(DOC)
