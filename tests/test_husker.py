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


PRODUCT = (b'<body><h1 class="title">Product 7</h1>'
           b'<span class="price">1,234.56</span>'
           b'<span class="qty">2,500</span>'
           b'<time datetime="2025-03-04">2025-03-04</time>'
           b'<script type="application/json">{"sku": 7, "stock": [1, 2]}'
           b'</script></body>')


def test_value_ops_int_float_date_json():
    import datetime
    doc = parse(PRODUCT)
    assert doc.one("span.price").float == 1234.56
    assert doc.one("span.qty").int == 2500
    assert doc.one("time").date() == datetime.date(2025, 3, 4)
    assert doc.one("script[type=application/json]").json == \
        {"sku": 7, "stock": [1, 2]}


def test_value_ops_raise_huskervalueerror():
    import pytest

    from sparkcrawl.husker import HuskerValueError
    doc = parse(b'<p class="x">not a number</p>')
    for op in (lambda h: h.int, lambda h: h.float,
               lambda h: h.date(), lambda h: h.json):
        with pytest.raises(HuskerValueError):
            op(doc.one("p.x"))


def test_one_of_multi_spec_alternatives():
    import pytest

    from sparkcrawl.husker import HuskerMismatch, HuskerNotUnique
    doc = parse(PRODUCT)
    # first alternative wins when present
    assert doc.one_of("h1.title", "div#name").text == "Product 7"
    # falls through to later specs
    assert doc.one_of("div#name", "h1.title").text == "Product 7"
    assert doc.some_of("div#nope", "h1.missing") is None
    with pytest.raises(HuskerMismatch):
        doc.one_of("div#nope", "h1.missing")
    with pytest.raises(HuskerNotUnique):
        doc.one_of("span")  # two spans


def test_json_husker_paths_and_values():
    import pytest

    from sparkcrawl.husker import (HuskerMismatch, HuskerNotUnique,
                                   HuskerValueError, parse_json)
    d = parse_json(b'{"sku": 7, "price": {"amount": "1,234.56"},'
                   b' "tags": ["a", "b"],'
                   b' "variants": [{"qty": 3}, {"qty": 9}],'
                   b' "name": {"title": "Product 7"}}')
    assert d.one("sku").int == 7
    assert d.one("price.amount").float == 1234.56
    assert [t.text for t in d.all("tags[*]")] == ["a", "b"]
    assert d.one("variants[0].qty").int == 3
    assert d.last("variants[*].qty").int == 9
    assert sum(v.int for v in d.all("variants[*].qty")) == 12
    assert d.one_of("name.display", "name.title").text == "Product 7"
    assert d.some("missing.path") is None
    assert d.one("price").json == {"amount": "1,234.56"}
    with pytest.raises(HuskerMismatch):
        d.one("nope")
    with pytest.raises(HuskerNotUnique):
        d.one("variants[*].qty")
    with pytest.raises(HuskerValueError):
        parse_json(b"{not json")
    with pytest.raises(HuskerValueError):
        d.one("price").text  # containers have no .text


def test_child_combinator():
    doc = parse(b'<div class="a"><p>direct</p><span><p>nested</p></span>'
                b"</div><p>outside</p>")
    assert [h.text for h in doc.any("div.a > p")] == ["direct"]
    assert sorted(h.text for h in doc.any("div.a p")) == ["direct", "nested"]
    assert doc.one("span > p").text == "nested"
    assert doc.any("span > div") == []


def test_positional_predicate():
    """Frozen spec: trailing [N] keeps the Nth match PER CONTEXT element
    (lxml-style positional predicate), composing with attribute filters."""
    doc = parse(b"<table>"
                b"<tr><td>a1</td><td>a2</td><td>a3</td></tr>"
                b"<tr><td>b1</td><td colspan=2>b2</td></tr>"
                b"<tr><td>c1</td></tr>"
                b"</table>")
    # per-row second cell: one per row that HAS a second cell
    assert [h.text for h in doc.any("tr > td[2]")] == ["a2", "b2"]
    # descendant axis: position is still per context (the one table)
    assert doc.one("table td[3]").text == "a3"
    assert [h.text for h in doc.any("tr > td[1]")] == ["a1", "b1", "c1"]
    # attribute filter composes BEFORE position
    assert doc.one("td[colspan][1]").text == "b2"
    # out-of-range position = no match (some → None, one → mismatch)
    assert doc.some("tr > td[9]") is None
    with pytest.raises(HuskerMismatch):
        doc.one("tr > td[9]")
