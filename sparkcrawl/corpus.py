"""Deterministic synthetic web corpus (FIXTURES.md §B, seed=42).

Every attribute of page *i* is a pure function of ``(SEED, i)`` via a
splitmix64 mixer — no RNG state — so the corpus can be generated
partition-parallel with ``mapInPandas`` (Spark path) or driver-side
(model-crawler oracle) and both see byte-identical pages.

Shape per BASELINE.json:15 input_hint:
(url:string, warc_ts:timestamp, html:binary, text:string, lang:string);
``text`` is left null — OUR engine produces it.

Host distribution is Zipf-ish with host0 owning ~50% of URLs (the heavy
fan-in host for the A9 skew tests).  The link graph is a seeded random
digraph with cycles, URL-alias variants (case/fragment/tracking-params/
relative forms) to exercise canonicalization, plus off-corpus and
javascript: links.  A deterministic subset of pages is malformed HTML and
another subset contains invalid UTF-8 bytes.
"""

from __future__ import annotations

import html as _html
from datetime import datetime, timedelta
from typing import Dict, Iterator, List, Tuple

import pandas as pd

SEED = 42
N_HOSTS = 20
LANGS = ("en", "es", "de", "fr", "zh")
_EPOCH = datetime(2025, 1, 1)

_WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo "
    "lima mike november oscar papa quebec romeo sierra tango uniform victor "
    "whiskey xray yankee zulu crawl frontier spark parquet arrow vector "
    "página日本語 schön déjà 北京 tokyo"
).split()

_MASK = (1 << 64) - 1


def _mix(*vals: int) -> int:
    """splitmix64 over a tuple — the corpus's only randomness source."""
    x = (SEED * 0x9E3779B97F4A7C15) & _MASK
    for v in vals:
        x = (x + v + 0x9E3779B97F4A7C15) & _MASK
        z = x
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & _MASK
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & _MASK
        x = z ^ (z >> 31)
    return x


def page_host(i: int) -> int:
    r = _mix(i, 1)
    if r % 100 < 50:  # heavy fan-in host
        return 0
    return 1 + r % (N_HOSTS - 1)


def page_path(i: int) -> str:
    return f"/private/{i}" if _mix(i, 2) % 11 == 0 else f"/p/{i}"


def page_url(i: int) -> str:
    """Canonical URL of page i (generator emits canonical form)."""
    return f"http://host{page_host(i)}.example{page_path(i)}"


def page_lang(i: int) -> str:
    return LANGS[_mix(i, 3) % len(LANGS)]


def page_warc_ts(i: int) -> datetime:
    return _EPOCH + timedelta(seconds=int(_mix(i, 4) % (365 * 86400)))


def page_link_targets(i: int, n: int) -> List[int]:
    k = 2 + _mix(i, 5) % 5
    return [(i * 2654435761 + 97 * j + 13) % n for j in range(1, k + 1)]


def _href_variant(src: int, dst: int, j: int) -> str:
    """One of 6 alias forms for the link src→dst (exercises A2/A15)."""
    url = page_url(dst)
    style = _mix(src, dst, j, 6) % 6
    if style == 0:
        return url
    if style == 1:  # uppercase host — canonicalization target
        return url.replace("http://host", "http://HOST", 1)
    if style == 2:  # fragment — stripped by canon
        return url + "#sec2"
    if style == 3:  # tracking + unsorted params — canon drops/sorts
        return url + "?utm_source=feed&b=2&a=1"
    if style == 4:  # absolute-path relative (same-host resolution via base)
        return page_path(dst) if page_host(dst) == page_host(src) else url
    return url + "?a=1&b=2"  # already-sorted params variant


def _body_words(i: int, n_words: int) -> str:
    return " ".join(_WORDS[_mix(i, 7, w) % len(_WORDS)] for w in range(n_words))


def page_html(i: int, n: int, fat: int = 0) -> bytes:
    """HTML bytes of page i in a corpus of n pages.

    ``fat`` pads the body with extra deterministic paragraphs (bench corpora
    use ~10–50 KB pages per SURVEY §6)."""
    url = page_url(i)
    targets = page_link_targets(i, n)
    anchors = [
        f'<a href="{_html.escape(_href_variant(i, t, j))}">link {j}</a>'
        for j, t in enumerate(targets)
    ]
    anchors.append(anchors[0])  # duplicate link
    anchors.append(f'<a href="http://offsite{_mix(i, 8) % 7}.invalid/x{i}">off</a>')
    anchors.append('<a href="javascript:void(0)">js</a>')
    anchors.append('<a name="no-href">anchorless</a>')
    paras = [
        f"<p>{_body_words(_mix(i, 9, p), 12)} &amp; entity &eacute; {p}</p>"
        for p in range(3 + fat)
    ]
    parts = [
        "<!DOCTYPE html><html><head>",
        f"<title>Page {i} — host{page_host(i)}</title>",
        "<style>body { color: #000; }</style>",
        '<script>var hidden = "not text";</script>',
        "</head><body>",
        f"<!-- comment {i} not text -->",
        f"<h1>Heading {i}</h1>",
        "<div>",
        *paras,
        "<ul>",
        *(f"<li>{a}</li>" for a in anchors),
        "</ul>",
        "</div>",
        "<noscript>no js fallback</noscript>",
        "</body></html>",
    ]
    doc = "".join(parts)
    if _mix(i, 10) % 17 == 0:  # malformed subset: unclosed/stray tags
        doc = doc.replace("</body></html>", "<div><b>unclosed</i> stray")
    raw = doc.encode("utf-8")
    if _mix(i, 11) % 23 == 0:  # bad-encoding subset: invalid UTF-8 bytes
        raw += b"<p>latin1 caf\xe9</p>"
    return raw


def page_row(i: int, n: int, fat: int = 0) -> Tuple:
    return (page_url(i), page_warc_ts(i), page_html(i, n, fat), None, page_lang(i))


# --- corpus materialization -------------------------------------------------

def pages_rows(n: int, fat: int = 0) -> List[Tuple]:
    """Driver-side full corpus (tiny/small scales only)."""
    return [page_row(i, n, fat) for i in range(n)]


def pages_dict(n: int, fat: int = 0) -> Dict[str, bytes]:
    """url→html map — the model crawler's 'web'."""
    return {page_url(i): page_html(i, n, fat) for i in range(n)}


def pages_df(spark, n: int, fat: int = 0):
    """Distributed generation: pure function of the row id ⇒ mapInPandas."""
    from .schemas import PAGES

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = [page_row(int(i), n, fat) for i in batch["id"]]
            yield pd.DataFrame(rows, columns=[f.name for f in PAGES.fields])

    parts = max(8, min(256, n // 2000 + 1))
    return spark.range(0, n, numPartitions=parts).mapInPandas(gen, schema=PAGES)


def seed_urls(n: int, n_seeds: int = 10) -> List[str]:
    """First page per distinct host (scan order), up to n_seeds seeds —
    includes the heavy host (host0 owns page 0's host half the time; scan
    guarantees distinct hosts)."""
    seen_hosts = set()
    seeds: List[str] = []
    for i in range(min(n, 5000)):
        h = page_host(i)
        if h not in seen_hosts:
            seen_hosts.add(h)
            seeds.append(page_url(i))
            if len(seeds) >= n_seeds:
                break
    return seeds


def robots_rows(ts: datetime = _EPOCH) -> List[Tuple]:
    """host1 denies all; even hosts deny /private/; odd hosts allow all."""
    rows = []
    for h in range(N_HOSTS):
        host = f"host{h}.example"
        if h == 1:
            rules = "User-agent: *\nDisallow: /\n"
        elif h % 2 == 0:
            rules = "User-agent: *\nDisallow: /private/\n"
        else:
            rules = "User-agent: *\nDisallow:\n"
        rows.append((host, ts, rules))
    return rows


# --- pages rendered from the driver's documents table (entry() flagship) ---

def doc_url(doc_id: int) -> str:
    return f"http://docs{doc_id % 10}.example/d/{doc_id}"


def doc_n_links(doc_id: int) -> int:
    return 1 + doc_id % 3


def doc_link_targets(doc_id: int, n_docs: int) -> List[int]:
    return [(doc_id * 31 + 7 * (j + 1)) % n_docs for j in range(doc_n_links(doc_id))]


def product_fields(doc_id: int) -> Tuple[int, int, int, int]:
    """(price_cents, qty, day_offset, stock) — pure functions of doc_id,
    mirrored arithmetically by the husker_value_ops DuckDB oracle."""
    return ((doc_id * 7919) % 1000000, (doc_id * 13) % 5000,
            doc_id % 365, doc_id % 7)


def render_product_html(doc_id: int) -> bytes:
    """A typed 'product page' for the Husker value-op surface: price with
    thousands separators (.float), count (.int), ISO date (.date), JSON
    metadata block (.json), and the title under one of two layout
    variants (one_of multi-spec)."""
    cents, qty, day, stock = product_fields(doc_id)
    d = (datetime(2025, 1, 1) + timedelta(days=day)).date().isoformat()
    title = f"Product {doc_id}"
    title_html = (f'<h1 class="title">{title}</h1>' if doc_id % 2 == 0
                  else f'<div id="name">{title}</div>')
    return (
        f"<html><body>{title_html}"
        f'<span class="price">{cents / 100:,.2f}</span>'
        f'<span class="qty">{qty:,}</span>'
        f'<time datetime="{d}">{d}</time>'
        f'<script type="application/json" id="meta">'
        f'{{"sku": {doc_id}, "stock": {stock}}}</script>'
        "</body></html>"
    ).encode("utf-8")


def render_doc_json(doc_id: int) -> bytes:
    """A typed JSON document for the JSON-husker surface (same field
    arithmetic as render_product_html so oracles share product_fields)."""
    import json as _j
    cents, qty, day, stock = product_fields(doc_id)
    name_key = "display" if doc_id % 2 == 0 else "title"
    return _j.dumps({
        "sku": doc_id,
        "price": {"amount": f"{cents / 100:,.2f}"},
        "tags": [f"t{j}" for j in range(1 + doc_id % 3)],
        "variants": [{"qty": qty}, {"qty": stock}],
        "name": {name_key: f"Product {doc_id}"},
    }, separators=(",", ":")).encode("utf-8")


def render_doc_html(doc_id: int, text: str, n_docs: int) -> bytes:
    """Wrap a documents.text row in deterministic HTML (escape-round-trip:
    extraction recovers whitespace-collapsed text)."""
    anchors = "".join(
        f'<a href="{doc_url(t)}">d{t}</a> ' for t in doc_link_targets(doc_id, n_docs)
    )
    return (
        "<html><head><script>x=1</script></head><body>"
        f"<p>{_html.escape(text or '')}</p><div>{anchors}</div>"
        "</body></html>"
    ).encode("utf-8")
