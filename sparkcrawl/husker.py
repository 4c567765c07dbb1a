"""§2.C — the Husker selection API, re-expressed as pure functions.

The reference's user-facing query surface is a lazy selector tree over a
parsed document (expected: alcazar/husker/*.py — unverified, reference
absent): selection ops ``one/some/all/any/first/last``, value ops
``.text/.attrib``, regex sub-selection, and mismatch errors
(HuskerMismatch, HuskerNotUnique).

Here the same API exists as a lightweight, stdlib-only DOM + selector
layer meant to run INSIDE vectorized UDFs (never as a distributed
structure): a page-parse returns a ``Husker`` and field extraction is
plain Python, so user scrape rules written against this API drop into
``mapInPandas``/``pandas_udf`` bodies unchanged.  Errors never cross the
UDF boundary — engine callers map them to status=ERROR rows.

Selector syntax (frozen spec, CSS-ish subset):
  ``tag``, ``.cls``, ``#id``, ``tag.cls``, ``tag[attr]``,
  ``tag[attr=value]``, descendant chaining with spaces
  (``div a[href]``), and the direct-child combinator ``>``
  (``ul > li``, space-separated).  ``*`` matches any tag.
  A trailing ``[N]`` (1-based, digits only — lxml-style positional
  predicate) keeps the Nth match PER CONTEXT ELEMENT: ``tr > td[2]``
  is each row's second cell, ``ul li[1]`` each list's first item.
  Position composes after any attribute filter (``td[colspan][2]``).
"""

from __future__ import annotations

import datetime
import json as _json
import re
from html.parser import HTMLParser
from typing import Iterator, List, Optional

from .extract import BLOCK_TAGS, _MUTED_TAGS, _SELF_BREAK, clean_text, decode_html


class HuskerError(Exception):
    pass


class HuskerMismatch(HuskerError):
    """Expected ≥1 match; found none."""


class HuskerNotUnique(HuskerError):
    """Expected exactly one match; found several."""


class HuskerValueError(HuskerError):
    """Value conversion (.int/.float/.date/.json) failed."""


_VOID_TAGS = frozenset("""area base br col embed hr img input link meta
    param source track wbr""".split())

_NUM_CLEAN = re.compile("[,\\s\u00a0]")  # thousands sep, whitespace, NBSP

# attr names must start with a letter/underscore so a digits-only
# bracket ([2]) is unambiguously the positional predicate
_SEL_PART = re.compile(
    r"^(?P<tag>[a-zA-Z0-9*]+)?"
    r"(?:\.(?P<cls>[\w\-]+))?"
    r"(?:#(?P<id>[\w\-]+))?"
    r"(?:\[(?P<attr>[a-zA-Z_][\w\-]*)(?:=(?P<val>[^\]]*))?\])?"
    r"(?:\[(?P<pos>\d+)\])?$"
)


class Element:
    """One DOM node (tolerant tree built by _TreeBuilder)."""

    __slots__ = ("tag", "attrs", "children")

    def __init__(self, tag: str, attrs: dict) -> None:
        self.tag = tag
        self.attrs = attrs
        self.children: List = []  # Element | str

    # -- text (same frozen spec as extract.py, scoped to this subtree) --
    def _chunks(self, out: List[str]) -> None:
        if self.tag in _MUTED_TAGS:
            return
        block = self.tag in BLOCK_TAGS
        if block or self.tag in _SELF_BREAK:
            out.append("\n")
        for c in self.children:
            if isinstance(c, str):
                out.append(c)
            else:
                c._chunks(out)
        if block:
            out.append("\n")

    @property
    def raw_text(self) -> str:
        out: List[str] = []
        self._chunks(out)
        return "".join(out)

    @property
    def text(self) -> str:
        return clean_text(self.raw_text)

    @property
    def raw_content(self) -> str:
        """All text descendants verbatim, INCLUDING muted subtrees —
        the payload view used by .json (script bodies are data there)."""
        out: List[str] = []

        def walk(el: "Element") -> None:
            for c in el.children:
                if isinstance(c, str):
                    out.append(c)
                else:
                    walk(c)

        walk(self)
        return "".join(out)

    def iter(self) -> Iterator["Element"]:
        yield self
        for c in self.children:
            if isinstance(c, Element):
                yield from c.iter()

    def __getitem__(self, name: str) -> str:
        return self.attrs[name]


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Element("[document]", {})
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        el = Element(tag, dict(attrs))
        self.stack[-1].children.append(el)
        if tag not in _VOID_TAGS:
            self.stack.append(el)

    def handle_startendtag(self, tag, attrs):
        self.stack[-1].children.append(Element(tag, dict(attrs)))

    def handle_endtag(self, tag):
        # tolerant close: pop to the nearest matching open tag, else ignore
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                break

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)


def _match(el: Element, part: str) -> bool:
    m = _SEL_PART.match(part)
    if not m:
        return False
    g = m.groupdict()
    if g["tag"] and g["tag"] != "*" and el.tag != g["tag"]:
        return False
    if g["cls"] and g["cls"] not in (el.attrs.get("class") or "").split():
        return False
    if g["id"] and el.attrs.get("id") != g["id"]:
        return False
    if g["attr"]:
        if g["attr"] not in el.attrs:
            return False
        if g["val"] is not None and el.attrs.get(g["attr"]) != g["val"]:
            return False
    return True


def _select(root: Element, selector: str) -> List[Element]:
    tokens = selector.split()
    current = [root]
    direct = False  # next part matches direct children only ('>')
    for part in tokens:
        if part == ">":
            direct = True
            continue
        m = _SEL_PART.match(part)
        pos = int(m.group("pos")) if m and m.group("pos") else None
        nxt: List[Element] = []
        seen = set()
        for base in current:
            pool = ((c for c in base.children if isinstance(c, Element))
                    if direct else
                    (el for el in base.iter() if el is not base))
            hits = [el for el in pool if _match(el, part)]
            if pos is not None:
                # positional predicate: Nth match within THIS context
                # (lxml-style — 1-based, document order per base)
                hits = hits[pos - 1:pos]
            for el in hits:
                if id(el) not in seen:
                    seen.add(id(el))
                    nxt.append(el)
        current = nxt
        direct = False
    return current


class Husker:
    """Selector handle over a parsed document or element list."""

    def __init__(self, element: Element) -> None:
        self._el = element

    # -- selection ops (reference semantics per SURVEY §2.C) --------------
    def all(self, selector: str) -> List["Husker"]:
        """≥1 matches else HuskerMismatch."""
        found = _select(self._el, selector)
        if not found:
            raise HuskerMismatch(f"no match for {selector!r}")
        return [Husker(e) for e in found]

    def any(self, selector: str) -> List["Husker"]:
        """≥0 matches."""
        return [Husker(e) for e in _select(self._el, selector)]

    def one(self, selector: str) -> "Husker":
        """Exactly one match else HuskerMismatch/HuskerNotUnique."""
        found = _select(self._el, selector)
        if not found:
            raise HuskerMismatch(f"no match for {selector!r}")
        if len(found) > 1:
            raise HuskerNotUnique(f"{len(found)} matches for {selector!r}")
        return Husker(found[0])

    def some(self, selector: str) -> Optional["Husker"]:
        """One or None; >1 is HuskerNotUnique."""
        found = _select(self._el, selector)
        if len(found) > 1:
            raise HuskerNotUnique(f"{len(found)} matches for {selector!r}")
        return Husker(found[0]) if found else None

    def first(self, selector: str) -> "Husker":
        return self.all(selector)[0]

    def last(self, selector: str) -> "Husker":
        return self.all(selector)[-1]

    # -- multi-spec alternatives (try specs in order) ----------------------
    def one_of(self, *selectors: str) -> "Husker":
        """First selector (in order) with ≥1 match wins; that selector
        must then match exactly one element (the reference's
        try-specs-in-order ergonomic for pages with layout variants)."""
        for sel in selectors:
            found = _select(self._el, sel)
            if found:
                if len(found) > 1:
                    raise HuskerNotUnique(
                        f"{len(found)} matches for {sel!r}")
                return Husker(found[0])
        raise HuskerMismatch(f"no match for any of {selectors!r}")

    def some_of(self, *selectors: str) -> Optional["Husker"]:
        """one_of, but None when no alternative matches."""
        try:
            return self.one_of(*selectors)
        except HuskerMismatch:
            return None

    # -- value ops ---------------------------------------------------------
    @property
    def text(self) -> str:
        return self._el.text

    @property
    def raw_text(self) -> str:
        return self._el.raw_text

    def attrib(self, name: str, default: Optional[str] = None) -> Optional[str]:
        return self._el.attrs.get(name, default)

    def __getitem__(self, name: str) -> str:
        return self._el[name]

    def sub(self, pattern: str, group: int = 0) -> Optional[str]:
        """Regex sub-selection over the cleaned text."""
        m = re.search(pattern, self.text)
        return m.group(group) if m else None

    # -- typed value ops (conversion failures raise HuskerValueError) ------
    @property
    def int(self) -> int:
        """Cleaned text → int; thousands separators / NBSP / spaces are
        stripped (price-and-count scrape staple)."""
        raw = _NUM_CLEAN.sub("", self.text)
        try:
            return int(raw)
        except ValueError as e:
            raise HuskerValueError(f"not an int: {self.text!r}") from e

    @property
    def float(self) -> float:
        raw = _NUM_CLEAN.sub("", self.text)
        try:
            return float(raw)
        except ValueError as e:
            raise HuskerValueError(f"not a float: {self.text!r}") from e

    def date(self, fmt: str = "%Y-%m-%d") -> "datetime.date":
        """Cleaned, stripped text parsed with strptime(fmt) → date."""
        try:
            return datetime.datetime.strptime(self.text.strip(), fmt).date()
        except ValueError as e:
            raise HuskerValueError(
                f"not a {fmt!r} date: {self.text!r}") from e

    @property
    def json(self):
        """Raw content (muted subtrees included — <script type=
        "application/json"> bodies are the common case) → json.loads."""
        try:
            return _json.loads(self._el.raw_content)
        except ValueError as e:
            raise HuskerValueError("invalid JSON payload") from e

    @property
    def tag(self) -> str:
        return self._el.tag


def parse(html) -> Husker:
    """bytes|str → document Husker (never raises on malformed input)."""
    builder = _TreeBuilder()
    try:
        builder.feed(decode_html(html))
        builder.close()
    except Exception:
        pass
    return Husker(builder.root)


# ======================================================================
# JSON husker — the reference's Husker tree also works over JSON
# documents; same selection semantics over a path spec instead of CSS.
#
# Frozen path spec: dot-separated object keys, ``[N]`` list index,
# ``[*]`` list fan-out (``items[*].price`` selects every price).
# Selection ops mirror the HTML Husker: one/some/all/any/first/last +
# one_of/some_of; value ops .value/.text/.int/.float/.date()/.json.
# ======================================================================

_JSON_SEG = re.compile(r"^(?P<key>[^\[\]]*)(?P<idx>(\[(\d+|\*)\])*)$")
_JSON_IDX = re.compile(r"\[(\d+|\*)\]")


def _json_resolve(value, path: str) -> List:
    cur = [value]
    for seg in path.split("."):
        m = _JSON_SEG.match(seg)
        if not m:
            return []
        key = m.group("key")
        if key:
            cur = [v[key] for v in cur if isinstance(v, dict) and key in v]
        for idx in _JSON_IDX.findall(m.group("idx") or ""):
            nxt: List = []
            for v in cur:
                if not isinstance(v, list):
                    continue
                if idx == "*":
                    nxt.extend(v)
                elif int(idx) < len(v):
                    nxt.append(v[int(idx)])
            cur = nxt
    return cur


class JsonHusker:
    """Selector handle over a parsed JSON value."""

    def __init__(self, value) -> None:
        self._v = value

    # -- selection (same contracts as the HTML Husker) ------------------
    def all(self, path: str) -> List["JsonHusker"]:
        found = _json_resolve(self._v, path)
        if not found:
            raise HuskerMismatch(f"no match for {path!r}")
        return [JsonHusker(v) for v in found]

    def any(self, path: str) -> List["JsonHusker"]:
        return [JsonHusker(v) for v in _json_resolve(self._v, path)]

    def one(self, path: str) -> "JsonHusker":
        found = _json_resolve(self._v, path)
        if not found:
            raise HuskerMismatch(f"no match for {path!r}")
        if len(found) > 1:
            raise HuskerNotUnique(f"{len(found)} matches for {path!r}")
        return JsonHusker(found[0])

    def some(self, path: str) -> Optional["JsonHusker"]:
        found = _json_resolve(self._v, path)
        if len(found) > 1:
            raise HuskerNotUnique(f"{len(found)} matches for {path!r}")
        return JsonHusker(found[0]) if found else None

    def first(self, path: str) -> "JsonHusker":
        return self.all(path)[0]

    def last(self, path: str) -> "JsonHusker":
        return self.all(path)[-1]

    def one_of(self, *paths: str) -> "JsonHusker":
        for p in paths:
            found = _json_resolve(self._v, p)
            if found:
                if len(found) > 1:
                    raise HuskerNotUnique(f"{len(found)} matches for {p!r}")
                return JsonHusker(found[0])
        raise HuskerMismatch(f"no match for any of {paths!r}")

    def some_of(self, *paths: str) -> Optional["JsonHusker"]:
        try:
            return self.one_of(*paths)
        except HuskerMismatch:
            return None

    # -- values ----------------------------------------------------------
    @property
    def value(self):
        return self._v

    @property
    def json(self):
        return self._v

    @property
    def text(self) -> str:
        if self._v is None or isinstance(self._v, (dict, list)):
            raise HuskerValueError(f"not a scalar: {type(self._v).__name__}")
        return str(self._v)

    @property
    def int(self) -> int:
        try:
            if isinstance(self._v, bool):
                raise ValueError
            return (int(self._v) if isinstance(self._v, (int, float))
                    else int(_NUM_CLEAN.sub("", str(self._v))))
        except (TypeError, ValueError) as e:
            raise HuskerValueError(f"not an int: {self._v!r}") from e

    @property
    def float(self) -> float:
        try:
            if isinstance(self._v, bool):
                raise ValueError
            return (float(self._v) if isinstance(self._v, (int, float))
                    else float(_NUM_CLEAN.sub("", str(self._v))))
        except (TypeError, ValueError) as e:
            raise HuskerValueError(f"not a float: {self._v!r}") from e

    def date(self, fmt: str = "%Y-%m-%d") -> "datetime.date":
        try:
            return datetime.datetime.strptime(self.text.strip(), fmt).date()
        except (HuskerValueError, ValueError) as e:
            raise HuskerValueError(f"not a {fmt!r} date: {self._v!r}") from e


def parse_json(data) -> JsonHusker:
    """bytes|str → JsonHusker; invalid JSON raises HuskerValueError."""
    if isinstance(data, (bytes, bytearray)):
        data = bytes(data).decode("utf-8", errors="replace")
    try:
        return JsonHusker(_json.loads(data))
    except ValueError as e:
        raise HuskerValueError("invalid JSON document") from e
