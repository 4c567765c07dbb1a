"""Single-threaded model crawler — the in-repo stand-in for the reference
implementation's sequential crawl loop (SURVEY §5.3).

Mirrors the Spark engine's frozen semantics exactly, sharing the SAME pure
functions (canonicalize, url_hash/xxh64, husk, robots.allowed, priority
formula, min-parent tie-breaks), so the parity tests can assert
per-round selected-URL sets, the final URL-seen set, and round-of-first-
fetch per URL match between this oracle and the distributed engine
[BASELINE.json:14 "matching the reference's crawl ordering and URL-seen
set under the same seed list and politeness budget"].
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

from .canon import canonicalize, url_hash, url_host
from .extract import husk, resolve_links
from .frontier import PRIORITY_DEPTH_W, PRIORITY_SEED_W
from .robots import allowed


@dataclass
class Rec:
    url: str
    url_canon: str
    url_hash: int
    host: str
    depth: int
    seed_distance: int
    priority: float
    discovered_round: int
    lineage_src_url_hash: Optional[int]
    status: str = "PENDING"
    fetched_round: Optional[int] = None
    text: Optional[str] = None
    n_links: int = 0


@dataclass
class ModelState:
    frontier: Dict[int, Rec] = field(default_factory=dict)   # by url_hash
    pending: set = field(default_factory=set)
    rounds: List[dict] = field(default_factory=list)


def _priority(depth: int, dist: int) -> float:
    return depth * PRIORITY_DEPTH_W + dist * PRIORITY_SEED_W


def crawl(
    pages: Dict[str, bytes],
    seed_urls: List[str],
    robots_rules: Dict[str, str],
    budget_per_host: int,
    max_rounds: int,
) -> ModelState:
    st = ModelState()
    # A1 seed ingest (round 0) — dedupe canonical duplicates like the
    # engine: the surviving raw url is the MIN url per hash (lockstep
    # with seeds_to_frontier's min-struct rule, NOT first-in-list order)
    for u in seed_urls:
        c = canonicalize(u)
        h = url_hash(c)
        if h in st.frontier:
            if u < st.frontier[h].url:
                st.frontier[h].url = u
            continue
        st.frontier[h] = Rec(u, c, h, url_host(c), 0, 0, _priority(0, 0), 0, None)
        st.pending.add(h)

    for r in range(1, max_rounds + 1):
        if not st.pending:
            break
        pend = [st.frontier[h] for h in st.pending]
        # A6 robots: all pending denied URLs become terminal this round
        denied = [x for x in pend
                  if not allowed(robots_rules.get(x.host), x.url_canon)]
        allowed_recs = [x for x in pend
                        if allowed(robots_rules.get(x.host), x.url_canon)]
        for x in denied:
            x.status = "ROBOTS_DENIED"
            x.fetched_round = r
            st.pending.discard(x.url_hash)

        # A7/A8: per-host top-K by (priority, url_canon) — frozen order
        by_host: Dict[str, List[Rec]] = {}
        for x in allowed_recs:
            by_host.setdefault(x.host, []).append(x)
        selected: List[Rec] = []
        for host in by_host:
            ranked = sorted(by_host[host], key=lambda x: (x.priority, x.url_canon))
            selected.extend(ranked[:budget_per_host])

        # A10-A15 fetch + husk + discover
        candidates: Dict[int, Tuple] = {}  # h -> (depth,dist,p_canon,p_hash,(url_canon,url))
        n_fetched = n_links_total = 0
        for x in selected:
            st.pending.discard(x.url_hash)
            x.fetched_round = r
            html = pages.get(x.url_canon)
            if html is None:
                x.status = "ERROR"
                continue
            x.status = "FETCHED"
            n_fetched += 1
            text, hrefs = husk(html)
            x.text = text
            links = resolve_links(x.url_canon, hrefs)
            x.n_links = len(links)
            n_links_total += len(links)
            for link in links:
                c = canonicalize(link)
                h = url_hash(c)
                key = (x.depth, x.seed_distance, x.url_canon, x.url_hash)
                ukey = (c, link)
                cur = candidates.get(h)
                if cur is None:
                    candidates[h] = [key, ukey]
                else:  # mirror Spark's two independent min(struct(...)) aggs
                    if key < cur[0]:
                        cur[0] = key
                    if ukey < cur[1]:
                        cur[1] = ukey

        # A5 dedupe vs seen (= frontier keys) + A16 append
        n_new = 0
        for h, ((pd_, ps, pc, ph), (c, link)) in sorted(candidates.items()):
            if h in st.frontier:
                continue
            rec = Rec(link, c, h, url_host(c), pd_ + 1, ps + 1,
                      _priority(pd_ + 1, ps + 1), r, ph)
            st.frontier[h] = rec
            st.pending.add(h)
            n_new += 1

        st.rounds.append({
            "round": r,
            "urls_selected": len(selected),
            "urls_fetched": n_fetched,
            "urls_extracted": n_fetched,
            "links_found": n_links_total,
            "links_new": n_new,
            "selected_hashes": sorted(x.url_hash for x in selected),
            "denied_hashes": sorted(x.url_hash for x in denied),
        })
    return st
