"""A6 — robots.txt evaluation (SURVEY §2.A).

The reference checks per-host robots rules before fetching (expected:
alcazar fetcher layer — unverified, reference absent).  Here: the robots
table is tiny (one row per host) ⇒ ``F.broadcast`` joined onto the
frontier on ``host`` [BASELINE.json:6 "robots.txt caching broadcast per
host"], then this pure rule-evaluator runs vectorized inside a pandas UDF.

Missing/unparseable rules ⇒ allowed (frozen spec; standard crawler
behavior for absent robots.txt).
"""

from __future__ import annotations

from typing import Dict, Optional
from urllib.robotparser import RobotFileParser

import pandas as pd

USER_AGENT = "sparkcrawl"


def _parser_for(rules: str) -> RobotFileParser:
    rp = RobotFileParser()
    rp.parse(rules.splitlines())
    return rp


def allowed(rules: Optional[str], url: str) -> bool:
    """Pure: may *url* be fetched under robots *rules* text?"""
    if rules is None or not rules.strip():
        return True
    try:
        return _parser_for(rules).can_fetch(USER_AGENT, url)
    except Exception:
        return True


def crawl_delay(rules: Optional[str]) -> Optional[float]:
    """Crawl-delay (seconds) applying to USER_AGENT, or None.

    Frozen spec: group-aware like the allow/deny parse — a directive
    belongs to the preceding ``User-agent`` group; a group naming our
    agent (substring match) beats ``*``; the FIRST group at the highest
    specificity wins.  Values parse as float (urllib's parser is
    int-only, but sub-second delays are common in the wild)."""
    if rules is None or not rules.strip():
        return None
    best = None  # (specificity, delay); spec 2 = named us, 1 = '*'
    agents: list = []
    in_group_header = False
    for line in rules.splitlines():
        line = line.split("#", 1)[0].strip()
        if not line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            if not in_group_header:
                agents = []
            agents.append(val.lower())
            in_group_header = True
            continue
        in_group_header = False
        if key == "crawl-delay":
            try:
                d = float(val)
            except ValueError:
                continue
            for a in agents:
                spec = 2 if (a and a != "*" and a in USER_AGENT.lower()) \
                    else (1 if a == "*" else 0)
                if spec and (best is None or spec > best[0]):
                    best = (spec, d)
    return best[1] if best else None


def crawl_delay_series(rules: pd.Series) -> pd.Series:
    """Vectorized UDF body for the per-host delay column."""
    return pd.Series([crawl_delay(r) for r in rules], dtype="float64")


def allowed_series(rules: pd.Series, urls: pd.Series) -> pd.Series:
    """Vectorized UDF body: parse each distinct rules-text once per batch."""
    cache: Dict[str, RobotFileParser] = {}
    out = []
    for r, u in zip(rules, urls):
        if r is None or not r.strip():
            out.append(True)
            continue
        rp = cache.get(r)
        if rp is None:
            try:
                rp = _parser_for(r)
            except Exception:
                rp = None
            cache[r] = rp
        try:
            out.append(True if rp is None else rp.can_fetch(USER_AGENT, u))
        except Exception:
            out.append(True)
    return pd.Series(out, dtype=bool)
