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
