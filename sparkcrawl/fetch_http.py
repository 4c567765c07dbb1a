"""A10 — real HTTP fetch path (the production swap for the sandbox
fetch-join, README "what changes on a real deployment").

``fetch_and_husk_http`` has the SAME output contract as
``frontier.fetch_and_husk`` (selected columns + fetched/text/links/lang/
http_status/final_url), so ``CrawlEngine(fetcher="http")`` drops it in
without touching any downstream stage.

Design (the UDF-shaped async fetcher the north star names):

* ``mapInPandas`` over the politeness-bounded selected set — each Arrow
  batch is fetched by a bounded thread pool (stdlib ``urllib`` +
  ``ThreadPoolExecutor``; I/O-bound threads sidestep the GIL), then
  husked with the same frozen extraction spec as the join path, so
  extracted text stays byte-identical regardless of fetcher.
* redirects followed by urllib; ``final_url`` records where the chain
  landed (≠ url_canon ⇒ redirect), ``http_status`` the final code.
* failures NEVER raise across the UDF boundary: HTTP errors carry their
  code, transport errors are -1; ``attempts`` counts tries (bounded
  retries with fixed backoff on transport errors only — 4xx/5xx are
  terminal).
* politeness BELOW round granularity lives here: within an Arrow batch,
  one host's URLs are fetched SERIALLY (per-host concurrency is always
  1 — selection co-partitions by host_bucket, so a batch is often
  single-host and a flat pool would fire pool_size concurrent requests
  at that host) with an optional ``courtesy_delay_s`` minimum interval
  between request starts; distinct hosts proceed in parallel up to
  ``pool_size``.  Per-round volume caps remain the selection stage's
  job (A8).

No network exists in this sandbox; tests drive this module against an
in-process ``http.server`` on 127.0.0.1 (tests/test_http_fetch.py) —
the code path is identical for real hosts.
"""

from __future__ import annotations

import time
import urllib.error
import urllib.parse
import urllib.request
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .extract import husk, resolve_links
from .robots import crawl_delay_series
from .textops import lang_id_text

USER_AGENT = "sparkcrawl/0.2 (+https://example.invalid/bot)"
_RESULT_FIELDS = [
    T.StructField("fetched", T.BooleanType()),
    T.StructField("text", T.StringType()),
    T.StructField("links", T.ArrayType(T.StringType())),
    T.StructField("lang", T.StringType()),
    T.StructField("http_status", T.IntegerType()),
    T.StructField("final_url", T.StringType()),
    T.StructField("attempts", T.IntegerType()),
]


def _fetch_one(url: str, timeout_s: float, retries: int,
               backoff_s: float, max_bytes: int
               ) -> Tuple[Optional[bytes], int, Optional[str], int]:
    """(body|None, http_status, final_url|None, attempts)."""
    attempts = 0
    for attempt in range(retries + 1):
        attempts = attempt + 1
        try:
            req = urllib.request.Request(
                url, headers={"User-Agent": USER_AGENT})
            with urllib.request.urlopen(req, timeout=timeout_s) as resp:
                body = resp.read(max_bytes)
                return body, int(resp.status), resp.geturl(), attempts
        except urllib.error.HTTPError as e:
            # terminal: the server answered (4xx/5xx) — no retry
            return None, int(e.code), e.geturl(), attempts
        except Exception:
            # transport error (refused, timeout, DNS): bounded retry
            if attempt < retries:
                time.sleep(backoff_s * (attempt + 1))
    return None, -1, None, attempts


def with_robots_delay(selected: DataFrame, robots_df: DataFrame) -> DataFrame:
    """Join each selected row's host Crawl-delay (float seconds, None if
    the host's robots.txt declares none) as ``crawl_delay_s`` — the
    tiny robots table broadcasts, same as the A6 allow check."""
    delay_udf = F.pandas_udf(crawl_delay_series, T.DoubleType())
    delays = F.broadcast(robots_df.select(
        "host", delay_udf("rules").alias("crawl_delay_s")))
    return selected.join(delays, "host", "left")


def fetch_and_husk_http(selected: DataFrame,
                        timeout_s: float = 10.0,
                        retries: int = 2,
                        backoff_s: float = 0.2,
                        max_bytes: int = 4 * 1024 * 1024,
                        pool_size: int = 16,
                        courtesy_delay_s: float = 0.0,
                        sniff_lang: bool = True) -> DataFrame:
    """Fetch each selected url_canon over HTTP and husk the body.

    Output schema = selected + (fetched, text, links, lang, http_status,
    final_url, attempts) — a superset of fetch_and_husk's contract
    (attempts is extra).  Rows that fail to fetch come back with
    fetched=false (the join path drops misses instead); to_extracted
    filters on fetched either way.

    Politeness: one host's URLs are fetched serially, ≥
    ``courtesy_delay_s`` seconds between request STARTS (crawl-delay
    analog); distinct hosts run in parallel on the thread pool.  A
    ``crawl_delay_s`` column (joined on by ``with_robots_delay`` from
    the robots table) raises the interval per host: the effective
    delay is max(courtesy_delay_s, host's robots Crawl-delay).
    """
    schema = T.StructType(list(selected.schema.fields) + _RESULT_FIELDS)

    def fetch_host_serial(job):
        # per-host worker: serial requests, min-interval pacing
        delay, idx_urls = job
        out = []
        next_ok = 0.0
        for i, u in idx_urls:
            if delay > 0:
                wait = next_ok - time.monotonic()
                if wait > 0:
                    time.sleep(wait)
            next_ok = time.monotonic() + delay
            out.append((i, _fetch_one(u, timeout_s, retries,
                                      backoff_s, max_bytes)))
        return out

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            urls = list(b["url_canon"])
            hosts = (list(b["host"]) if "host" in b.columns
                     else [urllib.parse.urlsplit(u).netloc for u in urls])
            rdel = (b["crawl_delay_s"] if "crawl_delay_s" in b.columns
                    else None)
            by_host: dict = {}
            for i, (u, h) in enumerate(zip(urls, hosts)):
                d = by_host.setdefault(h, [courtesy_delay_s, []])
                if rdel is not None and pd.notna(rdel.iloc[i]):
                    d[0] = max(d[0], float(rdel.iloc[i]))
                d[1].append((i, u))
            with ThreadPoolExecutor(max_workers=pool_size) as pool:
                raw_idx = [r for host_out in
                           pool.map(fetch_host_serial, by_host.values())
                           for r in host_out]
            raw = [res for _, res in sorted(raw_idx, key=lambda x: x[0])]
            out = b.copy()
            fetched, texts, links, statuses, finals, tries, langs = \
                [], [], [], [], [], [], []
            for url, (body, status, final, n_try) in zip(urls, raw):
                ok = body is not None and 200 <= status < 300
                fetched.append(ok)
                statuses.append(status)
                finals.append(final)
                tries.append(n_try)
                if ok:
                    text, hrefs = husk(body)
                    texts.append(text)
                    links.append(resolve_links(final or url, hrefs))
                    # the wire carries no lang column; fill it at ingest
                    # with the same frozen heuristic as text_lang_id
                    langs.append(lang_id_text(text) if sniff_lang else None)
                else:
                    texts.append(None)
                    links.append([])
                    langs.append(None)
            out["fetched"] = fetched
            out["text"] = texts
            out["links"] = links
            out["lang"] = langs
            out["http_status"] = pd.array(statuses, dtype="int32")
            out["final_url"] = finals
            out["attempts"] = pd.array(tries, dtype="int32")
            yield out

    return selected.mapInPandas(run, schema)
