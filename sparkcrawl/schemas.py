"""Fixed StructType schemas for every table the engine touches (SURVEY §1.2).

The reference (alcazar) is row-oriented with dynamic Python types
(expected: alcazar/datastructures.py — unverified, reference absent); our
model is columnar with fixed schemas — the intentional architecture
divergence for Spark.
"""

from __future__ import annotations

from pyspark.sql import types as T

# input: Common-Crawl-style pages table — shape fixed by BASELINE.json:15.
PAGES = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

# core crawl state: the URL frontier (Icebergish table, partitioned by
# host_bucket).  status ∈ PENDING|FETCHED|ROBOTS_DENIED|ERROR.
FRONTIER = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("url_canon", T.StringType(), False),
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("host_bucket", T.IntegerType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("seed_distance", T.IntegerType(), False),
        T.StructField("priority", T.DoubleType(), False),
        T.StructField("discovered_round", T.IntegerType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("lineage_src_url_hash", T.LongType(), True),
    ]
)

# per-host-bucket Bloom filters over url_hash (the distributed seen-set).
SEEN_SET = T.StructType(
    [
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("round", T.IntegerType(), False),
        T.StructField("bloom", T.BinaryType(), False),
        T.StructField("n_items", T.LongType(), False),
        T.StructField("fpp", T.DoubleType(), False),
    ]
)

# robots.txt rules per host — small, broadcast.
ROBOTS = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("fetched_ts", T.TimestampType(), True),
        T.StructField("rules", T.StringType(), True),
    ]
)

# seed list.
SEEDS = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("priority", T.DoubleType(), True),
    ]
)

# append-only per-round, per-partition metrics (resumability + bench).
METRICS = T.StructType(
    [
        T.StructField("round", T.IntegerType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("urls_selected", T.LongType(), False),
        T.StructField("urls_denied", T.LongType(), False),
        T.StructField("urls_fetched", T.LongType(), False),
        T.StructField("urls_extracted", T.LongType(), False),
        T.StructField("links_found", T.LongType(), False),
        T.StructField("links_new", T.LongType(), False),
        T.StructField("wall_ms", T.LongType(), False),
    ]
)

# fetched+extracted page output per round.  http_status/final_url carry
# HTTP-layer semantics (redirect chains land on final_url ≠ url_canon);
# the sandbox fetch-join synthesizes 200/url_canon, the real
# fetch_http path fills them from the wire.
EXTRACTED = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("url_canon", T.StringType(), False),
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("round", T.IntegerType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("seed_distance", T.IntegerType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("n_links", T.IntegerType(), False),
        T.StructField("links", T.ArrayType(T.StringType()), True),
        T.StructField("http_status", T.IntegerType(), True),
        T.StructField("final_url", T.StringType(), True),
        # fetch attempts incl. retries (fetch_http transport retries;
        # always 1 under the sandbox fetch-join)
        T.StructField("attempts", T.IntegerType(), True),
        # the table records every ATTEMPTED fetch (a fetch-results log);
        # rows with fetched=false carry the failure's http_status and no
        # text/links.  The broadcast fetch-join can't surface misses
        # (inner join), so there they appear only in fetchlog as ERROR.
        T.StructField("fetched", T.BooleanType(), False),
    ]
)

# terminal status log: one row per URL leaving PENDING
# (status ∈ FETCHED|ROBOTS_DENIED|ERROR; at most one row per url_hash).
# http_status: 200.. from the wire (join mode: 200), -1 unreachable/miss,
# 0 never attempted (robots).  attempts: fetch attempts incl. retries.
FETCHLOG = T.StructType(
    [
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("host_bucket", T.IntegerType(), False),
        T.StructField("round", T.IntegerType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("http_status", T.IntegerType(), True),
        T.StructField("attempts", T.IntegerType(), True),
    ]
)
