"""§2.B relational-operator inventory + §2.D training-data ops, exposed
through the driver contract (__spark_entry__.queries / oracle_sql).

Every query is a named, thin, *declarative* DataFrame program (Catalyst
does pushdown/pruning/join-selection); each has a DuckDB-ANSI oracle
unless the op is genuinely non-SQL-expressible (noted per query).
Column names are aliased identically on both sides (driver compares
sorted-by-name columns + order-insensitive value hash).

Float discipline: any aggregate over doubles is rounded on BOTH sides to
a fixed scale so engine summation order can't flip the value hash.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import q, t


# =========================================================================
# Scans / projection / filter
# =========================================================================

@q("scan_filter_project", """
SELECT l_orderkey, l_linenumber,
       CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,2))
                  * (1 - CAST(l_discount AS DECIMAL(18,2))), 2) AS DOUBLE)
         AS net_price
FROM lineitem
WHERE l_shipdate < TIMESTAMP '1995-06-01' AND l_quantity > 45
""")
def scan_filter_project(spark, sf):
    """Row-level arithmetic goes through exact decimals: double ROUND ties
    (x.xx5) resolve differently between engines; decimal ROUND doesn't."""
    li = t(spark, sf, "lineitem")
    net = (F.col("l_extendedprice").cast("decimal(18,2)")
           * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)")))
    return (
        li.filter((F.col("l_shipdate") < "1995-06-01") & (F.col("l_quantity") > 45))
        .select("l_orderkey", "l_linenumber",
                F.round(net, 2).cast("double").alias("net_price"))
    )


@q("nullsafe_eq", """
SELECT o_orderkey FROM orders
WHERE (CASE WHEN o_orderstatus = 'O' THEN NULL ELSE o_orderstatus END)
      IS NOT DISTINCT FROM NULL
""")
def nullsafe_eq(spark, sf):
    o = t(spark, sf, "orders").withColumn(
        "s", F.when(F.col("o_orderstatus") == "O", None)
        .otherwise(F.col("o_orderstatus")))
    return o.filter(F.col("s").eqNullSafe(F.lit(None).cast("string"))) \
        .select("o_orderkey")


# =========================================================================
# Aggregation
# =========================================================================

@q("agg_pricing_summary", """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2)                                   AS sum_qty,
       ROUND(SUM(l_extendedprice), 2)                              AS sum_base,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)           AS sum_disc,
       ROUND(AVG(l_quantity), 4)                                   AS avg_qty,
       MIN(l_quantity)                                             AS min_qty,
       MAX(l_quantity)                                             AS max_qty,
       COUNT(*)                                                    AS n_rows
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
""")
def agg_pricing_summary(spark, sf):
    """TPC-H Q1-shaped: partial (map-side) + final agg is Catalyst-automatic."""
    li = t(spark, sf, "lineitem").filter(F.col("l_shipdate") <= "1998-09-01")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
        .alias("sum_disc"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.count("*").alias("n_rows"),
    )


@q("agg_count_distinct", """
SELECT o_orderpriority,
       COUNT(DISTINCT o_custkey) AS n_custs,
       COUNT(*) AS n_orders
FROM orders GROUP BY o_orderpriority
""")
def agg_count_distinct(spark, sf):
    return t(spark, sf, "orders").groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_custs"),
        F.count("*").alias("n_orders"))


@q("agg_approx_count_distinct")  # approx value is engine-specific → rows-only
def agg_approx_count_distinct(spark, sf):
    """approx_count_distinct (HLL++) — the frontier-cardinality estimator
    (SURVEY §2.B hash/approx row). No SQL oracle: estimates are
    engine-specific; driver records the rows-only check."""
    return t(spark, sf, "lineitem").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.approx_count_distinct("l_orderkey").alias("approx_orders"))


@q("agg_rollup", """
SELECT r_name, n_name, COUNT(*) AS n, ROUND(SUM(c_acctbal), 2) AS bal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
""")
def agg_rollup(spark, sf):
    c, n, r = (t(spark, sf, x) for x in ("customer", "nation", "region"))
    joined = (c.join(n, c.c_nationkey == n.n_nationkey)
              .join(r, n.n_regionkey == r.r_regionkey))
    return joined.rollup("r_name", "n_name").agg(
        F.count("*").alias("n"), F.round(F.sum("c_acctbal"), 2).alias("bal"))


@q("agg_cube", """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
""")
def agg_cube(spark, sf):
    return t(spark, sf, "orders").cube("o_orderstatus", "o_orderpriority") \
        .agg(F.count("*").alias("n"))


@q("agg_grouping_sets", """
SELECT c_mktsegment, c_nationkey, COUNT(*) AS n
FROM customer GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))
""")
def agg_grouping_sets(spark, sf):
    c = t(spark, sf, "customer")
    c.createOrReplaceTempView("_gs_customer")
    return spark.sql("""
        SELECT c_mktsegment, c_nationkey, COUNT(*) AS n
        FROM _gs_customer GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))
    """)


# =========================================================================
# Joins
# =========================================================================

@q("join_inner", """
SELECT c_mktsegment, COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
""")
def join_inner(spark, sf):
    o, c = t(spark, sf, "orders"), t(spark, sf, "customer")
    return (o.join(c, o.o_custkey == c.c_custkey)
            .groupBy("c_mktsegment")
            .agg(F.count("*").alias("n_orders"),
                 F.round(F.sum("o_totalprice"), 2).alias("revenue")))


@q("join_left_outer", """
SELECT c_custkey, COUNT(o_orderkey) AS n_orders
FROM customer LEFT JOIN orders ON o_custkey = c_custkey
GROUP BY c_custkey
""")
def join_left_outer(spark, sf):
    o, c = t(spark, sf, "orders"), t(spark, sf, "customer")
    return (c.join(o, o.o_custkey == c.c_custkey, "left")
            .groupBy("c_custkey").agg(F.count("o_orderkey").alias("n_orders")))


@q("join_full_outer", """
WITH a AS (SELECT o_custkey AS k, COUNT(*) AS n_ord FROM orders GROUP BY 1),
     b AS (SELECT c_custkey AS k, COUNT(*) AS n_cust FROM customer GROUP BY 1)
SELECT COALESCE(a.k, b.k) AS k,
       COALESCE(n_ord, 0) AS n_ord, COALESCE(n_cust, 0) AS n_cust
FROM a FULL OUTER JOIN b ON a.k = b.k
""")
def join_full_outer(spark, sf):
    o = t(spark, sf, "orders").groupBy(F.col("o_custkey").alias("k")) \
        .agg(F.count("*").alias("n_ord"))
    c = t(spark, sf, "customer").groupBy(F.col("c_custkey").alias("k")) \
        .agg(F.count("*").alias("n_cust"))
    return (o.join(c, "k", "full")
            .select(F.col("k"),
                    F.coalesce("n_ord", F.lit(0)).alias("n_ord"),
                    F.coalesce("n_cust", F.lit(0)).alias("n_cust")))


@q("join_semi", """
SELECT c_custkey FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
              AND o_totalprice > 100000)
""")
def join_semi(spark, sf):
    o = t(spark, sf, "orders").filter(F.col("o_totalprice") > 100000)
    c = t(spark, sf, "customer")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey")


@q("join_anti", """
SELECT c_custkey FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderpriority = '1-URGENT')
""")
def join_anti(spark, sf):
    """left_anti — the A5 seen-set dedupe primitive."""
    o = t(spark, sf, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    c = t(spark, sf, "customer")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey")


@q("join_broadcast_dim", """
SELECT n_name, r_name, COUNT(*) AS n_cust
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY n_name, r_name
""")
def join_broadcast_dim(spark, sf):
    """Small dims broadcast explicitly (the A6 robots-join pattern)."""
    c = t(spark, sf, "customer")
    n = F.broadcast(t(spark, sf, "nation"))
    r = F.broadcast(t(spark, sf, "region"))
    return (c.join(n, c.c_nationkey == n.n_nationkey)
            .join(r, n.n_regionkey == r.r_regionkey)
            .groupBy("n_name", "r_name").agg(F.count("*").alias("n_cust")))


@q("join_range_theta", """
SELECT a.event_id, COUNT(*) AS n_following
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
GROUP BY a.event_id
""")
def join_range_theta(spark, sf):
    """Equi key + range predicate: same-user events within the hour after
    each event (non-equi self-join)."""
    e = t(spark, sf, "events")
    a = e.select(F.col("event_id"), F.col("user_id").alias("ua"),
                 F.col("ts").alias("ta"))
    b = e.select(F.col("user_id").alias("ub"), F.col("ts").alias("tb"))
    cond = ((a.ua == b.ub) & (b.tb > a.ta)
            & (b.tb <= F.col("ta") + F.expr("INTERVAL 1 HOUR")))
    return a.join(b, cond).groupBy("event_id") \
        .agg(F.count("*").alias("n_following"))


@q("join_asof", """
SELECT event_id, o_orderkey AS last_order FROM (
  SELECT event_id, o.o_orderkey,
         ROW_NUMBER() OVER (PARTITION BY event_id
                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
  FROM events e JOIN orders o
    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
) WHERE rn = 1
""")
def join_asof(spark, sf):
    """As-of join (most recent order ≤ each event's time, per user) —
    Spark has no builtin ASOF.  Expressed as a union-and-window merge:
    tag orders (kind 0) and events (kind 1), sort per user by
    (time, kind, orderkey), and carry the last order seen so far.  One
    shuffle on user_id, intermediate size = |events| + |orders| — the
    round-1 range-join + top-1 window expanded to |orders_before_event|
    rows per event (10^8 for a 10^4×10^4 power user) before pruning.
    Ordering makes the semantics exact: at equal timestamps orders sort
    before events (kind) so the join bound is <=, and ascending orderkey
    makes the last same-date order the max key (= ORDER BY date DESC,
    key DESC top-1)."""
    o, e = t(spark, sf, "orders"), t(spark, sf, "events")
    orders = (o.filter(F.col("o_custkey").isNotNull()
                       & F.col("o_orderdate").isNotNull())
              .select(F.col("o_custkey").alias("user_id"),
                      F.col("o_orderdate").alias("t"),
                      F.lit(0).alias("kind"),
                      F.col("o_orderkey").alias("okey"),
                      F.lit(None).cast("long").alias("event_id")))
    events = (e.filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
              .select("user_id", F.col("ts").alias("t"),
                      F.lit(1).alias("kind"),
                      F.lit(None).cast("long").alias("okey"),
                      "event_id"))
    w = (Window.partitionBy("user_id")
         .orderBy(F.col("t"), F.col("kind"), F.col("okey"))
         .rowsBetween(Window.unboundedPreceding, 0))
    merged = orders.unionByName(events).withColumn(
        "last_order", F.last("okey", ignorenulls=True).over(w))
    return (merged.filter((F.col("kind") == 1)
                          & F.col("last_order").isNotNull())
            .select("event_id", "last_order"))


@q("join_cross", """
SELECT r1.r_name AS a, r2.r_name AS b
FROM region r1 CROSS JOIN region r2 WHERE r1.r_regionkey < r2.r_regionkey
""")
def join_cross(spark, sf):
    r1 = t(spark, sf, "region").alias("r1")
    r2 = t(spark, sf, "region").alias("r2")
    return (r1.crossJoin(r2)
            .filter(F.col("r1.r_regionkey") < F.col("r2.r_regionkey"))
            .select(F.col("r1.r_name").alias("a"), F.col("r2.r_name").alias("b")))


@q("scalar_subquery", """
SELECT c_custkey, ROUND(c_acctbal, 2) AS bal FROM customer
WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
""")
def scalar_subquery(spark, sf):
    c = t(spark, sf, "customer")
    avg_bal = c.agg(F.avg("c_acctbal").alias("a"))
    return (c.join(F.broadcast(avg_bal))
            .filter(F.col("c_acctbal") > F.col("a"))
            .select("c_custkey", F.round("c_acctbal", 2).alias("bal")))


# =========================================================================
# Windows / sort / top-k
# =========================================================================

@q("window_rank_topk", """
SELECT c_custkey, o_orderkey, rk FROM (
  SELECT o_custkey AS c_custkey, o_orderkey,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rk
  FROM orders
) WHERE rk <= 3
""")
def window_rank_topk(spark, sf):
    """Per-group top-K — the A8 politeness-selection pattern."""
    o = t(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(),
                                                F.col("o_orderkey"))
    return (o.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 3)
            .select(F.col("o_custkey").alias("c_custkey"), "o_orderkey", "rk"))


@q("window_rank_dense", """
SELECT o_orderkey,
       RANK()       OVER (PARTITION BY o_orderstatus ORDER BY o_orderpriority) AS rnk,
       DENSE_RANK() OVER (PARTITION BY o_orderstatus ORDER BY o_orderpriority) AS drnk
FROM orders
""")
def window_rank_dense(spark, sf):
    o = t(spark, sf, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_orderpriority")
    return o.select("o_orderkey", F.rank().over(w).alias("rnk"),
                    F.dense_rank().over(w).alias("drnk"))


@q("window_lag_lead", """
SELECT event_id,
       LAG(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_v,
       LEAD(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_v
FROM events
""")
def window_lag_lead(spark, sf):
    e = t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select("event_id", F.lag("value").over(w).alias("prev_v"),
                    F.lead("value").over(w).alias("next_v"))


@q("window_running_sum", """
SELECT event_id,
       ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
       AS running_v
FROM events
""")
def window_running_sum(spark, sf):
    e = t(spark, sf, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return e.select("event_id", F.round(F.sum("value").over(w), 2)
                    .alias("running_v"))


@q("window_range_frame", """
SELECT o_orderkey,
       COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                      RANGE BETWEEN 1000 PRECEDING AND 1000 FOLLOWING) AS n_near
FROM orders
""")
def window_range_frame(spark, sf):
    o = t(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice") \
        .rangeBetween(-1000, 1000)
    return o.select("o_orderkey", F.count("*").over(w).alias("n_near"))


@q("sort_limit_topn", """
SELECT o_orderkey, ROUND(o_totalprice, 2) AS price
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
""")
def sort_limit_topn(spark, sf):
    return (t(spark, sf, "orders")
            .orderBy(F.col("o_totalprice").desc(), "o_orderkey").limit(100)
            .select("o_orderkey", F.round("o_totalprice", 2).alias("price")))


# =========================================================================
# Set ops / distinct
# =========================================================================

@q("set_union_intersect_except", """
WITH big AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000),
     auto AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE')
SELECT 'union' AS op, c_custkey FROM (SELECT * FROM big UNION SELECT * FROM auto)
UNION ALL
SELECT 'intersect', c_custkey FROM (SELECT * FROM big INTERSECT SELECT * FROM auto)
UNION ALL
SELECT 'except', c_custkey FROM (SELECT * FROM big EXCEPT SELECT * FROM auto)
""")
def set_union_intersect_except(spark, sf):
    c = t(spark, sf, "customer")
    big = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    auto = c.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_custkey")
    return (
        big.union(auto).distinct().select(F.lit("union").alias("op"), "c_custkey")
        .unionAll(big.intersect(auto)
                  .select(F.lit("intersect").alias("op"), "c_custkey"))
        .unionAll(big.exceptAll(auto).distinct()
                  .select(F.lit("except").alias("op"), "c_custkey"))
    )


@q("distinct_rows", """
SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
""")
def distinct_rows(spark, sf):
    return t(spark, sf, "orders").select("o_orderstatus", "o_orderpriority") \
        .distinct()


# =========================================================================
# Strings / regex / url
# =========================================================================

@q("string_funcs", """
SELECT c_custkey,
       LOWER(c_name)  AS lo, UPPER(c_name) AS up,
       TRIM(c_name)   AS tr, LENGTH(c_name) AS ln,
       SUBSTR(c_name, 1, 8) AS pre,
       c_name || '#' || c_mktsegment AS cat,
       SPLIT_PART(c_name, '#', 1) AS first_tok
FROM customer
""")
def string_funcs(spark, sf):
    c = t(spark, sf, "customer")
    return c.select(
        "c_custkey",
        F.lower("c_name").alias("lo"), F.upper("c_name").alias("up"),
        F.trim(F.col("c_name")).alias("tr"), F.length("c_name").alias("ln"),
        F.substring("c_name", 1, 8).alias("pre"),
        F.concat_ws("#", "c_name", "c_mktsegment").alias("cat"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(1)).alias("first_tok"))


@q("regexp_ops", """
SELECT p_partkey,
       regexp_extract(p_type, '([A-Z]+)', 1) AS first_word,
       regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled
FROM part
""")
def regexp_ops(spark, sf):
    p = t(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_type", r"([A-Z]+)", 1).alias("first_word"),
        F.regexp_replace("p_name", r"[aeiou]", "_").alias("devoweled"))


@q("parse_url_host", """
SELECT doc_id,
       regexp_extract(u, '^[a-z]+://([^/]+)', 1) AS host,
       regexp_extract(u, '^[a-z]+://[^/]+(/[^?#]*)', 1) AS path
FROM (SELECT doc_id, 'http://docs' || (doc_id % 10) || '.example/d/' || doc_id AS u
      FROM documents)
""")
def parse_url_host(spark, sf):
    """Spark's parse_url builtin (A2's cheap path); oracle re-derives with
    portable regexes."""
    d = t(spark, sf, "documents").select(
        "doc_id",
        F.concat(F.lit("http://docs"), F.col("doc_id") % 10,
                 F.lit(".example/d/"), F.col("doc_id")).alias("u"))
    return d.select(
        "doc_id",
        F.parse_url("u", F.lit("HOST")).alias("host"),
        F.parse_url("u", F.lit("PATH")).alias("path"))


@q("hash_md5", """
SELECT doc_id, md5(text) AS text_md5 FROM documents
""")
def hash_md5(spark, sf):
    return t(spark, sf, "documents").select(
        "doc_id", F.md5(F.encode("text", "UTF-8")).alias("text_md5"))


@q("hash_xxhash64")  # DuckDB has no xxhash64 → rows-only
def hash_xxhash64(spark, sf):
    """A3's JVM-side hash; cross-checked against the pure-Python XXH64 in
    tests/test_hashing.py instead of a SQL oracle."""
    return t(spark, sf, "documents").select(
        "doc_id", F.xxhash64("text").alias("h"))


# =========================================================================
# Date / time
# =========================================================================

@q("date_trunc_agg", """
SELECT date_trunc('month', o_orderdate) AS month, COUNT(*) AS n,
       ROUND(SUM(o_totalprice), 2) AS rev
FROM orders GROUP BY 1
""")
def date_trunc_agg(spark, sf):
    return (t(spark, sf, "orders")
            .groupBy(F.date_trunc("month", "o_orderdate").alias("month"))
            .agg(F.count("*").alias("n"),
                 F.round(F.sum("o_totalprice"), 2).alias("rev")))


@q("datediff_extract", """
SELECT o_orderkey,
       date_diff('day', o_orderdate, TIMESTAMP '1996-01-01') AS days_to_96,
       EXTRACT(year FROM o_orderdate) AS yr,
       EXTRACT(month FROM o_orderdate) AS mo
FROM orders
""")
def datediff_extract(spark, sf):
    o = t(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.datediff(F.lit("1996-01-01").cast("date"),
                   F.col("o_orderdate").cast("date")).alias("days_to_96"),
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mo"))


@q("tumbling_window", """
SELECT date_trunc('hour', ts) AS ws, COUNT(*) AS n,
       ROUND(SUM(value), 2) AS v
FROM events GROUP BY 1
""")
def tumbling_window(spark, sf):
    """F.window tumbling agg — the Structured-Streaming windowed-agg shape
    run over a bounded source (crawl rounds are the synchronous analog)."""
    e = t(spark, sf, "events")
    return (e.groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("v"))
            .select(F.col("w.start").alias("ws"), "n", "v"))


@q("sliding_window", """
WITH slides AS (SELECT 0 AS i UNION ALL SELECT 1)
SELECT date_trunc('hour', ts)
       + (CASE WHEN EXTRACT(minute FROM ts) >= 30
               THEN INTERVAL 30 MINUTE ELSE INTERVAL 0 MINUTE END)
       - (CASE WHEN i = 1 THEN INTERVAL 30 MINUTE ELSE INTERVAL 0 MINUTE END)
       AS ws, COUNT(*) AS n
FROM events, slides
GROUP BY 1
""")
def sliding_window(spark, sf):
    """1h window sliding every 30min — each event lands in 2 windows."""
    e = t(spark, sf, "events")
    return (e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
            .agg(F.count("*").alias("n"))
            .select(F.col("w.start").alias("ws"), "n"))


@q("session_window", """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE OR
                   LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM events),
sess AS (
  SELECT user_id, ts,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked)
SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
FROM sess GROUP BY user_id, sid
""")
def session_window(spark, sf):
    """F.session_window (30min gap) vs the classic gaps-and-islands SQL."""
    e = t(spark, sf, "events")
    return (e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
            .agg(F.count("*").alias("n_events"))
            .select("user_id", F.col("w.start").alias("session_start"),
                    "n_events"))


# =========================================================================
# Math / JSON / arrays
# =========================================================================

@q("math_funcs", """
SELECT l_orderkey, l_linenumber,
       ROUND(l_extendedprice, 1) AS r1,
       ABS(l_discount - 0.05) AS ad,
       CAST(l_orderkey % 7 AS BIGINT) AS m7,
       ROUND(LN(l_extendedprice), 6) AS lnp,
       CAST(FLOOR(l_quantity) AS BIGINT) AS fq,
       CAST(CEIL(l_quantity) AS BIGINT) AS cq,
       ROUND(SQRT(l_extendedprice), 6) AS sq,
       POWER(2, l_linenumber) AS p2
FROM lineitem WHERE l_orderkey < 1000
""")
def math_funcs(spark, sf):
    li = t(spark, sf, "lineitem").filter(F.col("l_orderkey") < 1000)
    return li.select(
        "l_orderkey", "l_linenumber",
        F.round("l_extendedprice", 1).alias("r1"),
        F.abs(F.col("l_discount") - 0.05).alias("ad"),
        F.pmod("l_orderkey", F.lit(7)).alias("m7"),
        F.round(F.log("l_extendedprice"), 6).alias("lnp"),
        F.floor("l_quantity").alias("fq"),
        F.ceil("l_quantity").alias("cq"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("sq"),
        F.pow(F.lit(2), F.col("l_linenumber")).alias("p2"))


@q("json_extract", """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
FROM events
""")
def json_extract(spark, sf):
    return t(spark, sf, "events").select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"))


@q("array_ops", """
SELECT vec_id, CAST(len(embedding) AS INT) AS dim,
       ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_v,
       ROUND(list_aggregate(list_transform(embedding,
             x -> CAST(x AS DOUBLE) * 2), 'sum'), 4) AS sum2x
FROM embeddings
""")
def array_ops(spark, sf):
    """size / element_at / higher-order transform + aggregate (sequential
    left-fold in double on both engines → bit-stable)."""
    e = t(spark, sf, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_v"),
        F.round(F.aggregate(
            F.transform("embedding", lambda x: x.cast("double") * 2),
            F.lit(0.0), lambda acc, x: acc + x), 4).alias("sum2x"))


@q("explode_words", """
SELECT w, COUNT(*) AS n FROM (
  SELECT unnest(string_split(p_name, ' ')) AS w FROM part
) GROUP BY w
""")
def explode_words(spark, sf):
    p = t(spark, sf, "part")
    return (p.select(F.explode(F.split("p_name", " ")).alias("w"))
            .groupBy("w").agg(F.count("*").alias("n")))


@q("pivot_segments", """
SELECT c_nationkey,
       COUNT(*) FILTER (WHERE c_mktsegment = 'AUTOMOBILE') AS automobile,
       COUNT(*) FILTER (WHERE c_mktsegment = 'BUILDING')   AS building,
       COUNT(*) FILTER (WHERE c_mktsegment = 'MACHINERY')  AS machinery
FROM customer GROUP BY c_nationkey
""")
def pivot_segments(spark, sf):
    """Pivot (wide aggregation) with an explicit value list — the
    fixed-column form is what survives at scale (no driver-side distinct
    pass to discover pivot values)."""
    c = t(spark, sf, "customer")
    return (
        c.groupBy("c_nationkey")
        .pivot("c_mktsegment", ["AUTOMOBILE", "BUILDING", "MACHINERY"])
        .agg(F.count(F.lit(1)))
        .select("c_nationkey",
                F.coalesce("AUTOMOBILE", F.lit(0)).alias("automobile"),
                F.coalesce("BUILDING", F.lit(0)).alias("building"),
                F.coalesce("MACHINERY", F.lit(0)).alias("machinery"))
    )


@q("percentile_prices", """
SELECT o_orderpriority,
       ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
       ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90
FROM orders GROUP BY o_orderpriority
""")
def percentile_prices(spark, sf):
    """Exact interpolated percentiles (Spark `percentile` ≡ DuckDB
    quantile_cont); the approximate t-digest path is
    agg_approx_count_distinct's HLL analog and stays engine-specific."""
    o = t(spark, sf, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90"))


@q("window_ntile_cume", """
SELECT o_orderkey, o_orderpriority,
       NTILE(4) OVER w AS tile,
       ROUND(PERCENT_RANK() OVER w, 6) AS prank,
       ROUND(CUME_DIST() OVER w, 6) AS cdist
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority
             ORDER BY o_totalprice, o_orderkey)
""")
def window_ntile_cume(spark, sf):
    """Distribution window functions (the remaining window family
    members): quartile bucket (NTILE), PERCENT_RANK, CUME_DIST per
    priority group, fully deterministic via the orderkey tie-break.
    Same scale shape as every other window op: one hash shuffle on the
    partition key, in-partition sort."""
    o = t(spark, sf, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice",
                                                      "o_orderkey")
    return o.select(
        "o_orderkey", "o_orderpriority",
        F.ntile(4).over(w).alias("tile"),
        F.round(F.percent_rank().over(w), 6).alias("prank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"))


@q("unpivot_metrics", """
WITH m AS (
  SELECT 'l_quantity' AS metric, l_quantity AS v FROM lineitem
  UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
  UNION ALL SELECT 'l_discount', l_discount FROM lineitem
  UNION ALL SELECT 'l_tax', l_tax FROM lineitem)
SELECT metric, COUNT(*) AS n, ROUND(SUM(v), 2) AS total
FROM m GROUP BY metric
""")
def unpivot_metrics(spark, sf):
    """UNPIVOT/melt (the inverse of pivot_segments): wide measure
    columns to long (metric, value) rows via Spark's native `unpivot`,
    then a per-metric rollup.  The melt is a zero-shuffle narrow map
    (each input row emits 4); only the metrics-sized agg shuffles."""
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    li = t(spark, sf, "lineitem").select(*cols)
    m = li.unpivot([], cols, "metric", "v")
    return m.groupBy("metric").agg(
        F.count("*").alias("n"),
        F.round(F.sum("v"), 2).alias("total"))


@q("agg_histogram", """
SELECT CAST(FLOOR(o_totalprice / 25000) AS INT) AS bin,
       COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total
FROM orders GROUP BY 1
""")
def agg_histogram(spark, sf):
    """Fixed-width histogram binning (profiling staple): bin id is a
    pure map-side expression, so the whole histogram is one
    map-side-combinable agg — bins × partials shuffle, never rows.
    Frozen bin width (no data-driven min/max scan) keeps the binning a
    single pass and the oracle arithmetic identical."""
    o = t(spark, sf, "orders")
    return (o.groupBy(F.floor(F.col("o_totalprice") / 25000).cast("int")
                      .alias("bin"))
            .agg(F.count("*").alias("n"),
                 F.round(F.sum("o_totalprice"), 2).alias("total")))


@q("orders_sessionize", """
WITH seq AS (
  SELECT o_custkey, o_orderkey, o_orderdate,
         LAG(o_orderdate) OVER w AS prev_date
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
flagged AS (
  SELECT *, CASE WHEN prev_date IS NULL
                 OR date_diff('day', prev_date, o_orderdate) > 30
                 THEN 1 ELSE 0 END AS new_session
  FROM seq),
sess AS (
  SELECT o_custkey, o_orderkey, o_orderdate,
         CAST(SUM(new_session) OVER (PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS session_id
  FROM flagged)
SELECT o_custkey, session_id, COUNT(*) AS n_orders,
       MIN(o_orderdate) AS first_date, MAX(o_orderdate) AS last_date
FROM sess GROUP BY o_custkey, session_id
""")
def orders_sessionize(spark, sf):
    """Gap-based sessionization (the 'islands' problem): per customer,
    consecutive orders ≤30 days apart form one session — lag the
    order date, flag gap starts, running-sum the flags into session
    ids, roll up per session.  The batch twin of the streaming
    session_window, expressed purely with windows (one hash shuffle on
    the customer key; both windows share the partitioning so Catalyst
    plans a single sort)."""
    o = t(spark, sf, "orders").select("o_custkey", "o_orderkey",
                                      "o_orderdate")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate",
                                                "o_orderkey")
    flagged = o.withColumn(
        "new_session",
        F.when(F.lag("o_orderdate").over(w).isNull()
               | (F.datediff("o_orderdate",
                             F.lag("o_orderdate").over(w)) > 30), 1)
        .otherwise(0))
    sess = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    return (sess.groupBy("o_custkey", "session_id")
            .agg(F.count("*").alias("n_orders"),
                 F.min("o_orderdate").alias("first_date"),
                 F.max("o_orderdate").alias("last_date")))


@q("window_first_last", """
SELECT o_orderkey, o_orderpriority,
       FIRST_VALUE(o_totalprice) OVER w AS cheapest,
       LAST_VALUE(o_totalprice) OVER w AS priciest,
       NTH_VALUE(o_totalprice, 2) OVER w AS second_cheapest
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority
             ORDER BY o_totalprice, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""")
def window_first_last(spark, sf):
    """FIRST_VALUE / LAST_VALUE / NTH_VALUE over the full-partition
    frame (the frame-navigation trio the window family still lacked),
    orderkey tie-broken for determinism."""
    o = t(spark, sf, "orders")
    w = (Window.partitionBy("o_orderpriority")
         .orderBy("o_totalprice", "o_orderkey")
         .rowsBetween(Window.unboundedPreceding,
                      Window.unboundedFollowing))
    return o.select(
        "o_orderkey", "o_orderpriority",
        F.first("o_totalprice").over(w).alias("cheapest"),
        F.last("o_totalprice").over(w).alias("priciest"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_cheapest"))


@q("events_resample_ffill", """
WITH ev AS (
  SELECT user_id, ts, value, event_id FROM events
  WHERE ts >= TIMESTAMP '2024-01-08' AND ts < TIMESTAMP '2024-01-15'),
hourly AS (
  SELECT user_id, hr, value FROM (
    SELECT user_id, date_trunc('hour', ts) AS hr, value,
           ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM ev) WHERE rn = 1),
span AS (SELECT user_id, MIN(hr) AS h0, MAX(hr) AS h1
         FROM hourly GROUP BY user_id),
grid AS (SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR))
                AS hr
         FROM span),
joined AS (
  SELECT g.user_id, g.hr, h.value,
         CASE WHEN h.value IS NULL THEN 1 ELSE 0 END AS is_gap
  FROM grid g LEFT JOIN hourly h
    ON h.user_id = g.user_id AND h.hr = g.hr)
SELECT user_id, hr,
       LAST_VALUE(value IGNORE NULLS) OVER (PARTITION BY user_id
         ORDER BY hr ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS v_ffill,
       is_gap
FROM joined
""")
def events_resample_ffill(spark, sf):
    """Time-series resampling with forward fill (the gap-fill every
    metrics/feature pipeline needs): per user, downsample to hourly
    (last observation per hour, ts/event_id tie-broken), generate the
    user's full hourly grid, and carry the last non-null observation
    forward across gaps (LAST_VALUE IGNORE NULLS over the ordered
    frame).  One week of events keeps the grid bounded in the demo;
    the shape is span-agnostic.  Scale: grid generation is an in-row
    sequence (rows = Σ user-span hours, emitted without shuffle); the
    downsample window, the grid join, and the fill window all key on
    user_id, so one partitioning serves all three."""
    lo = F.lit("2024-01-08").cast("timestamp")
    hi = F.lit("2024-01-15").cast("timestamp")
    ev = (t(spark, sf, "events")
          .filter((F.col("ts") >= lo) & (F.col("ts") < hi))
          .select("user_id", "ts", "value", "event_id",
                  F.date_trunc("hour", "ts").alias("hr")))
    wlast = Window.partitionBy("user_id", "hr").orderBy(
        F.col("ts").desc(), F.col("event_id").desc())
    hourly = (ev.withColumn("rn", F.row_number().over(wlast))
              .filter(F.col("rn") == 1).select("user_id", "hr", "value"))
    span = hourly.groupBy("user_id").agg(F.min("hr").alias("h0"),
                                         F.max("hr").alias("h1"))
    grid = span.select(
        "user_id",
        F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR")))
        .alias("hr"))
    joined = (grid.join(hourly, ["user_id", "hr"], "left")
              .withColumn("is_gap",
                          F.when(F.col("value").isNull(), 1).otherwise(0)))
    wf = (Window.partitionBy("user_id").orderBy("hr")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return joined.select(
        "user_id", "hr",
        F.last("value", ignorenulls=True).over(wf).alias("v_ffill"),
        "is_gap")


@q("agg_approx_percentile")  # sketch internals are engine-specific → rows-only
def agg_approx_percentile(spark, sf):
    """Approximate percentiles via Spark's GK-sketch
    (``percentile_approx``, accuracy 1000) — the mergeable companion to
    percentile_prices' exact interpolation, and the only form that
    scales: exact percentiles need a per-group sort, while the sketch
    is map-side-combinable constant memory (same role HLL plays for
    count-distinct).  No cross-engine oracle (DuckDB's approx sketch
    differs internally); test_approx_percentile_close pins the
    estimates within 2%% of the exact answers locally."""
    o = t(spark, sf, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.percentile_approx("o_totalprice", F.lit(0.5),
                                    F.lit(1000)), 4).alias("ap50"),
        F.round(F.percentile_approx("o_totalprice", F.lit(0.9),
                                    F.lit(1000)), 4).alias("ap90"))


@q("icebergish_time_travel")  # snapshot pinning is engine-side → rows-only
def icebergish_time_travel(spark, sf):
    """Icebergish scans with snapshot pinning (SURVEY §2.B scans row):
    three commits (append/append/replace) against a scratch table, read
    back AS OF each snapshot — returns (snapshot_id, mode, n_rows)."""
    import shutil
    import tempfile

    from pyspark.sql import types as T

    from .storage import IcebergishTable

    path = tempfile.mkdtemp(prefix="icebergish_demo_")
    try:
        schema = T.StructType([T.StructField("k", T.LongType()),
                               T.StructField("host_bucket", T.IntegerType())])
        tbl = IcebergishTable(path, schema, partition_by="host_bucket")
        mk = lambda lo, hi: spark.range(lo, hi).select(  # noqa: E731
            F.col("id").alias("k"), (F.col("id") % 4).cast("int").alias("host_bucket"))
        s0 = tbl.append(mk(0, 100), 1)
        s1 = tbl.append(mk(100, 250), 2)
        s2 = tbl.replace(mk(0, 40), 3)
        rows = [(int(s), m, tbl.read(spark, snapshot_id=s).count())
                for s, m in ((s0, "append"), (s1, "append"), (s2, "replace"))]
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return spark.createDataFrame(rows, "snapshot_id long, mode string, n_rows long")


@q("merge_upsert", """
WITH src AS (
  SELECT o_custkey AS k, ROUND(SUM(o_totalprice) / 1000, 2) AS delta
  FROM orders GROUP BY o_custkey),
srcx AS (
  SELECT k, delta FROM src
  UNION ALL
  SELECT k + 1000000 AS k, delta FROM src WHERE k % 97 = 0),
tgt AS (SELECT c_custkey AS k, c_acctbal FROM customer)
SELECT COALESCE(tgt.k, srcx.k) AS k,
       ROUND(COALESCE(c_acctbal, 0) + COALESCE(delta, 0), 2) AS acctbal,
       CASE WHEN tgt.k IS NULL THEN 'insert'
            WHEN srcx.k IS NULL THEN 'keep' ELSE 'update' END AS action
FROM tgt FULL OUTER JOIN srcx ON tgt.k = srcx.k
""")
def merge_upsert(spark, sf):
    """MERGE INTO semantics (Delta/Iceberg-style upsert) as pure
    DataFrame ops: full-outer-join target and source on the key, update
    matched rows, insert source-only rows, keep target-only rows, and
    tag every row with its action.  Source rows with keys outside the
    target domain (shifted by 1e6) exercise the insert branch.  One
    shuffle on the merge key; at 100 TB the target is bucketed on the
    key so the merge joins exchange-free (see join_bucketed_colocated)."""
    c = t(spark, sf, "customer").select(F.col("c_custkey").alias("tk"),
                                        "c_acctbal")
    src = (t(spark, sf, "orders").groupBy(F.col("o_custkey").alias("sk"))
           .agg(F.round(F.sum("o_totalprice") / 1000, 2).alias("delta")))
    srcx = src.union(
        src.filter(F.col("sk") % 97 == 0)
        .select((F.col("sk") + 1000000).alias("sk"), "delta"))
    # branch on the pre-coalesce JOIN KEYS, never on value-column
    # nullness — a NULL c_acctbal or delta must not flip the action
    j = c.join(srcx, c["tk"] == srcx["sk"], "full_outer")
    return j.select(
        F.coalesce("tk", "sk").alias("k"),
        F.round(F.coalesce("c_acctbal", F.lit(0.0))
                + F.coalesce("delta", F.lit(0.0)), 2).alias("acctbal"),
        F.when(F.col("tk").isNull(), "insert")
        .when(F.col("sk").isNull(), "keep")
        .otherwise("update").alias("action"))


@q("events_funnel", """
WITH v AS (SELECT user_id, MIN(ts) AS t_view FROM events
           WHERE event_type = 'view' GROUP BY user_id),
c AS (SELECT e.user_id, MIN(e.ts) AS t_click
      FROM events e JOIN v ON v.user_id = e.user_id AND e.ts >= v.t_view
      WHERE e.event_type = 'click' GROUP BY e.user_id),
p AS (SELECT e.user_id, MIN(e.ts) AS t_purchase
      FROM events e JOIN c ON c.user_id = e.user_id AND e.ts >= c.t_click
      WHERE e.event_type = 'purchase' GROUP BY e.user_id),
u AS (SELECT DISTINCT user_id FROM events)
SELECT u.user_id,
       CASE WHEN p.user_id IS NOT NULL THEN 3
            WHEN c.user_id IS NOT NULL THEN 2
            WHEN v.user_id IS NOT NULL THEN 1 ELSE 0 END AS stage,
       CAST(date_diff('second', v.t_view, p.t_purchase) AS BIGINT)
         AS secs_to_convert
FROM u LEFT JOIN v ON v.user_id = u.user_id
       LEFT JOIN c ON c.user_id = u.user_id
       LEFT JOIN p ON p.user_id = u.user_id
""")
def events_funnel(spark, sf):
    """Ordered conversion funnel (view → click → purchase): per user,
    the earliest view, the earliest click AT OR AFTER it, the earliest
    purchase AT OR AFTER that — stage reached plus end-to-end latency.
    The event-analytics sibling of the streaming session ops, written
    as three conditional-min aggregations chained through inequality
    joins (no window over the whole event stream).  Scale shape: every
    agg is map-side-combinable keyed on user_id and every join is
    user_id-keyed (stage tables scale with distinct users, so they are
    never force-broadcast — AQE broadcasts them when actually small);
    the full funnel costs three passes over the filtered event slices,
    each pruned to one event_type at the scan."""
    ev = t(spark, sf, "events").select("user_id", "event_type", "ts")
    v = (ev.filter(F.col("event_type") == "view")
         .groupBy("user_id").agg(F.min("ts").alias("t_view")))
    # no broadcast hints: the stage tables are per-user aggregates that
    # GROW with the corpus (distinct users scale with events), so a forced
    # broadcast is an OOM at 100×.  Every side is keyed on user_id — the
    # shuffle hash join is right, and AQE still broadcasts when a side is
    # genuinely small at runtime.
    c = (ev.filter(F.col("event_type") == "click")
         .join(v, "user_id")
         .filter(F.col("ts") >= F.col("t_view"))
         .groupBy("user_id").agg(F.min("ts").alias("t_click")))
    p = (ev.filter(F.col("event_type") == "purchase")
         .join(c, "user_id")
         .filter(F.col("ts") >= F.col("t_click"))
         .groupBy("user_id").agg(F.min("ts").alias("t_purchase")))
    u = ev.select("user_id").distinct()
    j = (u.join(v.withColumn("_v", F.lit(1)), "user_id", "left")
         .join(c.withColumn("_c", F.lit(1)), "user_id", "left")
         .join(p.withColumn("_p", F.lit(1)), "user_id", "left"))
    return j.select(
        "user_id",
        F.when(F.col("_p").isNotNull(), 3)
        .when(F.col("_c").isNotNull(), 2)
        .when(F.col("_v").isNotNull(), 1).otherwise(0).alias("stage"),
        (F.unix_timestamp("t_purchase")
         - F.unix_timestamp("t_view")).alias("secs_to_convert"))
