"""Relational operator surface over the driver's TPC-H-ish tables
(SURVEY §2.2) — the substrate the crawl engine's plans are built from.

Each query demonstrates one primitive the engine uses: anti/semi joins
(seen-set O4, idempotent sink O14), broadcast dim joins (robots O7 /
politeness O6), window top-k (frontier O2), salted two-phase
aggregation (skew handling O17), range joins (politeness windows),
rollup (lineage reporting O15), json/explode (events ingestion).

Floating-point policy: sums go through DECIMAL(18,4) then cast to
double; averages are decimal-sum / count — bit-identical across
engines. Every window order ends in a unique key for determinism.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from crawlers_spark.harness.common import dbl, dec, load


# --- TPC-H Q1 style pricing summary -----------------------------------
def q_pricing_summary(spark, sf):
    li = load(spark, sf, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dbl(F.sum(dec("l_quantity"))).alias("sum_qty"),
            dbl(F.sum(dec("l_extendedprice"))).alias("sum_base_price"),
            dbl(F.sum(dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - dec("l_discount")))).alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


SQL_PRICING = """
SELECT l_returnflag, l_linestatus,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_qty,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# --- Q3-style shipping priority (join + agg + top-k) ------------------
def q_shipping_priority(spark, sf):
    cust = load(spark, sf, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf, "orders").where(F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp"))
    li = load(spark, sf, "lineitem").where(F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dbl(F.sum(dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - dec("l_discount")))).alias("revenue"))
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


SQL_SHIPPING = """
SELECT l_orderkey, o_orderdate,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS VARCHAR) AS DOUBLE) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate  > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey LIMIT 10
"""


# --- Q5-style region revenue (broadcast dims, multi-join) -------------
def q_region_revenue(spark, sf):
    region = load(spark, sf, "region")
    nation = load(spark, sf, "nation")
    cust = load(spark, sf, "customer")
    orders = load(spark, sf, "orders")
    li = load(spark, sf, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            dbl(F.sum(dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - dec("l_discount")))).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


SQL_REGION = """
SELECT r_name,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS VARCHAR) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


# --- anti join (O4 seen-set) ------------------------------------------
def q_customers_without_orders(spark, sf):
    cust = load(spark, sf, "customer")
    orders = load(spark, sf, "orders")
    return cust.join(orders.select("o_custkey"), cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


SQL_ANTI = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
"""


# --- semi join ---------------------------------------------------------
def q_suppliers_with_big_items(spark, sf):
    sup = load(spark, sf, "supplier")
    li = load(spark, sf, "lineitem").where(F.col("l_quantity") >= 49)
    return sup.join(li.select("l_suppkey"), sup.s_suppkey == li.l_suppkey, "left_semi").select(
        "s_suppkey", "s_name"
    )


SQL_SEMI = """
SELECT s_suppkey, s_name FROM supplier
WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey AND l_quantity >= 49)
"""


# --- window top-k per group (frontier O2 shape) -----------------------
def q_top3_orders_per_customer(spark, sf):
    orders = load(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


SQL_TOP3 = """
SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders) t
WHERE rn <= 3
"""


# --- latest-N events per user -----------------------------------------
def q_latest5_events_per_user(spark, sf):
    ev = load(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select("user_id", "event_id", "event_type", "rn")
    )


SQL_LATEST5 = """
SELECT user_id, event_id, event_type, rn FROM (
  SELECT user_id, event_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events) t
WHERE rn <= 5
"""


# --- range join (politeness-window shape) -----------------------------
def q_lineitems_within_30d(spark, sf):
    orders = load(spark, sf, "orders")
    li = load(spark, sf, "lineitem")
    j = li.join(orders, li.l_orderkey == orders.o_orderkey).where(
        (F.col("l_shipdate") >= F.col("o_orderdate"))
        & (F.col("l_shipdate") <= F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
    )
    return j.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_shipped_30d"),
        dbl(F.sum(dec("l_quantity"))).alias("qty_30d"),
    )


SQL_RANGE = """
SELECT o_orderstatus, COUNT(*) AS n_shipped_30d,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS qty_30d
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= o_orderdate AND l_shipdate <= o_orderdate + INTERVAL 30 DAY
GROUP BY o_orderstatus
"""


# --- rollup (lineage reporting shape) ---------------------------------
def q_revenue_rollup(spark, sf):
    li = load(spark, sf, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(dbl(F.sum(dec("l_extendedprice"))).alias("revenue"), F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "revenue",
            "n",
        )
    )


SQL_ROLLUP = """
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS revenue,
       COUNT(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


# --- explicit GROUPING SETS (the shape rollup/cube can't express) ------
def q_grouping_sets(spark, sf):
    """Arbitrary GROUPING SETS — ((status, priority), (priority), ())
    is NOT a rollup prefix chain (the lone-priority set skips status),
    so it exercises Spark's Expand operator with an explicit set list
    plus per-column GROUPING flags to disambiguate real NULLs from
    subtotal rows. One Expand + one hash aggregate; at scale the
    Expand multiplies rows by #sets BEFORE the exchange, and partial
    aggregation still applies per set — the same 2-phase shape as a
    plain groupBy."""
    o = load(spark, sf, "orders")
    return (
        o.groupingSets(
            [["o_orderstatus", "o_orderpriority"], ["o_orderpriority"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dbl(F.sum(dec("o_totalprice"))).alias("total_price"),
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_priority"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "g_status",
            "g_priority",
            "n_orders",
            "total_price",
        )
    )


SQL_GROUPING_SETS = """
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
       CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
       COUNT(*) AS n_orders,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderpriority), ())
"""


# --- exact distinct ----------------------------------------------------
def q_users_per_event_type(spark, sf):
    ev = load(spark, sf, "events")
    return ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n_users"))


SQL_DISTINCT = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users FROM events GROUP BY event_type
"""


# --- json extraction ---------------------------------------------------
def q_event_props_json(spark, sf):
    ev = load(spark, sf, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.sum("k").cast("long").alias("sum_k"),
            F.count("k").alias("n_k"),
            (dbl(F.sum("k")) / F.count("k")).alias("avg_k"),
        )
    )


SQL_JSON = """
SELECT event_type,
       CAST(SUM(k) AS BIGINT) AS sum_k, COUNT(k) AS n_k,
       CAST(SUM(k) AS DOUBLE) / COUNT(k) AS avg_k
FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS INT) AS k FROM events) t
GROUP BY event_type
"""


# --- dedup: latest event per (user, type) ------------------------------
def q_dedup_latest_event(spark, sf):
    ev = load(spark, sf, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select("user_id", "event_type", "event_id", "value")
    )


SQL_DEDUP_EV = """
SELECT user_id, event_type, event_id, value FROM (
  SELECT user_id, event_type, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
  FROM events) t
WHERE rn = 1
"""


# --- salted two-phase aggregation (skew, O17) --------------------------
def q_salted_part_revenue_top20(spark, sf):
    """Explicit salt → partial agg → final agg; ≡ plain GROUP BY.

    This is the skew-split pattern the frontier uses (SURVEY §4.3.1):
    phase 1 aggregates (key, salt) slices, phase 2 merges slices —
    identical result, bounded per-reducer fan-in on hot keys.
    """
    li = load(spark, sf, "lineitem")
    salted = li.withColumn("_salt", F.pmod(F.xxhash64("l_orderkey"), F.lit(8)))
    partial = salted.groupBy("l_partkey", "_salt").agg(
        F.sum(dec("l_extendedprice")).alias("_p_rev"), F.count(F.lit(1)).alias("_p_n")
    )
    return (
        partial.groupBy("l_partkey")
        .agg(dbl(F.sum("_p_rev")).alias("revenue"), F.sum("_p_n").alias("n"))
        .orderBy(F.desc("revenue"), "l_partkey")
        .limit(20)
    )


SQL_SALTED = """
SELECT l_partkey,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS revenue,
       COUNT(*) AS n
FROM lineitem GROUP BY l_partkey
ORDER BY revenue DESC, l_partkey LIMIT 20
"""


# --- global top-k ------------------------------------------------------
def q_top10_orders(spark, sf):
    return (
        load(spark, sf, "orders")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


SQL_TOP10 = """
SELECT o_orderkey, o_custkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


# --- set ops: nations with customers but no suppliers ------------------
def q_nations_cust_no_supp(spark, sf):
    nation = load(spark, sf, "nation")
    cust_n = load(spark, sf, "customer").select(F.col("c_nationkey").alias("nk")).distinct()
    supp_n = load(spark, sf, "supplier").select(F.col("s_nationkey").alias("nk")).distinct()
    only = cust_n.exceptAll(supp_n).distinct()
    return nation.join(only, nation.n_nationkey == only.nk).select("n_nationkey", "n_name")


SQL_EXCEPT = """
SELECT n_nationkey, n_name FROM nation
JOIN (SELECT DISTINCT c_nationkey AS nk FROM customer
      EXCEPT SELECT DISTINCT s_nationkey FROM supplier) t
ON n_nationkey = nk
"""


# --- market segment summary -------------------------------------------
def q_mktsegment_summary(spark, sf):
    cust = load(spark, sf, "customer")
    return cust.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_cust"),
        dbl(F.sum(dec("c_acctbal"))).alias("sum_bal"),
        F.min("c_acctbal").alias("min_bal"),
        F.max("c_acctbal").alias("max_bal"),
    )


SQL_MKT = """
SELECT c_mktsegment, COUNT(*) AS n_cust,
       CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_bal,
       MIN(c_acctbal) AS min_bal, MAX(c_acctbal) AS max_bal
FROM customer GROUP BY c_mktsegment
"""


# --- sessionization (gap > 30 min) ------------------------------------
def q_sessionize_events(spark, sf):
    ev = load(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch_s = F.unix_timestamp(F.col("ts"))
    gap = F.when(epoch_s - F.lag(epoch_s).over(w) > 1800, 1).otherwise(0)
    sess = F.sum(gap).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long")
    return (
        ev.withColumn("session_id", sess)
        .groupBy("user_id", "session_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.min("event_id").alias("first_event"))
    )


SQL_SESSION = """
SELECT user_id, session_id, COUNT(*) AS n_events, MIN(event_id) AS first_event
FROM (
  SELECT user_id, event_id,
         CAST(SUM(CASE WHEN gap_s > 1800 THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM (
    SELECT user_id, event_id, ts,
           epoch(ts) - LAG(epoch(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_s
    FROM events) g
) s
GROUP BY user_id, session_id
"""


# --- as-of join: last click before each purchase -----------------------
def q_asof_click_before_purchase(spark, sf):
    ev = load(spark, sf, "events")
    purchases = ev.where("event_type = 'purchase'").select(
        F.col("event_id").alias("purchase_id"), F.col("user_id"), F.col("ts").alias("p_ts")
    )
    clicks = ev.where("event_type = 'click'").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    # the as-of predicate lives in the join condition (not a post-filter)
    # so purchases with only-later clicks keep their NULL row
    return (
        purchases.join(
            clicks,
            (purchases.user_id == clicks.c_user) & (clicks.c_ts <= purchases.p_ts),
            "left",
        )
        .groupBy("purchase_id", "user_id")
        .agg(F.max("c_ts").alias("last_click_ts"))
    )


SQL_ASOF = """
SELECT purchase_id, user_id, MAX(c_ts) AS last_click_ts
FROM (
  SELECT p.event_id AS purchase_id, p.user_id, p.ts AS p_ts, c.ts AS c_ts
  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
  LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
    ON p.user_id = c.user_id AND c.ts <= p.ts
) t
GROUP BY purchase_id, user_id
"""


# --- tumbling time windows --------------------------------------------
def q_hourly_event_windows(spark, sf):
    ev = load(spark, sf, "events")
    return (
        ev.groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dbl(F.sum(dec("value"))).alias("sum_value"))
    )


SQL_HOURLY = """
SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n,
       CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_value
FROM events GROUP BY date_trunc('hour', ts), event_type
"""


# --- cube over events --------------------------------------------------
def q_cube_events(spark, sf):
    ev = load(spark, sf, "events").withColumn(
        "day", F.date_trunc("day", "ts")
    )
    return (
        ev.cube("day", "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dbl(F.sum(dec("value"))).alias("sum_value"))
        .select(
            F.coalesce(F.col("day").cast("string"), F.lit("ALL")).alias("day"),
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            "n",
            "sum_value",
        )
    )


SQL_CUBE = """
SELECT COALESCE(CAST(CAST(date_trunc('day', ts) AS TIMESTAMP) AS VARCHAR), 'ALL') AS day,
       COALESCE(event_type, 'ALL') AS event_type,
       COUNT(*) AS n,
       CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_value
FROM events GROUP BY CUBE (date_trunc('day', ts), event_type)
"""


# --- intersect: nations with both customers and suppliers ---------------
def q_nations_cust_and_supp(spark, sf):
    nation = load(spark, sf, "nation")
    cust_n = load(spark, sf, "customer").select(F.col("c_nationkey").alias("nk")).distinct()
    supp_n = load(spark, sf, "supplier").select(F.col("s_nationkey").alias("nk")).distinct()
    both = cust_n.intersect(supp_n)
    return nation.join(both, nation.n_nationkey == both.nk).select("n_nationkey", "n_name")


SQL_INTERSECT = """
SELECT n_nationkey, n_name FROM nation
JOIN (SELECT DISTINCT c_nationkey AS nk FROM customer
      INTERSECT SELECT DISTINCT s_nationkey FROM supplier) t
ON n_nationkey = nk
"""


# --- approx_count_distinct within error bound ---------------------------
def q_approx_distinct_bounds(spark, sf):
    """HLL sketches differ per engine, so the *contract* is oracled:
    approx within 5% of exact (the bool is what both sides compute)."""
    ev = load(spark, sf, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
            F.count_distinct("user_id").alias("exact"),
        )
        .select(
            "event_type",
            "exact",
            (F.abs(F.col("approx") - F.col("exact")) <= F.col("exact") * 0.05).alias(
                "within_5pct"
            ),
        )
    )


SQL_APPROX = """
SELECT event_type, COUNT(DISTINCT user_id) AS exact, TRUE AS within_5pct
FROM events GROUP BY event_type
"""


# --- pivot ------------------------------------------------------------
_PIVOT_COLS = [
    ("1-URGENT", "n_urgent"),
    ("2-HIGH", "n_high"),
    ("3-MEDIUM", "n_medium"),
    ("4-NOT SPECIFIED", "n_notspec"),
    ("5-LOW", "n_low"),
]


def q_pivot_status_priority(spark, sf):
    """Relational pivot: ``groupBy().pivot(values).count()`` with an
    EXPLICIT value list, so Catalyst plans ONE partial-agg shuffle
    (PivotFirst) — no extra distinct-values pass over the data and no
    per-value scan. Missing cells are 0 on both sides."""
    o = load(spark, sf, "orders")
    pvt = (
        o.groupBy("o_orderstatus")
        .pivot("o_orderpriority", [p for p, _ in _PIVOT_COLS])
        .count()
    )
    return pvt.select(
        "o_orderstatus",
        *[
            F.coalesce(pvt[p], F.lit(0)).cast("bigint").alias(a)
            for p, a in _PIVOT_COLS
        ],
    )


SQL_PIVOT = """
SELECT o_orderstatus,
       CAST(count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS BIGINT) AS n_urgent,
       CAST(count(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS BIGINT) AS n_high,
       CAST(count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS BIGINT) AS n_medium,
       CAST(count(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS BIGINT) AS n_notspec,
       CAST(count(*) FILTER (WHERE o_orderpriority = '5-LOW') AS BIGINT) AS n_low
FROM orders GROUP BY o_orderstatus
"""


# --- exact distributed median (percentile_disc) -------------------------
def q_median_price_per_priority(spark, sf):
    """Exact per-group median (percentile_disc 0.5, order by
    (price, orderkey)) via TWO-PHASE RANK SELECTION — deliberately not
    a per-group sort window, which would sort each group in one task
    (5 groups × 10^10 rows = the killer). Phase 1 aggregates
    (group, integer price bucket) counts (map-side combine; the
    shuffled table is bucket-count-sized, not row-sized) and locates
    the bucket holding the target rank with a window over that tiny
    table. Phase 2 ranks ONLY the rows inside the hit bucket (broadcast
    semi-filter), so the per-task sort is bounded by the densest single
    bucket. The oracle restates the semantics with the plain window —
    same median, different physics."""
    o = load(spark, sf, "orders").select("o_orderpriority", "o_totalprice", "o_orderkey")
    bkt = F.floor(F.col("o_totalprice") / 1000).alias("bkt")
    counts = o.groupBy("o_orderpriority", bkt).agg(F.count(F.lit(1)).alias("c"))
    wcum = Window.partitionBy("o_orderpriority").orderBy("bkt")
    wall = Window.partitionBy("o_orderpriority")
    hit = (
        counts.select(
            "o_orderpriority",
            "bkt",
            "c",
            (F.sum("c").over(wcum) - F.col("c")).alias("below"),
            F.sum("c").over(wall).alias("n"),
        )
        .withColumn("k", F.floor((F.col("n") + 1) / 2).cast("bigint"))
        .where((F.col("below") < F.col("k")) & (F.col("below") + F.col("c") >= F.col("k")))
        .select(
            F.col("o_orderpriority").alias("_grp"),
            F.col("bkt").alias("_bkt"),
            "below",
            "k",
            "n",
        )
    )
    in_bucket = o.join(
        F.broadcast(hit),
        (o["o_orderpriority"] == hit["_grp"])
        & (F.floor(o["o_totalprice"] / 1000) == hit["_bkt"]),
    ).select("o_orderpriority", "o_totalprice", "o_orderkey", "below", "k", "n")
    wrank = Window.partitionBy("o_orderpriority").orderBy(
        F.asc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        in_bucket.withColumn("rn", F.row_number().over(wrank))
        .where(F.col("below") + F.col("rn") == F.col("k"))
        .select(
            "o_orderpriority",
            F.col("n").cast("bigint").alias("n_orders"),
            F.col("o_totalprice").alias("median_price"),
        )
    )


SQL_MEDIAN = """
WITH ranked AS (
  SELECT o_orderpriority, o_totalprice, o_orderkey,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice, o_orderkey) AS rn,
         count(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM orders)
SELECT o_orderpriority,
       CAST(n AS BIGINT) AS n_orders,
       o_totalprice AS median_price
FROM ranked WHERE rn = CAST(floor((n + 1) / 2.0) AS BIGINT)
"""


# --- correlated subqueries (Catalyst RewritePredicateSubquery) --------
def q_exists_mixed(spark, sf):
    """EXISTS + NOT EXISTS in ONE query through spark.sql — Catalyst
    rewrites the pair into a semi- and an anti-join on the same
    customer scan; previously the surface only exercised each rewrite
    through the DataFrame API separately."""
    load(spark, sf, "customer").createOrReplaceTempView("v_customer_ex")
    load(spark, sf, "orders").createOrReplaceTempView("v_orders_ex")
    return spark.sql(
        """
        SELECT c_custkey, c_name FROM v_customer_ex c
        WHERE EXISTS (SELECT 1 FROM v_orders_ex o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
          AND NOT EXISTS (SELECT 1 FROM v_orders_ex o2
                          WHERE o2.o_custkey = c.c_custkey
                            AND o2.o_orderpriority = '5-LOW')
        """
    )


SQL_EXISTS_MIXED = """
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderpriority = '1-URGENT')
  AND NOT EXISTS (SELECT 1 FROM orders o2
                  WHERE o2.o_custkey = c.c_custkey
                    AND o2.o_orderpriority = '5-LOW')
"""


def q_scalar_subquery_above_avg(spark, sf):
    """Scalar subqueries (RewriteCorrelatedScalarSubquery family):
    parts priced above the corpus average, with the average compare
    cross-multiplied into exact DECIMAL arithmetic (price·N > Σprice)
    so no float division enters the predicate."""
    load(spark, sf, "part").createOrReplaceTempView("v_part_sq")
    return spark.sql(
        """
        SELECT p_partkey, p_name, p_retailprice FROM v_part_sq
        WHERE CAST(p_retailprice AS DECIMAL(18,4))
              * (SELECT COUNT(*) FROM v_part_sq)
              > (SELECT SUM(CAST(p_retailprice AS DECIMAL(18,4))) FROM v_part_sq)
        """
    )


SQL_SCALAR_SUBQ = """
SELECT p_partkey, p_name, p_retailprice FROM part
WHERE CAST(p_retailprice AS DECIMAL(18,4)) * (SELECT COUNT(*) FROM part)
      > (SELECT SUM(CAST(p_retailprice AS DECIMAL(18,4))) FROM part)
"""


# --- ntile distribution buckets ---------------------------------------
def q_ntile_quartiles(spark, sf):
    """ntile(4) price quartiles per order priority — the remaining
    untested window frame function; order ends in the unique key so
    bucket assignment is total."""
    orders = load(spark, sf, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).cast("int").alias("quartile"),
    )


SQL_NTILE = """
SELECT o_orderkey, o_orderpriority,
       CAST(ntile(4) OVER (PARTITION BY o_orderpriority
                           ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT)
         AS quartile
FROM orders
"""


QUERIES = {
    "rel_exists_mixed": (q_exists_mixed, SQL_EXISTS_MIXED),
    "rel_scalar_subquery_above_avg": (q_scalar_subquery_above_avg, SQL_SCALAR_SUBQ),
    "rel_ntile_quartiles": (q_ntile_quartiles, SQL_NTILE),
    "rel_pricing_summary": (q_pricing_summary, SQL_PRICING),
    "rel_pivot_status_priority": (q_pivot_status_priority, SQL_PIVOT),
    "rel_median_price_per_priority": (q_median_price_per_priority, SQL_MEDIAN),
    "rel_shipping_priority": (q_shipping_priority, SQL_SHIPPING),
    "rel_region_revenue": (q_region_revenue, SQL_REGION),
    "rel_anti_join_customers_no_orders": (q_customers_without_orders, SQL_ANTI),
    "rel_semi_join_suppliers": (q_suppliers_with_big_items, SQL_SEMI),
    "rel_window_top3_orders_per_customer": (q_top3_orders_per_customer, SQL_TOP3),
    "rel_latest5_events_per_user": (q_latest5_events_per_user, SQL_LATEST5),
    "rel_range_join_30d": (q_lineitems_within_30d, SQL_RANGE),
    "rel_rollup_revenue": (q_revenue_rollup, SQL_ROLLUP),
    "rel_grouping_sets": (q_grouping_sets, SQL_GROUPING_SETS),
    "rel_distinct_users_per_type": (q_users_per_event_type, SQL_DISTINCT),
    "rel_json_event_props": (q_event_props_json, SQL_JSON),
    "rel_dedup_latest_event": (q_dedup_latest_event, SQL_DEDUP_EV),
    "rel_salted_part_revenue_top20": (q_salted_part_revenue_top20, SQL_SALTED),
    "rel_global_top10_orders": (q_top10_orders, SQL_TOP10),
    "rel_nations_cust_no_supp": (q_nations_cust_no_supp, SQL_EXCEPT),
    "rel_mktsegment_summary": (q_mktsegment_summary, SQL_MKT),
    "rel_sessionize_events": (q_sessionize_events, SQL_SESSION),
    "rel_asof_click_before_purchase": (q_asof_click_before_purchase, SQL_ASOF),
    "rel_hourly_event_windows": (q_hourly_event_windows, SQL_HOURLY),
    "rel_cube_events": (q_cube_events, SQL_CUBE),
    "rel_intersect_nations": (q_nations_cust_and_supp, SQL_INTERSECT),
    "rel_approx_distinct_bounds": (q_approx_distinct_bounds, SQL_APPROX),
}
