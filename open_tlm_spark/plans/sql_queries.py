"""General SQL surface: joins / aggregations / sorts / sets / windows.

The reference has NO joins (SURVEY.md §2.3) — series are fetched
independently — but the engine must present a clean general SQL
surface (§7 "What's hard" #5): the correctness gate runs TPC-H-style
queries. These exercise Spark's native join/agg/window/set operators,
which come free with the DataFrame API; our job is that the PLANS are
right at 100 TB (broadcast the dims, partial aggregation before the
shuffle, top-k instead of global sorts).

Float discipline: money inputs are cast to narrow decimals BEFORE any
arithmetic (products and sums then exact in both engines), the final
sum's scale is trimmed without rounding (inputs bound the true scale),
and only then cast to double — every step deterministic and identical
across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from open_tlm_spark.plans.registry import register


# ---------------------------------------------------------------- TPC-H Q1
@register(
    "tpch_q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_qty,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_base_price,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(6,4)))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_disc_price,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(6,4)))
                    * (1 + CAST(l_tax AS DECIMAL(6,4)))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_charge,
           round(avg(l_quantity), 6) AS avg_qty,
           round(avg(l_discount), 6) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary report: the canonical partial-agg showcase.

    Plan: scan with shipdate pushed to parquet -> partial hash agg
    (map side) -> single shuffle on 2 low-cardinality keys -> final
    agg. At 100 TB the shuffle carries only (#flags x #status x
    #partitions) rows — this query is scan-bound, as it should be.

    Float discipline: inputs (2-4 dp by construction) are cast to
    narrow decimals BEFORE multiplying, so every product and sum is
    exact in both engines; casting the double PRODUCT to decimal
    instead would hit engine-specific rounding of the 10th+ digit.
    """
    li = spark.table("lineitem").filter(
        F.col("l_shipdate") <= F.lit("2001-09-02 00:00:00").cast("timestamp")
    )
    ep = F.col("l_extendedprice").cast("decimal(12,2)")
    disc_price = ep * (F.lit(1) - F.col("l_discount").cast("decimal(6,4)"))
    charge = disc_price * (F.lit(1) + F.col("l_tax").cast("decimal(6,4)"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("decimal(38,2)").cast("double").alias("sum_qty"),
        F.sum(ep).cast("decimal(38,2)").cast("double").alias("sum_base_price"),
        F.sum(disc_price).cast("decimal(38,6)").cast("double").alias("sum_disc_price"),
        F.sum(charge).cast("decimal(38,6)").cast("double").alias("sum_charge"),
        F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


# ---------------------------------------------------------------- TPC-H Q3
@register(
    "tpch_q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l.l_discount AS DECIMAL(6,4)))) AS DECIMAL(38,6)) AS DOUBLE) AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping priority: selective dim -> fact join chain, top-k.

    Plan choices for scale: customer (filtered on segment) is
    broadcast into orders — no shuffle of the orders fact; the
    orders->lineitem join shuffles on orderkey (both facts, necessary)
    and AQE can flip it to broadcast at small SF. Final top-10 is
    TakeOrderedAndProject, never a global sort.
    """
    c = spark.table("customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = spark.table("orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    l = spark.table("lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    joined = l.join(
        broadcast(c).join(o, F.col("c_custkey") == F.col("o_custkey")),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    revenue = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(6,4)")
    )
    return (
        joined.groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(revenue).cast("decimal(38,6)").cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate")
    )


# ---------------------------------------------------------------- TPC-H Q5
@register(
    "tpch_q5_local_supplier_volume",
    oracle="""
    SELECT n.n_name,
           CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l.l_discount AS DECIMAL(6,4)))) AS DECIMAL(38,6)) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name
    """,
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local supplier volume: 6-table join. region/nation/supplier/
    customer are all broadcast dims; the only shuffle joins the two
    facts on orderkey. Join order: facts last, so Catalyst keeps the
    dim filters upstream of the big join."""
    r = spark.table("region").filter(F.col("r_name") == "ASIA")
    n = spark.table("nation")
    s = spark.table("supplier")
    c = spark.table("customer")
    o = spark.table("orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    l = spark.table("lineitem")
    sn = broadcast(
        s.join(broadcast(n), s.s_nationkey == n.n_nationkey).join(
            broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
        )
    )
    co = c.join(o, c.c_custkey == o.o_custkey)
    joined = l.join(co, l.l_orderkey == F.col("o_orderkey")).join(
        sn,
        (l.l_suppkey == F.col("s_suppkey"))
        & (F.col("c_nationkey") == F.col("s_nationkey")),
    )
    revenue = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(6,4)")
    )
    return joined.groupBy("n_name").agg(
        F.sum(revenue).cast("decimal(38,6)").cast("double").alias("revenue")
    )


# ---------------------------------------------------------------- TPC-H Q6
@register(
    "tpch_q6_forecast_revenue",
    oracle="""
    SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(6,4))) AS DECIMAL(38,4)) AS DOUBLE) AS revenue,
           count(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecasting revenue change: pure filter+agg — every predicate
    must reach the parquet scan (PushedFilters), zero shuffle
    (single-row global agg)."""
    li = spark.table("lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & F.col("l_discount").between(0.03, 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(12,2)")
            * F.col("l_discount").cast("decimal(6,4)")
        ).cast("decimal(38,4)").cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


# ------------------------------------------------------------ top-k join
@register(
    "top_customers_by_revenue",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           CAST(CAST(sum(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS DOUBLE) AS total_spend,
           count(*) AS n_orders
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_name
    ORDER BY total_spend DESC, c_custkey
    LIMIT 25
    """,
)
def top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast dim join + top-k. Aggregate BEFORE the join
    (group orders by custkey first) so the join input is one row per
    customer, then broadcast the smaller aggregated side."""
    o = (
        spark.table("orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(12,2)")).cast("decimal(38,2)").cast("double").alias("total_spend"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    c = spark.table("customer")
    return (
        o.join(broadcast(c), o.o_custkey == c.c_custkey)
        .orderBy(F.col("total_spend").desc(), "c_custkey")
        .limit(25)
        .select("c_custkey", "c_name", "total_spend", "n_orders")
    )


# --------------------------------------------------------- window functions
@register(
    "window_user_running_stats",
    oracle="""
    SELECT event_id, user_id, ts, value,
           row_number() OVER w AS seq,
           round(sum(value) OVER w, 6) AS running_sum,
           round(value - lag(value, 1, 0.0) OVER w, 6) AS delta,
           round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6) AS moving_avg5
    FROM events
    WHERE user_id < 50
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_running_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.5 analytic windows (reference has none — natural extension):
    per-user ordered row_number / running sum / lag delta / 5-row
    moving average. One shuffle on user_id, one sort within
    partitions, all four functions share the frame."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w5 = w.rowsBetween(-4, 0)
    ev = spark.table("events").filter(F.col("user_id") < 50)
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.row_number().over(w).alias("seq"),
        F.round(F.sum("value").over(w), 6).alias("running_sum"),
        F.round(F.col("value") - F.lag("value", 1, 0.0).over(w), 6).alias("delta"),
        F.round(F.avg("value").over(w5), 6).alias("moving_avg5"),
    )


# ------------------------------------------------------------- set ops
@register(
    "set_ops_purchasers_vs_errors",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'purchase'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'error'
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'signup'
    """,
)
def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 set operations (absent in reference, free in Spark SQL):
    INTERSECT/EXCEPT with DISTINCT semantics."""
    ev = spark.table("events")
    purchasers = ev.filter(F.col("event_type") == "purchase").select("user_id")
    errors = ev.filter(F.col("event_type") == "error").select("user_id")
    signups = ev.filter(F.col("event_type") == "signup").select("user_id")
    return purchasers.intersect(errors).subtract(signups)


# ------------------------------------------------------------- pivot/melt
@register(
    "pivot_event_type_daily",
    oracle="""
    SELECT (epoch_us(ts) // (86400::BIGINT * 1000000)) * 86400 AS day_ts,
           count(*) FILTER (WHERE event_type = 'click') AS click,
           count(*) FILTER (WHERE event_type = 'error') AS error,
           count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           count(*) FILTER (WHERE event_type = 'signup') AS signup,
           count(*) FILTER (WHERE event_type = 'view') AS view
    FROM events
    GROUP BY 1
    """,
)
def pivot_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 multi-series overlay as a relational operator: align all
    series on a shared time axis via groupBy(bin).pivot(dataset_id).
    Explicit pivot values -> single-pass, no extra distinct job."""
    from open_tlm_spark.functions.time import floor_to

    ev = spark.table("events")
    return (
        ev.groupBy(floor_to("ts", 86400).alias("day_ts"))
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["click", "error", "purchase", "signup", "view"])
    )


# ------------------------------------------------------------- semi join
@register(
    "tpch_q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority checking: EXISTS -> LEFT SEMI join. The semi
    join shuffles only (orderkey, orderdate) pairs and short-circuits
    on first match — never materializes the lineitem payload."""
    o = spark.table("orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    l = spark.table("lineitem")
    matched = o.join(
        l,
        (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return matched.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


# ------------------------------------------------------------- anti join
@register(
    "customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    ORDER BY c_custkey
    LIMIT 50
    """,
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS -> LEFT ANTI join (null-safe, unlike NOT IN): the
    canonical 'find the orphans' scan."""
    c = spark.table("customer")
    o = spark.table("orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .orderBy("c_custkey")
        .limit(50)
        .select("c_custkey", "c_name")
    )


# ----------------------------------------------------- correlated subquery
@register(
    "parts_above_brand_average",
    oracle="""
    WITH brand_avg AS (
      SELECT p_brand, round(avg(p_retailprice), 6) AS brand_avg
      FROM part GROUP BY p_brand
    )
    SELECT p.p_partkey, p.p_brand, p.p_retailprice, b.brand_avg
    FROM part p JOIN brand_avg b USING (p_brand)
    WHERE p.p_retailprice > b.brand_avg
    """,
)
def parts_above_brand_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-scalar-subquery pattern (price above the brand's
    average), decorrelated the way Catalyst does it: aggregate once,
    broadcast the tiny per-brand frame back onto the fact."""
    p = spark.table("part")
    brand_avg = p.groupBy("p_brand").agg(
        F.round(F.avg("p_retailprice"), 6).alias("brand_avg")
    )
    return (
        p.join(broadcast(brand_avg), "p_brand")
        .filter(F.col("p_retailprice") > F.col("brand_avg"))
        .select("p_partkey", "p_brand", "p_retailprice", "brand_avg")
    )


# --------------------------------------------------------------- TPC-H Q14
@register(
    "tpch_q14_promo_revenue",
    oracle="""
    SELECT round(
             100.00 * CAST(CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
                       THEN CAST(l_extendedprice AS DECIMAL(12,2))
                            * (1 - CAST(l_discount AS DECIMAL(6,4)))
                       ELSE CAST(0 AS DECIMAL(12,2)) END) AS DECIMAL(38,6)) AS DOUBLE)
             / CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                       * (1 - CAST(l_discount AS DECIMAL(6,4)))) AS DECIMAL(38,6)) AS DOUBLE),
             6) AS promo_revenue_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-06-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
    """,
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion effect: conditional aggregation over a broadcast dim
    join — CASE inside sum, one scan, one broadcast, one 1-row agg."""
    l = spark.table("lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-06-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    p = spark.table("part")
    joined = l.join(broadcast(p), l.l_partkey == p.p_partkey)
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(6,4)")
    )
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(
        F.lit(0).cast("decimal(12,2)")
    )
    return joined.agg(
        F.round(
            F.lit(100.0)
            * F.sum(promo).cast("decimal(38,6)").cast("double")
            / F.sum(rev).cast("decimal(38,6)").cast("double"),
            6,
        ).alias("promo_revenue_pct")
    )


# --------------------------------------------------------------- TPC-H Q18
@register(
    "tpch_q18_large_orders",
    oracle="""
    WITH big AS (
      SELECT l_orderkey
      FROM lineitem
      GROUP BY l_orderkey
      HAVING sum(l_quantity) > 150
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS total_price,
           CAST(sum(CAST(l.l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN big ON big.l_orderkey = o.o_orderkey
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY total_price DESC, o_orderkey
    LIMIT 100
    """,
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume customers: HAVING post-aggregate filter feeding a
    semi-style join. The `big` set (aggregate-then-filter) is tiny ->
    broadcast back onto orders, so the only fact-fact shuffle is the
    final per-order quantity sum."""
    l = spark.table("lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 150)
        .select("l_orderkey")
    )
    c = spark.table("customer")
    o = spark.table("orders")
    joined = (
        o.join(broadcast(big), o.o_orderkey == big.l_orderkey)
        .join(broadcast(c), o.o_custkey == c.c_custkey)
        .join(l.alias("li"), F.col("li.l_orderkey") == o.o_orderkey)
    )
    return (
        joined.groupBy(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
        )
        .agg(
            F.sum(F.col("li.l_quantity").cast("decimal(12,2)"))
            .cast("double")
            .alias("total_qty")
        )
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.col("o_totalprice").cast("decimal(12,2)").cast("double").alias("total_price"),
            "total_qty",
        )
        .orderBy(F.col("total_price").desc(), "o_orderkey")
        .limit(100)
    )


# --------------------------------------------------------------- TPC-H Q10
@register(
    "tpch_q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(6,4)))) AS DECIMAL(38,6)) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item reporting (TPC-H Q10 analog): who returned the
    most revenue last quarter. Plan: returnflag + orderdate predicates
    pushed to both fact scans; customer and nation broadcast; the one
    shuffle is the fact-fact join on orderkey; top-20 is
    TakeOrderedAndProject. (Reference has no joins — SURVEY.md §2.3 —
    this exercises the general SQL surface the gate requires.)"""
    c = spark.table("customer")
    n = spark.table("nation")
    o = spark.table("orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    l = spark.table("lineitem").filter(F.col("l_returnflag") == "R")
    joined = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(broadcast(c), o.o_custkey == c.c_custkey)
        .join(broadcast(n), c.c_nationkey == n.n_nationkey)
    )
    revenue = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(6,4)")
    )
    return (
        joined.groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(revenue).cast("decimal(38,6)").cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
        .select("c_custkey", "c_name", "n_name", "revenue")
    )


# ---------------------------------------------------------------- TPC-H Q7
@register(
    "tpch_q7_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
           CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(6,4)))) AS DECIMAL(38,6)) AS DOUBLE) AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume shipping between two nations (TPC-H Q7 analog): the
    disjunctive nation-pair predicate spans the supplier side AND the
    customer side, so it can only apply after both joins — the plan
    broadcasts supplier+nation and customer+nation (both tiny after
    their own filters can't prune: each keeps 2 nations' rows), then
    the single fact-fact shuffle on orderkey, then the pair filter and
    a low-cardinality agg (2 pairs x years)."""
    n = spark.table("nation").filter(F.col("n_name").isin("NATION_1", "NATION_2"))
    s = spark.table("supplier").join(
        broadcast(n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("sn_key"),
    )
    c = spark.table("customer").join(
        broadcast(n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))),
        F.col("c_nationkey") == F.col("cn_key"),
    )
    l = spark.table("lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    o = spark.table("orders")
    joined = (
        l.join(broadcast(s), l.l_suppkey == F.col("s_suppkey"))
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(broadcast(c), o.o_custkey == F.col("c_custkey"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    revenue = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(6,4)")
    )
    return (
        joined.groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(F.sum(revenue).cast("decimal(38,6)").cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# --------------------------------------------------------------- TPC-H Q21
@register(
    "tpch_q21_waiting_suppliers",
    oracle="""
    SELECT s.s_name, count(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Waiting-supplier pattern (TPC-H Q21 shape, adapted: the synthetic
    lineitem has no commit/receipt dates, so "last to ship" stands in
    for "late"): for finished orders with >1 supplier, count per
    supplier the lineitems where NO other supplier shipped later —
    a double-correlated EXISTS + NOT EXISTS on the same fact.

    Plan: both correlations become orderkey-equi self-joins (left_semi
    then left_anti) — three shuffles of the fact on the same key, which
    AQE can co-plan; supplier is broadcast at the end. No nested-loop
    anywhere despite the inequality predicates (they ride along as
    join-side filters on the equi-join)."""
    o = spark.table("orders").filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    l1 = (
        spark.table("lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .drop("o_orderkey")
    )
    l2 = spark.table("lineitem").select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    )
    l3 = spark.table("lineitem").select(
        F.col("l_orderkey").alias("k3"),
        F.col("l_suppkey").alias("s3"),
        F.col("l_shipdate").alias("d3"),
    )
    waited = l1.join(
        l2, (F.col("l_orderkey") == F.col("k2")) & (F.col("l_suppkey") != F.col("s2")), "left_semi"
    ).join(
        l3,
        (F.col("l_orderkey") == F.col("k3"))
        & (F.col("l_suppkey") != F.col("s3"))
        & (F.col("d3") > F.col("l_shipdate")),
        "left_anti",
    )
    s = spark.table("supplier")
    return (
        waited.join(broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


# ---------------------------------------------------------------- TPC-H Q8
@register(
    "tpch_q8_market_share",
    oracle="""
    WITH flat AS (
      SELECT year(o.o_orderdate) AS o_year,
             CAST(l.l_extendedprice AS DECIMAL(12,2))
               * (1 - CAST(l.l_discount AS DECIMAL(6,4))) AS volume,
             ns.n_name AS supp_nation
      FROM lineitem l
      JOIN orders o    ON l.l_orderkey = o.o_orderkey
      JOIN customer c  ON o.o_custkey = c.c_custkey
      JOIN nation nc   ON c.c_nationkey = nc.n_nationkey
      JOIN region r    ON nc.n_regionkey = r.r_regionkey
      JOIN supplier s  ON l.l_suppkey = s.s_suppkey
      JOIN nation ns   ON s.s_nationkey = ns.n_nationkey
      JOIN part p      ON l.l_partkey = p.p_partkey
      WHERE r.r_name = 'ASIA'
        AND p.p_type = 'PROMO'
        AND o.o_orderdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                              AND TIMESTAMP '1996-12-31 00:00:00'
    )
    SELECT o_year,
           round(
             CAST(CAST(sum(CASE WHEN supp_nation = 'NATION_3'
                                THEN volume ELSE 0 END) AS DECIMAL(38,6)) AS DOUBLE)
             / CAST(CAST(sum(volume) AS DECIMAL(38,6)) AS DOUBLE),
             6) AS mkt_share
    FROM flat
    GROUP BY o_year
    """,
)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """National market share (Q8 adapted to the reduced schema):
    NATION_3 suppliers' slice of PROMO-part revenue sold to REGION_0
    customers, by order year.

    Plan: every dimension (customer+nation+region, supplier+nation,
    part) broadcasts into the two-fact lineitem<->orders join — ONE
    fact shuffle on orderkey, then a 2-row aggregate. Numerator and
    denominator are exact decimal sums; the single double division at
    the end is deterministic in both engines."""
    li = spark.table("lineitem")
    o = spark.table("orders").filter(
        F.col("o_orderdate").between(
            F.lit("1995-01-01 00:00:00").cast("timestamp"),
            F.lit("1996-12-31 00:00:00").cast("timestamp"),
        )
    )
    nc = spark.table("nation").alias("nc")
    ns = spark.table("nation").alias("ns")
    cust_in_region = (
        spark.table("customer")
        .join(broadcast(nc), F.col("c_nationkey") == F.col("nc.n_nationkey"))
        .join(
            broadcast(spark.table("region").filter(F.col("r_name") == "ASIA")),
            F.col("nc.n_regionkey") == F.col("r_regionkey"),
        )
        .select("c_custkey")
    )
    supp_nation = (
        spark.table("supplier")
        .join(broadcast(ns), F.col("s_nationkey") == F.col("ns.n_nationkey"))
        .select("s_suppkey", F.col("ns.n_name").alias("supp_nation"))
    )
    promo = spark.table("part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    volume = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(6,4)")
    )
    flat = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(broadcast(cust_in_region), F.col("o_custkey") == F.col("c_custkey"))
        .join(broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(broadcast(promo), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            volume.alias("volume"),
            "supp_nation",
        )
    )
    zero = F.lit(0).cast("decimal(18,6)")
    return flat.groupBy("o_year").agg(
        F.round(
            F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(zero))
            .cast("decimal(38,6)")
            .cast("double")
            / F.sum("volume").cast("decimal(38,6)").cast("double"),
            6,
        ).alias("mkt_share")
    )


# ---------------------------------------------------------------- TPC-H Q9
@register(
    "tpch_q9_profit_by_nation_year",
    oracle="""
    SELECT ns.n_name AS nation, year(o.o_orderdate) AS o_year,
           CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l.l_discount AS DECIMAL(6,4)))) AS DECIMAL(38,6)) AS DOUBLE)
             AS sum_profit
    FROM lineitem l
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    WHERE p.p_name LIKE '%blue%'
    GROUP BY 1, 2
    """,
)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-type profit (Q9 without partsupp: profit = discounted
    revenue) for parts named '%blue%', by supplier nation and order
    year. Part + supplier+nation broadcast; the lineitem<->orders
    join is the one fact shuffle."""
    li = spark.table("lineitem")
    green = spark.table("part").filter(F.col("p_name").contains("blue")).select("p_partkey")
    sn = (
        spark.table("supplier")
        .join(broadcast(spark.table("nation")), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    profit = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(6,4)")
    )
    return (
        li.join(broadcast(green), F.col("l_partkey") == F.col("p_partkey"))
        .join(broadcast(sn), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(spark.table("orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .select("nation", F.year("o_orderdate").alias("o_year"), profit.alias("_p"))
        .groupBy("nation", "o_year")
        .agg(F.sum("_p").cast("decimal(38,6)").cast("double").alias("sum_profit"))
    )


# --------------------------------------------------------------- TPC-H Q12
@register(
    "tpch_q12_late_shipments",
    oracle="""
    SELECT o.o_orderpriority,
           count(*) FILTER (WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
             AS n_late,
           count(*) FILTER (WHERE l.l_shipdate <= o.o_orderdate + INTERVAL 90 DAY)
             AS n_ontime
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-lag report (Q12 adapted: no shipmode column, so the
    two-bucket conditional count keys on order priority; late =
    shipped more than 90 days after the order date). One fact-fact
    shuffle on orderkey, then a 5-row aggregate — the conditional
    counts are map-side partial."""
    o = spark.table("orders")
    li = spark.table("lineitem")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    return (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.when(late, 1)).alias("n_late"),
            F.count(F.when(~late, 1)).alias("n_ontime"),
        )
    )


# --------------------------------------------------------------- TPC-H Q15
@register(
    "tpch_q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                  * (1 - CAST(l_discount AS DECIMAL(6,4)))) AS DECIMAL(38,6))
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(r.total_revenue AS DOUBLE) AS total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top supplier by quarterly revenue (Q15). The correlated
    max-subquery becomes a broadcast of the 1-row max frame joined on
    EXACT DECIMAL equality (comparing doubles here would be an
    engine-dependent coin flip; ties all survive, as in the spec).
    Revenue aggregation is one shuffle on suppkey."""
    rev = (
        spark.table("lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
        )
        .select(
            F.col("l_suppkey").alias("supplier_no"),
            (
                F.col("l_extendedprice").cast("decimal(12,2)")
                * (F.lit(1) - F.col("l_discount").cast("decimal(6,4)"))
            ).alias("_v"),
        )
        .groupBy("supplier_no")
        .agg(F.sum("_v").cast("decimal(38,6)").alias("total_revenue"))
    )
    top = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        spark.table("supplier")
        .join(rev, F.col("s_suppkey") == F.col("supplier_no"))
        .join(broadcast(top), F.col("total_revenue") == F.col("max_revenue"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
    )


# --------------------------------------------------------------- TPC-H Q17
@register(
    "tpch_q17_small_quantity_revenue",
    oracle="""
    WITH avg_qty AS (
      SELECT l_partkey,
             CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS DOUBLE)
               / count(*) AS part_avg
      FROM lineitem
      GROUP BY l_partkey
    )
    SELECT CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS DOUBLE)
             / 7.0 AS avg_yearly
    FROM lineitem l
    JOIN part p    ON l.l_partkey = p.p_partkey
    JOIN avg_qty a ON l.l_partkey = a.l_partkey
    WHERE p.p_brand = 'Brand#23'
      AND l.l_quantity < 0.2 * a.part_avg
    """,
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity-order revenue (Q17). The correlated per-part
    average is a groupBy + equi-join (the window form would range-
    shuffle the whole fact); the average itself is an exact decimal
    sum over a count, so the 0.2x threshold compare is deterministic
    across engines. Brand filter broadcasts into both fact sides."""
    li = spark.table("lineitem")
    avg_qty = li.groupBy(F.col("l_partkey").alias("ak")).agg(
        (
            F.sum(F.col("l_quantity").cast("decimal(12,2)"))
            .cast("decimal(38,2)")
            .cast("double")
            / F.count(F.lit(1))
        ).alias("part_avg")
    )
    brand = spark.table("part").filter(F.col("p_brand") == "Brand#23").select("p_partkey")
    return (
        li.join(broadcast(brand), F.col("l_partkey") == F.col("p_partkey"))
        .join(avg_qty, F.col("l_partkey") == F.col("ak"))
        .filter(F.col("l_quantity") < 0.2 * F.col("part_avg"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(12,2)"))
                .cast("decimal(38,2)")
                .cast("double")
                / F.lit(7.0)
            ).alias("avg_yearly")
        )
    )


# --------------------------------------------------------------- TPC-H Q20
@register(
    "tpch_q20_excess_suppliers",
    oracle="""
    WITH shipped AS (
      SELECT l.l_suppkey,
             CAST(CAST(sum(CAST(l.l_quantity AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS DOUBLE)
               AS total_qty
      FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey
      WHERE p.p_name LIKE 'red%'
      GROUP BY l.l_suppkey
    )
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN shipped sh ON sh.l_suppkey = s.s_suppkey
    WHERE n.n_name = 'NATION_1' AND sh.total_qty > 50
    ORDER BY s.s_suppkey
    """,
)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """High-volume part suppliers (Q20 adapted: lineitem stands in
    for partsupp availability): NATION_1 suppliers who shipped more
    than 50 units of 'red%' parts. Semi-join chain: part filter
    broadcasts into lineitem, one shuffle on suppkey for the
    quantity total, then the tiny result joins supplier+nation."""
    li = spark.table("lineitem")
    red = spark.table("part").filter(F.col("p_name").startswith("red")).select("p_partkey")
    shipped = (
        li.join(broadcast(red), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(12,2)"))
            .cast("decimal(38,2)")
            .cast("double")
            .alias("total_qty")
        )
        .filter(F.col("total_qty") > 50)
    )
    n1 = spark.table("nation").filter(F.col("n_name") == "NATION_1")
    return (
        spark.table("supplier")
        .join(broadcast(n1), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(shipped, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------- TPC-H Q2
@register(
    "tpch_q2_min_cost_supplier",
    oracle="""
    WITH shipped AS (
      SELECT DISTINCT l.l_suppkey, p.p_type
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    eu AS (
      SELECT s.s_suppkey, s.s_name, s.s_acctbal
      FROM supplier s
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'EUROPE'
    )
    SELECT p_type, s_suppkey, s_name, s_acctbal
    FROM (
      SELECT sh.p_type, e.s_suppkey, e.s_name, e.s_acctbal,
             row_number() OVER (PARTITION BY sh.p_type
                                ORDER BY e.s_acctbal, e.s_suppkey) AS rn
      FROM shipped sh JOIN eu e ON sh.l_suppkey = e.s_suppkey
    ) WHERE rn = 1
    """,
)
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-cost supplier per part type (Q2 adapted: no partsupp, so
    account balance proxies supply cost and lineitem history proxies
    the catalog). The correlated-min subquery becomes a per-type
    row_number window over the distinct (supplier, type) relation;
    dims broadcast, ties broken by suppkey."""
    from pyspark.sql.window import Window

    shipped = (
        spark.table("lineitem")
        .join(
            broadcast(spark.table("part").select("p_partkey", "p_type")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select("l_suppkey", "p_type")
        .distinct()
    )
    eu = (
        spark.table("supplier")
        .join(broadcast(spark.table("nation")), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            broadcast(spark.table("region").filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal")
    )
    w = Window.partitionBy("p_type").orderBy("s_acctbal", "s_suppkey")
    return (
        shipped.join(broadcast(eu), F.col("l_suppkey") == F.col("s_suppkey"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("p_type", "s_suppkey", "s_name", "s_acctbal")
    )


# --------------------------------------------------------------- TPC-H Q11
@register(
    "tpch_q11_important_stock",
    oracle="""
    WITH nation2 AS (
      SELECT s.s_suppkey
      FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE n.n_name = 'NATION_2'
    ),
    pv AS (
      SELECT l.l_partkey,
             CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(38,2))
               AS part_value
      FROM lineitem l JOIN nation2 s2 ON l.l_suppkey = s2.s_suppkey
      GROUP BY l.l_partkey
    )
    SELECT l_partkey, CAST(part_value AS DOUBLE) AS part_value
    FROM pv
    WHERE part_value > (
      SELECT sum(part_value) * CAST(0.001 AS DECIMAL(6,4)) FROM pv
    )
    """,
)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Important stock (Q11 adapted: shipped value per part from
    NATION_2 suppliers stands in for partsupp inventory value).
    The HAVING-over-global-fraction is a broadcast of the 1-row
    total; both the per-part sums and the 0.1% threshold stay exact
    decimals until the final projection, so the comparison is
    deterministic across engines."""
    n2 = (
        spark.table("supplier")
        .join(
            broadcast(spark.table("nation").filter(F.col("n_name") == "NATION_2")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    pv = (
        spark.table("lineitem")
        .join(broadcast(n2), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(12,2)"))
            .cast("decimal(38,2)")
            .alias("part_value")
        )
    )
    threshold = pv.agg(
        (F.sum("part_value") * F.lit("0.001").cast("decimal(6,4)")).alias("thr")
    )
    return (
        pv.join(broadcast(threshold), F.col("part_value") > F.col("thr"))
        .select("l_partkey", F.col("part_value").cast("double").alias("part_value"))
    )


# ------------------------------------------ bucketed co-located join
@register(
    "bucketed_colocated_join",
    bench=False,  # writes bucketed table state each run — gate only
    oracle="""
    SELECT o.o_orderpriority,
           count(*) AS n_items,
           CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2)))
                AS DECIMAL(38,2)) AS DOUBLE) AS total_price
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1
    """,
)
def bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located fact-fact join via Hive-style bucketing: both fact
    tables are written `bucketBy(8, orderkey)` (the shuffle paid ONCE
    at ingest), then sort-merge joined with ZERO exchanges — the
    standard answer for a 100 TB fact-fact join repeated across a
    workload, where per-query shuffles dominate and neither side
    broadcasts. The oracle is the plain join over the raw tables, so
    equality proves the bucketed layout changes the plan, never the
    result. Plan shape (no exchange before the join) is pinned by
    tests/test_plan_quality.py::test_bucketed_join_no_shuffle.
    """
    import tempfile

    from open_tlm_spark.sources.bucketed import colocated_join, write_bucketed

    base = tempfile.mkdtemp(prefix="tlm_bucketed_")
    write_bucketed(
        spark.table("orders").select("o_orderkey", "o_orderpriority"),
        "tlm_b_orders",
        ["o_orderkey"],
        8,
        f"{base}/orders",
    )
    write_bucketed(
        spark.table("lineitem").select("l_orderkey", "l_extendedprice"),
        "tlm_b_lineitem",
        ["l_orderkey"],
        8,
        f"{base}/lineitem",
    )
    joined = colocated_join(
        spark,
        "tlm_b_lineitem",
        "tlm_b_orders",
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.col("l_extendedprice").cast("decimal(12,2)"))
        .cast("decimal(38,2)")
        .cast("double")
        .alias("total_price"),
    )
