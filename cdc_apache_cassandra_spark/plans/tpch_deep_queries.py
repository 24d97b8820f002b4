"""Deep relational coverage: the remaining TPC-H query shapes, adapted to
the driver corpus's slim schema (no partsupp/shipmode/commitdate columns —
see TESTDATA.md). Together with tpch_queries.py this exercises every
operator family the reference's users get from the new engine's relational
surface (SURVEY §2.3/§2.4 note: the reference itself has only the J1 join;
everything here is Catalyst built-ins behind our API).

Determinism rules per plans/registry.py: DECIMAL exact aggregation, final
DOUBLE cast; ratios as double divisions of identically-derived operands;
deterministic ORDER BY tie-breaks before any LIMIT.

Scale notes inline per query; dimension joins broadcast, fact-fact joins
shuffle on their keys, AQE handles skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_apache_cassandra_spark.plans.registry import register
from cdc_apache_cassandra_spark.sources.registry import load_table, load_tables


def _dec(c: str | Column) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return col.cast("decimal(18,2)")


def _ts(s: str) -> Column:
    return F.lit(s).cast("timestamp")


# --- Q4: EXISTS semi-join + grouped count ----------------------------------

_Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
"""


@register("tpch_q4_order_priority", sql=_Q4_SQL)
def q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS => LEFT SEMI join (no row multiplication),
    then a tiny grouped count. Semi join shuffles only orderkeys."""
    t = load_tables(spark, sf_dir, "orders", "lineitem")
    o = t["orders"].filter(
        (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1996-04-01 00:00:00"))
    )
    li = t["lineitem"]
    semi = o.join(
        li,
        (o["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"] > o["o_orderdate"]),
        "left_semi",
    )
    return semi.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


# --- Q7: bi-national volume (two dimension roles for nation) ---------------

_Q7_SQL = """
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       YEAR(l_shipdate) AS l_year,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation sn ON sn.n_nationkey = s_nationkey
JOIN nation cn ON cn.n_nationkey = c_nationkey
WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
    OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY sn.n_name, cn.n_name, YEAR(l_shipdate)
"""


@register("tpch_q7_volume_shipping", sql=_Q7_SQL)
def q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: one dimension table (nation) joined in TWO roles.
    Both nation joins broadcast (25 rows at any SF); the lineitem-orders
    join is the only big shuffle."""
    t = load_tables(spark, sf_dir, "lineitem", "supplier", "orders", "customer",
                    "nation")
    sn = t["nation"].select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = t["nation"].select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
    )
    df = (
        li.join(t["supplier"], F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(sn), F.col("sn_key") == F.col("s_nationkey"))
        .join(F.broadcast(cn), F.col("cn_key") == F.col("c_nationkey"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return df.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
    ).agg(
        F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")))
        .cast("double")
        .alias("revenue")
    )


# --- Q8: market share (conditional-sum ratio) ------------------------------

_Q8_SQL = """
WITH vol AS (
  SELECT YEAR(o_orderdate) AS o_year,
         CAST(l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume,
         sn.n_name AS supp_nation
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation cn ON cn.n_nationkey = c_nationkey
  JOIN region    ON r_regionkey = cn.n_regionkey
  JOIN nation sn ON sn.n_nationkey = s_nationkey
  WHERE r_name = 'ASIA'
    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
)
SELECT o_year,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END) AS DOUBLE)
       / CAST(SUM(volume) AS DOUBLE) AS mkt_share
FROM vol GROUP BY o_year
"""


@register("tpch_q8_market_share", sql=_Q8_SQL)
def q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: snowflake join (region->nation->customer) + a
    conditional-aggregate ratio. Region/nation broadcast; the ratio is
    double division of two exact decimal sums."""
    t = load_tables(spark, sf_dir, "lineitem", "supplier", "orders", "customer",
                    "nation", "region")
    cn = t["nation"].select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    sn = t["nation"].select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    asia = t["region"].filter(F.col("r_name") == "ASIA")
    df = (
        t["lineitem"]
        .join(t["supplier"], F.col("s_suppkey") == F.col("l_suppkey"))
        .join(
            t["orders"].filter(
                (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
                & (F.col("o_orderdate") < _ts("1998-01-01 00:00:00"))
            ),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(cn), F.col("cn_key") == F.col("c_nationkey"))
        .join(F.broadcast(asia), F.col("r_regionkey") == F.col("cn_region"))
        .join(F.broadcast(sn), F.col("sn_key") == F.col("s_nationkey"))
    )
    vol = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return df.select(
        F.year("o_orderdate").alias("o_year"),
        vol.alias("volume"),
        "supp_nation",
    ).groupBy("o_year").agg(
        (
            F.sum(
                F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(
                    F.lit(0)
                )
            ).cast("double")
            / F.sum("volume").cast("double")
        ).alias("mkt_share")
    )


# --- Q9: product profit by nation x year -----------------------------------

_Q9_SQL = """
SELECT n_name AS nation, YEAR(o_orderdate) AS o_year,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(9,2))
                  * (1 - CAST(l_discount AS DECIMAL(9,2)))
                - CAST(p_retailprice AS DECIMAL(9,2))
                  * CAST(l_quantity AS DECIMAL(9,2))
                  * CAST('0.6' AS DECIMAL(2,1))) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN nation   ON n_nationkey = s_nationkey
WHERE p_type = 'PROMO'
GROUP BY n_name, YEAR(o_orderdate)
"""


@register("tpch_q9_product_profit", sql=_Q9_SQL)
def q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (supplycost stood in by 0.6*retailprice — the corpus
    has no partsupp). Narrow decimal casts keep the product precision
    inside both engines' 38-digit cap so the exact sums agree."""
    t = load_tables(spark, sf_dir, "lineitem", "part", "supplier", "orders",
                    "nation")

    def d9(c: str) -> Column:
        return F.col(c).cast("decimal(9,2)")

    profit = d9("l_extendedprice") * (F.lit(1) - d9("l_discount")) - d9(
        "p_retailprice"
    ) * d9("l_quantity") * F.lit("0.6").cast("decimal(2,1)")
    df = (
        t["lineitem"]
        .join(
            t["part"].filter(F.col("p_type") == "PROMO"),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(t["supplier"], F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t["nation"]), F.col("n_nationkey") == F.col("s_nationkey"))
    )
    return df.groupBy(
        F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
    ).agg(F.sum(profit).cast("double").alias("sum_profit"))


# --- Q10: returned-item top customers (deterministic top-k) ----------------

_Q10_SQL = """
SELECT c_custkey, c_name, n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       CAST(ROUND(ANY_VALUE(c_acctbal), 2) AS DOUBLE) AS acctbal_r
FROM customer
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON n_nationkey = c_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-10-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register("tpch_q10_returned_items", sql=_Q10_SQL)
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: selective fact filter, 3 joins, grouped revenue,
    global top-20. LIMIT after ORDER BY uses Spark's TakeOrdered (no full
    sort); tie-break on c_custkey makes the cut deterministic."""
    t = load_tables(spark, sf_dir, "customer", "orders", "lineitem", "nation")
    df = (
        t["customer"]
        .join(
            t["orders"].filter(
                (F.col("o_orderdate") >= _ts("1997-10-01 00:00:00"))
                & (F.col("o_orderdate") < _ts("1998-01-01 00:00:00"))
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            t["lineitem"].filter(F.col("l_returnflag") == "R"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(t["nation"]), F.col("n_nationkey") == F.col("c_nationkey"))
    )
    agg = df.groupBy("c_custkey", "c_name", "n_name").agg(
        F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")))
        .cast("double")
        .alias("revenue"),
        F.round(F.any_value("c_acctbal"), 2).cast("double").alias("acctbal_r"),
    )
    return agg.orderBy(F.col("revenue").desc(), F.col("c_custkey")).limit(20)


# --- Q12: late-shipment priority classes (interval arithmetic) -------------

_Q12_SQL = """
SELECT YEAR(l_shipdate) AS ship_year,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
         AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
         AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON o_orderkey = l_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
GROUP BY YEAR(l_shipdate)
"""


@register("tpch_q12_late_shipments", sql=_Q12_SQL)
def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipmode stood in by priority classes): join with
    an interval predicate + conditional counts."""
    t = load_tables(spark, sf_dir, "lineitem", "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    df = t["lineitem"].join(
        t["orders"], F.col("o_orderkey") == F.col("l_orderkey")
    ).filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"))
    return df.groupBy(F.year("l_shipdate").alias("ship_year")).agg(
        F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
        F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
    )


# --- Q13: customer order-count distribution (outer join + double group) ----

_Q13_SQL = """
WITH c_orders AS (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
SELECT c_count, COUNT(*) AS custdist
FROM c_orders GROUP BY c_count
"""


@register("tpch_q13_customer_distribution", sql=_Q13_SQL)
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: outer join with a join-condition filter (NOT a
    post-filter — unmatched customers must survive), then two stacked
    aggregations. COUNT(col) skips the outer-join nulls."""
    t = load_tables(spark, sf_dir, "customer", "orders")
    o = t["orders"].filter(F.col("o_orderpriority") != "1-URGENT")
    joined = t["customer"].join(
        o, F.col("c_custkey") == F.col("o_custkey"), "left_outer"
    )
    per_cust = joined.groupBy("c_custkey").agg(
        F.count("o_orderkey").alias("c_count")
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


# --- Q14: promo revenue ratio ----------------------------------------------

_Q14_SQL = """
SELECT CAST(100.0 * SUM(CASE WHEN p_type = 'PROMO'
              THEN CAST(l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l_discount AS DECIMAL(18,2))) ELSE 0 END) AS DOUBLE)
     / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
     AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'
"""


@register("tpch_q14_promo_revenue", sql=_Q14_SQL)
def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: conditional-sum ratio over one selective month."""
    t = load_tables(spark, sf_dir, "lineitem", "part")
    rev = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    df = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= _ts("1997-09-01 00:00:00"))
            & (F.col("l_shipdate") < _ts("1997-10-01 00:00:00"))
        )
        .join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
    )
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))
    ).cast("double")
    return df.agg(
        (F.lit(100.0) * promo / F.sum(rev).cast("double")).alias("promo_revenue")
    )


# --- Q15: top supplier (scalar-subquery max) -------------------------------

_Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                  * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


@register("tpch_q15_top_supplier", sql=_Q15_SQL)
def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: derived revenue table reused twice (agg + scalar
    max) — the max is broadcast back as a 1-row cross join, no collect."""
    t = load_tables(spark, sf_dir, "lineitem", "supplier")
    revenue = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < _ts("1996-04-01 00:00:00"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")))
            .cast("double")
            .alias("total_revenue")
        )
    )
    mx = revenue.agg(F.max("total_revenue").alias("max_rev"))
    return (
        t["supplier"]
        .join(revenue, F.col("s_suppkey") == F.col("supplier_no"))
        .join(F.broadcast(mx), F.col("total_revenue") == F.col("max_rev"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# --- Q16: supplier count by part attributes --------------------------------

_Q16_SQL = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM part JOIN lineitem ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
GROUP BY p_brand, p_type, p_size
"""


@register("tpch_q16_supplier_cnt", sql=_Q16_SQL)
def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: negated + IN-list dimension predicates, distinct
    aggregate. Spark plans count(distinct) as a two-phase expand+agg."""
    t = load_tables(spark, sf_dir, "part", "lineitem")
    p = t["part"].filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
    )
    return (
        p.join(t["lineitem"], F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# --- Q17: small-quantity correlated average --------------------------------

_Q17_SQL = """
WITH pa AS (
  SELECT l_partkey AS pk,
         0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*))
         AS qty_threshold
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
       AS DOUBLE) AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN pa ON pa.pk = l_partkey
WHERE p_brand = 'Brand#3' AND l_quantity < qty_threshold
"""


@register("tpch_q17_small_quantity", sql=_Q17_SQL)
def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery decorrelated into a
    per-part aggregate + re-join (exactly what Catalyst does with the SQL
    form). The threshold is derived identically in both engines: exact
    decimal sum -> double / count."""
    t = load_tables(spark, sf_dir, "lineitem", "part")
    pa = t["lineitem"].groupBy(F.col("l_partkey").alias("pk")).agg(
        (
            F.lit(0.2)
            * (F.sum(_dec("l_quantity")).cast("double") / F.count("*"))
        ).alias("qty_threshold")
    )
    df = (
        t["lineitem"]
        .join(
            t["part"].filter(F.col("p_brand") == "Brand#3"),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(pa, F.col("pk") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
    )
    return df.agg(
        (F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias(
            "avg_yearly"
        )
    )


# --- Q18: large-volume customers (HAVING over join) ------------------------

_Q18_SQL = """
WITH big AS (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150
)
SELECT c_name, c_custkey, o_orderkey, o_orderdate,
       CAST(o_totalprice AS DOUBLE) AS totalprice,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM customer
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE o_orderkey IN (SELECT l_orderkey FROM big)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
"""


@register("tpch_q18_large_volume", sql=_Q18_SQL)
def q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING-filtered subquery as a semi join back onto
    the fact table. The `big` keyset is small -> broadcast semi join."""
    t = load_tables(spark, sf_dir, "customer", "orders", "lineitem")
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("sq"))
        .filter(F.col("sq") > 150)
        .select("l_orderkey")
    )
    li = t["lineitem"].join(
        F.broadcast(big.withColumnRenamed("l_orderkey", "big_key")),
        F.col("l_orderkey") == F.col("big_key"),
        "left_semi",
    )
    df = (
        t["customer"]
        .join(t["orders"], F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
    )
    return df.groupBy(
        "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
    ).agg(F.sum(_dec("l_quantity")).cast("double").alias("sum_qty")).select(
        "c_name",
        "c_custkey",
        "o_orderkey",
        "o_orderdate",
        F.col("o_totalprice").cast("double").alias("totalprice"),
        "sum_qty",
    )


# --- Q19: OR-of-ANDs pushdown ----------------------------------------------

_Q19_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity >= 1 AND l_quantity <= 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
       AND l_quantity >= 10 AND l_quantity <= 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
       AND l_quantity >= 20 AND l_quantity <= 30)
"""


@register("tpch_q19_discounted_revenue", sql=_Q19_SQL)
def q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of conjunctive range predicates across
    both join sides — Catalyst pushes the per-table residuals below the
    join and keeps the cross-table OR as the join filter."""
    t = load_tables(spark, sf_dir, "lineitem", "part")
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
         & (q >= 1) & (q <= 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25)
           & (q >= 10) & (q <= 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35)
           & (q >= 20) & (q <= 30))
    )
    return (
        t["lineitem"]
        .join(t["part"], F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(
            F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
    )


# --- Q22: dormant rich customers (anti join + global scalar) ---------------

_Q22_SQL = """
WITH avg_bal AS (
  SELECT AVG(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0
)
SELECT c_nationkey, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer, avg_bal
WHERE c_acctbal > ab
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY c_nationkey
"""


@register("tpch_q22_dormant_customers", sql=_Q22_SQL)
def q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: global scalar subquery (avg balance) broadcast as
    a 1-row cross join + NOT EXISTS as a left anti join."""
    t = load_tables(spark, sf_dir, "customer", "orders")
    avg_bal = (
        t["customer"]
        .filter(F.col("c_acctbal") > 0)
        .agg(F.avg("c_acctbal").alias("ab"))
    )
    recent = t["orders"].filter(
        F.col("o_orderdate") >= _ts("2000-01-01 00:00:00")
    )
    rich = (
        t["customer"]
        .crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
    )
    dormant = rich.join(
        recent, F.col("o_custkey") == F.col("c_custkey"), "left_anti"
    )
    return dormant.groupBy("c_nationkey").agg(
        F.count("*").alias("numcust"),
        F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
    )


# --- CUBE over two dimensions ----------------------------------------------

_CUBE_SQL = """
SELECT c_mktsegment, o_orderpriority, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM customer JOIN orders ON o_custkey = c_custkey
GROUP BY CUBE (c_mktsegment, o_orderpriority)
"""


@register("agg_cube_segment_priority", sql=_CUBE_SQL)
def cube_segment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 2^2 grouping combinations in one pass (Spark Expand
    operator multiplies rows by 4 pre-shuffle, partial aggs keep the
    shuffle small)."""
    t = load_tables(spark, sf_dir, "customer", "orders")
    df = t["customer"].join(t["orders"], F.col("o_custkey") == F.col("c_custkey"))
    return df.cube("c_mktsegment", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.sum(_dec("o_totalprice")).cast("double").alias("sum_price"),
    )


# --- GROUPING SETS (SQL surface) -------------------------------------------

_GSETS_SQL = """
SELECT n_name, c_mktsegment, COUNT(*) AS n_cust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
FROM customer JOIN nation ON n_nationkey = c_nationkey
GROUP BY GROUPING SETS ((n_name), (c_mktsegment), ())
"""


@register("agg_grouping_sets_nation_segment", sql=_GSETS_SQL)
def grouping_sets_nation_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS through the engine's SQL surface (temp views
    + spark.sql) — same Expand-based plan as cube/rollup."""
    t = load_tables(spark, sf_dir, "customer", "nation")
    t["customer"].createOrReplaceTempView("customer_v")
    t["nation"].createOrReplaceTempView("nation_v")
    return spark.sql(
        """
        SELECT n_name, c_mktsegment, COUNT(*) AS n_cust,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        FROM customer_v JOIN nation_v ON n_nationkey = c_nationkey
        GROUP BY GROUPING SETS ((n_name), (c_mktsegment), ())
        """
    )


# --- Running window aggregate (frame-ordered exact sum) --------------------

_RUNNING_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
           PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
       AS running_spend
FROM orders
"""


@register("window_running_customer_spend", sql=_RUNNING_SQL)
def window_running_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per customer with an explicit ROWS frame; decimal
    accumulation makes the running values association-independent, so both
    engines agree bit-for-bit."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(_dec("o_totalprice")).over(w).cast("double").alias("running_spend"),
    )
