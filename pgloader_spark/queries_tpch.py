"""TPC-H-shaped analytical queries 2/7/8/9/10/11/12/14/15/16/17/19/20/21/22.

The reference (dimitri/pgloader) migrates data; its regress suite proves
row-level fidelity with EXCEPT diffs (src/regress/regress.lisp:97-109).
These queries widen the analytical surface of the Spark engine over the
same tables — each shape maps to a classic TPC-H pattern, adapted to
the testdata schema (no partsupp table: lineitem's (l_partkey,
l_suppkey) pairs are the part-supplier bridge).

Plan discipline (the point at 100 TB):
- nation/region are fixed-cardinality (25/5 rows): always broadcast.
- customer/supplier/part/orders/lineitem scale with SF: never
  broadcast-hinted; AQE may still decide at runtime for small SFs.
- money math in DECIMAL (exact, engine-order-independent), cast to
  DOUBLE only in the final projection; ratios rounded to 6 decimals.
- correlated subqueries are decorrelated by hand into windows or
  aggregate-joins — the shapes Catalyst itself can't always rewrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from pgloader_spark.queries import DEC, _dec, query
from pgloader_spark.session import read_table

_B = F.broadcast  # for fixed-cardinality dims only (nation, region)

_DISC_PRICE_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"
)


def _disc_price():
    one = F.lit(1).cast(DEC)
    return _dec("l_extendedprice") * (one - _dec("l_discount"))


@query(
    "q2_min_cost_supplier",
    oracle=f"""
WITH costs AS (
  SELECT l_partkey, l_suppkey,
         MIN(round(l_extendedprice / l_quantity, 6)) AS unit_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey),
ranked AS (
  SELECT p_partkey, p_name, s_name, n_name, unit_cost,
         MIN(unit_cost) OVER (PARTITION BY p_partkey) AS best_cost
  FROM costs
  JOIN part ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  JOIN region ON r_regionkey = n_regionkey
  WHERE p_size = 15 AND p_type = 'LARGE' AND r_name = 'EUROPE')
SELECT p_partkey, p_name, s_name, n_name, unit_cost
FROM ranked WHERE unit_cost = best_cost
""",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated-min subquery, decorrelated to a window.

    The classic `WHERE cost = (SELECT min(cost) ... WHERE same part)`
    becomes a min-over-partition window — one shuffle on p_partkey
    instead of a per-row subquery. Part filter prunes before any join.
    """
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "LARGE")
    )
    supp = read_table(spark, sf_dir, "supplier")
    nat = read_table(spark, sf_dir, "nation")
    reg = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    costs = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.round(F.col("l_extendedprice") / F.col("l_quantity"), 6)).alias(
            "unit_cost"
        )
    )
    joined = (
        costs.join(part, costs.l_partkey == part.p_partkey)
        .join(supp, costs.l_suppkey == supp.s_suppkey)
        .join(_B(nat), supp.s_nationkey == nat.n_nationkey)
        .join(_B(reg), nat.n_regionkey == reg.r_regionkey)
    )
    best = F.min("unit_cost").over(W.partitionBy("p_partkey"))
    return (
        joined.withColumn("best_cost", best)
        .filter(F.col("unit_cost") == F.col("best_cost"))
        .select("p_partkey", "p_name", "s_name", "n_name", "unit_cost")
    )


@query(
    "q7_volume_shipping",
    oracle=f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
       CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation n1 ON n1.n_nationkey = s_nationkey
JOIN nation n2 ON n2.n_nationkey = c_nationkey
WHERE l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY 1, 2, 3
""",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: two roles of one dim table + OR-pair predicate.

    nation joins twice (supplier side, customer side) — both broadcast;
    the OR-of-nation-pairs predicate lands after both joins, where
    Catalyst can still push each disjunct's nation filter into the
    broadcast build sides.
    """
    li = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between("1995-01-01", "1996-12-31 00:00:00")
    )
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    supp = read_table(spark, sf_dir, "supplier")
    nat = read_table(spark, sf_dir, "nation")
    n1 = nat.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nat.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair_ok = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(_B(n1), supp.s_nationkey == F.col("n1_key"))
        .join(_B(n2), cust.c_nationkey == F.col("n2_key"))
        .filter(pair_ok)
        .withColumn("l_year", F.year("l_shipdate").cast("int"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
    )


@query(
    "q8_market_share",
    oracle=f"""
WITH all_nations AS (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
         {_DISC_PRICE_SQL} AS volume,
         n2.n_name AS nation
  FROM lineitem
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON n1.n_nationkey = c_nationkey
  JOIN region ON r_regionkey = n1.n_regionkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation n2 ON n2.n_nationkey = s_nationkey
  JOIN part ON p_partkey = l_partkey
  WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
    AND o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31')
SELECT o_year,
       round(CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume
                           ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
FROM all_nations GROUP BY o_year
""",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: 7-table join + conditional-share aggregation."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between("1995-01-01", "1996-12-31 00:00:00")
    )
    cust = read_table(spark, sf_dir, "customer")
    supp = read_table(spark, sf_dir, "supplier")
    part = read_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    nat = read_table(spark, sf_dir, "nation")
    reg = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = nat.select("n_nationkey", "n_regionkey")
    n2 = nat.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    vol = _disc_price()
    zero = F.lit(0).cast(DEC)
    base = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(_B(n1), cust.c_nationkey == n1.n_nationkey)
        .join(_B(reg), n1.n_regionkey == reg.r_regionkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(_B(n2), supp.s_nationkey == F.col("n2_key"))
        .join(part, li.l_partkey == part.p_partkey)
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            vol.alias("volume"),
            F.col("nation"),
        )
    )
    share = F.round(
        F.sum(F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(zero))
        .cast("double")
        / F.sum("volume").cast("double"),
        6,
    )
    return base.groupBy("o_year").agg(share.alias("mkt_share"))


@query(
    "q9_product_profit",
    oracle=f"""
SELECT n_name AS nation,
       CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
       CAST(SUM({_DISC_PRICE_SQL}
                - CAST(round(p_retailprice * 0.1 * l_quantity, 2) AS DECIMAL(18,2)))
            AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
JOIN orders ON o_orderkey = l_orderkey
WHERE p_name LIKE 'red%'
GROUP BY 1, 2
""",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit rollup with a LIKE-filtered part dim.

    Supply cost proxied as 10% of p_retailprice per unit (the schema
    has no partsupp); rounded to cents in DECIMAL so both engines sum
    identical exact values.
    """
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    supp = read_table(spark, sf_dir, "supplier")
    nat = read_table(spark, sf_dir, "nation")
    orders = read_table(spark, sf_dir, "orders")
    cost = F.round(F.col("p_retailprice") * 0.1 * F.col("l_quantity"), 2).cast(DEC)
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(_B(nat), supp.s_nationkey == nat.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
            (_disc_price() - cost).alias("profit"),
        )
        .groupBy("nation", "o_year")
        .agg(F.sum("profit").cast("double").alias("sum_profit"))
    )


@query(
    "q10_returned_items",
    oracle=f"""
SELECT c_custkey, c_name,
       CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE) AS revenue,
       c_acctbal, n_name
FROM customer
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON n_nationkey = c_nationkey
WHERE o_orderdate >= TIMESTAMP '1995-10-01'
  AND o_orderdate < TIMESTAMP '1996-01-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue, top-20 customers."""
    li = read_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-10-01") & (F.col("o_orderdate") < "1996-01-01")
    )
    cust = read_table(spark, sf_dir, "customer")
    nat = read_table(spark, sf_dir, "nation")
    return (
        cust.join(orders, orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(_B(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "q11_important_stock",
    oracle=f"""
WITH vals AS (
  SELECT l_partkey,
         SUM({_DISC_PRICE_SQL}) AS value_dec
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  WHERE n_name = 'NATION_5'
  GROUP BY l_partkey)
SELECT l_partkey AS partkey, CAST(value_dec AS DOUBLE) AS part_value
FROM vals
WHERE value_dec > (SELECT SUM(value_dec) * 0.001 FROM vals)
""",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: HAVING against an uncorrelated scalar aggregate.

    The grand total rides a 1-row broadcast cross join (never a
    collect): one pass builds per-part values, a second trivially
    small plan aggregates them — Spark reuses the shuffle output of
    the first aggregation for both (ReusedExchange).
    """
    li = read_table(spark, sf_dir, "lineitem")
    supp = read_table(spark, sf_dir, "supplier")
    nat = read_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    vals = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(_B(nat), supp.s_nationkey == nat.n_nationkey)
        .groupBy("l_partkey")
        .agg(F.sum(_disc_price()).alias("value_dec"))
    )
    total = vals.agg((F.sum("value_dec") * F.lit(0.001)).alias("threshold"))
    return (
        vals.join(_B(total))
        .filter(F.col("value_dec") > F.col("threshold"))
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("value_dec").cast("double").alias("part_value"),
        )
    )


@query(
    "q12_priority_shipping",
    oracle="""
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
WHERE l_returnflag = 'A'
  AND l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_linestatus
ORDER BY l_linestatus
""",
)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: join + conditional counts by category."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_returnflag") == "A")
        & (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
    )
    orders = read_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@query(
    "q14_promo_revenue",
    oracle=f"""
SELECT round(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                                   THEN {_DISC_PRICE_SQL}
                                   ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE), 6) AS promo_revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01' AND l_shipdate < TIMESTAMP '1996-04-01'
""",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-share scalar over a month window."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-03-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    part = read_table(spark, sf_dir, "part")
    zero = F.lit(0).cast(DEC)
    promo = F.when(F.col("p_type") == "PROMO", _disc_price()).otherwise(zero)
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(_disc_price()).cast("double"),
                6,
            ).alias("promo_revenue")
        )
    )


@query(
    "q15_top_supplier",
    oracle=f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM({_DISC_PRICE_SQL}) AS total_dec
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, CAST(total_dec AS DOUBLE) AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_dec = (SELECT MAX(total_dec) FROM revenue)
""",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: view + scalar-max subquery.

    Equality against max is evaluated on the DECIMAL sums (exact on
    both engines); the 1-row max broadcasts. Spark reuses the revenue
    aggregation's shuffle for both consumers.
    """
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    supp = read_table(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_disc_price()).alias("total_dec")
    )
    mx = revenue.agg(F.max("total_dec").alias("max_dec"))
    return (
        supp.join(revenue, supp.s_suppkey == revenue.supplier_no)
        .join(_B(mx))
        .filter(F.col("total_dec") == F.col("max_dec"))
        .select(
            "s_suppkey", "s_name", F.col("total_dec").cast("double").alias("total_revenue")
        )
    )


@query(
    "q16_supplier_part_types",
    oracle="""
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
""",
)
def q16_supplier_part_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: NOT-IN anti-join + COUNT DISTINCT rollup.

    The NOT IN subquery has no NULL keys (s_suppkey is a PK), so it is
    exactly a left-anti join — the scalable form (a real NOT IN with
    nullable keys needs a null-aware anti join, which Spark also
    supports via AQE's null-aware anti join for single-column cases).
    """
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
    )
    bad_supp = (
        read_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(bad_supp, li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
WITH avg_qty AS (
  SELECT l_partkey AS ap_partkey, 0.2 * AVG(l_quantity) AS qty_threshold
  FROM lineitem GROUP BY l_partkey)
SELECT round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 6)
       AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN avg_qty ON ap_partkey = l_partkey
WHERE p_brand = 'Brand#2' AND l_quantity < qty_threshold
""",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated AVG subquery, decorrelated to an
    aggregate-join (per-part thresholds computed once, joined back)."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#2")
    avg_qty = li.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(avg_qty, li.l_partkey == avg_qty.ap_partkey)
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            F.round(F.sum(_dec("l_extendedprice")).cast("double") / 7.0, 6).alias(
                "avg_yearly"
            )
        )
    )


@query(
    "q19_discounted_revenue",
    oracle=f"""
SELECT CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
""",
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs across both join sides.

    Catalyst factors the per-side conjuncts out of the disjunction
    (brand/size prune part scans, quantity prunes lineitem) before the
    join — the textbook predicate-pushdown-through-OR case.
    """
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#4")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
    )


@query(
    "q20_excess_suppliers",
    oracle="""
SELECT s_name, n_name
FROM supplier
JOIN nation ON n_nationkey = s_nationkey
WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
  AND s_suppkey IN (
    SELECT l_suppkey FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_type = 'PROMO'
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_suppkey
    HAVING SUM(l_quantity) > 50)
""",
)
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: IN over a grouped-HAVING subquery → semi-join."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    part = read_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    supp = read_table(spark, sf_dir, "supplier")
    nat = read_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3")
    )
    heavy = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
    )
    return (
        supp.join(_B(nat), supp.s_nationkey == nat.n_nationkey)
        .join(heavy, supp.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_name", "n_name")
    )


@query(
    "q21_sole_return_supplier",
    oracle="""
WITH order_stats AS (
  SELECT l_orderkey AS ok,
         COUNT(DISTINCT l_suppkey) AS n_supps,
         COUNT(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END)
           AS n_r_supps,
         MIN(CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS r_supp
  FROM lineitem GROUP BY l_orderkey)
SELECT s_name, COUNT(*) AS numwait
FROM order_stats
JOIN orders ON o_orderkey = ok
JOIN supplier ON s_suppkey = r_supp
WHERE o_orderstatus = 'F' AND n_supps >= 2 AND n_r_supps = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 25
""",
)
def q21_sole_return_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: EXISTS (other supplier on the order) AND NOT
    EXISTS (other supplier also flagged), decorrelated to one grouped
    pass over lineitem.

    The textbook form is two correlated subqueries; one aggregation
    computing (distinct suppliers, distinct flagged suppliers) per
    order replaces both — a single shuffle instead of two self-joins.
    """
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    supp = read_table(spark, sf_dir, "supplier")
    r_supp = F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
    stats = (
        li.groupBy(F.col("l_orderkey").alias("ok"))
        .agg(
            F.count_distinct("l_suppkey").alias("n_supps"),
            F.count_distinct(r_supp).alias("n_r_supps"),
            F.min(r_supp).alias("r_supp"),
        )
        .filter((F.col("n_supps") >= 2) & (F.col("n_r_supps") == 1))
    )
    return (
        stats.join(orders, stats.ok == orders.o_orderkey)
        .join(supp, stats.r_supp == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(25)
    )


@query(
    "q22_acctbal_opportunity",
    oracle="""
WITH avg_bal AS (
  SELECT AVG(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0.0),
eligible AS (
  SELECT right(c_name, 2) AS cntrycode, c_acctbal
  FROM customer, avg_bal
  WHERE c_acctbal > ab
    AND NOT EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '2000-01-01'))
SELECT cntrycode, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM eligible GROUP BY cntrycode
""",
)
def q22_acctbal_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar-avg threshold + NOT EXISTS anti-join.

    The NOT EXISTS is windowed (no orders since 2000-01-01): "lapsed
    high-balance customers" — the anti-join's build side shrinks to
    recent orders, which is also the scalable form.
    """
    cust = read_table(spark, sf_dir, "customer")
    orders = (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "2000-01-01")
        .select("o_custkey")
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("ab")
    )
    return (
        cust.join(_B(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select(
            F.expr("right(c_name, 2)").alias("cntrycode"),
            F.col("c_acctbal"),
        )
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )
