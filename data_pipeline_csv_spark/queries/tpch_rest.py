"""The remaining TPC-H queries (Q2, Q4, Q6, Q9, Q11, Q12, Q15, Q16,
Q19, Q20, Q21), completing the 22-query suite together with
relational.py (Q1/Q3/Q5/Q14-as-promo) and tpch_extra.py.

The driver schema has no partsupp table and no commit/receipt dates,
phone, container, shipmode or comment columns, so the queries that
depend on them are adapted while keeping their defining relational
shape (noted per query): correlated scalar subqueries (Q2/Q15/Q17),
EXISTS/NOT EXISTS (Q4/Q21/Q22), HAVING over a scalar fraction (Q11),
disjunctive multi-range predicates (Q19), distinct-count with NOT IN
(Q16), nested semi-joins (Q18/Q20).

Determinism: money sums use the canonical fixed-point recipe
(queries/canon.py); MIN/MAX over doubles are comparisons (order-safe);
scalar thresholds are a single IEEE op on exact integer sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .canon import CENT_SCALE, REV_SCALE, REV_TERM_SQL, fp_money, fp_sql, fp_sum, rev_term
from .registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------
# Q2 minimum-cost supplier (adapted: unit cost from lineitem, not
# partsupp — MIN(extendedprice/quantity) per (part, supplier))
# --------------------------------------------------------------------
@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH supply AS (
      SELECT l_partkey, l_suppkey, MIN(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem GROUP BY 1, 2
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name, unit_cost
    FROM part
    JOIN supply   ON l_partkey = p_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE p_type = 'LARGE' AND p_size <= 15 AND r_name = 'EUROPE'
      AND unit_cost = (
        SELECT MIN(s2.unit_cost)
        FROM supply s2
        JOIN supplier sp ON sp.s_suppkey = s2.l_suppkey
        JOIN nation n2 ON sp.s_nationkey = n2.n_nationkey
        JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
        WHERE s2.l_partkey = p_partkey AND r2.r_name = 'EUROPE'
      )
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    doc="TPC-H Q2 (adapted: unit cost = MIN(price/qty) from lineitem, no "
    "partsupp): correlated scalar MIN decorrelated into a per-part "
    "minimum over region-filtered suppliers joined back on equality — "
    "MIN over doubles is a comparison, so the equality join is exact.",
    tags=("join", "subquery", "tpch"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter((F.col("p_type") == "LARGE") & (F.col("p_size") <= 15))
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")

    supply = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    eu_supply = (
        supply.join(supp, supply.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    min_cost = eu_supply.groupBy(F.col("l_partkey").alias("mc_partkey")).agg(
        F.min("unit_cost").alias("min_cost")
    )
    return (
        eu_supply.join(
            min_cost,
            (F.col("l_partkey") == F.col("mc_partkey"))
            & (F.col("unit_cost") == F.col("min_cost")),
        )
        .join(part, F.col("l_partkey") == part.p_partkey)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "unit_cost")
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


# --------------------------------------------------------------------
# Q4 order priority checking (adapted: EXISTS a returned line instead
# of the absent commit/receipt-date lateness predicate)
# --------------------------------------------------------------------
@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (
        SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'
      )
    GROUP BY 1 ORDER BY 1
    """,
    doc="TPC-H Q4 (adapted: EXISTS returned-line instead of late-line): "
    "quarter window + EXISTS as a left-semi join, counts per priority.",
    tags=("semi", "agg", "tpch"),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-07-01") & (F.col("o_orderdate") < "1996-10-01")
    )
    returned = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        orders.join(returned, orders.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------
# Q6 forecasting revenue change (verbatim shape)
# --------------------------------------------------------------------
@query(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT {fp_sql("l_extendedprice * l_discount", REV_SCALE)} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6: pure scan+filter+agg — the predicate triple pushes to "
    "the parquet scan and the sum needs no shuffle beyond one exchange "
    "of 32 partial rows.",
    tags=("filter", "agg", "tpch"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            fp_money(F.col("l_extendedprice") * F.col("l_discount"), REV_SCALE).alias(
                "revenue"
            )
        )
    )


# --------------------------------------------------------------------
# Q9 product type profit (adapted: supply cost proxied by
# 0.5 * p_retailprice, no partsupp)
# --------------------------------------------------------------------
_PROFIT_SQL = "l_extendedprice * (1 - l_discount) - 0.5 * p_retailprice * l_quantity"


@query(
    "q9_product_profit",
    oracle=f"""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
           {fp_sql(_PROFIT_SQL, REV_SCALE)} AS sum_profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%bolt%'
    GROUP BY 1, 2
    ORDER BY nation, o_year DESC
    """,
    doc="TPC-H Q9 (adapted: supply cost = 0.5*p_retailprice, part-name "
    "token '%bolt%'): profit by supplier nation and order year; the "
    "profit term is one shared IEEE expression quantized once.",
    tags=("join", "agg", "tpch"),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%"))
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    nation = _t(spark, sf_dir, "nation")
    profit = (
        F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
        - F.lit(0.5) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(fp_money(profit, REV_SCALE).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


# --------------------------------------------------------------------
# Q11 important stock (adapted: part value from lineitem revenue in
# one nation; HAVING over a scalar fraction of the total)
# --------------------------------------------------------------------
@query(
    "q11_important_parts",
    oracle=f"""
    WITH j AS (
      SELECT l_partkey, {REV_TERM_SQL} AS v
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_7'
    ),
    per AS (SELECT l_partkey, {fp_sql("v", REV_SCALE)} AS value FROM j GROUP BY 1),
    tot AS (SELECT {fp_sql("v", REV_SCALE)} AS total FROM j)
    SELECT l_partkey, value
    FROM per, tot
    WHERE value > total * 0.001
    ORDER BY value DESC, l_partkey
    """,
    doc="TPC-H Q11 (adapted: part value = lineitem revenue, one supplier "
    "nation): HAVING against a scalar fraction of the global total — "
    "both sides of the cut are canonical fixed-point doubles, the "
    "threshold one IEEE multiply.",
    tags=("join", "agg", "subquery", "tpch"),
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    j = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .select("l_partkey", rev_term().alias("v"))
    )
    per = j.groupBy("l_partkey").agg(fp_money(F.col("v"), REV_SCALE).alias("value"))
    tot = j.agg(fp_money(F.col("v"), REV_SCALE).alias("total"))
    return (
        per.crossJoin(F.broadcast(tot))
        .filter(F.col("value") > F.col("total") * 0.001)
        .select("l_partkey", "value")
        .orderBy(F.col("value").desc(), "l_partkey")
    )


# --------------------------------------------------------------------
# Q12 shipping modes (adapted: l_linestatus stands in for the absent
# l_shipmode; priority classification kept verbatim)
# --------------------------------------------------------------------
@query(
    "q12_priority_lines",
    oracle="""
    SELECT l_linestatus,
      CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY 1 ORDER BY 1
    """,
    doc="TPC-H Q12 (adapted: linestatus instead of shipmode): conditional "
    "counts by priority class over a ship-year window.",
    tags=("join", "agg", "case", "tpch"),
)
def q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    orders = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


# --------------------------------------------------------------------
# Q15 top supplier (scalar MAX subquery over a revenue view)
# --------------------------------------------------------------------
@query(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue0 AS (
      SELECT l_suppkey AS supplier_no, {fp_sql(REV_TERM_SQL, REV_SCALE)} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY 1
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue0 ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue0)
    ORDER BY s_suppkey
    """,
    doc="TPC-H Q15: supplier(s) achieving the maximum quarter revenue — "
    "scalar MAX over canonical doubles joined back on equality.",
    tags=("agg", "subquery", "tpch"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    supp = _t(spark, sf_dir, "supplier")
    rev0 = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        fp_money(rev_term(), REV_SCALE).alias("total_revenue")
    )
    mx = rev0.agg(F.max("total_revenue").alias("mx"))
    return (
        rev0.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(supp, F.col("supplier_no") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------
# Q16 supplier diversity per part attribute (adapted: suppliers from
# lineitem; "complaints" exclusion = negative account balance)
# --------------------------------------------------------------------
@query(
    "q16_part_supplier_diversity",
    oracle="""
    SELECT p_brand, p_type, p_size, CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#13' AND p_type <> 'PROMO'
      AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
    GROUP BY 1, 2, 3
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    doc="TPC-H Q16 (adapted: supplier set from lineitem, exclusion = "
    "negative balance): distinct-supplier counts per part attribute "
    "with a NOT IN anti-join.",
    tags=("join", "agg", "anti", "distinct", "tpch"),
)
def q16_part_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
    )
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0.0).select("s_suppkey")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


# --------------------------------------------------------------------
# Q19 discounted revenue (disjunctive multi-range predicate; container
# replaced by p_size ranges)
# --------------------------------------------------------------------
@query(
    "q19_disjunctive_revenue",
    oracle=f"""
    SELECT {fp_sql(REV_TERM_SQL, REV_SCALE)} AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H Q19 (adapted: p_size ranges instead of containers): "
    "three-branch disjunctive predicate across the join — Catalyst "
    "pushes the common join key and evaluates the OR post-join.",
    tags=("join", "filter", "tpch"),
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#14")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(fp_money(rev_term(), REV_SCALE).alias("revenue"))
    )


# --------------------------------------------------------------------
# Q20 potential part promotion (adapted: a supplier qualifies if it
# shipped >12% of some SMALL part's total shipped quantity)
# --------------------------------------------------------------------
@query(
    "q20_dominant_suppliers",
    oracle="""
    WITH shipped AS (
      SELECT l_partkey, l_suppkey,
             CAST(SUM(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_fp
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_type = 'SMALL'
      GROUP BY 1, 2
    ),
    per_part AS (
      SELECT l_partkey, CAST(SUM(qty_fp) AS BIGINT) AS total_fp FROM shipped GROUP BY 1
    )
    SELECT s_suppkey, s_name, s_acctbal
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM shipped JOIN per_part USING (l_partkey)
      WHERE CAST(qty_fp AS DOUBLE) > 0.12 * CAST(total_fp AS DOUBLE)
    )
    ORDER BY s_name
    """,
    doc="TPC-H Q20 (adapted: dominance = >12% of a SMALL part's shipped "
    "quantity, no partsupp availqty): nested aggregation feeding a "
    "semi-join on the supplier key; quantities accumulate as exact "
    "int64 fixed-point.",
    tags=("join", "agg", "semi", "subquery", "tpch"),
)
def q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "SMALL")
    supp = _t(spark, sf_dir, "supplier")
    shipped = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(fp_sum(F.col("l_quantity"), CENT_SCALE).cast("bigint").alias("qty_fp"))
    )
    per_part = shipped.groupBy(F.col("l_partkey").alias("pp_partkey")).agg(
        F.sum("qty_fp").cast("bigint").alias("total_fp")
    )
    dominant = (
        shipped.join(per_part, shipped.l_partkey == F.col("pp_partkey"))
        .filter(F.col("qty_fp").cast("double") > 0.12 * F.col("total_fp").cast("double"))
        .select("l_suppkey")
    )
    return (
        supp.join(dominant, supp.s_suppkey == dominant.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
        .orderBy("s_name")
    )


# --------------------------------------------------------------------
# Q21 suppliers who kept orders waiting (adapted: "late" = returned
# line; multi-supplier EXISTS / sole-offender NOT EXISTS kept)
# --------------------------------------------------------------------
@query(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM lineitem l1
    JOIN supplier ON s_suppkey = l1.l_suppkey
    WHERE l1.l_returnflag = 'R'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_returnflag = 'R'
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
    doc="TPC-H Q21 (adapted: offense = returned line, no receipt dates): "
    "EXISTS/NOT EXISTS pair decorrelated into per-order supplier and "
    "offender distinct-counts — a returned line counts iff its order "
    "has >=2 suppliers and exactly one offending supplier.",
    tags=("join", "agg", "semi", "anti", "subquery", "tpch"),
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    per_order = li.groupBy(F.col("l_orderkey").alias("po_orderkey")).agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_offenders"),
    )
    l1 = li.filter(F.col("l_returnflag") == "R")
    return (
        l1.join(
            per_order,
            (l1.l_orderkey == F.col("po_orderkey"))
            & (F.col("n_supp") >= 2)
            & (F.col("n_offenders") == 1),
        )
        .join(supp, l1.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )
