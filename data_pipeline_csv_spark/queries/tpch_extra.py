"""Extended TPC-H-style query suite, adapted to the driver's trimmed
star schema (no partsupp; no commit/receipt dates, phone, container or
shipmode columns — adaptations noted per query).

Scale notes: constant-size dims (region/nation) carry explicit
broadcast hints; scale-growing tables (supplier/part/customer) carry
NO hint — AQE broadcasts them while they fit (they do at every test
SF) and shuffle-hashes them at real SFs where a hint would OOM the
executors. Facts shuffle only on their join/group keys, and all money
sums are exact fixed-point arithmetic so plans can be reordered
freely without changing results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .canon import CENT_SCALE, REV_SCALE, REV_TERM_SQL, fp_money, fp_sql, rev_term
from .registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


_rev = rev_term


# --------------------------------------------------------------------
# Q7 volume shipping: revenue between two nations by year
# --------------------------------------------------------------------
@query(
    "q7_volume_shipping",
    oracle=f"""
    SELECT
      ns.n_name AS supp_nation,
      nc.n_name AS cust_nation,
      CAST(year(l_shipdate) AS INT) AS l_year,
      {fp_sql(REV_TERM_SQL, REV_SCALE)} AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey  = c_custkey
    JOIN supplier ON l_suppkey  = s_suppkey
    JOIN nation ns ON s_nationkey = ns.n_nationkey
    JOIN nation nc ON c_nationkey = nc.n_nationkey
    WHERE ((ns.n_name = 'NATION_3' AND nc.n_name = 'NATION_8')
        OR (ns.n_name = 'NATION_8' AND nc.n_name = 'NATION_3'))
      AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
    GROUP BY 1, 2, 3
    """,
    doc="TPC-H Q7 (adapted: no shipmode filter; testdata nation names): bi-national trade flows; "
    "two broadcast nation joins disambiguated by alias.",
    tags=("join", "agg", "tpch"),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between("1996-01-01", "1997-12-31 00:00:00")
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    ns = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    nc = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(
            ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_8"))
            | ((F.col("supp_nation") == "NATION_8") & (F.col("cust_nation") == "NATION_3"))
        )
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year")
        )
        .agg(fp_money(_rev(), REV_SCALE).alias("revenue"))
    )


# --------------------------------------------------------------------
# Q8 market share of one nation within a region's imports
# --------------------------------------------------------------------
@query(
    "q8_market_share",
    oracle=f"""
    WITH all_nations AS (
      SELECT
        CAST(year(o_orderdate) AS INT) AS o_year,
        l_extendedprice * (1 - l_discount) AS volume,
        ns.n_name AS supp_nation
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey  = c_custkey
      JOIN nation nc ON c_nationkey = nc.n_nationkey
      JOIN region   ON nc.n_regionkey = r_regionkey
      JOIN supplier ON l_suppkey  = s_suppkey
      JOIN nation ns ON s_nationkey = ns.n_nationkey
      JOIN part     ON l_partkey  = p_partkey
      WHERE r_name = 'EUROPE' AND p_type = 'ECONOMY'
        AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
    )
    SELECT
      o_year,
      ({fp_sql("CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0.0 END", REV_SCALE)})
        / ({fp_sql("volume", REV_SCALE)}) AS mkt_share
    FROM all_nations
    GROUP BY o_year
    """,
    doc="TPC-H Q8 (adapted: p_type='ECONOMY'): nation's share of regional "
    "import volume; ratio of two exact fixed-point sums in one IEEE divide.",
    tags=("join", "agg", "tpch", "case"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between("1996-01-01", "1997-12-31 00:00:00")
    )
    cust = _t(spark, sf_dir, "customer")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    supp = _t(spark, sf_dir, "supplier")
    nc = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    ns = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    vol = F.col("volume")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(part, li.l_partkey == part.p_partkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nc), F.col("c_nationkey") == nc.n_nationkey)
        .join(F.broadcast(region), nc.n_regionkey == region.r_regionkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("s_nkey"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            _rev().alias("volume"),
            "supp_nation",
        )
        .groupBy("o_year")
        .agg(
            (
                fp_money(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(F.lit(0.0)), REV_SCALE)
                / fp_money(vol, REV_SCALE)
            ).alias("mkt_share")
        )
    )


# --------------------------------------------------------------------
# Q10 returned-item reporting: top customers by lost revenue
# --------------------------------------------------------------------
@query(
    "q10_returned_items",
    oracle=f"""
    SELECT
      c_custkey, c_name,
      {fp_sql(REV_TERM_SQL, REV_SCALE)} AS revenue,
      c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-10-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
    doc="TPC-H Q10: lost revenue from returns per customer, quarter window, top-20.",
    tags=("join", "agg", "topk", "tpch"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-10-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(fp_money(_rev(), REV_SCALE).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


# --------------------------------------------------------------------
# Q13 customer distribution: how many customers made k orders
# --------------------------------------------------------------------
@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H Q13 (adapted: priority predicate instead of comment LIKE): "
    "left join preserving order-less customers, double aggregation.",
    tags=("join", "agg", "outer", "tpch"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    joined = cust.join(
        orders,
        (cust.c_custkey == orders.o_custkey) & (orders.o_orderpriority != "1-URGENT"),
        "left",
    )
    return (
        joined.groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# --------------------------------------------------------------------
# Q17 small-quantity-order revenue (scalar subquery per part)
# --------------------------------------------------------------------
@query(
    "q17_small_quantity",
    oracle=f"""
    SELECT
      ({fp_sql("l_extendedprice", CENT_SCALE)}) / 7.0 AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#11'
      AND l_quantity < (
        SELECT 0.2 * AVG(l_quantity) FROM lineitem l2 WHERE l2.l_partkey = p_partkey
      )
    """,
    doc="TPC-H Q17 (adapted: brand filter only): correlated scalar subquery "
    "decorrelated into a per-part average joined back to the fact.",
    tags=("join", "agg", "subquery", "tpch"),
)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#11")
    # Decorrelated: per-part avg computed once (partial agg map-side),
    # broadcast back — the plan Catalyst produces for the SQL form too.
    per_part = li.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        (F.avg("l_quantity") * 0.2).alias("qty_cut")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(per_part, li.l_partkey == F.col("ap_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg(
            (fp_money(F.col("l_extendedprice"), CENT_SCALE) / 7.0).alias("avg_yearly")
        )
    )


# --------------------------------------------------------------------
# Q18 large-volume customers
# --------------------------------------------------------------------
@query(
    "q18_large_volume_customers",
    oracle=f"""
    SELECT
      c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
      {fp_sql("l_quantity", CENT_SCALE)} AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 75
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderdate ASC, o_orderkey ASC
    LIMIT 100
    """,
    doc="TPC-H Q18 (threshold adapted to data scale): orders above a total "
    "quantity cut — semi join on a grouped HAVING.",
    tags=("join", "agg", "semi", "tpch"),
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("tq"))
        .filter(F.col("tq") > 75)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        orders.join(big, orders.o_orderkey == F.col("big_orderkey"), "left_semi")
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(fp_money(F.col("l_quantity"), CENT_SCALE).alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .limit(100)
    )


# --------------------------------------------------------------------
# Q22 global sales opportunity (anti join + scalar subquery)
# --------------------------------------------------------------------
@query(
    "q22_sales_opportunity",
    oracle=f"""
    SELECT
      n_name,
      COUNT(*) AS numcust,
      {fp_sql("c_acctbal", CENT_SCALE)} AS totacctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    WHERE c_acctbal > (
        -- canonical fixed-point mean: a plain AVG(DOUBLE) is
        -- accumulation-order dependent, and a cut off by 1 ulp can
        -- flip borderline customers between engines
        SELECT ({fp_sql("c_acctbal", CENT_SCALE)}) / COUNT(*)
        FROM customer WHERE c_acctbal > 0.0
      )
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    GROUP BY n_name
    ORDER BY n_name
    """,
    doc="TPC-H Q22 (adapted: nation instead of phone prefix; no-URGENT-orders "
    "cut, since every customer orders in this data): rich customers "
    "with no urgent orders — uncorrelated scalar avg + anti join.",
    tags=("join", "anti", "subquery", "tpch"),
)
def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    nation = _t(spark, sf_dir, "nation")
    # Uncorrelated scalar: one tiny aggregate, crossJoin-broadcast into
    # the filter (no driver round-trip, stays one lazy plan). The mean
    # is the canonical fixed-point form — AVG(DOUBLE) is accumulation-
    # order dependent across engines.
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (fp_money(F.col("c_acctbal"), CENT_SCALE) / F.count(F.lit(1))).alias("cut")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("cut"))
        .join(orders.filter(F.col("o_orderpriority") == "1-URGENT"), cust.c_custkey == orders.o_custkey, "left_anti")
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            fp_money(F.col("c_acctbal"), CENT_SCALE).alias("totacctbal"),
        )
        .orderBy("n_name")
    )
