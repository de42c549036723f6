"""Core relational query library (SURVEY.md §2 phase-2 surface).

Scans, filters/projections, all join families, aggregations (group-by,
distinct, rollup/cube), sorts/top-k, set ops, scalar functions — each
as an idiomatic lazy DataFrame plan (Catalyst does pushdown/pruning/
join selection) paired with a DuckDB oracle.

Determinism contract (see registry.py): money aggregates sum
DECIMAL-cast terms so results are exact and order-insensitive; ratios
are single IEEE-double ops on those exact sums; every LIMIT carries a
total order.

Reference parity notes: the reference's whole transform surface is
pandas ``dropna()`` + ``len(df)`` (reference src/transform.py:5-7,
api.py:79) — reproduced in engine.py; everything here is the
relational surface the reference lacked (SURVEY.md §2.2 "not
implemented anywhere").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

# Canonical money aggregation: see queries/canon.py for why fixed-point
# BIGINT accumulation (not DECIMAL sums + CAST AS DOUBLE) is the only
# engine-portable bit-stable recipe.
from .canon import (  # noqa: E402
    CENT_SCALE as _CENT_SCALE,
    CHARGE_SCALE as _CHARGE_SCALE,
    REV_SCALE as _REV_SCALE,
    REV_TERM_SQL as _REV_TERM,
    fp_money as _fp_money,
    fp_sql as _fp_sql,
    rev_term as _rev,
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Measured: auto-balancing fact scans here (repartition to
    # defaultParallelism) LOSES at bench scale — the full-row shuffle
    # plus per-call physical planning costs more than the single-task
    # scan saves. sources.tables.balanced stays available for genuinely
    # pathological layouts; a well-laid-out 100 TB table parallelizes
    # at the row-group level without help.
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------
# Aggregation: TPC-H Q1-style pricing summary
# --------------------------------------------------------------------
@query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT
      l_returnflag,
      l_linestatus,
      {_fp_sql("l_quantity", _CENT_SCALE)}          AS sum_qty,
      {_fp_sql("l_extendedprice", _CENT_SCALE)}     AS sum_base_price,
      {_fp_sql(_REV_TERM, _REV_SCALE)}              AS sum_disc_price,
      {_fp_sql(_REV_TERM + " * (1 + l_tax)", _CHARGE_SCALE)} AS sum_charge,
      ({_fp_sql("l_quantity", _CENT_SCALE)}) / COUNT(*) AS avg_qty,
      COUNT(*)                                      AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-06-30 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="Grouped aggregation with exact fixed-point sums + derived average (TPC-H Q1 shape).",
    tags=("agg", "groupby"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-06-30").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _fp_money(F.col("l_quantity"), _CENT_SCALE).alias("sum_qty"),
            _fp_money(F.col("l_extendedprice"), _CENT_SCALE).alias("sum_base_price"),
            _fp_money(_rev(), _REV_SCALE).alias("sum_disc_price"),
            _fp_money(_rev() * (1 + F.col("l_tax")), _CHARGE_SCALE).alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .withColumn("avg_qty", F.col("sum_qty") / F.col("count_order"))
        .select(
            "l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
            "sum_disc_price", "sum_charge", "avg_qty", "count_order",
        )
    )


# --------------------------------------------------------------------
# Join + agg + top-k: TPC-H Q3-style shipping priority
# --------------------------------------------------------------------
@query(
    "q3_shipping_priority",
    oracle=f"""
    SELECT
      l_orderkey,
      {_fp_sql(_REV_TERM, _REV_SCALE)} AS revenue,
      o_orderdate,
      o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
    LIMIT 10
    """,
    doc="3-way join + group + deterministic top-k (TPC-H Q3 shape). Customer side joins size-adaptively: AQE broadcasts it below threshold, shuffles at 100 TB.",
    tags=("join", "agg", "topk"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp"))
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_fp_money(_rev(), _REV_SCALE).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("o_orderdate").asc(), F.col("l_orderkey").asc())
        .limit(10)
    )


# --------------------------------------------------------------------
# 6-way join: TPC-H Q5-style local supplier volume
# --------------------------------------------------------------------
@query(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT
      n_name,
      {_fp_sql(_REV_TERM, _REV_SCALE)} AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY n_name
    """,
    doc="6-way star join: constant dims (nation/region) pinned broadcast, growing dims (customer/supplier) AQE-adaptive, fact shuffles once on orderkey (TPC-H Q5 shape).",
    tags=("join", "agg"),
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(_fp_money(_rev(), _REV_SCALE).alias("revenue"))
    )


# --------------------------------------------------------------------
# Flagship: revenue per nation (used by __spark_entry__.entry)
# --------------------------------------------------------------------
@query(
    "revenue_by_nation",
    oracle=f"""
    SELECT
      n_name,
      {_fp_sql(_REV_TERM, _REV_SCALE)} AS revenue,
      COUNT(*) AS n_lineitems
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY revenue DESC, n_name ASC
    """,
    doc="Flagship: fact-to-dim star join rolled up to nation. Nation pinned broadcast (constant 25 rows); customer left to AQE so the same plan survives 100 TB.",
    tags=("join", "agg", "flagship"),
)
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(_fp_money(_rev(), _REV_SCALE).alias("revenue"), F.count(F.lit(1)).alias("n_lineitems"))
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


# --------------------------------------------------------------------
# Scan + filter + projection (pushdown showcase)
# --------------------------------------------------------------------
@query(
    "filter_project",
    oracle="""
    SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_quantity > 45 AND l_returnflag = 'R'
    """,
    doc="Predicate + projection pushed into the parquet scan (PushedFilters/ReadSchema).",
    tags=("scan", "filter"),
)
def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .filter((F.col("l_quantity") > 45) & (F.col("l_returnflag") == "R"))
        .select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")
    )


# --------------------------------------------------------------------
# Distinct
# --------------------------------------------------------------------
@query(
    "distinct_order_attrs",
    oracle="SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
    doc="Distinct as shuffle-dedup on the group keys.",
    tags=("distinct",),
)
def distinct_order_attrs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "orders").select("o_orderstatus", "o_orderpriority").distinct()


# --------------------------------------------------------------------
# Exact count-distinct
# --------------------------------------------------------------------
@query(
    "count_distinct_parts",
    oracle="""
    SELECT
      l_returnflag,
      COUNT(DISTINCT l_partkey) AS n_parts,
      COUNT(DISTINCT l_suppkey) AS n_supps,
      COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Exact multi-column count-distinct (expand + two-phase agg in Spark).",
    tags=("agg", "distinct"),
)
def count_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# --------------------------------------------------------------------
# Sort + limit (top-k) with total order
# --------------------------------------------------------------------
@query(
    "topk_expensive_orders",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 25
    """,
    doc="Top-k: Spark plans TakeOrderedAndProject (per-partition heap + driver merge), no full sort.",
    tags=("sort", "topk"),
)
def topk_expensive_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice", "o_orderdate")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(25)
    )


# --------------------------------------------------------------------
# Join families: left outer with aggregation
# --------------------------------------------------------------------
@query(
    "left_join_order_counts",
    oracle="""
    SELECT c_custkey, c_name, COUNT(o_orderkey) AS order_cnt
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    """,
    doc="Left outer join preserving customers with zero orders (COUNT skips nulls).",
    tags=("join",),
)
def left_join_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("order_cnt"))
    )


@query(
    "semi_join_active_customers",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
    )
    """,
    doc="Left-semi join (EXISTS): customers with at least one urgent order.",
    tags=("join", "semi"),
)
def semi_join_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    urgent = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "anti_join_never_urgent",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
    )
    """,
    doc="Left-anti join (NOT EXISTS): customers with no urgent order.",
    tags=("join", "anti"),
)
def anti_join_never_urgent(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    urgent = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "semi_anti_customers",
    oracle="""
    SELECT 'has_urgent' AS tag, c_custkey, c_name
    FROM customer
    WHERE EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
    )
    UNION ALL
    SELECT 'never_urgent' AS tag, c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
    )
    """,
    doc="Left-semi (EXISTS) and left-anti (NOT EXISTS) joins in one "
    "tagged result: every customer lands in exactly one branch. One "
    "query covers both join families inside the driver's checked-query "
    "budget; the granular forms stay registered below the priority "
    "block (see queries/__init__.py).",
    tags=("join", "semi", "anti"),
)
def semi_anti_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    urgent = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    semi = (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_semi")
        .select(F.lit("has_urgent").alias("tag"), "c_custkey", "c_name")
    )
    anti = (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti")
        .select(F.lit("never_urgent").alias("tag"), "c_custkey", "c_name")
    )
    return semi.unionAll(anti)


@query(
    "full_outer_nation_activity",
    oracle="""
    WITH c AS (
      SELECT c_nationkey AS nk, COUNT(*) AS n_customers FROM customer GROUP BY 1
    ), s AS (
      SELECT s_nationkey AS nk, COUNT(*) AS n_suppliers FROM supplier GROUP BY 1
    )
    SELECT
      COALESCE(c.nk, s.nk) AS nationkey,
      COALESCE(n_customers, 0) AS n_customers,
      COALESCE(n_suppliers, 0) AS n_suppliers
    FROM c FULL OUTER JOIN s ON c.nk = s.nk
    """,
    doc="Full outer join of per-nation customer vs supplier counts.",
    tags=("join", "outer"),
)
def full_outer_nation_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").groupBy(F.col("c_nationkey").alias("nk")).agg(F.count(F.lit(1)).alias("n_customers"))
    s = _t(spark, sf_dir, "supplier").groupBy(F.col("s_nationkey").alias("nk")).agg(F.count(F.lit(1)).alias("n_suppliers"))
    return (
        c.join(s, "nk", "full_outer")
        .select(
            F.col("nk").alias("nationkey"),
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        )
    )


# --------------------------------------------------------------------
# Non-equi (range/theta) join
# --------------------------------------------------------------------
@query(
    "range_join_price_bands",
    oracle=f"""
    WITH bands(band_id, lo, hi) AS (
      VALUES (0, 0.0, 25000.0), (1, 25000.0, 100000.0), (2, 100000.0, 1000000000.0)
    )
    SELECT band_id, COUNT(*) AS n_orders,
           {_fp_sql("o_totalprice", _CENT_SCALE)} AS total
    FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
    GROUP BY band_id
    """,
    doc="Range (theta) join against a tiny broadcast band table — Spark plans BroadcastNestedLoopJoin.",
    tags=("join", "range"),
)
def range_join_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    bands = spark.createDataFrame(
        [(0, 0.0, 25000.0), (1, 25000.0, 100000.0), (2, 100000.0, 1000000000.0)],
        "band_id int, lo double, hi double",
    )
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.join(
            F.broadcast(bands),
            (orders.o_totalprice >= bands.lo) & (orders.o_totalprice < bands.hi),
        )
        .groupBy("band_id")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _fp_money(F.col("o_totalprice"), _CENT_SCALE).alias("total"),
        )
    )


# --------------------------------------------------------------------
# Rollup / grouping sets
# --------------------------------------------------------------------
@query(
    "rollup_returns",
    oracle=f"""
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(GROUPING(l_returnflag) AS INT) + 2 * CAST(GROUPING(l_linestatus) AS INT) AS grp,
      COUNT(*) AS n_rows,
      {_fp_sql("l_quantity", _CENT_SCALE)} AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
    doc="Hierarchical rollup with GROUPING disambiguation of generated nulls.",
    tags=("agg", "rollup"),
)
def rollup_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        (F.grouping("l_returnflag").cast("int") + 2 * F.grouping("l_linestatus").cast("int")).alias("grp"),
        F.count(F.lit(1)).alias("n_rows"),
        _fp_money(F.col("l_quantity"), _CENT_SCALE).alias("sum_qty"),
    ).select("l_returnflag", "l_linestatus", "grp", "n_rows", "sum_qty")


@query(
    "cube_order_status",
    oracle="""
    SELECT
      o_orderstatus,
      o_orderpriority,
      CAST(GROUPING(o_orderstatus) AS INT) + 2 * CAST(GROUPING(o_orderpriority) AS INT) AS grp,
      COUNT(*) AS n_orders
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
    doc="Full cube over two attributes with GROUPING id.",
    tags=("agg", "cube"),
)
def cube_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            (F.grouping("o_orderstatus").cast("int") + 2 * F.grouping("o_orderpriority").cast("int")).alias("grp"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select("o_orderstatus", "o_orderpriority", "grp", "n_orders")
    )


# --------------------------------------------------------------------
# Conditional aggregation (TPC-H Q14 shape): promo revenue share
# --------------------------------------------------------------------
@query(
    "promo_revenue_share",
    oracle=f"""
    SELECT
      {_fp_sql(f"CASE WHEN p_type = 'PROMO' THEN {_REV_TERM} ELSE 0.0 END", _REV_SCALE)} AS promo_revenue,
      {_fp_sql(_REV_TERM, _REV_SCALE)} AS total_revenue,
      ({_fp_sql(f"CASE WHEN p_type = 'PROMO' THEN {_REV_TERM} ELSE 0.0 END", _REV_SCALE)})
        / ({_fp_sql(_REV_TERM, _REV_SCALE)}) AS promo_share
    FROM lineitem JOIN part ON l_partkey = p_partkey
    """,
    doc="Conditional aggregation over a broadcast join; ratio of exact fixed-point sums.",
    tags=("agg", "join", "case"),
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    promo_term = F.when(F.col("p_type") == "PROMO", _rev()).otherwise(F.lit(0.0))
    joined = li.join(part, li.l_partkey == part.p_partkey)
    return (
        joined.agg(
            _fp_money(promo_term, _REV_SCALE).alias("promo_revenue"),
            _fp_money(_rev(), _REV_SCALE).alias("total_revenue"),
        )
        .withColumn("promo_share", F.col("promo_revenue") / F.col("total_revenue"))
    )


# --------------------------------------------------------------------
# Set operations
# --------------------------------------------------------------------
@query(
    "setops_customer_keys",
    oracle="""
    WITH buyers AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'),
         openb  AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderstatus = 'O')
    SELECT 'both' AS tag, k FROM (SELECT k FROM buyers INTERSECT SELECT k FROM openb)
    UNION ALL
    SELECT 'f_only' AS tag, k FROM (SELECT k FROM buyers EXCEPT SELECT k FROM openb)
    """,
    doc="INTERSECT / EXCEPT / UNION ALL over key sets.",
    tags=("setops",),
)
def setops_customer_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    f_keys = orders.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("k")).distinct()
    o_keys = orders.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("k")).distinct()
    both = f_keys.intersect(o_keys).select(F.lit("both").alias("tag"), "k")
    f_only = f_keys.exceptAll(o_keys).select(F.lit("f_only").alias("tag"), "k")
    return both.unionAll(f_only)


# --------------------------------------------------------------------
# Scalar function surface (string / math / date / conditional)
# --------------------------------------------------------------------
@query(
    "scalar_functions",
    oracle="""
    SELECT
      p_partkey,
      UPPER(p_name)                             AS name_upper,
      LOWER(p_brand)                            AS brand_lower,
      SUBSTR(p_type, 1, 4)                      AS type_prefix,
      LENGTH(p_name)                            AS name_len,
      CONCAT(p_brand, ':', p_type)              AS brand_type,
      ABS(p_size - 25)                          AS size_dist,
      CAST(FLOOR(p_retailprice) AS BIGINT)      AS price_floor,
      CAST(CEIL(p_retailprice) AS BIGINT)       AS price_ceil,
      p_partkey % 7                             AS key_mod,
      CASE WHEN p_size >= 25 THEN 'large' ELSE 'small' END AS size_class
    FROM part
    """,
    doc="Scalar string/math/conditional functions, all JVM-side whole-stage-codegen.",
    tags=("scalar",),
)
def scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "part").select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.substring("p_type", 1, 4).alias("type_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.abs(F.col("p_size") - 25).alias("size_dist"),
        F.floor("p_retailprice").alias("price_floor"),
        F.ceil("p_retailprice").alias("price_ceil"),
        (F.col("p_partkey") % 7).alias("key_mod"),
        F.when(F.col("p_size") >= 25, "large").otherwise("small").alias("size_class"),
    )


@query(
    "date_functions",
    oracle="""
    SELECT
      o_orderkey,
      CAST(EXTRACT(year  FROM o_orderdate) AS INT) AS order_year,
      CAST(EXTRACT(month FROM o_orderdate) AS INT) AS order_month,
      CAST(EXTRACT(day   FROM o_orderdate) AS INT) AS order_day,
      CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
    """,
    doc="Timestamp component extraction + truncation.",
    tags=("scalar", "date"),
)
def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select(
            "o_orderkey",
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
            F.dayofmonth("o_orderdate").alias("order_day"),
            F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month_start"),
        )
    )


@query(
    "json_extract_props",
    oracle="""
    SELECT
      event_type,
      COUNT(*) AS n_events,
      -- DuckDB SUM(BIGINT) -> HUGEINT -> float64 under pandas; pin BIGINT
      CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
    FROM events
    GROUP BY event_type
    """,
    doc="JSON field extraction from a string column, aggregated.",
    tags=("scalar", "json"),
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.get_json_object("props", "$.k").cast("bigint")).alias("sum_k"),
        )
    )
