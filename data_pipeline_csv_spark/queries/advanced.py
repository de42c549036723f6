"""Advanced operator surface: as-of join, grouping sets, deterministic
sampling, nearest-rank percentiles, array explode/aggregate, unpivot,
and the UDF extension hooks (vectorized scalar + grouped-agg
pandas_udf) — each DuckDB-oracled.

Determinism notes: percentiles use nearest-rank order statistics (no
interpolation arithmetic to diverge between engines); sampling is
systematic key-mod (stable under any parallelism, unlike PRNG-based
``df.sample``); float reductions ride the fixed-point BIGINT trick
(see queries/similarity.py).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..operators.asof import asof_join_backward
from ..operators.skew import diagnose_skew, salted_join
from ..sources.tables import load_table
from .canon import CENT_SCALE, REV_SCALE, REV_TERM_SQL, fp_money, fp_sql, rev_term
from .registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------
# As-of join: each purchase matched to the user's latest prior click
# --------------------------------------------------------------------
@query(
    "asof_purchase_last_click",
    oracle="""
    WITH clicks AS (
      SELECT user_id, ts, MAX(event_id) AS click_event_id
      FROM events WHERE event_type = 'click'
      GROUP BY user_id, ts
    ),
    purchases AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    )
    SELECT p.user_id, p.ts, p.event_id,
           c.ts AS asof_ts, c.click_event_id AS asof_click_event_id
    FROM purchases p
    ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    doc="Backward as-of join (union + one shuffle + running last window) "
    "checked against DuckDB's native ASOF JOIN. operators/asof.py.",
    tags=("join", "asof", "events"),
)
def asof_purchase_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_event_id"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    return asof_join_backward(
        purchases, clicks, on="user_id", right_cols=("click_event_id",)
    )


# --------------------------------------------------------------------
# GROUPING SETS with grouping() flags
# --------------------------------------------------------------------
@query(
    "grouping_sets_orders",
    oracle=f"""
    SELECT
      o_orderpriority, o_orderstatus,
      GROUPING(o_orderpriority) AS g_prio,
      GROUPING(o_orderstatus)   AS g_status,
      COUNT(*) AS n_orders,
      {fp_sql("o_totalprice", CENT_SCALE)} AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
    """,
    doc="GROUPING SETS (two single-column sets + grand total) with "
    "grouping() flags disambiguating real nulls from rollup nulls.",
    tags=("agg", "groupingsets"),
)
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders").createOrReplaceTempView("__gs_orders")
    return spark.sql(
        f"""
        SELECT
          o_orderpriority, o_orderstatus,
          CAST(grouping(o_orderpriority) AS INT) AS g_prio,
          CAST(grouping(o_orderstatus)   AS INT) AS g_status,
          COUNT(*) AS n_orders,
          {fp_sql("o_totalprice", CENT_SCALE)} AS total_price
        FROM __gs_orders
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        """
    )


# --------------------------------------------------------------------
# Deterministic systematic sampling (key-mod, parallelism-stable)
# --------------------------------------------------------------------
@query(
    "sample_systematic_revenue",
    oracle=f"""
    SELECT
      l_returnflag,
      COUNT(*) AS n_sampled,
      {fp_sql(REV_TERM_SQL, REV_SCALE)} AS revenue
    FROM lineitem
    WHERE l_orderkey % 97 < 5
    GROUP BY l_returnflag
    """,
    doc="~5% systematic sample by key-mod: reproducible on any engine, any "
    "partitioning, any scale — unlike PRNG sampling, whose draw depends "
    "on row order. For non-key-correlated sampling swap in a hash of "
    "the key; the plan shape is identical.",
    tags=("sample", "agg"),
)
def sample_systematic_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter((F.col("l_orderkey") % 97) < 5)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            fp_money(rev_term(), REV_SCALE).alias("revenue"),
        )
    )


# --------------------------------------------------------------------
# Nearest-rank percentiles per group (order statistics, no interpolation)
# --------------------------------------------------------------------
@query(
    "percentiles_order_value",
    oracle="""
    WITH ranked AS (
      SELECT
        c_mktsegment, o_totalprice,
        ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                           ORDER BY o_totalprice ASC, o_orderkey ASC) AS rn,
        COUNT(*)    OVER (PARTITION BY c_mktsegment) AS n
      FROM orders JOIN customer ON o_custkey = c_custkey
    )
    SELECT
      c_mktsegment,
      MAX(CASE WHEN rn = CAST(ceil(0.50 * n) AS BIGINT) THEN o_totalprice END) AS p50,
      MAX(CASE WHEN rn = CAST(ceil(0.90 * n) AS BIGINT) THEN o_totalprice END) AS p90,
      MAX(CASE WHEN rn = CAST(ceil(0.99 * n) AS BIGINT) THEN o_totalprice END) AS p99
    FROM ranked
    GROUP BY c_mktsegment
    """,
    doc="Nearest-rank p50/p90/p99 of order value per market segment: "
    "rank-filter formulation is engine-portable (interpolating "
    "percentile_cont arithmetic is not bit-stable across engines). "
    "At scale this is one shuffle + one sort — same cost as any window.",
    tags=("window", "percentile", "agg"),
)
def percentiles_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(F.col("o_totalprice").asc(), F.col("o_orderkey").asc())
    ranked = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .select("c_mktsegment", "o_totalprice", "o_orderkey")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(W.partitionBy("c_mktsegment")))
    )

    def pick(p: float):
        return F.max(
            F.when(
                F.col("rn") == F.ceil(F.lit(p) * F.col("n")).cast("bigint"),
                F.col("o_totalprice"),
            )
        )

    return ranked.groupBy("c_mktsegment").agg(
        pick(0.50).alias("p50"), pick(0.90).alias("p90"), pick(0.99).alias("p99")
    )


# --------------------------------------------------------------------
# Array explode + positional aggregation (fixed-point exact)
# --------------------------------------------------------------------
@query(
    "explode_embedding_positions",
    oracle="""
    WITH ce AS (
      SELECT CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS pos,
             unnest(embedding) AS x
      FROM embeddings
    )
    SELECT pos, COUNT(*) AS n,
           CAST(SUM(CAST(floor(CAST(x AS DOUBLE) * 1e9) AS BIGINT)) AS BIGINT) AS sum_fp
    FROM ce GROUP BY pos
    """,
    doc="posexplode over array<float> + per-position exact fixed-point sum "
    "— the column-stats pass of an embedding table.",
    tags=("array", "explode", "agg"),
)
def explode_embedding_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return (
        emb.select(F.posexplode("embedding").alias("pos", "x"))
        .groupBy(F.col("pos").cast("int").alias("pos"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(F.col("x").cast("double") * 1e9).cast("bigint")).alias("sum_fp"),
        )
    )


# --------------------------------------------------------------------
# Unpivot / melt
# --------------------------------------------------------------------
@query(
    "unpivot_part_attrs",
    oracle="""
    SELECT p_partkey, 'p_retailprice' AS attr, CAST(p_retailprice AS DOUBLE) AS val FROM part
    UNION ALL
    SELECT p_partkey, 'p_size' AS attr, CAST(p_size AS DOUBLE) AS val FROM part
    """,
    doc="unpivot (wide->long melt) of part numeric attributes; the ANSI "
    "UNION ALL form is the oracle.",
    tags=("unpivot", "reshape"),
)
def unpivot_part_attrs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    return part.select(
        "p_partkey", F.col("p_retailprice").cast("double"), F.col("p_size").cast("double")
    ).unpivot("p_partkey", ["p_retailprice", "p_size"], "attr", "val")


# --------------------------------------------------------------------
# Skew mitigation: salted join, provably identical to the plain join
# --------------------------------------------------------------------
@query(
    "skew_salted_join_priority",
    oracle=f"""
    SELECT
      o_orderpriority,
      COUNT(*) AS n_items,
      {fp_sql(REV_TERM_SQL, REV_SCALE)} AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
    doc="lineitem⋈orders via the salting rewrite (operators/skew.py, 8 "
    "salts): the oracle is the PLAIN join — proving salting changes the "
    "physical distribution, never the result.",
    tags=("join", "skew", "salting"),
)
def skew_salted_join_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").withColumnRenamed("l_orderkey", "o_orderkey")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    joined = salted_join(li, orders, on="o_orderkey", n_salts=8)
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        fp_money(rev_term(), REV_SCALE).alias("revenue"),
    )


# --------------------------------------------------------------------
# UDF surface: vectorized scalar pandas_udf
# --------------------------------------------------------------------
@query(
    "udf_scalar_normalize_name",
    oracle="""
    SELECT p_partkey, reverse(upper(p_name)) AS norm_name FROM part
    """,
    doc="Arrow-vectorized scalar pandas_udf (string kernel on whole "
    "batches) — the engine's scalar extension hook; the same transform "
    "as built-ins is the oracle, proving UDF results integrate exactly.",
    tags=("udf", "pandas_udf"),
)
def udf_scalar_normalize_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    @pandas_udf("string")
    def norm_name(s: pd.Series) -> pd.Series:
        return s.str.upper().map(lambda x: x[::-1] if x is not None else None)

    part = _t(spark, sf_dir, "part")
    return part.select("p_partkey", norm_name("p_name").alias("norm_name"))


# --------------------------------------------------------------------
# UDAF surface: grouped-agg pandas_udf (exact fixed-point)
# --------------------------------------------------------------------
@query(
    "udaf_discount_sumsq",
    oracle="""
    SELECT
      l_returnflag,
      CAST(SUM(CAST(round(l_discount * 100) AS BIGINT) * CAST(round(l_discount * 100) AS BIGINT))
        AS BIGINT) AS sumsq_cents
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Grouped-aggregate pandas_udf (UDAF hook): exact integer "
    "sum-of-squares of discount cents, computed in numpy per Arrow "
    "batch group. NOTE: grouped-agg UDAFs lack partial aggregation — "
    "all group rows shuffle to one place; prefer built-ins in hot "
    "paths (this query exists to pin the extension surface).",
    tags=("udf", "udaf", "pandas_udf"),
)
def udaf_discount_sumsq(spark: SparkSession, sf_dir: str) -> DataFrame:
    @pandas_udf("bigint")
    def sumsq_cents(d: pd.Series) -> int:
        cents = (d * 100).round().astype("int64")
        return int((cents * cents).sum())

    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(sumsq_cents("l_discount").alias("sumsq_cents"))


@query(
    "skew_key_diagnosis",
    oracle="""
    WITH c AS (
      SELECT user_id, COUNT(*) AS n_rows FROM events GROUP BY user_id
    ),
    t AS (SELECT SUM(n_rows) AS total, COUNT(*) AS n_keys FROM c)
    SELECT user_id, CAST(n_rows AS BIGINT) AS n_rows,
           CAST(n_rows AS DOUBLE) / CAST(total AS DOUBLE) AS share,
           CAST(n_rows AS DOUBLE) / (CAST(total AS DOUBLE) / CAST(n_keys AS DOUBLE)) AS skew_ratio
    FROM c, t
    ORDER BY n_rows DESC, user_id ASC
    LIMIT 10
    """,
    doc="Key-skew diagnosis: the 10 heaviest user_id groups in events "
    "with row share and skew ratio (count over mean-count-per-key) — "
    "the pre-flight report that sizes n_salts for salted_join / "
    "decides AQE skew thresholds. One key shuffle; the scalar "
    "total/key-count aggregate broadcasts back via crossJoin "
    "(operators/skew.py diagnose_skew).",
    tags=("skew", "diagnosis", "profile"),
)
def skew_key_diagnosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id")
    return diagnose_skew(ev, ["user_id"], top=10)


@query(
    "udtf_sentence_split",
    oracle="""
    WITH parts AS (
      SELECT doc_id,
             generate_subscripts(string_split(text, '.'), 1) AS raw_idx,
             trim(unnest(string_split(text, '.'))) AS sentence
      FROM documents
    )
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY raw_idx) - 1 AS INT) AS sent_idx,
           sentence,
           CAST(length(sentence) AS INT) AS n_chars
    FROM parts WHERE sentence <> ''
    """,
    doc="Python UDTF (Spark 4 table function) splitting documents into "
    "sentences via LATERAL — completes the UDF/UDAF/UDTF extension "
    "surface (SURVEY §2.6). Row-at-a-time Python is the SLOW path by "
    "design here: this demonstrates the user-extension hook; the "
    "engine-native equivalent of this particular op is "
    "split+posexplode (used throughout queries/text.py).",
    tags=("udtf", "extension", "text"),
)
def udtf_sentence_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="sent_idx int, sentence string, n_chars int")
    class SentenceSplit:
        def eval(self, text):
            if text is None:
                return
            idx = 0
            for raw in text.split("."):
                s = raw.strip()
                if s:
                    yield idx, s, len(s)
                    idx += 1

    spark.udtf.register("sentence_split", SentenceSplit)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        "SELECT d.doc_id, s.sent_idx, s.sentence, s.n_chars "
        "FROM _udtf_docs d, LATERAL sentence_split(d.text) s"
    )
