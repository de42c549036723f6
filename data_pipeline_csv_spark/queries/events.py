"""Event-stream batch queries (SURVEY.md §7 phase 3, batch side).

Time-bucketed aggregation, gap-based sessionization, deterministic
keep-first dedup, and pivoting over the driver's ``events`` table.
The streaming twins of these (Structured Streaming with watermarks /
session windows) live in ``data_pipeline_csv_spark.streaming``; these
batch forms are the DuckDB-checkable semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..operators.sessionize import sessionize
from ..sources.tables import load_table
from .canon import VALUE_SCALE, fp_money, fp_sql
from .registry import query


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


@query(
    "events_hourly_rollup",
    oracle=f"""
    SELECT
      date_trunc('hour', ts) AS bucket,
      event_type,
      COUNT(*) AS n_events,
      COUNT(DISTINCT user_id) AS n_users,
      {fp_sql("value", VALUE_SCALE)} AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="Tumbling 1h window aggregation (batch twin of the streaming hourly rollup).",
    tags=("events", "agg", "time"),
)
def events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _events(spark, sf_dir)
        .groupBy(
            F.date_trunc("hour", F.col("ts")).alias("bucket"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            fp_money(F.col("value"), VALUE_SCALE).alias("sum_value"),
        )
    )


@query(
    "events_sessionize",
    oracle="""
    WITH flagged AS (
      SELECT
        user_id, event_id, ts,
        CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800 * 1000000
               OR LAG(ts) OVER w IS NULL
             THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    ), numbered AS (
      SELECT
        user_id, event_id, ts,
        -- window SUM over INT is HUGEINT in DuckDB -> float64 in pandas;
        -- pin BIGINT to match Spark's long session_seq
        CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
      FROM flagged
    )
    SELECT
      user_id,
      session_seq,
      COUNT(*) AS n_events,
      MIN(ts) AS session_start,
      MAX(ts) AS session_end
    FROM numbered
    GROUP BY user_id, session_seq
    """,
    doc="Gap-based sessionization (30 min idle gap): lag -> flag -> prefix-sum -> per-session rollup.",
    tags=("events", "session", "window"),
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sessionize(_events(spark, sf_dir), gap_seconds=1800)


@query(
    "events_dedup_first",
    oracle="""
    SELECT user_id, event_type, event_id, ts, value
    FROM (
      SELECT *,
        ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts ASC, event_id ASC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    doc="Deterministic keep-first dedup on (user_id, event_type) — the reproducible form of dropDuplicates.",
    tags=("events", "dedup", "window"),
)
def events_dedup_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("user_id", "event_type").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return (
        _events(spark, sf_dir)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "ts", "value")
    )


@query(
    "events_daily_pivot",
    oracle="""
    SELECT
      CAST(date_trunc('day', ts) AS DATE) AS day,
      COUNT(*) FILTER (WHERE event_type = 'click')    AS click,
      COUNT(*) FILTER (WHERE event_type = 'error')    AS error,
      COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
      COUNT(*) FILTER (WHERE event_type = 'signup')   AS signup,
      COUNT(*) FILTER (WHERE event_type = 'view')     AS view
    FROM events
    GROUP BY 1
    """,
    doc="Pivot event_type counts into columns per day (Spark pivot == conditional aggregation).",
    tags=("events", "pivot"),
)
def events_daily_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    types = ["click", "error", "purchase", "signup", "view"]
    out = (
        _events(spark, sf_dir)
        .groupBy(F.date_trunc("day", F.col("ts")).cast("date").alias("day"))
        .pivot("event_type", types)
        .count()
    )
    # pivot leaves null where a (day, type) combination is absent;
    # COUNT(*) FILTER in the oracle yields 0 — align on 0.
    for t in types:
        out = out.withColumn(t, F.coalesce(F.col(t), F.lit(0)))
    return out


@query(
    "events_sliding_counts",
    oracle="""
    WITH offs AS (SELECT unnest([0, 1, 2, 3]) AS k),
    slid AS (
      SELECT
        make_timestamp(((epoch_us(ts) // 900000000) * 900 - k * 900) * 1000000)
          AS window_start,
        event_type
      FROM events, offs
    )
    SELECT window_start, event_type, COUNT(*) AS n_events
    FROM slid
    GROUP BY window_start, event_type
    """,
    doc="Sliding 1h/15min window counts (batch twin of "
    "sliding_counts_stream): every event lands in window/slide = 4 "
    "buckets; the oracle materializes the same 4 shifted buckets.",
    tags=("events", "window", "sliding"),
)
def events_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _events(spark, sf_dir)
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )


@query(
    "events_conversion_funnel",
    oracle="""
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.t1
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2
      GROUP BY e.user_id
    ),
    stages AS (
      SELECT '1_signup' AS stage, CAST(COUNT(*) AS BIGINT) AS n_users FROM s1
      UNION ALL
      SELECT '2_click_after_signup', CAST(COUNT(*) AS BIGINT) FROM s2
      UNION ALL
      SELECT '3_purchase_after_click', CAST(COUNT(*) AS BIGINT) FROM s3
    )
    SELECT stage, n_users,
      COALESCE(CAST(n_users AS DOUBLE) / LAG(n_users) OVER (ORDER BY stage), 1.0) AS conversion
    FROM stages
    """,
    doc="Ordered conversion funnel: users whose first signup precedes "
    "a later click precedes a later purchase (strict event-time "
    "ordering per user), with per-stage counts and step conversion "
    "rates. Each stage is one filtered scan (predicate pushed to the "
    "parquet reader) + a keyed min-aggregate joined to the previous "
    "stage on user_id — all three shuffles share the user_id key, and "
    "the final window runs over a 3-row frame. Conversion divides "
    "exact integer counts.",
    tags=("events", "funnel", "pipeline"),
)
def events_conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select("user_id", "event_type", "ts")
    s1 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    stages = (
        s1.agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .select(F.lit("1_signup").alias("stage"), "n_users")
        .unionAll(
            s2.agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
            .select(F.lit("2_click_after_signup").alias("stage"), "n_users")
        )
        .unionAll(
            s3.agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
            .select(F.lit("3_purchase_after_click").alias("stage"), "n_users")
        )
    )
    w = W.orderBy("stage")
    return stages.select(
        "stage",
        "n_users",
        F.coalesce(
            F.col("n_users").cast("double") / F.lag("n_users").over(w), F.lit(1.0)
        ).alias("conversion"),
    )


@query(
    "events_gapfill_resample",
    oracle="""
    WITH b AS (
      SELECT user_id,
        make_timestamp((epoch_us(ts) // 21600000000) * 21600000000) AS bucket
      FROM events
    ),
    counts AS (
      SELECT user_id, bucket, CAST(COUNT(*) AS BIGINT) AS n
      FROM b GROUP BY 1, 2
    ),
    spans AS (
      SELECT user_id, MIN(bucket) AS lo, MAX(bucket) AS hi FROM b GROUP BY user_id
    ),
    grid AS (
      SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 6 HOUR)) AS bucket
      FROM spans
    )
    SELECT g.user_id, g.bucket, COALESCE(c.n, 0) AS n_events
    FROM grid g LEFT JOIN counts c ON g.user_id = c.user_id AND g.bucket = c.bucket
    """,
    doc="Dense time-axis resample (hypertable-style gap-fill): each "
    "user's activity is bucketed to 6-hour windows and the grid "
    "between their first and last bucket is densified, emitting "
    "zero-count rows for silent periods. The grid is generated "
    "map-side per user (sequence + explode, no driver loop, no "
    "calendar join against a materialized dimension); both the count "
    "agg and the grid join key on user_id, so the whole plan shares "
    "one partitioning family.",
    tags=("events", "time", "gapfill", "resample"),
)
def events_gapfill_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    bucketed = _events(spark, sf_dir).select(
        "user_id", F.window("ts", "6 hours").start.alias("bucket")
    )
    counts = bucketed.groupBy("user_id", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    grid = (
        bucketed.groupBy("user_id")
        .agg(F.min("bucket").alias("lo"), F.max("bucket").alias("hi"))
        .select(
            "user_id",
            F.explode(
                F.sequence(F.col("lo"), F.col("hi"), F.expr("interval 6 hours"))
            ).alias("bucket"),
        )
    )
    return grid.join(counts, ["user_id", "bucket"], "left").select(
        "user_id", "bucket", F.coalesce(F.col("n"), F.lit(0).cast("bigint")).alias("n_events")
    )


@query(
    "events_decay_score",
    oracle=f"""
    WITH mx AS (
      SELECT user_id, value, CAST(ts AS DATE) AS d,
             MAX(CAST(ts AS DATE)) OVER (PARTITION BY user_id) AS last_day
      FROM events
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(floor(value * power(CAST(0.5 AS DOUBLE), date_diff('day', d, last_day)) * {VALUE_SCALE}) AS BIGINT)) AS DOUBLE) / {VALUE_SCALE}.0 AS decayed_score
    FROM mx
    GROUP BY user_id
    """,
    doc="Time-decayed engagement score (EWMA family): each event's "
    "value is discounted by 0.5^(days before the user's latest day) "
    "and summed. Decay base 0.5 is deliberate: integer powers of two "
    "are EXACT in IEEE double in any engine, so the per-term product "
    "is bit-identical and the fixed-point sum stays engine-portable "
    "(arbitrary bases differ by ulps between libm and Java pow). The "
    "partition-max window carries no sort and shares its user_id "
    "hash partitioning with the final agg: one exchange total.",
    tags=("events", "decay", "ewma", "window"),
)
def events_decay_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select(
        "user_id", F.col("ts").cast("date").alias("d"), "value"
    )
    last_day = F.max("d").over(W.partitionBy("user_id"))
    days = F.datediff(last_day, F.col("d")).cast("double")
    term = F.col("value") * F.pow(F.lit(0.5), days)
    return (
        ev.withColumn("term", term)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            fp_money(F.col("term"), VALUE_SCALE).alias("decayed_score"),
        )
    )


@query(
    "events_pit_join",
    # Full value oracle: the dimension is pure arithmetic on
    # c_custkey, the interval predicate is exact timestamp
    # comparisons, and every event lands in exactly one validity
    # window — DuckDB replays the whole join row-for-row.
    oracle="""
    WITH dimv AS (
      SELECT c_custkey, c_mktsegment, r.v AS v,
             CASE WHEN r.v = 0 THEN TIMESTAMP '2023-12-01'
                  WHEN r.v = 1 THEN TIMESTAMP '2024-01-01'
                       + INTERVAL (8 + c_custkey % 5) DAY
                  ELSE TIMESTAMP '2024-01-01'
                       + INTERVAL (17 + c_custkey % 7) DAY END AS valid_from,
             (c_custkey + r.v) % 4 AS tier
      FROM customer, range(0, 3) r(v)
    ),
    dim AS (
      SELECT *, LEAD(valid_from) OVER (
        PARTITION BY c_custkey ORDER BY v) AS valid_to
      FROM dimv
    )
    SELECT e.event_id, e.user_id,
           CAST(d.v AS INT) AS version,
           CAST(d.tier AS BIGINT) AS tier,
           d.c_mktsegment AS mktsegment
    FROM events e JOIN dim d ON e.user_id = d.c_custkey
      AND e.ts >= d.valid_from
      AND (d.valid_to IS NULL OR e.ts < d.valid_to)
    """,
    doc="POINT-IN-TIME join — the feature-store primitive (Feast/"
    "Tecton's PIT-correct training join): every event joins the "
    "dimension VERSION that was valid at the event's timestamp, never "
    "a later one — the leakage-free way to attach features to "
    "training examples. The versioned dimension is an SCD2-shaped "
    "table (3 validity windows per customer, boundaries arithmetic on "
    "the key; valid_to derived by LEAD over versions — one dim-sized "
    "window); the join is an EQUI-join on the key carrying the "
    "interval predicate as a post-join filter, so it shuffles on "
    "user_id exactly like any keyed fact-dim join (no range-join "
    "blowup; AQE handles skew). At 100 TB: events shuffle once on "
    "user key, dim versions are |keys| x versions rows — "
    "broadcastable while small, bucketed when not.",
    tags=("events", "join", "pit", "scd2", "feature-store", "scale"),
)
def events_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select("event_id", "user_id", "ts")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    dimv = cust.select(
        "c_custkey",
        "c_mktsegment",
        F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("v"),
    ).select(
        "c_custkey",
        "c_mktsegment",
        "v",
        F.when(F.col("v") == 0, F.expr("timestamp'2023-12-01'"))
        .when(
            F.col("v") == 1,
            F.expr("timestamp'2024-01-01' + make_interval(0, 0, 0, CAST(8 + c_custkey % 5 AS INT))"),
        )
        .otherwise(
            F.expr("timestamp'2024-01-01' + make_interval(0, 0, 0, CAST(17 + c_custkey % 7 AS INT))")
        )
        .alias("valid_from"),
        ((F.col("c_custkey") + F.col("v")) % 4).alias("tier"),
    )
    dim = dimv.withColumn(
        "valid_to",
        F.lead("valid_from").over(W.partitionBy("c_custkey").orderBy("v")),
    )
    return (
        ev.join(
            dim,
            (ev["user_id"] == dim["c_custkey"])
            & (ev["ts"] >= dim["valid_from"])
            & (dim["valid_to"].isNull() | (ev["ts"] < dim["valid_to"])),
        )
        .select(
            "event_id",
            "user_id",
            F.col("v").cast("int").alias("version"),
            F.col("tier").cast("bigint").alias("tier"),
            F.col("c_mktsegment").alias("mktsegment"),
        )
    )


@query(
    "events_session_pmi",
    # Full value oracle: counts are integers, and each PMI is
    # ln(exact-int / exact-double-product) — two IEEE ops in a pinned
    # association, floored to 1e-6 fixed point (the BM25 determinism
    # contract). Sessionization replays the events_sessionize CTE.
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, ts, event_type,
        CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800 * 1000000
               OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    ),
    numbered AS (
      SELECT user_id, event_type,
        SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
      FROM flagged
    ),
    st AS (SELECT DISTINCT user_id, session_seq, event_type FROM numbered),
    n AS (
      SELECT COUNT(*) AS n_sessions
      FROM (SELECT DISTINCT user_id, session_seq FROM st)
    ),
    tc AS (SELECT event_type, COUNT(*) AS c FROM st GROUP BY 1),
    pc AS (
      SELECT a.event_type AS t1, b.event_type AS t2, COUNT(*) AS c_ab
      FROM st a
      JOIN st b ON a.user_id = b.user_id AND a.session_seq = b.session_seq
               AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT pc.t1, pc.t2,
           CAST(pc.c_ab AS BIGINT) AS c_ab,
           CAST(ca.c AS BIGINT) AS c_a,
           CAST(cb.c AS BIGINT) AS c_b,
           CAST(FLOOR(ln(CAST(n.n_sessions * pc.c_ab AS DOUBLE)
                         / (CAST(ca.c AS DOUBLE) * cb.c)) * 1000000.0) AS BIGINT)
             AS pmi_fp
    FROM pc
    JOIN tc ca ON pc.t1 = ca.event_type
    JOIN tc cb ON pc.t2 = cb.event_type
    CROSS JOIN n
    """,
    doc="Session co-occurrence PMI — association mining (Church & "
    "Hanks 1990's pointwise mutual information over market-basket "
    "sessions): which event types occur together in a user session "
    "more than chance predicts. Gap-sessionize (the events_sessionize "
    "window pair), distinct (session, type) incidence, WITHIN-session "
    "pair expansion via a session-keyed self-join (per-session type "
    "sets are tiny — bounded by the event-type vocabulary, so the "
    "join fans out O(|types|^2) per session, never corpus-quadratic), "
    "then PMI from the broadcast type-count table and 1-row session "
    "total. Counts are exact integers; each PMI is two IEEE ops "
    "floored to 1e-6 fixed point, replayed bit-for-bit.",
    tags=("events", "pmi", "association", "sessions", "scale"),
)
def events_session_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    prev_us = F.unix_micros(F.lag("ts").over(w))
    cur_us = F.unix_micros(F.col("ts"))
    new_session = F.when(
        prev_us.isNull() | ((cur_us - prev_us) > 1800 * 1_000_000), 1
    ).otherwise(0)
    w_run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    st = (
        ev.withColumn("_ns", new_session)
        .withColumn("session_seq", F.sum("_ns").over(w_run))
        .select("user_id", "session_seq", "event_type")
        .distinct()
    )
    n = st.select("user_id", "session_seq").distinct().agg(
        F.count(F.lit(1)).alias("n_sessions")
    )
    tc = st.groupBy("event_type").agg(F.count(F.lit(1)).alias("c"))
    a, b = st.alias("a"), st.alias("b")
    pc = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.session_seq") == F.col("b.session_seq"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("t1"), F.col("b.event_type").alias("t2")
        )
        .agg(F.count(F.lit(1)).alias("c_ab"))
    )
    return (
        pc.join(F.broadcast(tc.withColumnRenamed("event_type", "t1").withColumnRenamed("c", "c_a")), "t1")
        .join(F.broadcast(tc.withColumnRenamed("event_type", "t2").withColumnRenamed("c", "c_b")), "t2")
        .crossJoin(F.broadcast(n))
        .select(
            "t1",
            "t2",
            F.col("c_ab").cast("bigint").alias("c_ab"),
            F.col("c_a").cast("bigint").alias("c_a"),
            F.col("c_b").cast("bigint").alias("c_b"),
            F.floor(
                F.log(
                    (F.col("n_sessions") * F.col("c_ab")).cast("double")
                    / (F.col("c_a").cast("double") * F.col("c_b"))
                )
                * 1_000_000.0
            ).cast("bigint").alias("pmi_fp"),
        )
    )


@query(
    "events_funnel_conversion",
    # FULL value oracle: each step's frontier replayed as a correlated
    # min-after join with the same 24 h attribution window — identical
    # greedy-earliest semantics, single-row integer output. Counts
    # form a real gradient at every SF (sf0.01: 150 users -> 150 view
    # -> 60 click-within-24h -> 25 purchase-within-24h).
    oracle="""
    WITH sess AS (SELECT user_id, ts, event_type FROM events),
    s1 AS (
      SELECT user_id, MIN(ts) AS t
      FROM sess WHERE event_type = 'view' GROUP BY 1
    ), s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t
      FROM sess e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.t
        AND epoch_us(e.ts) - epoch_us(s1.t) <= CAST(86400 AS BIGINT) * 1000000
      GROUP BY 1
    ), s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t
      FROM sess e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t
        AND epoch_us(e.ts) - epoch_us(s2.t) <= CAST(86400 AS BIGINT) * 1000000
      GROUP BY 1
    )
    SELECT
      (SELECT COUNT(DISTINCT user_id) FROM sess) AS n_sessions,
      (SELECT COUNT(*) FROM s1) AS n_step_1,
      (SELECT COUNT(*) FROM s2) AS n_step_2,
      (SELECT COUNT(*) FROM s3) AS n_step_3
    """,
    doc="ORDERED attribution-window funnel (view -> click -> purchase, "
    "each step within 24 h of the previous) — the MATCH_RECOGNIZE-"
    "shaped product-analytics staple in its standard GREEDY form: "
    "step k counts only if its event occurs STRICTLY AFTER the "
    "earliest completion of step k-1 and inside the attribution "
    "window (greedy equals existential only when no window is set — "
    "r10 ADVICE; the existential variant is events_funnel_"
    "existential). Spark-first: "
    "no UDF, no per-user state machine — step k's frontier is "
    "min(ts)-after-frontier via one user-keyed join + agg per step, "
    "all sharing one exchange lineage, each frontier frame shrinking "
    "monotonically (operators/sessionize.py funnel_counts; the same "
    "operator runs per-session funnels with "
    "key_cols=('user_id','session_seq')).",
    tags=("events", "funnel", "window"),
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sessionize import funnel_counts

    ev = _events(spark, sf_dir).select("user_id", "event_type", "ts")
    return funnel_counts(
        ev,
        steps=("view", "click", "purchase"),
        key_cols=("user_id",),
        within_seconds=86400,
    )


@query(
    "events_funnel_existential",
    # FULL value oracle, and genuinely EXISTENTIAL on the oracle side
    # too: each step is an EXISTS over any in-window predecessor
    # (the DISTINCT join chain), not a frontier replay — so the hash
    # match checks the DP against an independent formulation of the
    # same semantics, not against itself.
    oracle="""
    WITH s1 AS (
      SELECT DISTINCT user_id, ts FROM events WHERE event_type = 'view'
    ), f2 AS (
      SELECT DISTINCT e.user_id, e.ts
      FROM events e JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.ts
       AND epoch_us(e.ts) - epoch_us(s1.ts) <= CAST(86400 AS BIGINT) * 1000000
      WHERE e.event_type = 'click'
    ), f3 AS (
      SELECT DISTINCT e.user_id, e.ts
      FROM events e JOIN f2 ON e.user_id = f2.user_id AND e.ts > f2.ts
       AND epoch_us(e.ts) - epoch_us(f2.ts) <= CAST(86400 AS BIGINT) * 1000000
      WHERE e.event_type = 'purchase'
    )
    SELECT
      (SELECT COUNT(DISTINCT user_id) FROM events) AS n_sessions,
      (SELECT COUNT(DISTINCT user_id) FROM s1) AS n_step_1,
      (SELECT COUNT(DISTINCT user_id) FROM f2) AS n_step_2,
      (SELECT COUNT(DISTINCT user_id) FROM f3) AS n_step_3
    """,
    doc="EXISTENTIAL attribution-window funnel (view -> click -> "
    "purchase, each gap within 24 h): step k counts iff ANY ordered "
    "chain of the step types with in-window gaps exists — the "
    "MATCH_RECOGNIZE-equivalent semantics the greedy frontier "
    "(events_funnel_conversion) under-counts when the window binds "
    "(r10 VERDICT #1). Spark-first DP: per step, feasible completion "
    "TIMES propagate via a latest-feasible-predecessor running max "
    "over the union of feasible step-(k-1) rows and step-k events — "
    "one session-keyed window per step, rangeBetween(...,-1) for the "
    "strict predecessor, no UDF, no per-session collect "
    "(operators/sessionize.py funnel_counts_existential; greedy-"
    "misses-existential-catches pinned by tests/test_funnel.py::"
    "test_existential_catches_what_greedy_misses, brute-force pinned "
    "by test_funnel_existential_matches_bruteforce).",
    tags=("events", "funnel", "window"),
)
def events_funnel_existential(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sessionize import funnel_counts_existential

    ev = _events(spark, sf_dir).select("user_id", "event_type", "ts")
    return funnel_counts_existential(
        ev,
        steps=("view", "click", "purchase"),
        key_cols=("user_id",),
        within_seconds=86400,
    )
