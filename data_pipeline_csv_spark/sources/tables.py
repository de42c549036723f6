"""Parquet table sources for the driver's TPC-H-ish testdata.

Each table is one parquet file under ``{sf_dir}/{name}.parquet``
(see TESTDATA.md). Reads are lazy; Catalyst pushes filters and prunes
columns into the scan, so callers should select/filter on the returned
DataFrame rather than pre-materializing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any realistic scale
# factor (region=5 rows, nation=25 rows regardless of SF; supplier/part
# grow slowly). Fact tables shuffle on their join keys.
BROADCASTABLE = {"region", "nation", "supplier", "part", "customer"}


def balanced(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Redistribute a scan whose input layout starves the cluster.

    Parquet scan parallelism is bounded by row groups; a source laid
    out as few huge row groups (or one file per table, as the driver's
    testdata is) pins the whole scan->partial-agg pipeline to a handful
    of tasks no matter how many cores exist. When the scan yields fewer
    partitions than ``defaultParallelism``, a round-robin repartition
    spreads the downstream work; when the layout is already parallel
    (any real 100 TB table: thousands of files x 128 MB row groups)
    this is a no-op costing one partition-count check.

    Filters/pruning still reach the scan: Catalyst pushes predicates
    and column pruning through Repartition nodes.
    """
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def _events_ts_is_nanos(path: str) -> bool:
    """Peek the parquet footer: is events.ts physical TIMESTAMP(NANOS)?

    Read via pyarrow so the legacy ``nanosAsLong`` conf is only set on
    the caller's session when the file actually needs it (a MICROS/NTZ
    file reads fine without it, and the conf must stay set for the whole
    life of the returned lazy DataFrame, so set-and-restore is unsafe).
    """
    import os

    import pyarrow.parquet as pq

    p = path
    if os.path.isdir(p):
        inner = sorted(f for f in os.listdir(p) if f.endswith(".parquet"))
        if not inner:
            return False
        p = os.path.join(p, inner[0])
    try:
        t = pq.read_schema(p).field("ts").type
    except Exception:
        return False
    return getattr(t, "unit", None) == "ns"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.ts has shipped as parquet TIMESTAMP(NANOS) (which the
        # Spark reader rejects -> read as long ns via the legacy conf and
        # truncate to micros, exactly as DuckDB coerces TIMESTAMP_NS) and
        # as TIMESTAMP(MICROS) isAdjustedToUTC=false (which Spark 4 reads
        # as TIMESTAMP_NTZ). Normalize both to TIMESTAMP holding the
        # wall-clock value AS a UTC instant, via tz-free epoch-micros
        # arithmetic (timestampdiff on NTZ / integer div on the long ns),
        # so epoch math (unix_micros, window()) matches the
        # timezone-naive DuckDB oracle under ANY session timezone — an
        # NTZ->LTZ cast would shift by the session offset instead.
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        path = f"{sf_dir}/{name}.parquet"
        if _events_ts_is_nanos(path):
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(df.schema["ts"].dataType, T.TimestampNTZType):
            df = df.withColumn(
                "ts",
                F.timestamp_micros(
                    F.expr(
                        "timestampdiff(MICROSECOND,"
                        " TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
                    )
                ),
            )
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
