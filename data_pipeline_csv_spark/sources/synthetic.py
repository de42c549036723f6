"""Synthetic startup dataset (reference S6, api.py:596-607).

The reference materializes a 100-row products CSV on startup when no
input exists: id 1..100, name f-string, price = round(10 + i*0.5, 2),
category = Electronics if i%3==0 else Books if i%3==1 else Clothing,
in_stock = i%2==0. Golden counts over 1..100: Electronics=33,
Books=34, Clothing=33; in_stock true = 50; zero nulls (dropna is
identity on it).

Expressed as a lazy Spark plan: ``spark.range`` + codegen'd column
expressions — no driver-side loop, scales to any row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def synthetic_products(spark: SparkSession, n: int = 100) -> DataFrame:
    return (
        spark.range(1, n + 1)
        .select(
            F.col("id").cast("long").alias("id"),
            F.format_string("Product %d", F.col("id")).alias("name"),
            F.round(10.0 + F.col("id") * 0.5, 2).alias("price"),
            F.when(F.col("id") % 3 == 0, "Electronics")
            .when(F.col("id") % 3 == 1, "Books")
            .otherwise("Clothing")
            .alias("category"),
            (F.col("id") % 2 == 0).alias("in_stock"),
        )
    )
