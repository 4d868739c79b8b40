"""Shared helpers for the harness query registry."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def dec(col: str, scale: int = 4):
    """Exact decimal view of a double column — identical arithmetic in
    Spark and DuckDB, so value hashes match bit-for-bit."""
    return F.col(col).cast(f"decimal(18,{scale})")


def dbl(c):
    return c.cast("double")
