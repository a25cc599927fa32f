"""Fixture-table catalog.

Registers the driver-generated parquet tables (TESTDATA.md / FIXTURES.md) as
temp views so both the DataFrame API and ``spark.sql`` see the same names the
DuckDB oracle uses.  At 100 TB these would be real catalog tables partitioned
by date (segments ≈ parquet files, SURVEY §1.1); the query code is identical
either way — that is the point of going through the session catalog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES: tuple[str, ...] = (
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

# Small dimension tables that should always broadcast in joins at any scale.
BROADCAST_DIMS: frozenset[str] = frozenset({"region", "nation", "supplier", "part", "customer"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar parquet scan; Catalyst prunes columns + pushes filters.

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS), which Spark reads as a
    nanosecond long (``spark.sql.legacy.parquet.nanosAsLong``, set in
    session.py); we surface it as a micros TimestampType via exact integer
    division (``DIV`` — never float math on epoch-nanos magnitudes).
    """
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    return df


def register_tables(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Register every fixture table as a temp view named like the file."""
    out: dict[str, DataFrame] = {}
    for name in tables:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
