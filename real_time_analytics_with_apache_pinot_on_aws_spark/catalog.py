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

    ``events.ts`` has two accepted physical encodings across fixture
    generations, both normalized to TimestampType here:

    - legacy: parquet TIMESTAMP(NANOS), which Spark reads as a nanosecond
      long (``spark.sql.legacy.parquet.nanosAsLong``, set in session.py);
      surfaced via exact integer division (``DIV`` — never float math on
      epoch-nanos magnitudes);
    - current: parquet timestamp[us] with no timezone (TIMESTAMP_NTZ),
      surfaced with a plain cast (see the UTC guard below).
    """
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "timestamp_ntz":
        # The ntz->timestamp cast is lazy and epoch-correct only under a UTC
        # session; fail fast instead of silently shifting timestamps.
        tz = spark.conf.get("spark.sql.session.timeZone")
        if tz not in ("UTC", "Etc/UTC", "GMT"):
            raise ValueError(
                f"events.ts is TIMESTAMP_NTZ; spark.sql.session.timeZone must "
                f"be UTC for epoch-faithful casts (got {tz!r})"
            )
    ts_type = dict(df.dtypes).get("ts")
    if name == "events" and ts_type == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    elif name == "events" and ts_type == "timestamp_ntz":
        # parquet timestamp[us] without tz: surface as session-tz TimestampType
        # (session tz is pinned UTC, so wall-clock == epoch semantics match the
        # DuckDB oracle's naive-timestamp epoch()).
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
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


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist a table bucketed (and optionally sorted) by join/agg keys.

    This is the 100 TB co-location strategy for repeated fact-fact joins
    (lineitem ⋈ orders on orderkey): both sides pre-hashed into the same
    bucket layout means Catalyst drops the Exchange (and with sorted buckets,
    the Sort) from every subsequent join on those keys — the shuffle is paid
    once at write time instead of per query, exactly like Pinot's
    partition-aware segment assignment.  Requires a session with a warehouse
    (``spark.sql.warehouse.dir``); bucketing metadata lives in the catalog,
    so this writes a managed table, not a bare path.
    """
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name, format="parquet")
