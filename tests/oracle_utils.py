"""Local mini-driver: run each registry query on Spark AND its DuckDB oracle,
compare row count, column names, and order-insensitive values — mirroring the
driver's CORRECTNESS gate so failures surface before a round ends."""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal

import duckdb

from real_time_analytics_with_apache_pinot_on_aws_spark import catalog


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in catalog.TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm(v):
    """Normalize a cell for cross-engine comparison (always sortable tuples)."""
    if v is None:
        return ("_null", "")
    if isinstance(v, Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", repr(v))
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, _dt.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, _dt.date):
        return ("d", v.isoformat())
    if isinstance(v, (list, tuple)):
        return ("arr", tuple(_norm(x) for x in v))
    if isinstance(v, (bytes, bytearray)):
        return ("bin", bytes(v))
    return ("s", str(v))


def compare(spark_df, con: duckdb.DuckDBPyConnection, oracle: str) -> list[str]:
    """Return a list of mismatch descriptions (empty == pass)."""
    problems: list[str] = []
    srows = spark_df.collect()
    scols = sorted(spark_df.columns)
    ores = con.sql(oracle)
    ocols = sorted(ores.columns)
    orows = ores.fetchall()
    ocol_index = {c: i for i, c in enumerate(ores.columns)}

    if scols != ocols:
        problems.append(f"columns differ: spark={scols} oracle={ocols}")
        return problems
    if len(srows) != len(orows):
        problems.append(f"row count differs: spark={len(srows)} oracle={len(orows)}")

    skeys = sorted(
        tuple(_norm(r[c]) for c in scols) for r in (row.asDict() for row in srows)
    )
    okeys = sorted(tuple(_norm(r[ocol_index[c]]) for c in scols) for r in orows)
    if skeys != okeys:
        # find first differing row for the report
        for i, (a, b) in enumerate(zip(skeys, okeys)):
            if a != b:
                problems.append(f"values differ at sorted row {i}: spark={a} oracle={b} (cols={scols})")
                break
        else:
            problems.append("values differ in tail rows")
    return problems
