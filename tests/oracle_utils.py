"""Local mini-driver: run each registry query on Spark AND its DuckDB oracle,
compare row count, column names, and order-insensitive values — mirroring the
driver's CORRECTNESS gate so failures surface before a round ends.

Round-1 lesson (VERDICT.md item 9): the driver canonicalizes through *pandas*
and is dtype-strict — DuckDB integer SUM comes back HUGEINT -> float64 (2.0)
while Spark returns int64 (2), and those hash DIFFERENT.  The old `_norm`
here coerced them equal, so six driver hash-fails passed locally.  This
version goes through pandas on both sides (``toPandas()`` / ``.df()``) and
keeps int / float / Decimal / bool distinct, and *raises* on list/array/dict
cells exactly like the driver's canonicalizer does (b52's `unhashable type:
'list'` crash).
"""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

from real_time_analytics_with_apache_pinot_on_aws_spark import catalog


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in catalog.TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


class UnhashableCell(ValueError):
    """Raised when a result cell would crash the driver's pandas canonicalizer."""


def _norm(v):
    """Normalize one pandas cell, dtype-STRICT (int != float != Decimal)."""
    # NaN / None / NaT all render as SQL NULL on both engines' pandas paths.
    if v is None or v is pd.NaT:
        return ("_null",)
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return ("_null",)
        return ("f", repr(f))
    if isinstance(v, (bool, np.bool_)):
        return ("b", bool(v))
    if isinstance(v, (int, np.integer)):
        return ("i", int(v))
    if isinstance(v, Decimal):
        # deliberately NOT normalized: a Decimal result column is a bug per
        # the queries.py header rules (driver renders it unlike DuckDB float64)
        return ("dec", str(v))
    if isinstance(v, (pd.Timestamp, _dt.datetime)):
        return ("ts", pd.Timestamp(v).tz_localize(None).isoformat() if getattr(v, "tzinfo", None) else pd.Timestamp(v).isoformat())
    if isinstance(v, _dt.date):
        return ("ts", pd.Timestamp(v).isoformat())  # date == midnight ts (driver sorts them equal)
    if isinstance(v, (list, tuple, dict, set, np.ndarray)):
        raise UnhashableCell(
            f"array/struct cell {type(v).__name__} in result schema — the driver's "
            "pandas canonicalizer crashes on this (unhashable type); flatten with "
            "array_join/to_json before returning"
        )
    if isinstance(v, (bytes, bytearray)):
        return ("bin", bytes(v))
    return ("s", str(v))


def _canon(pdf: pd.DataFrame) -> list[tuple]:
    cols = sorted(pdf.columns)
    rows = []
    for row in pdf[cols].itertuples(index=False, name=None):
        rows.append(tuple(_norm(v) for v in row))
    rows.sort()
    return rows


def compare(spark_df, con: duckdb.DuckDBPyConnection, oracle: str) -> list[str]:
    """Return a list of mismatch descriptions (empty == pass)."""
    problems: list[str] = []
    spdf = spark_df.toPandas()
    scols = sorted(spdf.columns)
    ores = con.sql(oracle)
    opdf = ores.df()
    ocols = sorted(opdf.columns)

    if scols != ocols:
        problems.append(f"columns differ: spark={scols} oracle={ocols}")
        return problems
    if len(spdf) != len(opdf):
        problems.append(f"row count differs: spark={len(spdf)} oracle={len(opdf)}")

    try:
        skeys = _canon(spdf)
    except UnhashableCell as e:
        problems.append(f"spark result not driver-hashable: {e}")
        return problems
    try:
        okeys = _canon(opdf)
    except UnhashableCell as e:
        problems.append(f"oracle result not driver-hashable: {e}")
        return problems

    if skeys != okeys:
        # find first differing row for the report
        for i, (a, b) in enumerate(zip(skeys, okeys)):
            if a != b:
                problems.append(
                    f"values differ at sorted row {i}: spark={a} oracle={b} (cols={scols})"
                )
                break
        else:
            problems.append("values differ in tail rows")
    return problems
