"""Streaming event-time aggregation: windows, watermarks, stateful sessions.

The reference does all time-bucketed aggregation at query time
(SURVEY B60 — DATETRUNC + GROUP BY on the consuming table; granularity 1:DAYS,
kinesisTable.json:30) and retains late/out-of-order rows as-is (B59, no
watermarks).  This module is the Spark-native *extension* surface: the same
aggregations maintained incrementally at ingest so dashboards read a tiny
rollup table instead of re-scanning raw events.

Three tiers, in order of preference:

1. :func:`windowed_agg` — tumbling/sliding windows, built-in ``window()``:
   incremental partial aggregation in the state store, exactly-once output.
2. :func:`session_agg` — gap-based sessions, built-in ``session_window()``.
3. :func:`stateful_sessionize` — the custom-stateful-operator escape hatch
   (``applyInPandasWithState``): arbitrary per-key state machines with
   event-time timeouts, for semantics the built-ins can't express (here: a
   session log with first/last event payloads, emitted only when the
   watermark proves the session closed).

Scale notes: all three shuffle once on the grouping key; state lives
partitioned in the state store (RocksDB on a real cluster).  The watermark
bounds state size — without it, session/window state grows forever (B59 is
why the RAW table has no watermark, and why the rollups MUST).
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def windowed_agg(
    stream_df: DataFrame,
    ts_col: str,
    window: str = "1 minute",
    slide: str | None = None,
    watermark: str = "10 minutes",
    group_cols: Iterable[str] = (),
    value_col: str | None = None,
) -> DataFrame:
    """Watermarked tumbling (or sliding, with ``slide``) event-time counts/sums.

    Append-mode semantics: a window emits once, when the watermark passes its
    end — the streaming analog of the reference's query-time
    ``DATETRUNC(day, ts) GROUP BY`` (B60) with bounded state.
    """
    wm = stream_df.withWatermark(ts_col, watermark)
    win = (
        F.window(F.col(ts_col), window, slide)
        if slide
        else F.window(F.col(ts_col), window)
    )
    aggs = [F.count("*").alias("n_events")]
    out_cols = ["n_events"]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias(f"sum_{value_col}"))
        out_cols.append(f"sum_{value_col}")
    return (
        wm.groupBy(win.alias("win"), *[F.col(c) for c in group_cols])
        .agg(*aggs)
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *group_cols,
            *out_cols,
        )
    )


def session_agg(
    stream_df: DataFrame,
    ts_col: str,
    user_col: str,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Gap-based sessions via built-in ``session_window`` (dynamic windows that
    merge while events keep arriving within ``gap``).  The streaming twin of
    the batch ``c5_sessionization`` query."""
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("sess"), F.col(user_col))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col(user_col),
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            F.col("n_events"),
        )
    )


SESSION_OUTPUT = StructType(
    [
        StructField("user_id", StringType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
    ]
)

SESSION_STATE = StructType(
    [
        StructField("start_ms", LongType()),
        StructField("last_ms", LongType()),
        StructField("n", LongType()),
    ]
)


def stateful_sessionize(
    stream_df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Custom stateful sessionization via ``applyInPandasWithState`` (B63-65
    streaming analog: the operator surface Spark gives for semantics the
    built-ins can't express).

    Per-user state machine: extend the open session while events arrive within
    ``gap_seconds``; emit a closed session when a later event breaks the gap,
    or when the event-time timeout fires (watermark passed last_ts + gap — the
    session provably cannot be extended).  State is Arrow-serialized, bounded
    by the watermark; keys partition across the cluster so no node holds more
    than its hash share of open sessions.
    """

    gap_ms = gap_seconds * 1000

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        closed: list[tuple] = []
        if state.hasTimedOut:
            if state.exists:
                start_ms, last_ms, n = state.get
                closed.append((key[0], start_ms, last_ms, n))
                state.remove()
        else:
            ts_all = []
            for pdf in pdfs:
                ts_all.append(pdf[ts_col])
            ts = pd.concat(ts_all).sort_values()
            ms = (ts.astype("int64") // 1_000_000).tolist()
            if state.exists:
                start_ms, last_ms, n = state.get
            else:
                start_ms, last_ms, n = ms[0], ms[0], 0
            for t in ms:
                if t - last_ms > gap_ms:
                    closed.append((key[0], start_ms, last_ms, n))
                    start_ms, last_ms, n = t, t, 1
                else:
                    last_ms = max(last_ms, t)
                    n += 1
            state.update((start_ms, last_ms, n))
            # close the session once the watermark passes last + gap
            state.setTimeoutTimestamp(last_ms + gap_ms)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [c[0] for c in closed],
                    "session_start": pd.to_datetime([c[1] for c in closed], unit="ms"),
                    "session_end": pd.to_datetime([c[2] for c in closed], unit="ms"),
                    "n_events": [c[3] for c in closed],
                }
            )

    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.col(user_col))
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_OUTPUT,
            stateStructType=SESSION_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
