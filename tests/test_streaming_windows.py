"""Streaming event-time aggregation tests: windows, session windows, and the
applyInPandasWithState custom stateful sessionizer.

Append-mode results only finalize when the watermark advances, which needs a
second micro-batch — so sources are drained with maxFilesPerTrigger=1 over two
files, the second carrying much later timestamps.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import functions as F

from real_time_analytics_with_apache_pinot_on_aws_spark.streaming import windows as SW

SCHEMA = "user_id string, ts timestamp, value long"


def _write(path: Path, rows: list[tuple[str, str, int]]) -> None:
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as fh:
        for user, ts, value in rows:
            fh.write(json.dumps({"user_id": user, "ts": ts, "value": value}) + "\n")


def _stream(spark, src_dir: Path):
    raw = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", "1")
        .load(str(src_dir))
    )
    return raw.select(F.from_json("value", SCHEMA).alias("r")).select("r.*")


def _drain(df, name: str):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def test_windowed_agg_finalizes_on_watermark(spark, tmp_path):
    src = tmp_path / "in"
    _write(
        src / "a.json",
        [
            ("u1", "2024-06-01 10:00:10", 5),
            ("u1", "2024-06-01 10:00:40", 7),
            ("u2", "2024-06-01 10:01:10", 1),
        ],
    )
    # batch 2 pushes the watermark far past every batch-1 window
    _write(src / "b.json", [("u9", "2024-06-01 12:00:00", 0)])

    out = SW.windowed_agg(
        _stream(spark, src),
        "ts",
        window="1 minute",
        watermark="10 seconds",
        group_cols=("user_id",),
        value_col="value",
    )
    _drain(out, "win_agg")
    rows = {
        (r["user_id"], str(r["window_start"])): (r["n_events"], r["sum_value"])
        for r in spark.table("win_agg").collect()
    }
    assert rows[("u1", "2024-06-01 10:00:00")] == (2, 12)
    assert rows[("u2", "2024-06-01 10:01:00")] == (1, 1)


def test_session_window_agg(spark, tmp_path):
    src = tmp_path / "in"
    _write(
        src / "a.json",
        [
            ("u1", "2024-06-01 10:00:00", 1),
            ("u1", "2024-06-01 10:10:00", 1),  # same session (gap 30m)
            ("u1", "2024-06-01 11:30:00", 1),  # new session
        ],
    )
    _write(src / "b.json", [("u9", "2024-06-01 23:00:00", 0)])

    out = SW.session_agg(_stream(spark, src), "ts", "user_id", gap="30 minutes", watermark="1 second")
    _drain(out, "sess_agg")
    rows = sorted(
        (str(r["session_start"]), r["n_events"])
        for r in spark.table("sess_agg").filter(F.col("user_id") == "u1").collect()
    )
    assert rows == [("2024-06-01 10:00:00", 2), ("2024-06-01 11:30:00", 1)]


def test_stateful_sessionize_gap_and_timeout(spark, tmp_path):
    src = tmp_path / "in"
    _write(
        src / "a.json",
        [
            ("u1", "2024-06-01 10:00:00", 1),
            ("u1", "2024-06-01 10:05:00", 1),
            ("u1", "2024-06-01 11:00:00", 1),  # breaks the 30-min gap in-batch
            ("u2", "2024-06-01 10:00:00", 1),
        ],
    )
    # batch 2: watermark jumps far ahead -> every open session times out
    _write(src / "b.json", [("u9", "2024-06-02 10:00:00", 0)])

    out = SW.stateful_sessionize(_stream(spark, src), "user_id", "ts", gap_seconds=1800)
    _drain(out, "stateful_sess")
    got = {
        (r["user_id"], str(r["session_start"])): (str(r["session_end"]), r["n_events"])
        for r in spark.table("stateful_sess").collect()
    }
    # u1 session 1 closed by the in-batch gap break
    assert got[("u1", "2024-06-01 10:00:00")] == ("2024-06-01 10:05:00", 2)
    # u1 session 2 and u2's session closed by event-time timeout
    assert got[("u1", "2024-06-01 11:00:00")] == ("2024-06-01 11:00:00", 1)
    assert got[("u2", "2024-06-01 10:00:00")] == ("2024-06-01 10:00:00", 1)
