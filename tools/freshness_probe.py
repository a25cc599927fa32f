"""Freshness probe: measure event-written -> row-queryable latency.

The reference's headline claim is near-real-time freshness — rows are
queryable while still in Pinot's in-memory consuming segment (README.md:19),
sealed every 2 minutes (kinesisTableConfigFile.json:24).  Spark's structural
analog is the micro-batch trigger (SURVEY B57): freshness = trigger interval
+ commit latency.  This probe quantifies that gap end-to-end through the real
ingest pipeline (file source -> JSON decode -> day-partitioned parquet):

    python tools/freshness_probe.py [trigger_seconds] [rounds]

For each round it writes a uniquely-marked event, polls the served table
until the marker is visible, and reports per-round and median latency as one
JSON line.  With the default 1-second trigger, median freshness on local[32]
is a few seconds — the honest number to compare against Pinot's
"seconds" (consuming segment) and 2-minute durability cadence.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
import uuid
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from real_time_analytics_with_apache_pinot_on_aws_spark.engine import Engine  # noqa: E402
from real_time_analytics_with_apache_pinot_on_aws_spark.session import build_session  # noqa: E402
from real_time_analytics_with_apache_pinot_on_aws_spark.streaming import RawRecordSource  # noqa: E402

SCHEMA = {
    "schemaName": "kinesisTable",
    "dimensionFieldSpecs": [
        {"name": "userID", "dataType": "STRING"},
        {"name": "campaign", "dataType": "STRING"},
    ],
    "metricFieldSpecs": [{"name": "price", "dataType": "INT"}],
    "dateTimeFieldSpecs": [
        {
            "name": "creationTimestamp",
            "dataType": "STRING",
            "format": "1:DAYS:SIMPLE_DATE_FORMAT:yyyy-MM-dd HH:mm:ss",
            "granularity": "1:DAYS",
        }
    ],
}

TABLE_CONFIG = {
    "tableName": "freshness_probe",
    "tableType": "REALTIME",
    "segmentsConfig": {"timeColumnName": "creationTimestamp"},
}


def main() -> None:
    trigger_s = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = build_session(app_name="freshness_probe")
    spark.sparkContext.setLogLevel("ERROR")

    with tempfile.TemporaryDirectory() as tmp:
        src = Path(tmp) / "in"
        src.mkdir()
        engine = Engine(spark, str(Path(tmp) / "warehouse"))
        pipe = engine.add_table(
            SCHEMA,
            TABLE_CONFIG,
            RawRecordSource(kind="files", path=str(src)),
            start=False,
        )
        pipe.start(trigger=f"{max(1, int(trigger_s))} seconds")

        latencies = []
        for i in range(rounds):
            marker = uuid.uuid4().hex
            event = {
                "userID": marker,
                "campaign": "probe",
                "price": i,
                "creationTimestamp": "2024-06-01 10:00:00",
            }
            (src / f"evt_{i}.json").write_text(json.dumps(event) + "\n")
            t0 = time.time()
            while True:
                try:
                    if pipe.table().filter(f"userID = '{marker}'").count() > 0:
                        break
                except Exception:
                    pass  # table dir not created until the first commit
                if time.time() - t0 > 120:
                    raise TimeoutError(f"round {i}: marker not visible in 120 s")
                time.sleep(0.2)
            latencies.append(round(time.time() - t0, 3))
        pipe.stop()

    latencies_sorted = sorted(latencies)
    print(
        json.dumps(
            {
                "metric": "ingest_freshness",
                "value": latencies_sorted[len(latencies_sorted) // 2],
                "unit": "sec",
                "trigger_sec": trigger_s,
                "rounds": latencies,
                "reference": "Pinot consuming-segment freshness: seconds; "
                "durable seal: 2 min (kinesisTableConfigFile.json:24)",
            }
        )
    )


if __name__ == "__main__":
    main()
