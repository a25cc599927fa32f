"""Stream/batch source adapters (SURVEY §2.A A1-A3, A13).

The reference ingests from a 2-shard Kinesis stream
(lib/apache-pinot-solution-stack.ts:730-734) with a LATEST shard iterator and
JSON payloads (kinesisTableConfigFile.json:18-22), with MSK/Kafka as the
documented alternative (resources/constructs/msk-construct.ts).

``RawRecordSource`` (re-exported from streaming.ingest) abstracts the record
feed; this module adds the option-mapping helpers for the real connectors.
The Kinesis connector jar is not present in this environment, so its adapter
only *builds options* — construction is exercised, IO is not (gated at load).
"""

from __future__ import annotations

from ..streaming.ingest import RawRecordSource  # noqa: F401

# Exact connector coordinates for a deployment with network/jars available —
# pass via ``spark.jars.packages`` (or bake into the image).  Versions track
# the Spark version in use (pyspark 4.1.x / Scala 2.13):
KAFKA_CONNECTOR_COORDINATES = "org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.2"
# Kinesis has no first-party Spark connector; the maintained Structured
# Streaming connector (format "aws-kinesis", used by RawRecordSource) is
# AWS Labs' spark-sql-kinesis-connector —
# https://github.com/awslabs/spark-sql-kinesis-connector
KINESIS_CONNECTOR_REPO = "https://github.com/awslabs/spark-sql-kinesis-connector"


def kafka_connector_available(spark) -> bool:
    """True when the Kafka Structured Streaming connector is on the classpath.

    Checks class resolution only — no broker contact (the connector defers
    connections until the query starts).  Gates the end-to-end test in
    tests/test_streaming_engine.py so it runs automatically wherever the jar
    is present and skips (with the coordinates in the skip reason) where not.
    """
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


def kinesis_source(stream_name: str, region: str = "us-east-1", latest: bool = True) -> RawRecordSource:
    """Option mapping for the spark-kinesis connector (A1/A2 analog).

    Reference config -> connector options:
    - ``streamType: kinesis``, 2 shards -> one Spark input partition per shard
    - ``shardIteratorType: LATEST`` (json:18) -> ``startingPosition: latest``
    - fetch timeout 120s -> reader poll timeout

    Requires the ``spark-sql-kinesis`` connector jar at runtime.
    """
    return RawRecordSource(
        kind="kinesis",
        options={
            "streamName": stream_name,
            "region": region,
            "startingPosition": "latest" if latest else "trim_horizon",
        },
    )


def kafka_source(bootstrap: str, topic: str, latest: bool = True) -> RawRecordSource:
    """Kafka/MSK analog (A13): topic with 3 partitions, RF 2 in the reference
    (msk-serverless-construct.ts:91-100) — Spark maps partitions natively."""
    return RawRecordSource(
        kind="kafka",
        options={
            "kafka.bootstrap.servers": bootstrap,
            "subscribe": topic,
            "startingOffsets": "latest" if latest else "earliest",
        },
    )


def source_from_stream_configs(stream_configs: dict) -> RawRecordSource:
    """Build the record source a Pinot ``streamConfigs`` block declares —
    what the controller does when AddTable arrives with a REALTIME config
    (kinesisTableConfigFile.json:14-26 is the reference's exact block).

    - ``streamType: kinesis`` -> :func:`kinesis_source` (topic name json:16,
      LATEST iterator json:18; region placeholder resolved by the caller)
    - ``streamType: kafka`` -> :func:`kafka_source` (the documented MSK
      alternative, msk-construct.ts)
    - ``streamType: file`` -> the engine's file-tailing source (the
      test/bench analog of a shard put; not a Pinot stream type — documented
      extension so provisioning round-trips run jar-free)
    """
    stype = str(stream_configs.get("streamType", "")).lower()
    if stype == "kinesis":
        return kinesis_source(
            stream_configs["stream.kinesis.topic.name"],
            region=stream_configs.get("region", "us-east-1"),
            latest=str(stream_configs.get("shardIteratorType", "LATEST")).upper()
            == "LATEST",
        )
    if stype == "kafka":
        return kafka_source(
            stream_configs["stream.kafka.broker.list"],
            stream_configs["stream.kafka.topic.name"],
            latest=str(
                stream_configs.get("stream.kafka.consumer.prop.auto.offset.reset", "latest")
            ).lower()
            in ("latest", "largest"),
        )
    if stype == "file":
        return RawRecordSource(kind="files", path=stream_configs["stream.file.path"])
    raise ValueError(f"unsupported streamType {stype!r}")
