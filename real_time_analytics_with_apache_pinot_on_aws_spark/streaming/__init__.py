"""Structured-Streaming ingestion: the reference's realtime-table path.

Reference dataflow (SURVEY §3 entry 2): Kinesis JSON events -> per-shard
consumer -> KafkaJSONMessageDecoder -> consuming segment (immediately
queryable) -> sealed segment -> S3 deep storage, with 2-minute flush and
7-day retention.

Spark mirror: ``readStream`` (file/kafka/rate source) -> ``from_json`` decode
(the compiled schema) -> ``writeStream`` parquet append with checkpoint;
micro-batch commit == segment flush; the table directory == deep storage
(no separate serving tier); retention == partition-drop job.

``rollup`` adds the star-tree analog: per-micro-batch partial-aggregate
cells appended alongside the table, merged at query time (``serve``).
"""

from .ingest import IngestPipeline, RawRecordSource  # noqa: F401
