"""PySpark-native real-time analytics engine.

A brand-new engine with the query and data-processing capabilities of the
``aws-samples/real-time-analytics-with-apache-pinot-on-aws`` solution (which
deploys Apache Pinot 1.2.0; see /root/reference and SURVEY.md).  Everything is
expressed Spark-first: DataFrame/SQL logical plans optimized by Catalyst, with
Structured Streaming for the ingestion path.

Layout
------
- ``session``    : tuned SparkSession builder (AQE, shuffle sizing, UTC).
- ``schema``     : Pinot-schema-JSON -> StructType compiler (SURVEY §1.3).
- ``catalog``    : test-fixture table registration.
- ``engine``     : the user-facing Engine facade (add_table / query / ingest).
- ``functions``  : Pinot 1.2 function surface as Catalyst-native SQL UDFs.
- ``operators``  : gapfill, top-k, dedup (minhash/simhash), similarity search,
                   text analysis, multimodal plumbing.
- ``streaming``  : Kinesis-analog ingestion (readStream -> decode -> append)
                   with flush cadence + retention (SURVEY §2.A).
"""

__version__ = "0.1.0"
