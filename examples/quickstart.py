"""Quickstart: the reference deployment's workflow, end-to-end on this engine.

Mirrors what a user of aws-samples/real-time-analytics-with-apache-pinot-on-aws
does after `cdk deploy` (README.md:88-110 of the reference): create a realtime
table from a Pinot schema + table config, stream KDG-shaped JSON events in,
and run live SQL — plus the round-4 extras (star-tree auto-routing, EXPLAIN,
broker envelope).  Runs standalone:

    python examples/quickstart.py
"""

from __future__ import annotations

import json
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

from real_time_analytics_with_apache_pinot_on_aws_spark.engine import Engine
from real_time_analytics_with_apache_pinot_on_aws_spark.session import build_session
from real_time_analytics_with_apache_pinot_on_aws_spark.streaming import RawRecordSource
from real_time_analytics_with_apache_pinot_on_aws_spark.streaming.rollup import AggRequest

# The reference's schema/table-config shapes (kinesisTable.json /
# kinesisTableConfigFile.json), plus a star-tree declaration.
SCHEMA = {
    "schemaName": "clickstream",
    "dimensionFieldSpecs": [
        {"name": "userID", "dataType": "STRING"},
        {"name": "campaign", "dataType": "STRING", "defaultNullValue": "NONE"},
    ],
    "metricFieldSpecs": [{"name": "price", "dataType": "DOUBLE"}],
    "dateTimeFieldSpecs": [
        {
            "name": "creationTimestamp",
            "dataType": "STRING",
            "format": "SIMPLE_DATE_FORMAT|yyyy-MM-dd HH:mm:ss",
            "granularity": "1:DAYS",
        }
    ],
}
TABLE_CONFIG = {
    "tableName": "clickstream",
    "tableType": "REALTIME",
    "segmentsConfig": {
        "timeColumnName": "creationTimestamp",
        "retentionTimeUnit": "DAYS",
        "retentionTimeValue": "7",
    },
    "tableIndexConfig": {
        "streamConfigs": {"realtime.segment.flush.threshold.time": "2m"},
        "starTreeIndexConfigs": [
            {
                "dimensionsSplitOrder": ["campaign", "ingest_date"],
                "functionColumnPairs": [
                    "SUM__price", "COUNT__price",
                    # round 6: sketch cells — mergeable DataSketches HLL
                    "DISTINCTCOUNTHLL__userID",
                ],
            }
        ],
    },
}


def main() -> None:
    spark = build_session(app_name="quickstart", shuffle_partitions=8)
    work = Path(tempfile.mkdtemp(prefix="quickstart_"))
    src = work / "stream_in"
    src.mkdir(parents=True)

    # 1. KDG-analog: land a batch of JSON events on the stream source
    with open(src / "batch1.json", "w") as fh:
        for i in range(200):
            fh.write(json.dumps({
                "userID": str(i % 40),
                "campaign": ["BlackFriday", "10Percent", "NONE"][i % 3],
                "price": 10 + (i % 90),
                "creationTimestamp": f"2024-06-01 10:{i % 60:02d}:00",
            }) + "\n")

    # 2. AddTable: schema + config -> consuming table (A8)
    engine = Engine(spark, str(work / "warehouse"))
    pipe = engine.add_table(
        SCHEMA, TABLE_CONFIG,
        RawRecordSource(kind="files", path=str(src)),
        available_now=True,
    )
    pipe.process_available()
    engine.register_view("clickstream")

    # 3. Live SQL over the consuming table (B2), broker-envelope result (B4)
    resp = engine.query_broker_response(
        "SELECT campaign, count(*) AS n, round(sum(price), 2) AS revenue "
        "FROM clickstream GROUP BY campaign ORDER BY revenue DESC"
    )
    print("broker response:", json.dumps(resp["resultTable"], indent=2))

    # 4. Star-tree selection: the same aggregate served from pre-agg cells
    routed, route = engine.query_routed(
        "SELECT campaign, sum(price) AS revenue, count(price) AS n "
        "FROM clickstream GROUP BY campaign"
    )
    print(f"route = {route}")
    routed.show()

    # ... or declaratively:
    df, route = engine.query_agg(
        "clickstream",
        AggRequest(dims=("campaign",), aggs={"mean_price": ("avg", "price")}),
    )
    print(f"declarative route = {route}")
    df.show()

    # 4b. Pinot aggregate SPELLINGS route too — DISTINCTCOUNTHLL group-bys
    #     are served from the mergeable HLL sketch cells (round 6)
    routed, route = engine.query_routed(
        "SELECT campaign, DISTINCTCOUNTHLL(userID) AS users, "
        "SUM(price) AS revenue FROM clickstream GROUP BY campaign"
    )
    print(f"HLL route = {route}")
    routed.show()

    # 4c. ... and the whole Pinot function surface answers as plain SQL:
    #     aggregate spellings, percent-scaled percentiles, scalar names
    engine.query(
        "SELECT MINMAXRANGE(price) AS price_range, "
        "PERCENTILE(price, 90) AS p90, "
        "LASTWITHTIME(price, creationTimestamp__ts, 'DOUBLE') AS last_price, "
        "DISTINCTCOUNT(userID) AS users FROM clickstream"
    ).show()

    # 5. Plan introspection, Pinot-style (EXPLAIN PLAN FOR)
    engine.query(
        "EXPLAIN PLAN FOR SELECT campaign, count(*) FROM clickstream GROUP BY campaign"
    ).show(truncate=False)

    # 6. The wire surface (round 5): POST /query/sql — the exact endpoint
    #    the reference's ALB fronts (stack ts:725-726)
    import urllib.request

    from real_time_analytics_with_apache_pinot_on_aws_spark import broker_http

    srv = broker_http.start_broker(engine, port=0)
    try:
        req = urllib.request.Request(
            srv.url(),
            data=json.dumps({"sql": "SELECT count(*) AS n FROM clickstream"}).encode(),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=60) as resp:
            print("HTTP broker:", json.loads(resp.read())["resultTable"]["rows"])
    finally:
        srv.stop()

    # 7. Dimension table + scalar LOOKUP (the Pinot replicated dim join)
    dim = spark.createDataFrame(
        [("BlackFriday", "alex"), ("10Percent", "sam")], "campaign string, owner string"
    )
    engine.add_dim_table(
        {
            "schemaName": "campaignDim",
            "dimensionFieldSpecs": [
                {"name": "campaign", "dataType": "STRING"},
                {"name": "owner", "dataType": "STRING"},
            ],
            "primaryKeyColumns": ["campaign"],
        },
        {"tableName": "campaignDim", "tableType": "OFFLINE", "isDimTable": True},
        dim,
    )
    engine.query(
        "SELECT campaign, LOOKUP('campaignDim','owner','campaign', campaign) AS owner, "
        "count(*) AS n FROM clickstream GROUP BY 1, 2 ORDER BY n DESC"
    ).show()

    # 8. SQL gapfill (Pinot's GAPFILL form): fill missing minutes per campaign
    engine.query(
        "SELECT GAPFILL(tb, '1:MINUTES:EPOCH', '2024-06-01 10:00:00', "
        "'2024-06-01 10:10:00', '1:MINUTES', FILL(rev, 'FILL_DEFAULT_VALUE'), "
        "TIMESERIESON(campaign)) AS tb, campaign, rev "
        "FROM (SELECT date_trunc('MINUTE', creationTimestamp__ts) AS tb, campaign, "
        "sum(price) AS rev FROM clickstream GROUP BY 1, 2) LIMIT 8"
    ).show()

    # 9. Hybrid table: push a sealed OFFLINE day, reads merge at the
    #    time boundary (offline <= boundary, realtime after)
    engine.add_offline_table(
        SCHEMA,
        {
            "tableName": "clickstream",
            "tableType": "OFFLINE",
            "segmentsConfig": {
                "timeColumnName": "creationTimestamp",
                "retentionTimeUnit": "DAYS",
                "retentionTimeValue": "7",
            },
        },
    )
    engine.upload_segment(
        "clickstream",
        spark.createDataFrame(
            [("u1", "BlackFriday", 99.0, "2024-05-31 12:00:00")],
            "userID string, campaign string, price double, creationTimestamp string",
        ),
    )
    engine.register_view("clickstream")
    print("hybrid boundary:", engine.hybrid_time_boundary("clickstream"))
    engine.query(
        "SELECT ingest_date, count(*) AS n FROM clickstream GROUP BY 1 ORDER BY 1"
    ).show()

    # 10. RealtimeToOfflineSegmentsTask: move sealed realtime days into the
    #     OFFLINE side (the minion task production hybrid tables run) —
    #     requires the consumer drained, same rule as compaction
    pipe.stop()
    # explicit cutoff: the default never moves the newest (consuming) day
    print("realtime->offline:",
          engine.realtime_to_offline("clickstream", cutoff_day="2024-06-01"))
    engine.register_view("clickstream")
    engine.query(
        "SELECT ingest_date, count(*) AS n FROM clickstream GROUP BY 1 ORDER BY 1"
    ).show()

    # 11. Controller REST: the reference provisions with pinot-admin.sh
    #     AddTable == POST /schemas + POST /tables against the controller;
    #     the same facade lists tables and runs maintenance tasks
    import json as _json
    import urllib.request

    from real_time_analytics_with_apache_pinot_on_aws_spark.controller_http import start_controller

    ctl = start_controller(engine, port=0)
    with urllib.request.urlopen(f"{ctl.url()}/tables", timeout=10) as r:
        print("controller /tables:", _json.loads(r.read()))

    # 12. Round 6 — CLP log columns (B68): a table whose string field is
    #     stored as logtype/dictionaryVars/encodedVars; CLPDECODE(field)
    #     reassembles, and numeric analytics run on the encoded form
    logs_src = work / "logs_in"
    logs_src.mkdir()
    with open(logs_src / "a.json", "w") as fh:
        for i in range(6):
            fh.write(json.dumps({
                "message": f"task_{i % 2} finished in {15 + i} ms",
                "creationTimestamp": f"2024-06-01 11:0{i}:00",
            }) + "\n")
    logpipe = engine.add_table(
        {
            "schemaName": "logs",
            "dimensionFieldSpecs": [{"name": "message", "dataType": "STRING"}],
            "dateTimeFieldSpecs": [
                {"name": "creationTimestamp", "dataType": "STRING",
                 "format": "SIMPLE_DATE_FORMAT|yyyy-MM-dd HH:mm:ss",
                 "granularity": "1:DAYS"}
            ],
        },
        {
            "tableName": "logs",
            "tableType": "REALTIME",
            "segmentsConfig": {"timeColumnName": "creationTimestamp"},
            "fieldConfigList": [
                {"name": "message", "encodingType": "RAW",
                 "compressionCodec": "CLP"}
            ],
            "tableIndexConfig": {
                "streamConfigs": {"realtime.segment.flush.threshold.time": "2m"}
            },
        },
        RawRecordSource(kind="files", path=str(logs_src)),
        available_now=True,
    )
    logpipe.process_available()
    engine.register_view("logs")
    engine.query(
        "SELECT CLPDECODE(message) AS msg, message_logtype, "
        "message_encodedVars[0] AS ms FROM logs ORDER BY ms LIMIT 3"
    ).show(truncate=False)
    logpipe.stop()

    # 13. Round 6 — Pinot null semantics: enableNullHandling=false serves
    #     the sentinel view (IS NULL matches nothing) of null-native storage
    engine.query(
        "SET enableNullHandling=false; "
        "SELECT count(*) AS null_campaigns FROM clickstream "
        "WHERE campaign IS NULL"
    ).show()

    # 14. Round 6 — pause/resume consumption over the controller REST
    #     (the table keeps answering while paused; resume is exactly-once)
    with urllib.request.urlopen(
        urllib.request.Request(
            f"{ctl.url()}/tables/logs/pauseConsumption", method="POST"
        ), timeout=10,
    ) as r:
        print("pauseConsumption:", _json.loads(r.read()))
    ctl.stop()

    # 15. Round 7 — Pinot's primary funnel aggregate (cumulative distinct-
    #     correlator intersection), the bounded MV-distinct statement route
    #     (LATERAL VIEW POSEXPLODE plan, never a collect_set of arrays),
    #     and the vector scalar family — all plain broker SQL
    engine.query(
        "SELECT FUNNELCOUNT(STEPS(campaign = 'BlackFriday', "
        "campaign = '10Percent'), CORRELATE_BY(userID)) AS funnel "
        "FROM clickstream"
    ).show(truncate=False)
    spark.sql(
        "SELECT * FROM VALUES ('a', array('x','y')), ('a', array('y','x')), "
        "('b', array('z')) AS t(k, tags)"
    ).createOrReplaceTempView("mv_demo")
    engine.query(
        "SELECT k, DISTINCTCOUNTMV(tags) AS distinct_tags, COUNT(*) AS n "
        "FROM mv_demo GROUP BY k ORDER BY k"
    ).show()
    engine.query(
        "SELECT round(COSINEDISTANCE(array(1.0D, 0.0D), "
        "array(0.0D, 1.0D)), 4) AS orthogonal_dist, "
        "VECTORNORM(array(3.0D, 4.0D)) AS norm_3_4"
    ).show()

    # 16. Round 8 — the last wire-spelling tail: EXPRMIN/EXPRMAX
    #     (projection first, multi-measure lexicographic), ARRAYAGG,
    #     the exact array-function names, and the IdSet filter
    #     IN_SUBQUERY — all served exactly through the same broker SQL
    engine.query(
        "SELECT EXPRMAX(campaign, price) AS priciest_campaign, "
        "ARRAYAGG(campaign, 'STRING', true) AS campaigns "
        "FROM clickstream"
    ).show(truncate=False)
    engine.query(
        "SELECT userID FROM clickstream WHERE IN_SUBQUERY(userID, "
        "'SELECT ID_SET(userID) FROM clickstream "
        "WHERE campaign = ''BlackFriday''') = 1 "
        "ORDER BY userID LIMIT 5"
    ).show()
    engine.query(
        "SELECT ARRAYSORTSTRING(array('b', 'a')) AS sorted_tags, "
        "VALUEIN(array(1, 5, 2), 1, 2) AS kept, "
        "HAMMINGDISTANCE('karolin', 'kathrin') AS ham"
    ).show()

    # 17. Round-8 session tail: the boolean aggregates, MODE tie
    #     reducers (MIN default / MAX via the exact negation identity),
    #     the epoch-bucket rollup macros, and SUMARRAYLONG served by the
    #     positional statement route (posexplode + per-(group, position)
    #     hash aggregate — Pinot's accumulator bound, zero collected
    #     input arrays)
    engine.query(
        "SELECT BOOLAND(price > 0) AS all_paid, "
        "BOOLOR(campaign = 'BlackFriday') AS any_bf, "
        "MODE(price, 'MAX') AS modal_price_hi, "
        "TOEPOCHMINUTESROUNDED(1613472303000, 15) AS bucket15 "
        "FROM clickstream"
    ).show()
    # derived-table relations route too (the FROM re-emits verbatim
    # inside the bounded plan's derived table)
    engine.query(
        "SELECT k, SUMARRAYLONG(nums) AS elementwise_sums "
        "FROM (SELECT * FROM VALUES ('a', array(1, 2, 3)), "
        "('a', array(10, 20)), ('b', array(5)) AS t(k, nums)) src "
        "GROUP BY k ORDER BY k"
    ).show()

    # 18. Round 9: single-use WITH-CTEs inline into the bounded routes
    #     (the last fold-only wire shape), FUNNELSTEPDURATIONSTATS rides
    #     the ordered-funnel window cascade, and the logical explain
    #     spelling answers the Catalyst tree
    engine.query(
        "WITH recent AS (SELECT userID, creationTimestamp__ts, campaign "
        "FROM clickstream WHERE price >= 0) "
        "SELECT FUNNELCOUNT(STEPS(campaign = 'BlackFriday', "
        "campaign = '10Percent'), CORRELATE_BY(userID)) AS funnel "
        "FROM recent"
    ).show(truncate=False)
    engine.query(
        "SELECT FUNNELSTEPDURATIONSTATS(creationTimestamp__ts, '0', 2, "
        "'campaign = ''BlackFriday''', 'campaign = ''10Percent''', "
        "'durationFunctions=min,avg') AS step_durations_ms "
        "FROM clickstream"
    ).show(truncate=False)
    engine.query(
        "EXPLAIN PLAN WITHOUT IMPLEMENTATION FOR "
        "SELECT campaign, count(*) FROM clickstream GROUP BY campaign"
    ).show(truncate=False)

    # 19. Round 10: the routes now admit the full dashboard shape in one
    #     statement — a time-bucketed funnel (expression GROUP BY /
    #     GROUP BY 1), FILTER'd co-aggregates, and dimension-join chains
    engine.query(
        "SELECT date_trunc('DAY', creationTimestamp__ts) AS day, "
        "FUNNELCOUNT(STEPS(campaign = 'BlackFriday', "
        "campaign = '10Percent'), CORRELATE_BY(userID)) AS funnel, "
        "count(*) FILTER (WHERE price > 50) AS big_carts "
        "FROM clickstream "
        "GROUP BY date_trunc('DAY', creationTimestamp__ts) ORDER BY 1"
    ).show(truncate=False)

    spark.stop()


if __name__ == "__main__":
    main()
