"""CLP log-column tests (SURVEY B68): encode/decode losslessness, the
engine's fieldConfigList compressionCodec "CLP" path, the CLPDECODE SQL
macro + 1-arg sugar, hybrid parity, and the compression claim."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from real_time_analytics_with_apache_pinot_on_aws_spark.engine import Engine, TableConfig
from real_time_analytics_with_apache_pinot_on_aws_spark.operators import clp
from real_time_analytics_with_apache_pinot_on_aws_spark.streaming import RawRecordSource

LOG_SCHEMA = {
    "schemaName": "logsTable",
    "dimensionFieldSpecs": [
        {"name": "level", "dataType": "STRING"},
        {"name": "message", "dataType": "STRING"},
    ],
    "dateTimeFieldSpecs": [
        {
            "name": "ts",
            "dataType": "STRING",
            "format": "SIMPLE_DATE_FORMAT|yyyy-MM-dd HH:mm:ss",
            "granularity": "1:DAYS",
        }
    ],
}

LOG_TABLE_CONFIG = {
    "tableName": "logsTable",
    "tableType": "REALTIME",
    "segmentsConfig": {"timeColumnName": "ts"},
    "fieldConfigList": [
        {"name": "message", "encodingType": "RAW", "compressionCodec": "CLP"}
    ],
}

TRICKY = [
    "INFO task_12 finished in 37 ms code 007 x1.5",
    "plain words only",
    "",
    "a  b   -42",              # runs of spaces + negative int
    "007 -0 9223372036854775808 9223372036854775807",  # non-roundtrip ints
    " leading and trailing ",
    "v1.2.3-rc4 10.0.0.1:8080 /api/v2/users?id=99",
    "tab\tinside one-token 5",
    "\x11 literal placeholder \x12 bytes 3",  # content containing placeholders
]


def _roundtrip(spark, msgs):
    df = spark.createDataFrame([(i, m) for i, m in enumerate(msgs)], "id int, msg string")
    enc = clp.clp_encode(df, "msg")
    dec = enc.select(
        "id", clp.clp_decode_column("msg").alias("decoded")
    ).orderBy("id")
    return [r["decoded"] for r in dec.collect()]


def test_clp_roundtrip_lossless(spark):
    """decode(encode(x)) == x for every string — including placeholder
    bytes in content, non-BIGINT-roundtrip integers, and space runs."""
    assert _roundtrip(spark, TRICKY) == TRICKY


def test_clp_roundtrip_null(spark):
    df = spark.createDataFrame([(1, None)], "id int, msg string")
    enc = clp.clp_encode(df, "msg")
    row = enc.select(clp.clp_decode_column("msg").alias("d")).collect()[0]
    assert row["d"] is None


def test_clp_classification(spark):
    """Pure roundtrip integers -> encodedVars; digit-bearing tokens ->
    dictionaryVars; static tokens stay in the logtype."""
    df = spark.createDataFrame(
        [(1, "INFO task_12 finished in 37 ms code 007 x1.5")], "id int, msg string"
    )
    r = clp.clp_encode(df, "msg").collect()[0]
    assert r["msg_logtype"] == "INFO \x11 finished in \x12 ms code \x11 \x11"
    assert r["msg_dictionaryVars"] == ["task_12", "007", "x1.5"]
    assert r["msg_encodedVars"] == [37]


def test_clp_no_python_udf_in_plan(spark):
    """Encode and decode are built-in higher-order functions — the hot
    path never leaves the JVM."""
    df = spark.createDataFrame([(1, "a 1 b")], "id int, msg string")
    enc = clp.clp_encode(df, "msg")
    plan = (
        enc.select(clp.clp_decode_column("msg"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan and "BatchEval" not in plan


def test_clpdecode_sql_macro(spark):
    """The registered CLPDECODE(lt, dv, ev) SQL macro matches the Column
    API decode on the same rows."""
    from real_time_analytics_with_apache_pinot_on_aws_spark.functions import sqlfns

    sqlfns.register_all(spark)
    df = spark.createDataFrame([(i, m) for i, m in enumerate(TRICKY)], "id int, msg string")
    clp.clp_encode(df, "msg").createOrReplaceTempView("clp_macro_t")
    rows = spark.sql(
        "SELECT id, CLPDECODE(msg_logtype, msg_dictionaryVars, msg_encodedVars) AS d "
        "FROM clp_macro_t ORDER BY id"
    ).collect()
    assert [r["d"] for r in rows] == TRICKY
    spark.catalog.dropTempView("clp_macro_t")


def test_table_config_parses_clp_columns():
    cfg = TableConfig.parse(LOG_TABLE_CONFIG)
    assert cfg.clp_columns == ("message",)


def _write_logs(path, n, day, start=0):
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as fh:
        for i in range(start, start + n):
            fh.write(
                json.dumps(
                    {
                        "level": "INFO",
                        "message": (
                            f"task_{i % 7} finished scanning container_{i % 5} "
                            f"in {17 + i} ms with code {i % 3}"
                        ),
                        "ts": f"{day} 10:{i % 60:02d}:00",
                    }
                )
                + "\n"
            )


def test_engine_clp_end_to_end(spark, tmp_path):
    """fieldConfigList compressionCodec CLP **[P1.2]**: ingest stores the
    three physical columns (never the raw message), CLPDECODE(message)
    sugar reassembles through query(), template mining is a logtype
    GROUP BY, and numeric aggregation runs on encodedVars undecoded."""
    src = tmp_path / "in"
    _write_logs(src / "a.json", 20, "2024-06-01")
    engine = Engine(spark, str(tmp_path / "wh"))
    pipe = engine.add_table(
        LOG_SCHEMA, LOG_TABLE_CONFIG,
        RawRecordSource(kind="files", path=str(src)), available_now=True,
    )
    pipe.process_available()
    engine.register_view("logsTable")
    cols = spark.table("logsTable").columns
    assert "message" not in cols
    for c in ("message_logtype", "message_dictionaryVars", "message_encodedVars"):
        assert c in cols

    # 1-arg sugar through query(): the original messages come back
    decoded = {
        r["d"]
        for r in engine.query(
            "SELECT CLPDECODE(message) AS d FROM logsTable"
        ).collect()
    }
    assert "task_0 finished scanning container_0 in 17 ms with code 0" in decoded
    assert len(decoded) == 20

    # template mining: one logtype for all 20 lines
    lt = engine.query(
        "SELECT message_logtype AS t, count(*) AS n FROM logsTable GROUP BY 1"
    ).collect()
    assert len(lt) == 1 and lt[0]["n"] == 20

    # numeric analytics directly on the encoded representation
    mx = engine.query(
        "SELECT max(message_encodedVars[0]) AS mx FROM logsTable"
    ).collect()[0]["mx"]
    assert mx == 17 + 19
    pipe.stop()


def test_engine_clp_hybrid_upload_parity(spark, tmp_path):
    """upload_segment applies the same CLP encode the realtime decode
    applies, so the hybrid boundary union serves one physical schema."""
    src = tmp_path / "in"
    _write_logs(src / "rt.json", 4, "2024-06-02")
    engine = Engine(spark, str(tmp_path / "wh"))
    pipe = engine.add_table(
        LOG_SCHEMA, LOG_TABLE_CONFIG,
        RawRecordSource(kind="files", path=str(src)), available_now=True,
    )
    pipe.process_available()
    engine.add_offline_table(
        LOG_SCHEMA,
        {
            "tableName": "logsTable",
            "tableType": "OFFLINE",
            "segmentsConfig": {"timeColumnName": "ts"},
            "fieldConfigList": [
                {"name": "message", "encodingType": "RAW", "compressionCodec": "CLP"}
            ],
        },
    )
    engine.upload_segment(
        "logsTable",
        spark.createDataFrame(
            [("WARN", "disk_3 at 91 percent on host_12", "2024-06-01 09:00:00")],
            "level string, message string, ts string",
        ),
    )
    engine.register_view("logsTable")
    decoded = {
        r["d"]
        for r in engine.query("SELECT CLPDECODE(message) AS d FROM logsTable").collect()
    }
    assert "disk_3 at 91 percent on host_12" in decoded
    assert len(decoded) == 5
    pipe.stop()


def test_clp_compression_beats_raw(spark, tmp_path):
    """The storage claim: on template-shaped logs the CLP physical layout
    (dictionary-encodable logtype + packed longs) writes smaller parquet
    than the raw message column."""
    n = 20_000
    df = spark.range(n).select(
        F.concat(
            F.lit("2024-06-01 10:00:00 INFO scheduler task_"),
            (F.col("id") % 997).cast("string"),
            F.lit(" assigned to executor_"),
            (F.col("id") % 31).cast("string"),
            F.lit(" queue length "),
            (F.col("id") % 113).cast("string"),
            F.lit(" wait "),
            F.col("id"),
            F.lit(" ms"),
        ).alias("message")
    )
    raw_path = tmp_path / "raw"
    clp_path = tmp_path / "clp"
    df.coalesce(1).write.parquet(str(raw_path))
    clp.clp_encode(df, "message").coalesce(1).write.parquet(str(clp_path))

    def _bytes(p):
        return sum(f.stat().st_size for f in p.rglob("*.parquet"))

    raw_b, clp_b = _bytes(raw_path), _bytes(clp_path)
    assert clp_b < raw_b, (raw_b, clp_b)


@pytest.mark.parametrize("stmt", [
    "SELECT CLPDECODE(other) AS d FROM x",       # undeclared column untouched
    "SELECT 'CLPDECODE(message)' AS s FROM x",   # inside a literal untouched
])
def test_clpdecode_sugar_guards(spark, tmp_path, stmt):
    engine = Engine(spark, str(tmp_path / "wh"))
    engine.configs["logsTable"] = TableConfig.parse(LOG_TABLE_CONFIG)
    assert engine._expand_clpdecode_sugar(stmt) == stmt
    expanded = engine._expand_clpdecode_sugar("SELECT CLPDECODE(message) FROM x")
    assert "message_logtype" in expanded and "message_encodedVars" in expanded


def test_clp_hybrid_one_sided_declaration_serves_one_shape(spark, tmp_path):
    """Hybrid CLP coherence (round-6 review): declaring compressionCodec
    CLP only on the REALTIME side (the natural spelling — Pinot's
    fieldsForClpEncoding is ingest-side config) still yields ONE physical
    schema: the offline struct carries the physical triple from
    registration (before any upload), and uploads encode identically."""
    src = tmp_path / "in"
    _write_logs(src / "rt.json", 3, "2024-06-02")
    engine = Engine(spark, str(tmp_path / "wh"))
    pipe = engine.add_table(
        LOG_SCHEMA, LOG_TABLE_CONFIG,
        RawRecordSource(kind="files", path=str(src)), available_now=True,
    )
    pipe.process_available()
    # OFFLINE side declares NO fieldConfigList at all
    engine.add_offline_table(
        LOG_SCHEMA,
        {
            "tableName": "logsTable",
            "tableType": "OFFLINE",
            "segmentsConfig": {"timeColumnName": "ts"},
        },
    )
    # the EMPTY offline side already exposes the encoded shape
    empty_cols = engine.offline_structs["logsTable"].fieldNames()
    assert "message" not in empty_cols
    assert "message_logtype" in empty_cols
    engine.register_view("logsTable")
    before = set(spark.table("logsTable").columns)
    engine.upload_segment(
        "logsTable",
        spark.createDataFrame(
            [("WARN", "disk_7 at 93 percent on host_2", "2024-06-01 09:00:00")],
            "level string, message string, ts string",
        ),
    )
    engine.register_view("logsTable")
    after = set(spark.table("logsTable").columns)
    assert before == after          # schema did NOT flip on first upload
    decoded = {
        r["d"]
        for r in engine.query(
            "SELECT CLPDECODE(message) AS d FROM logsTable"
        ).collect()
    }
    assert "disk_7 at 93 percent on host_2" in decoded and len(decoded) == 4
    pipe.stop()


def test_clpdecode_sugar_qualified_reference(spark, tmp_path):
    """CLPDECODE(alias.field) **[P1.2]** — the natural spelling in a join —
    expands with the qualifier carried onto all three physical columns
    (round-6 review: the bare-identifier regex left it as a confusing
    wrong-arity call)."""
    src = tmp_path / "in"
    _write_logs(src / "a.json", 3, "2024-06-01")
    engine = Engine(spark, str(tmp_path / "wh"))
    pipe = engine.add_table(
        LOG_SCHEMA, LOG_TABLE_CONFIG,
        RawRecordSource(kind="files", path=str(src)), available_now=True,
    )
    pipe.process_available()
    engine.register_view("logsTable")
    rows = engine.query(
        "SELECT CLPDECODE(l.message) AS d FROM logsTable l "
        "WHERE l.level = 'INFO' ORDER BY d"
    ).collect()
    assert len(rows) == 3
    assert rows[0]["d"].startswith("task_0 finished")
    pipe.stop()
