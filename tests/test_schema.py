"""Schema compiler unit tests (SURVEY §1.2-1.3).

The fixture schema reproduces the shape of the reference's public table schema
(resources/pinot/resources/kinesisTable.json) — field classes, SDF dateTime
format — plus extra fields covering the full Pinot 1.2 type matrix.
"""

from __future__ import annotations

from pyspark.sql import types as T

from real_time_analytics_with_apache_pinot_on_aws_spark.schema import (
    TableSchema,
    decoded_frame,
    parse_schema,
)

CLICKSTREAM_SCHEMA = {
    "schemaName": "kinesisTable",
    "dimensionFieldSpecs": [
        {"name": "userID", "dataType": "STRING"},
        {"name": "campaign", "dataType": "STRING"},
        {"name": "tags", "dataType": "STRING", "singleValueField": False},
        {"name": "flags", "dataType": "INT", "singleValueField": False},
        {"name": "active", "dataType": "BOOLEAN"},
        {"name": "payload", "dataType": "JSON"},
        {"name": "blob", "dataType": "BYTES"},
    ],
    "metricFieldSpecs": [
        {"name": "price", "dataType": "INT"},
        {"name": "amount", "dataType": "BIG_DECIMAL"},
        {"name": "ratio", "dataType": "FLOAT"},
        {"name": "total", "dataType": "DOUBLE"},
        {"name": "clicks", "dataType": "LONG"},
    ],
    "dateTimeFieldSpecs": [
        {
            "name": "creationTimestamp",
            "dataType": "STRING",
            "format": "SIMPLE_DATE_FORMAT|yyyy-MM-dd HH:mm:ss",
            "granularity": "1:DAYS",
        }
    ],
}


def test_struct_compilation():
    schema = parse_schema(CLICKSTREAM_SCHEMA)
    struct = schema.struct
    by_name = {f.name: f for f in struct.fields}
    assert isinstance(by_name["userID"].dataType, T.StringType)
    assert isinstance(by_name["tags"].dataType, T.ArrayType)
    assert isinstance(by_name["tags"].dataType.elementType, T.StringType)
    assert isinstance(by_name["flags"].dataType.elementType, T.IntegerType)
    assert isinstance(by_name["active"].dataType, T.BooleanType)
    assert isinstance(by_name["payload"].dataType, T.StringType)  # JSON rides as string
    assert isinstance(by_name["blob"].dataType, T.BinaryType)
    assert isinstance(by_name["price"].dataType, T.IntegerType)
    assert by_name["amount"].dataType == T.DecimalType(38, 18)
    assert isinstance(by_name["clicks"].dataType, T.LongType)
    assert by_name["creationTimestamp"].metadata["fieldClass"] == "dateTime"
    assert by_name["userID"].metadata["fieldClass"] == "dimension"
    assert by_name["price"].metadata["fieldClass"] == "metric"


def test_time_column_and_format():
    schema = parse_schema(CLICKSTREAM_SCHEMA)
    tc = schema.time_column()
    assert tc is not None and tc.name == "creationTimestamp"
    assert tc.format == "SIMPLE_DATE_FORMAT|yyyy-MM-dd HH:mm:ss"


def test_decode_coercion(spark):
    """KafkaJSONMessageDecoder parity: JSON string/number coercion per field
    (KDG sends userID as JSON string, price as number — README.md:88-109)."""
    schema = parse_schema(
        {
            "schemaName": "t",
            "dimensionFieldSpecs": [{"name": "userID", "dataType": "STRING"}],
            "metricFieldSpecs": [{"name": "price", "dataType": "INT"}],
            "dateTimeFieldSpecs": [
                {
                    "name": "creationTimestamp",
                    "dataType": "STRING",
                    "format": "SIMPLE_DATE_FORMAT|yyyy-MM-dd HH:mm:ss",
                }
            ],
        }
    )
    raw = spark.createDataFrame(
        [
            ('{"userID": "42", "price": 99, "creationTimestamp": "2024-05-01 10:20:30"}',),
            ('{"userID": "7", "price": "55", "creationTimestamp": "2024-05-02 00:00:00"}',),
            ('{"userID": "x", "price": null, "creationTimestamp": null}',),
        ],
        "value string",
    )
    rows = {r["userID"]: r for r in decoded_frame(raw, schema).collect()}
    assert rows["42"]["price"] == 99
    assert rows["7"]["price"] == 55  # string -> INT coercion
    assert rows["x"]["price"] is None  # real nulls, not Pinot default-fill
    assert rows["42"]["creationTimestamp"] == "2024-05-01 10:20:30"  # raw kept
    assert rows["42"]["creationTimestamp__ts"].year == 2024  # derived typed col


def test_epoch_format():
    schema = parse_schema(
        {
            "schemaName": "t",
            "dateTimeFieldSpecs": [
                {"name": "ms", "dataType": "LONG", "format": "1:MILLISECONDS:EPOCH"}
            ],
        }
    )
    tc = schema.time_column()
    assert tc is not None and tc.pinot_type == "LONG"


def test_unknown_type_rejected():
    import pytest

    schema = parse_schema(
        {"schemaName": "t", "dimensionFieldSpecs": [{"name": "bad", "dataType": "WAT"}]}
    )
    with pytest.raises(ValueError, match="unknown Pinot type"):
        _ = schema.struct


def test_default_null_value_fill(spark):
    """Pinot defaultNullValue **[P1.2]**: a field that DECLARES a default gets
    it substituted for missing/uncoercible values at decode; fields without
    one keep real SQL nulls (SURVEY §1.2 divergence stays opt-in)."""
    schema = parse_schema(
        {
            "schemaName": "t",
            "dimensionFieldSpecs": [
                {"name": "campaign", "dataType": "STRING", "defaultNullValue": "NONE"},
                {"name": "region", "dataType": "STRING"},
            ],
            "metricFieldSpecs": [
                {"name": "price", "dataType": "DOUBLE", "defaultNullValue": 0}
            ],
        }
    )
    raw = spark.createDataFrame(
        [
            ('{"campaign": "BF", "region": "eu", "price": 9.5}',),
            ('{"region": null}',),                      # all missing/null
            ('{"campaign": null, "price": "wat"}',),    # uncoercible price
        ],
        "value string",
    )
    rows = decoded_frame(raw, schema).collect()
    decoded = [(r["campaign"], r["region"], r["price"]) for r in rows]
    assert ("BF", "eu", 9.5) in decoded
    assert ("NONE", None, 0.0) in decoded       # defaults fill, region stays null
    assert decoded.count(("NONE", None, 0.0)) == 2


def test_null_handling_disabled_type_default_matrix(spark):
    """schema.pinot_type_default **[P1.2]**: with null handling disabled,
    every Pinot type fills with its documented sentinel — dimension
    minimums ('null' strings, Integer/Long.MIN_VALUE, -Infinity floats,
    epoch-0 timestamps, empty bytes, one-element MV arrays) and metric
    zeros; a declared defaultNullValue always wins over the matrix."""
    schema = parse_schema(
        {
            "schemaName": "t",
            "dimensionFieldSpecs": [
                {"name": "s", "dataType": "STRING"},
                {"name": "i", "dataType": "INT"},
                {"name": "l", "dataType": "LONG"},
                {"name": "d", "dataType": "DOUBLE"},
                {"name": "b", "dataType": "BOOLEAN"},
                {"name": "t", "dataType": "TIMESTAMP"},
                {"name": "y", "dataType": "BYTES"},
                {"name": "mv", "dataType": "INT", "singleValueField": False},
                {"name": "dn", "dataType": "STRING", "defaultNullValue": "X"},
            ],
            "metricFieldSpecs": [
                {"name": "mi", "dataType": "INT"},
                {"name": "md", "dataType": "DOUBLE"},
            ],
        }
    )
    raw = spark.createDataFrame([("{}",)], "value string")
    r = decoded_frame(raw, schema, null_handling_enabled=False).collect()[0]
    assert r["s"] == "null" and r["i"] == -(2**31) and r["l"] == -(2**63)
    assert r["d"] == float("-inf") and r["b"] is False
    assert r["t"].year == 1970 and r["y"] == bytearray(b"")
    assert r["mv"] == [-(2**31)]
    assert r["dn"] == "X"                      # declared default wins
    assert r["mi"] == 0 and r["md"] == 0.0     # metric zeros, not minimums
    # the flag off (engine default) keeps real SQL nulls
    r2 = decoded_frame(raw, schema).collect()[0]
    assert r2["s"] is None and r2["mi"] is None and r2["dn"] == "X"
