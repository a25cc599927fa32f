"""Pinot-style schema compiler: schema JSON -> Spark StructType + decoder.

The reference declares tables with a fixed schema JSON listing
``dimensionFieldSpecs`` / ``metricFieldSpecs`` / ``dateTimeFieldSpecs``
(reference: resources/pinot/resources/kinesisTable.json:1-32) and registers it
ahead of data (resources/bastion/bastionUserData.sh:36) — no inference.  This
module compiles that JSON into:

- a ``StructType`` (dimension/metric/dateTime is kept as column metadata, not a
  type distinction — SURVEY §1.1);
- a ``from_json`` ingest decoder expression replicating
  ``KafkaJSONMessageDecoder`` row decode + coercion
  (resources/pinot/resources/kinesisTableConfigFile.json:21);
- for dateTime fields declared as ``SIMPLE_DATE_FORMAT|<fmt>``, a derived
  parsed ``TimestampType`` column ``<name>__ts`` used for partition pruning and
  retention (SURVEY §1.2: keep the raw string, add the typed column).

Null semantics: Pinot substitutes type defaults for nulls at ingest unless null
handling is enabled; we keep real Spark/ANSI nulls (saner, and the DuckDB
oracle agrees) — divergence documented in SURVEY §1.2.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Pinot 1.2 scalar data types -> Spark types (SURVEY §1.2).
_PINOT_TO_SPARK: dict[str, T.DataType] = {
    "INT": T.IntegerType(),
    "LONG": T.LongType(),
    "FLOAT": T.FloatType(),
    "DOUBLE": T.DoubleType(),
    "BIG_DECIMAL": T.DecimalType(38, 18),
    "BOOLEAN": T.BooleanType(),
    "TIMESTAMP": T.TimestampType(),
    "STRING": T.StringType(),
    "JSON": T.StringType(),  # queried via JSONEXTRACTSCALAR-family functions
    "BYTES": T.BinaryType(),
}

# SimpleDateFormat tokens happen to align with Spark's datetime pattern for the
# formats Pinot uses (e.g. 'yyyy-MM-dd HH:mm:ss', kinesisTable.json:28).
_SDF_PREFIX = "SIMPLE_DATE_FORMAT"
_EPOCH_PREFIX = "EPOCH"


@dataclass(frozen=True)
class FieldSpec:
    name: str
    pinot_type: str
    field_class: str  # dimension | metric | dateTime
    single_value: bool = True
    format: str | None = None  # dateTime only
    granularity: str | None = None  # dateTime only
    # Pinot defaultNullValue **[P1.2]**: when a field declares one, the
    # decoder substitutes it for missing/uncoercible values at ingest —
    # Pinot's null-substitution, made OPT-IN per field (undeclared fields
    # keep real SQL nulls; the documented SURVEY §1.2 divergence applies
    # only to Pinot's silent type-default fill, not declared defaults).
    default_null_value: object | None = None

    @property
    def spark_type(self) -> T.DataType:
        try:
            scalar = _PINOT_TO_SPARK[self.pinot_type.upper()]
        except KeyError:
            raise ValueError(f"unknown Pinot type {self.pinot_type!r} for field {self.name!r}")
        return scalar if self.single_value else T.ArrayType(scalar)


@dataclass(frozen=True)
class TableSchema:
    name: str
    fields: tuple[FieldSpec, ...] = field(default_factory=tuple)

    @property
    def struct(self) -> T.StructType:
        return T.StructType(
            [
                T.StructField(
                    f.name,
                    f.spark_type,
                    nullable=True,
                    metadata={
                        "fieldClass": f.field_class,
                        **({"format": f.format} if f.format else {}),
                        **({"granularity": f.granularity} if f.granularity else {}),
                    },
                )
                for f in self.fields
            ]
        )

    @property
    def datetime_fields(self) -> tuple[FieldSpec, ...]:
        return tuple(f for f in self.fields if f.field_class == "dateTime")

    def time_column(self) -> FieldSpec | None:
        dts = self.datetime_fields
        return dts[0] if dts else None


def parse_schema(schema_json: str | dict) -> TableSchema:
    """Compile Pinot schema JSON (kinesisTable.json shape) to a TableSchema."""
    spec = json.loads(schema_json) if isinstance(schema_json, str) else schema_json
    fields: list[FieldSpec] = []
    for fs in spec.get("dimensionFieldSpecs", []):
        fields.append(
            FieldSpec(
                name=fs["name"],
                pinot_type=fs["dataType"],
                field_class="dimension",
                single_value=fs.get("singleValueField", True),
                default_null_value=fs.get("defaultNullValue"),
            )
        )
    for fs in spec.get("metricFieldSpecs", []):
        fields.append(
            FieldSpec(
                name=fs["name"],
                pinot_type=fs["dataType"],
                field_class="metric",
                default_null_value=fs.get("defaultNullValue"),
            )
        )
    for fs in spec.get("dateTimeFieldSpecs", []):
        fields.append(
            FieldSpec(
                name=fs["name"],
                pinot_type=fs["dataType"],
                field_class="dateTime",
                format=fs.get("format"),
                granularity=fs.get("granularity"),
            )
        )
    return TableSchema(name=spec.get("schemaName", "table"), fields=tuple(fields))


def _sdf_pattern(fmt: str | None) -> str | None:
    """Extract the SimpleDateFormat pattern from a Pinot dateTime format string
    like ``1:DAYS:SIMPLE_DATE_FORMAT:yyyy-MM-dd HH:mm:ss`` or the pipe form
    ``SIMPLE_DATE_FORMAT|yyyy-MM-dd HH:mm:ss`` (kinesisTable.json:28)."""
    if not fmt:
        return None
    for sep in ("|", ":"):
        if _SDF_PREFIX in fmt:
            head, _, tail = fmt.partition(_SDF_PREFIX)
            tail = tail.lstrip(sep)
            if tail:
                return tail
    return None


def time_parse_expr(spec: FieldSpec) -> Column:
    """Typed event-time expression for a dateTime field.

    STRING + SIMPLE_DATE_FORMAT -> ``to_timestamp(col, pattern)``;
    EPOCH millis/seconds -> ``timestamp_millis`` / ``timestamp_seconds``;
    TIMESTAMP/LONG default -> cast.
    """
    col = F.col(spec.name)
    pattern = _sdf_pattern(spec.format)
    # try_* variants throughout: a malformed record must become NULL, not kill
    # the stream (ANSI mode throws; Pinot's decoder null/defaults — §1.2).
    if pattern:
        return F.try_to_timestamp(col, F.lit(pattern))
    if spec.format and _EPOCH_PREFIX in spec.format.upper():
        if "MILLISECONDS" in spec.format.upper():
            return F.timestamp_millis(col.try_cast("long"))
        return F.timestamp_seconds(col.try_cast("long"))
    return col.try_cast("timestamp")


def _lenient_struct(schema: TableSchema) -> T.StructType:
    """String-typed mirror of the schema: JSON values parse as text first."""

    def widen(dt: T.DataType) -> T.DataType:
        if isinstance(dt, T.ArrayType):
            return T.ArrayType(T.StringType())
        return T.StringType()

    return T.StructType(
        [T.StructField(f.name, widen(f.spark_type), True) for f in schema.fields]
    )


#: Pinot's silent type-default fill **[P1.2]** (FieldSpec
#: DEFAULT_[DIMENSION|METRIC]_NULL_VALUE_OF_*): the value a null lands as
#: when the table does NOT enable null handling
#: (tableIndexConfig.nullHandlingEnabled=false).  Dimensions/dateTimes get
#: sentinel minimums ("null" for strings), metrics get additive zeros.
_PINOT_TYPE_DEFAULTS: dict[tuple[str, bool], object] = {
    ("INT", False): -(2**31),
    ("LONG", False): -(2**63),
    ("BIG_DECIMAL", False): 0,
    ("BIG_DECIMAL", True): 0,
    ("FLOAT", False): float("-inf"),
    ("DOUBLE", False): float("-inf"),
    ("BOOLEAN", False): False,
    ("TIMESTAMP", False): 0,
    ("STRING", False): "null",
    ("JSON", False): "null",
    ("BYTES", False): b"",
    ("INT", True): 0,
    ("LONG", True): 0,
    ("FLOAT", True): 0.0,
    ("DOUBLE", True): 0.0,
    ("BOOLEAN", True): False,
    ("TIMESTAMP", True): 0,
    ("STRING", True): "null",
    ("JSON", True): "null",
    ("BYTES", True): b"",
}


def pinot_type_default(spec: FieldSpec) -> Column:
    """The literal Pinot substitutes for a null in ``spec`` when the table
    config leaves ``nullHandlingEnabled`` false **[P1.2]** — sentinel
    minimums for dimensions/dateTimes, additive zeros for metrics, ``"null"``
    for strings.  Multi-value fields fill with the one-element array of the
    scalar default (Pinot's MV default).  Constant-folded literal, so the
    fill stays one codegen expression."""
    is_metric = spec.field_class == "metric"
    val = _PINOT_TYPE_DEFAULTS[(spec.pinot_type.upper(), is_metric)]
    scalar_t = _PINOT_TO_SPARK[spec.pinot_type.upper()]
    if spec.pinot_type.upper() == "TIMESTAMP":
        lit = F.lit(0).cast("timestamp")
    else:
        lit = F.lit(val).try_cast(scalar_t)
    if not spec.single_value:
        return F.array(lit)
    return lit


def decode_expr(
    schema: TableSchema,
    value_col: str = "value",
    null_handling_enabled: bool = True,
) -> Column:
    """The KafkaJSONMessageDecoder analog: JSON string -> typed struct.

    Two-step coercion matching the reference's decoder semantics
    (kinesisTableConfigFile.json:21 — the KDG sends userID as a JSON *string*
    and price as a JSON *number*, README.md:88-109, and either must land in
    the declared type): parse every field as string with ``from_json`` (JSON
    numbers/booleans stringify losslessly), then CAST to the declared Spark
    type.  One codegen'd expression — no Python in the ingest hot path.

    ``null_handling_enabled=False`` is Pinot's
    ``tableIndexConfig.nullHandlingEnabled=false`` storage mode **[P1.2]**:
    fields WITHOUT a declared defaultNullValue fill with the silent
    type-default matrix (:func:`pinot_type_default`) instead of keeping SQL
    nulls.  The engine's config default is true (null-native storage — the
    documented SURVEY §1.2 divergence: Pinot defaults to false and needs
    the opt-in; here false is the opt-in).
    """
    raw = F.from_json(F.col(value_col).cast("string"), _lenient_struct(schema))
    # try_cast: uncoercible values become NULL instead of failing the batch
    # under ANSI mode (Pinot decoder behavior; divergence is NULL vs type
    # default, documented in SURVEY §1.2).
    typed = []
    for f in schema.fields:
        col = F.col(f"__raw.{f.name}").try_cast(f.spark_type)
        if f.default_null_value is not None:
            # declared defaultNullValue: fill missing/uncoercible values at
            # decode time (constant-folded literal, still one codegen expr)
            col = F.coalesce(col, F.lit(f.default_null_value).try_cast(f.spark_type))
        elif not null_handling_enabled:
            col = F.coalesce(col, pinot_type_default(f))
        typed.append(col.alias(f.name))
    return F.struct(*typed).alias("__typed"), raw.alias("__raw")


def decoded_frame(
    df: DataFrame,
    schema: TableSchema,
    value_col: str = "value",
    null_handling_enabled: bool = True,
) -> DataFrame:
    """Apply the decoder and append derived ``<name>__ts`` typed time columns."""
    typed_expr, raw_expr = decode_expr(schema, value_col, null_handling_enabled)
    out = df.select(raw_expr).select(typed_expr).select("__typed.*")
    for spec in schema.datetime_fields:
        if not isinstance(spec.spark_type, T.TimestampType):
            out = out.withColumn(f"{spec.name}__ts", time_parse_expr(spec))
    return out
