"""JSON-Schema ↔ Spark StructType conversion.

The reference holds each stream's schema as an opaque JSON-Schema map
(models/DiscoverStream.java:20) discovered from the tap and re-emitted in-band
as SCHEMA messages. The concrete type vocabulary is the Northwind fixture
(src/test/resources/properties/postgres.json): type unions with "null",
integer min/max bounds, number+multipleOf → decimal scale, string
format=date-time / date, recursive array defs, nested objects, and empty
``{}`` schemas for unsupported columns.

Type-preference knobs mirrored from connector configs:
- ``use_singer_decimal`` (taps/PipelinewiseSqlServer.java:112-116) — numbers
  with multipleOf become DecimalType instead of DoubleType.
- ``use_date_datatype`` (taps/PipelinewiseSqlServer.java:96-100) — format=date
  stays DateType instead of TimestampType.
- ``prefer_float_over_numeric`` (targets/Oracle.java:107-110) — numbers become
  DoubleType even with multipleOf.
"""

from __future__ import annotations

import decimal
import json
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import types as T

INT32_MIN, INT32_MAX = -(2**31), 2**31 - 1


@dataclass
class TypeOptions:
    """Schema-conversion preferences (see module docstring for citations)."""

    use_singer_decimal: bool = True
    use_date_datatype: bool = True
    prefer_float_over_numeric: bool = False
    max_recursion_depth: int = 3


def _json_types(schema: dict[str, Any]) -> tuple[list[str], bool]:
    """Extract the non-null JSON types and nullability from a ``type`` field."""
    t = schema.get("type")
    if t is None:
        if "anyOf" in schema:
            # union of subschemas: nullable if any is null-typed
            subs = schema["anyOf"]
            types: list[str] = []
            nullable = False
            for s in subs:
                st, sn = _json_types(s)
                types.extend(st)
                nullable = nullable or sn
            return types, nullable
        return [], True
    if isinstance(t, str):
        t = [t]
    nullable = "null" in t
    return [x for x in t if x != "null"], nullable


def _decimal_from_multiple_of(mul: Any) -> T.DataType:
    """multipleOf: 0.01 ⇒ DecimalType(precision, 2) — scale from the exponent."""
    try:
        d = decimal.Decimal(str(mul))
        scale = max(0, -d.as_tuple().exponent)
    except decimal.InvalidOperation:
        scale = 2
    # 38 is Spark's max precision; leave generous integer digits.
    return T.DecimalType(38, min(scale, 18))


def json_schema_to_spark_type(
    schema: dict[str, Any],
    opts: TypeOptions | None = None,
    _depth: int = 0,
) -> T.DataType | None:
    """Convert one JSON-Schema node to a Spark DataType.

    Returns None for unsupported/empty schemas (``{}`` ⇒ column excluded, as
    the fixture's ``picture`` column with inclusion=unsupported).
    """
    opts = opts or TypeOptions()
    if not schema:
        return None
    if _depth > opts.max_recursion_depth:
        return T.StringType()

    types, _ = _json_types(schema)
    if not types:
        # object with properties but no declared type, or pure $ref
        if "properties" in schema:
            types = ["object"]
        else:
            return None

    jt = types[0]
    if len(types) > 1:
        # heterogeneous union (beyond null) — degrade to string, lossless JSON
        return T.StringType()

    if jt == "string":
        fmt = schema.get("format")
        if fmt == "date-time":
            return T.TimestampType()
        if fmt == "date":
            return T.DateType() if opts.use_date_datatype else T.TimestampType()
        if fmt == "time":
            return T.StringType()
        return T.StringType()
    if jt == "integer":
        lo, hi = schema.get("minimum"), schema.get("maximum")
        if lo is not None and hi is not None and lo >= INT32_MIN and hi <= INT32_MAX:
            return T.IntegerType()
        return T.LongType()
    if jt == "number":
        mul = schema.get("multipleOf")
        if mul is not None and opts.use_singer_decimal and not opts.prefer_float_over_numeric:
            return _decimal_from_multiple_of(mul)
        return T.DoubleType()
    if jt == "boolean":
        return T.BooleanType()
    if jt == "array":
        item = schema.get("items") or {}
        et = json_schema_to_spark_type(item, opts, _depth + 1) or T.StringType()
        return T.ArrayType(et, containsNull=True)
    if jt == "object":
        props = schema.get("properties")
        if props:
            fields = []
            for name, sub in props.items():
                st = json_schema_to_spark_type(sub, opts, _depth + 1)
                if st is None:
                    continue
                _, nullable = _json_types(sub)
                fields.append(T.StructField(name, st, nullable=True if nullable else True))
            if fields:
                return T.StructType(fields)
        return T.MapType(T.StringType(), T.StringType(), valueContainsNull=True)
    return T.StringType()


def json_schema_to_struct(
    schema: dict[str, Any], opts: TypeOptions | None = None
) -> T.StructType:
    """Top-level stream JSON-Schema → StructType (unsupported columns dropped)."""
    opts = opts or TypeOptions()
    fields: list[T.StructField] = []
    for name, sub in (schema.get("properties") or {}).items():
        st = json_schema_to_spark_type(sub, opts)
        if st is None:
            continue  # empty {} schema ⇒ inclusion unsupported ⇒ excluded
        _, nullable = _json_types(sub)
        fields.append(T.StructField(name, st, nullable=nullable or True))
    return T.StructType(fields)


def spark_type_to_json_schema(dt: T.DataType, nullable: bool = True) -> dict[str, Any]:
    """Inverse mapping, used when the engine emits SCHEMA messages."""
    def wrap(jt: Any, extra: dict[str, Any] | None = None) -> dict[str, Any]:
        out: dict[str, Any] = dict(extra or {})
        out["type"] = ["null", jt] if nullable and isinstance(jt, str) else jt
        return out

    if isinstance(dt, (T.IntegerType, T.ShortType, T.ByteType)):
        return wrap("integer", {"minimum": INT32_MIN, "maximum": INT32_MAX})
    if isinstance(dt, T.LongType):
        return wrap("integer")
    if isinstance(dt, T.DecimalType):
        return wrap("number", {"multipleOf": float(decimal.Decimal(1).scaleb(-dt.scale))})
    if isinstance(dt, (T.DoubleType, T.FloatType)):
        return wrap("number")
    if isinstance(dt, T.BooleanType):
        return wrap("boolean")
    if isinstance(dt, T.TimestampType):
        return wrap("string", {"format": "date-time"})
    if isinstance(dt, T.DateType):
        return wrap("string", {"format": "date"})
    if isinstance(dt, T.ArrayType):
        return wrap("array", {"items": spark_type_to_json_schema(dt.elementType)})
    if isinstance(dt, T.StructType):
        return wrap(
            "object",
            {"properties": {f.name: spark_type_to_json_schema(f.dataType, f.nullable) for f in dt.fields}},
        )
    if isinstance(dt, T.BinaryType):
        return wrap("string", {"contentEncoding": "base64"})
    return wrap("string")


def struct_to_json_schema(st: T.StructType) -> dict[str, Any]:
    return {
        "type": "object",
        "properties": {f.name: spark_type_to_json_schema(f.dataType, f.nullable) for f in st.fields},
    }


def parse_schema_message(payload: str | dict[str, Any], opts: TypeOptions | None = None) -> T.StructType:
    """SCHEMA-message payload (JSON string or dict) → StructType."""
    if isinstance(payload, str):
        payload = json.loads(payload)
    inner = payload.get("schema", payload)
    return json_schema_to_struct(inner, opts)
