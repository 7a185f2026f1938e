"""JSON-Schema ↔ StructType conversion, against the reference's type
vocabulary (src/test/resources/properties/postgres.json fixture, SURVEY §1.2)."""

from pyspark.sql import types as T

from plugin_singer_spark.schema import (
    TypeOptions,
    json_schema_to_struct,
    parse_schema_message,
    struct_to_json_schema,
)

# a category-stream-shaped schema matching the Northwind fixture
CATEGORY = {
    "type": "object",
    "properties": {
        "categoryid": {"type": "integer", "minimum": -2147483648, "maximum": 2147483647},
        "categoryname": {"type": ["null", "string"], "maxLength": 15},
        "description": {"type": ["null", "string"]},
        "picture": {},  # inclusion unsupported -> excluded
        "unitprice": {"type": ["null", "number"], "multipleOf": 0.01},
        "bigcount": {"type": "integer"},
        "added": {"type": ["null", "string"], "format": "date-time"},
        "flag": {"type": ["null", "boolean"]},
        "tags": {"type": ["null", "array"], "items": {"type": "string"}},
        "nested": {"type": ["null", "object"], "properties": {"a": {"type": "integer", "minimum": 0, "maximum": 10}}},
    },
}


def test_basic_types():
    st = json_schema_to_struct(CATEGORY)
    by = {f.name: f for f in st.fields}
    assert isinstance(by["categoryid"].dataType, T.IntegerType)
    assert isinstance(by["categoryname"].dataType, T.StringType) and by["categoryname"].nullable
    assert isinstance(by["bigcount"].dataType, T.LongType)  # unbounded integer
    assert isinstance(by["added"].dataType, T.TimestampType)
    assert isinstance(by["flag"].dataType, T.BooleanType)
    assert isinstance(by["tags"].dataType, T.ArrayType)
    assert isinstance(by["nested"].dataType, T.StructType)


def test_unsupported_column_excluded():
    st = json_schema_to_struct(CATEGORY)
    assert "picture" not in [f.name for f in st.fields]


def test_multiple_of_decimal():
    st = json_schema_to_struct(CATEGORY)
    dt = {f.name: f.dataType for f in st.fields}["unitprice"]
    assert isinstance(dt, T.DecimalType) and dt.scale == 2


def test_prefer_float_over_numeric():
    st = json_schema_to_struct(CATEGORY, TypeOptions(prefer_float_over_numeric=True))
    dt = {f.name: f.dataType for f in st.fields}["unitprice"]
    assert isinstance(dt, T.DoubleType)


def test_date_datatype_knob():
    sch = {"type": "object", "properties": {"d": {"type": "string", "format": "date"}}}
    assert isinstance(json_schema_to_struct(sch).fields[0].dataType, T.DateType)
    assert isinstance(
        json_schema_to_struct(sch, TypeOptions(use_date_datatype=False)).fields[0].dataType,
        T.TimestampType,
    )


def test_roundtrip():
    st = json_schema_to_struct(CATEGORY)
    back = json_schema_to_struct(struct_to_json_schema(st))
    assert [f.name for f in back.fields] == [f.name for f in st.fields]


def test_parse_schema_message():
    msg = '{"type": "SCHEMA", "stream": "category", "schema": {"type": "object", "properties": {"id": {"type": "integer", "minimum": 0, "maximum": 100}}}, "key_properties": ["id"]}'
    st = parse_schema_message(msg)
    assert isinstance(st.fields[0].dataType, T.IntegerType)
