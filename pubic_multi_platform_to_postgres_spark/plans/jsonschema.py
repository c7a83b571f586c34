"""JSON-Schema → Spark ``StructType`` compiler.

The reference declares every stream as a hand-authored JSON-Schema file
(``tap_*/schemas/*.json``, loaded at ``tap_wrike/internal.py:38-47``) with
``additionalProperties: false`` and nullable unions ``["null", T]``. This
module compiles that dialect into typed Spark schemas so extracted records
become DataFrames with real column types instead of stringly-typed rows.

Type mapping (SURVEY.md §1.2):

========================  =====================
JSON-Schema               Spark
========================  =====================
string                    StringType
string + date-time        TimestampType
string + date             DateType
string + email/other fmt  StringType
number                    DoubleType (money stays double — reference parity)
integer                   LongType
boolean                   BooleanType
object                    StructType
array                     ArrayType(item type)
========================  =====================
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import types as T

_FORMAT_TYPES = {
    "date-time": T.TimestampType(),
    "date": T.DateType(),
}

_SCALAR_TYPES = {
    "string": T.StringType(),
    "number": T.DoubleType(),
    "integer": T.LongType(),
    "boolean": T.BooleanType(),
    "null": T.NullType(),
}


def _unwrap_nullable(type_decl: Any) -> tuple[Any, bool]:
    """``["null", T]`` (any order / arity) → (T, nullable)."""
    if isinstance(type_decl, list):
        non_null = [t for t in type_decl if t != "null"]
        nullable = len(non_null) < len(type_decl)
        if len(non_null) != 1:
            raise ValueError(f"unsupported type union: {type_decl}")
        return non_null[0], nullable
    return type_decl, False


def compile_type(schema: dict[str, Any]) -> tuple[T.DataType, bool]:
    """Compile one JSON-Schema node → (Spark type, nullable)."""
    type_decl, nullable = _unwrap_nullable(schema.get("type", "string"))

    if type_decl == "object":
        props = schema.get("properties", {})
        fields = []
        for name, sub in props.items():
            sub_type, sub_nullable = compile_type(sub)
            fields.append(T.StructField(name, sub_type, sub_nullable))
        return T.StructType(fields), nullable
    if type_decl == "array":
        item_schema = schema.get("items", {"type": "string"})
        item_type, item_nullable = compile_type(item_schema)
        return T.ArrayType(item_type, containsNull=item_nullable or True), nullable
    if type_decl == "string":
        fmt = schema.get("format")
        return _FORMAT_TYPES.get(fmt, T.StringType()), nullable
    if type_decl in _SCALAR_TYPES:
        return _SCALAR_TYPES[type_decl], nullable
    raise ValueError(f"unsupported JSON-Schema type: {type_decl!r}")


def compile_schema(schema: dict[str, Any]) -> T.StructType:
    """Compile a top-level stream schema (object) → StructType.

    Fields are nullable unless the union says otherwise — the reference
    never marks required fields, and its sink treats every non-PK column
    as nullable.
    """
    spark_type, _ = compile_type(schema)
    if not isinstance(spark_type, T.StructType):
        raise ValueError("top-level schema must be an object")
    # every field nullable=True at the top level (reference semantics)
    return T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in spark_type.fields]
    )


def type_to_json_schema(dt: T.DataType, nullable: bool) -> dict[str, Any] | Any:
    """Reverse of :func:`compile_type`: Spark type → the reference's
    JSON-Schema dialect (nullable unions ``["null", T]``; timestamps as
    ``string`` + ``format: date-time``). Round-trip invariant:
    ``compile_schema(to_json_schema(st)) == st`` for any schema built
    from the dialect — pinned by ``test_json_schema_roundtrip``."""
    if isinstance(dt, T.StructType):
        # falls through to the shared nullable wrap below — a nullable
        # object node must union to ["null", "object"] like every other
        # type, or nested nullability is lost and the round-trip
        # invariant breaks for depth >= 2 (ADVICE r7)
        base: dict[str, Any] = {
            "type": "object",
            "properties": {
                f.name: type_to_json_schema(f.dataType, f.nullable)
                for f in dt.fields
            },
            "additionalProperties": False,
        }
    elif isinstance(dt, T.ArrayType):
        base = {
            "type": "array",
            "items": type_to_json_schema(dt.elementType, dt.containsNull),
        }
    elif isinstance(dt, T.TimestampType):
        base = {"type": "string", "format": "date-time"}
    elif isinstance(dt, T.DateType):
        base = {"type": "string", "format": "date"}
    elif isinstance(dt, T.StringType):
        base = {"type": "string"}
    elif isinstance(dt, T.DoubleType):
        base = {"type": "number"}
    elif isinstance(dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        base = {"type": "integer"}
    elif isinstance(dt, T.BooleanType):
        base = {"type": "boolean"}
    else:
        raise ValueError(f"no JSON-Schema mapping for Spark type {dt}")
    if nullable:
        base = {**base, "type": ["null", base["type"]]}
    return base


def to_json_schema(schema: T.StructType) -> dict[str, Any]:
    """Top-level stream schema: StructType → the reference's JSON-Schema
    shape (``additionalProperties: false``, every field a nullable
    union — reference semantics, matching :func:`compile_schema`)."""
    return {
        "type": "object",
        "properties": {
            f.name: type_to_json_schema(f.dataType, True) for f in schema.fields
        },
        "additionalProperties": False,
    }
