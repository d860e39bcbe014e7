"""Iceberg-spec type system ↔ Spark ``StructType``, with field-ID identity.

Re-expresses the reference's type model (reference: spec/types.go:15-298) and
schema (reference: spec/schema.go:10-109) idiomatically for Spark: types are
small frozen dataclasses; the Spark mapping follows the reference's own
spec→Arrow table (reference: table/scan.go:288-343) adapted to Spark SQL types
(int→IntegerType, long→LongType, timestamp→TimestampNTZ, timestamptz→Timestamp,
uuid→string, fixed→binary, time→long µs since Spark has no TIME type).

Field IDs — not names — are the stable identity (reference: spec/manifest.go:
121-136 keys stats by field id; evolution appends schemas and moves
current-schema-id, reference: spec/metadata.go:308-333). We carry the id in
``StructField.metadata['iceberg.field_id']`` and key all file statistics by it,
so renames never corrupt pruning or stats.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field as dc_field
from typing import Any

from pyspark.sql import types as T

from .errors import ValidationError

# -- type model -------------------------------------------------------------


@dataclass(frozen=True)
class IcebergType:
    def __str__(self) -> str:  # overridden
        raise NotImplementedError


@dataclass(frozen=True)
class PrimitiveType(IcebergType):
    name: str  # boolean int long float double date time timestamp timestamptz string uuid binary

    def __str__(self) -> str:
        return self.name


BOOLEAN = PrimitiveType("boolean")
INT = PrimitiveType("int")
LONG = PrimitiveType("long")
FLOAT = PrimitiveType("float")
DOUBLE = PrimitiveType("double")
DATE = PrimitiveType("date")
TIME = PrimitiveType("time")
TIMESTAMP = PrimitiveType("timestamp")
TIMESTAMPTZ = PrimitiveType("timestamptz")
STRING = PrimitiveType("string")
UUID = PrimitiveType("uuid")
BINARY = PrimitiveType("binary")

_PRIMITIVES = {
    t.name: t
    for t in (BOOLEAN, INT, LONG, FLOAT, DOUBLE, DATE, TIME, TIMESTAMP, TIMESTAMPTZ, STRING, UUID, BINARY)
}


@dataclass(frozen=True)
class FixedType(IcebergType):
    """fixed[N] (reference: spec/types.go:106-117)."""

    length: int

    def __str__(self) -> str:
        return f"fixed[{self.length}]"


@dataclass(frozen=True)
class DecimalType(IcebergType):
    """decimal(p,s) (reference: spec/types.go:120-132)."""

    precision: int
    scale: int

    def __str__(self) -> str:
        return f"decimal({self.precision},{self.scale})"


@dataclass(frozen=True)
class NestedField:
    """Struct member (reference: spec/types.go:135-194)."""

    field_id: int
    name: str
    type: IcebergType
    required: bool = False
    doc: str | None = None


@dataclass(frozen=True)
class StructType(IcebergType):
    fields: tuple[NestedField, ...] = ()

    def __str__(self) -> str:
        inner = ", ".join(f"{f.field_id}: {f.name}: {'required' if f.required else 'optional'} {f.type}" for f in self.fields)
        return f"struct<{inner}>"

    def field_by_name(self, name: str) -> NestedField | None:
        for f in self.fields:
            if f.name == name:
                return f
        return None

    def field_by_id(self, fid: int) -> NestedField | None:
        for f in self.fields:
            if f.field_id == fid:
                return f
        return None


@dataclass(frozen=True)
class ListType(IcebergType):
    """list<elem> (reference: spec/types.go:197-214)."""

    element_id: int
    element: IcebergType
    element_required: bool = False

    def __str__(self) -> str:
        return f"list<{self.element}>"


@dataclass(frozen=True)
class MapType(IcebergType):
    """map<k,v> (reference: spec/types.go:217-238)."""

    key_id: int
    key: IcebergType
    value_id: int
    value: IcebergType
    value_required: bool = False

    def __str__(self) -> str:
        return f"map<{self.key}, {self.value}>"


@dataclass(frozen=True)
class Schema:
    """schema-id + struct + identifier-field-ids (reference: spec/schema.go:10-31)."""

    schema_id: int
    struct: StructType
    identifier_field_ids: tuple[int, ...] = ()

    @property
    def fields(self) -> tuple[NestedField, ...]:
        return self.struct.fields

    def find_field(self, name: str) -> NestedField | None:
        return self.struct.field_by_name(name)

    def find_field_by_id(self, fid: int) -> NestedField | None:
        return self.struct.field_by_id(fid)

    def column_names(self) -> list[str]:
        return [f.name for f in self.fields]

    def highest_field_id(self) -> int:
        """Recursive max field id over nested types (reference: spec/schema.go:54-90)."""

        def walk(t: IcebergType) -> int:
            if isinstance(t, StructType):
                return max([0, *(max(f.field_id, walk(f.type)) for f in t.fields)])
            if isinstance(t, ListType):
                return max(t.element_id, walk(t.element))
            if isinstance(t, MapType):
                return max(t.key_id, t.value_id, walk(t.key), walk(t.value))
            return 0

        return walk(self.struct)

    def equals(self, other: "Schema") -> bool:
        """Structural equality ignoring schema_id (reference: spec/schema.go:93-109)."""
        return self.struct == other.struct


# -- string parser (reference: spec/types.go:241-298) -----------------------

_DECIMAL_RE = re.compile(r"^decimal\(\s*(\d+)\s*,\s*(\d+)\s*\)$")
_FIXED_RE = re.compile(r"^fixed\[(\d+)\]$")


def parse_type(s: str) -> IcebergType:
    """Parse a primitive/parameterized type string (nested types use JSON)."""
    s = s.strip()
    if s in _PRIMITIVES:
        return _PRIMITIVES[s]
    m = _DECIMAL_RE.match(s)
    if m:
        return DecimalType(int(m.group(1)), int(m.group(2)))
    m = _FIXED_RE.match(s)
    if m:
        return FixedType(int(m.group(1)))
    raise ValidationError(f"cannot parse type: {s!r}")


# -- JSON serde (reference: spec/schema.go:119-334) -------------------------


def type_to_json(t: IcebergType) -> Any:
    if isinstance(t, PrimitiveType):
        return t.name
    if isinstance(t, DecimalType):
        return str(t)
    if isinstance(t, FixedType):
        return str(t)
    if isinstance(t, StructType):
        return {
            "type": "struct",
            "fields": [
                {
                    "id": f.field_id,
                    "name": f.name,
                    "required": f.required,
                    "type": type_to_json(f.type),
                    **({"doc": f.doc} if f.doc else {}),
                }
                for f in t.fields
            ],
        }
    if isinstance(t, ListType):
        return {
            "type": "list",
            "element-id": t.element_id,
            "element": type_to_json(t.element),
            "element-required": t.element_required,
        }
    if isinstance(t, MapType):
        return {
            "type": "map",
            "key-id": t.key_id,
            "key": type_to_json(t.key),
            "value-id": t.value_id,
            "value": type_to_json(t.value),
            "value-required": t.value_required,
        }
    raise ValidationError(f"unserializable type {t!r}")


def type_from_json(j: Any) -> IcebergType:
    if isinstance(j, str):
        return parse_type(j)
    kind = j.get("type")
    if kind == "struct":
        return StructType(
            tuple(
                NestedField(f["id"], f["name"], type_from_json(f["type"]), f.get("required", False), f.get("doc"))
                for f in j["fields"]
            )
        )
    if kind == "list":
        return ListType(j["element-id"], type_from_json(j["element"]), j.get("element-required", False))
    if kind == "map":
        return MapType(
            j["key-id"], type_from_json(j["key"]), j["value-id"], type_from_json(j["value"]), j.get("value-required", False)
        )
    raise ValidationError(f"bad type json: {j!r}")


def schema_to_json(s: Schema) -> dict:
    out = type_to_json(s.struct)
    out["schema-id"] = s.schema_id
    if s.identifier_field_ids:
        out["identifier-field-ids"] = list(s.identifier_field_ids)
    return out


def schema_from_json(j: dict | str) -> Schema:
    if isinstance(j, str):
        j = json.loads(j)
    struct = type_from_json({"type": "struct", "fields": j["fields"]})
    return Schema(j.get("schema-id", 0), struct, tuple(j.get("identifier-field-ids", ())))


# -- Spark mapping (reference: table/scan.go:288-343, adapted to Spark SQL) --

FIELD_ID_KEY = "iceberg.field_id"


def to_spark_type(t: IcebergType) -> T.DataType:
    if isinstance(t, PrimitiveType):
        return {
            "boolean": T.BooleanType(),
            "int": T.IntegerType(),
            "long": T.LongType(),
            "float": T.FloatType(),
            "double": T.DoubleType(),
            "date": T.DateType(),
            "time": T.LongType(),  # µs-of-day; Spark has no TIME type (SURVEY §7 hard part 2)
            "timestamp": T.TimestampNTZType(),
            "timestamptz": T.TimestampType(),
            "string": T.StringType(),
            "uuid": T.StringType(),
            "binary": T.BinaryType(),
        }[t.name]
    if isinstance(t, DecimalType):
        return T.DecimalType(t.precision, t.scale)
    if isinstance(t, FixedType):
        return T.BinaryType()
    if isinstance(t, StructType):
        return T.StructType([
            T.StructField(f.name, to_spark_type(f.type), not f.required, metadata={FIELD_ID_KEY: f.field_id})
            for f in t.fields
        ])
    if isinstance(t, ListType):
        return T.ArrayType(to_spark_type(t.element), not t.element_required)
    if isinstance(t, MapType):
        return T.MapType(to_spark_type(t.key), to_spark_type(t.value), not t.value_required)
    raise ValidationError(f"no spark mapping for {t!r}")


def to_spark_schema(s: Schema) -> T.StructType:
    return to_spark_type(s.struct)


def from_spark_type(dt: T.DataType, next_id) -> IcebergType:
    """Spark → Iceberg type; ``next_id`` is a callable allocating field ids."""
    if isinstance(dt, T.BooleanType):
        return BOOLEAN
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType)):
        return INT
    if isinstance(dt, T.LongType):
        return LONG
    if isinstance(dt, T.FloatType):
        return FLOAT
    if isinstance(dt, T.DoubleType):
        return DOUBLE
    if isinstance(dt, T.DateType):
        return DATE
    if isinstance(dt, T.TimestampNTZType):
        return TIMESTAMP
    if isinstance(dt, T.TimestampType):
        return TIMESTAMPTZ
    if isinstance(dt, T.StringType):
        return STRING
    if isinstance(dt, T.BinaryType):
        return BINARY
    if isinstance(dt, T.DecimalType):
        return DecimalType(dt.precision, dt.scale)
    if isinstance(dt, T.StructType):
        fields = []
        for f in dt.fields:
            fid = f.metadata.get(FIELD_ID_KEY) if f.metadata else None
            fid = fid if fid is not None else next_id()
            fields.append(NestedField(fid, f.name, from_spark_type(f.dataType, next_id), not f.nullable))
        return StructType(tuple(fields))
    if isinstance(dt, T.ArrayType):
        return ListType(next_id(), from_spark_type(dt.elementType, next_id), not dt.containsNull)
    if isinstance(dt, T.MapType):
        return MapType(
            next_id(), from_spark_type(dt.keyType, next_id), next_id(), from_spark_type(dt.valueType, next_id),
            not dt.valueContainsNull,
        )
    raise ValidationError(f"no iceberg mapping for spark type {dt!r}")


def from_spark_schema(st: T.StructType, schema_id: int = 0, identifier_fields: tuple[str, ...] = ()) -> Schema:
    """Build a Schema from a Spark StructType, allocating fresh field ids
    depth-first (fields first, then nested ids), matching Iceberg assignment."""
    counter = {"n": 0}

    def next_id() -> int:
        counter["n"] += 1
        return counter["n"]

    struct = from_spark_type(st, next_id)
    assert isinstance(struct, StructType)
    id_fields = tuple(
        f.field_id for f in struct.fields if f.name in identifier_fields
    )
    return Schema(schema_id, struct, id_fields)
