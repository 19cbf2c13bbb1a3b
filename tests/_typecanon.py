"""Canonical type vocabulary for the local gate's type-parity check.

The driver's value hash is computed over arrow-serialized results, so it is
type-sensitive in a specific way (observed r1/r2): integer *widths* hash
alike (Spark rank() int32 matched DuckDB BIGINT), but class differences do
not — DuckDB ``SUM(int)`` returns HUGEINT (arrow decimal128(38,0)) which
hash-mismatched Spark's BIGINT in round 2's q12. This module maps both a
Spark ``DataType`` and a DuckDB ``DESCRIBE`` type string onto one canonical
vocabulary that collapses exactly what the driver collapses and keeps
distinct exactly what bit it: ints vs decimals, float vs double, temporal
classes, nesting.

Both mappings are plan-time (no query execution), so the parity suite's
runtime is unchanged.
"""

from __future__ import annotations

import re

from pyspark.sql import types as T


def canon_spark(dt: T.DataType) -> str:
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, T.DoubleType):
        return "double"
    if isinstance(dt, T.FloatType):
        return "float"
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision},{dt.scale})"
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "timestamp"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, T.BinaryType):
        return "binary"
    if isinstance(dt, T.ArrayType):
        return f"list<{canon_spark(dt.elementType)}>"
    if isinstance(dt, T.MapType):
        return f"map<{canon_spark(dt.keyType)},{canon_spark(dt.valueType)}>"
    if isinstance(dt, T.StructType):
        inner = ",".join(
            f"{f.name}:{canon_spark(f.dataType)}" for f in dt.fields
        )
        return f"struct<{inner}>"
    return str(dt).lower()


_DUCK_SIMPLE = {
    "TINYINT": "int",
    "SMALLINT": "int",
    "INTEGER": "int",
    "BIGINT": "int",
    "UTINYINT": "int",
    "USMALLINT": "int",
    "UINTEGER": "int",
    "UBIGINT": "int",
    # HUGEINT crosses to arrow as decimal128(38,0) — the q12 failure class.
    "HUGEINT": "decimal(38,0)",
    "DOUBLE": "double",
    "FLOAT": "float",
    "REAL": "float",
    "VARCHAR": "string",
    "TEXT": "string",
    "BOOLEAN": "bool",
    "DATE": "date",
    "BLOB": "binary",
}


def _split_top(s: str) -> list[str]:
    """Split on top-level commas (ignores commas inside parens/brackets)."""
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return parts


def canon_duck(type_str: str) -> str:
    s = type_str.strip()
    if s.endswith("[]"):
        return f"list<{canon_duck(s[:-2])}>"
    upper = s.upper()
    if upper in _DUCK_SIMPLE:
        return _DUCK_SIMPLE[upper]
    if upper.startswith("TIMESTAMP"):
        return "timestamp"
    m = re.fullmatch(r"DECIMAL\((\d+),\s*(\d+)\)", upper)
    if m:
        return f"decimal({m.group(1)},{m.group(2)})"
    if upper.startswith("STRUCT(") and s.endswith(")"):
        fields = []
        for part in _split_top(s[len("STRUCT("):-1]):
            name, _, typ = part.strip().partition(" ")
            fields.append(f"{name.strip(chr(34))}:{canon_duck(typ)}")
        return "struct<" + ",".join(fields) + ">"
    if upper.startswith("MAP(") and s.endswith(")"):
        kv = _split_top(s[len("MAP("):-1])
        if len(kv) == 2:
            return f"map<{canon_duck(kv[0])},{canon_duck(kv[1])}>"
    return s.lower()
