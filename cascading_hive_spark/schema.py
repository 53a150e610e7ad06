"""Schema acquisition and Hive-DDL parsing (SURVEY.md §1.3, A9).

Reference parity:

- ``HiveSchemaUtil.parse`` (HiveSchemaUtil.java:37-77) turns a Hive DDL
  column list (``"uid BIGINT, name STRING"``) into parallel name/type
  lists via the Hive ANTLR parser. Here: ``parse_ddl`` on top of
  Spark's own DDL parser (``StructType.fromDDL``) — the same grammar
  family, including nested ``array<struct<...>>``
  (HiveSchemaUtilTest.java:68-101).
- Explicit parallel name/type arrays with length validation
  (RCFile.java:123-133): ``from_names_types``.
- ORC's ``_colN`` default column naming (ORCFile.java:91,
  ORCFileTest.java:180-182): ``default_names``.
- The type-alias quirks: ORC renames ``decimal`` to ``bigdecimal`` on
  inference (ORCFile.java:230-232) and RCFile widens ``tinyint`` to int
  on read (RCFile.java:288-289). We normalize both to proper Spark
  types and keep the alias table here so DDL written against the
  reference still parses.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Hive type name -> Spark DDL type name (SURVEY.md §1.2 table).
HIVE_TO_SPARK_TYPE = {
    "string": "string",
    "int": "int",
    "integer": "int",
    "bigint": "bigint",
    "float": "float",
    "double": "double",
    "boolean": "boolean",
    "tinyint": "tinyint",
    "smallint": "smallint",
    "binary": "binary",
    # reference flattens decimal to unconstrained BigDecimal
    # (ORCFile.java:230-232, 342-344); Spark needs precision/scale —
    # standardized to decimal(38,18) (SURVEY.md §7 risk register).
    "decimal": "decimal(38,18)",
    "bigdecimal": "decimal(38,18)",
    "timestamp": "timestamp",
    "varchar": "string",
    "date": "date",
}


def _normalize_type(hive_type: str) -> str:
    """Map a (possibly nested) Hive type string to Spark DDL.

    Parameterized / nested types pass through — Spark's parser accepts
    hive-style decimal(p,s), varchar(n), array<>, map<>, struct<> —
    but the reference's aliases are rewritten at token level:
    ``bigdecimal`` and bare ``decimal`` (no precision) both become
    decimal(38,18) (ORCFile.java:230-232 flattens to BigDecimal).
    """
    import re

    low = hive_type.strip().lower()
    low = re.sub(r"\b(bigdecimal|decimal)\b(?!\s*\()", "decimal(38,18)", low)
    return low


def parse_ddl(ddl: str) -> T.StructType:
    """Parse a Hive DDL column list into a StructType.

    Raises ValueError on malformed input (reference raises
    RuntimeException — HiveSchemaUtil.java:58-66).
    """
    if not ddl or not ddl.strip():
        raise ValueError("empty schema string")
    try:
        return T.StructType.fromDDL(_normalize_type(ddl))
    except Exception as exc:  # noqa: BLE001 — normalize parser errors
        raise ValueError(f"malformed Hive schema string: {ddl!r}") from exc


def parse_ddl_names_types(ddl: str) -> tuple[list[str], list[str]]:
    """HiveSchemaUtil.parse parity: return parallel (names, types)."""
    struct = parse_ddl(ddl)
    return [f.name for f in struct.fields], [f.dataType.simpleString() for f in struct.fields]


def from_names_types(names: list[str], types: list[str] | None = None) -> T.StructType:
    """Explicit-schema mode (RCFile.java:77-92) with the reference's
    validation (equal lengths, RCFile.java:123-133) and Scalding's
    default-fill-to-string behavior (ColumnarSerDeSource.scala:22-31)
    when ``types`` is shorter than ``names``."""
    if types is None:
        types = []
    if len(types) > len(names):
        raise ValueError(
            f"{len(types)} types for {len(names)} columns"
        )
    padded = list(types) + ["string"] * (len(names) - len(types))
    fields = [
        T.StructField(n, parse_ddl(f"__c {t}").fields[0].dataType, True)
        for n, t in zip(names, padded)
    ]
    return T.StructType(fields)


def default_names(n: int) -> list[str]:
    """ORC default column naming ``_col0.._colN`` (ORCFile.java:91)."""
    return [f"_col{i}" for i in range(n)]


def to_ddl(schema: T.StructType) -> str:
    """StructType -> Hive-compatible DDL column list."""
    return ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in schema.fields)
