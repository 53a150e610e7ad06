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


_PRIMITIVES: dict[str, T.DataType] = {
    "string": T.StringType(),
    "int": T.IntegerType(),
    "integer": T.IntegerType(),
    "bigint": T.LongType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "real": T.FloatType(),
    "double": T.DoubleType(),
    "boolean": T.BooleanType(),
    "tinyint": T.ByteType(),
    "byte": T.ByteType(),
    "smallint": T.ShortType(),
    "short": T.ShortType(),
    "binary": T.BinaryType(),
    "timestamp": T.TimestampType(),
    "timestamp_ntz": T.TimestampNTZType(),
    "date": T.DateType(),
    "void": T.NullType(),
}


class _DDLParser:
    """Pure-Python recursive-descent parser for Hive/Spark DDL column
    lists — the role HiveSchemaUtil.parse fills with the Hive ANTLR
    parser (HiveSchemaUtil.java:37-77), but with NO JVM dependency so
    schema handling works before any SparkSession exists. Verified
    differentially against Spark's own ``StructType.fromDDL`` in
    tests/test_schema.py."""

    def __init__(self, s: str):
        self.s = s
        self.i = 0

    def error(self, msg: str):
        raise ValueError(f"malformed Hive schema string at pos {self.i}: {msg}")

    def skip_ws(self):
        while self.i < len(self.s) and self.s[self.i].isspace():
            self.i += 1

    def peek(self) -> str:
        self.skip_ws()
        return self.s[self.i] if self.i < len(self.s) else ""

    def expect(self, ch: str):
        if self.peek() != ch:
            self.error(f"expected {ch!r}, found {self.peek()!r}")
        self.i += 1

    def ident(self) -> str:
        self.skip_ws()
        if self.peek() == "`":
            self.i += 1
            j = self.s.find("`", self.i)
            if j < 0:
                self.error("unterminated backquote")
            name, self.i = self.s[self.i : j], j + 1
            return name
        j = self.i
        while j < len(self.s) and (self.s[j].isalnum() or self.s[j] == "_"):
            j += 1
        if j == self.i:
            self.error("expected identifier")
        name, self.i = self.s[self.i : j], j
        return name

    def int_lit(self) -> int:
        self.skip_ws()
        j = self.i
        while j < len(self.s) and self.s[j].isdigit():
            j += 1
        if j == self.i:
            self.error("expected integer")
        v, self.i = int(self.s[self.i : j]), j
        return v

    def data_type(self) -> T.DataType:
        name = self.ident().lower()
        if name in ("decimal", "numeric", "bigdecimal", "dec"):
            # reference flattens bare decimal to BigDecimal
            # (ORCFile.java:230-232) -> decimal(38,18)
            if self.peek() == "(":
                self.i += 1
                p = self.int_lit()
                s = 0
                if self.peek() == ",":
                    self.i += 1
                    s = self.int_lit()
                self.expect(")")
                return T.DecimalType(p, s)
            return T.DecimalType(38, 18)
        if name in ("varchar", "char"):
            if self.peek() == "(":
                self.i += 1
                n = self.int_lit()
                self.expect(")")
                return T.VarcharType(n) if name == "varchar" else T.CharType(n)
            return T.StringType()
        if name == "array":
            self.expect("<")
            elem = self.data_type()
            self.expect(">")
            return T.ArrayType(elem)
        if name == "map":
            self.expect("<")
            k = self.data_type()
            self.expect(",")
            v = self.data_type()
            self.expect(">")
            return T.MapType(k, v)
        if name == "struct":
            self.expect("<")
            fields = []
            while True:
                fname = self.ident()
                self.expect(":")
                fields.append(T.StructField(fname, self.data_type(), True))
                if self.peek() == ",":
                    self.i += 1
                    continue
                break
            self.expect(">")
            return T.StructType(fields)
        if name in _PRIMITIVES:
            return _PRIMITIVES[name]
        self.error(f"unknown type {name!r}")

    def column_list(self) -> T.StructType:
        fields = []
        while True:
            fname = self.ident()
            # optional ':' (struct-style) or whitespace separator
            if self.peek() == ":":
                self.i += 1
            fields.append(T.StructField(fname, self.data_type(), True))
            self.skip_ws()
            if self.peek() == ",":
                self.i += 1
                continue
            break
        self.skip_ws()
        if self.i != len(self.s):
            self.error(f"trailing input {self.s[self.i:]!r}")
        return T.StructType(fields)


def parse_ddl(ddl: str) -> T.StructType:
    """Parse a Hive DDL column list into a StructType — pure Python,
    no SparkSession required.

    Raises ValueError on malformed input (reference raises
    RuntimeException — HiveSchemaUtil.java:58-66).
    """
    if not ddl or not ddl.strip():
        raise ValueError("empty schema string")
    return _DDLParser(ddl.strip()).column_list()


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


def schema_diff(old: T.StructType, new: T.StructType) -> list[dict]:
    """Schema-drift report between two table versions — the DDL-level
    companion to io.table_diff's row-level reconciliation: one dict
    per changed column path with ``change`` in {'added', 'removed',
    'type_changed', 'nullability_changed'}. Nested structs are walked
    with dotted paths (a type change INSIDE a struct reports the leaf
    path, not an opaque whole-struct change); arrays/maps compare by
    simpleString. Order-insensitive — reordered columns are not
    drift (by-name alignment is the repo's write contract,
    io.align_to_schema)."""

    def walk(prefix: str, o: T.StructType, n: T.StructType, out: list[dict]) -> None:
        ofields = {f.name: f for f in o.fields}
        nfields = {f.name: f for f in n.fields}
        for name, f in ofields.items():
            path = f"{prefix}{name}"
            if name not in nfields:
                out.append({"column": path, "change": "removed",
                            "old_type": f.dataType.simpleString(), "new_type": None})
                continue
            g = nfields[name]
            if isinstance(f.dataType, T.StructType) and isinstance(g.dataType, T.StructType):
                walk(f"{path}.", f.dataType, g.dataType, out)
            elif f.dataType.simpleString() != g.dataType.simpleString():
                out.append({"column": path, "change": "type_changed",
                            "old_type": f.dataType.simpleString(),
                            "new_type": g.dataType.simpleString()})
            if f.nullable != g.nullable and name in nfields:
                out.append({"column": path, "change": "nullability_changed",
                            "old_type": str(f.nullable), "new_type": str(g.nullable)})
        for name, g in nfields.items():
            if name not in ofields:
                out.append({"column": f"{prefix}{name}", "change": "added",
                            "old_type": None, "new_type": g.dataType.simpleString()})

    out: list[dict] = []
    walk("", old, new, out)
    return out
