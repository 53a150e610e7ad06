"""Schema module tests — mirrors HiveSchemaUtilTest.java's 4 cases
(simple list, extra whitespace, nested array<struct>, malformed input)
plus the reference's type quirks."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from cascading_hive_spark import schema as S


def test_parse_simple():
    # HiveSchemaUtilTest.java:27-40 equivalent
    names, types = S.parse_ddl_names_types("uid BIGINT, name STRING, description STRING")
    assert names == ["uid", "name", "description"]
    assert types == ["bigint", "string", "string"]


def test_parse_whitespace_and_case():
    names, types = S.parse_ddl_names_types("  a   int ,  b    string  ")
    assert names == ["a", "b"]
    assert types == ["int", "string"]


def test_parse_nested_array_struct():
    # HiveSchemaUtilTest.java:84-101 equivalent
    ddl = "id int, arr array<struct<one:string,two:bigint,three:struct<four:string>,five:string>>"
    st = S.parse_ddl(ddl)
    assert st.fields[1].name == "arr"
    assert isinstance(st.fields[1].dataType, T.ArrayType)
    inner = st.fields[1].dataType.elementType
    assert isinstance(inner, T.StructType)
    assert [f.name for f in inner.fields] == ["one", "two", "three", "five"]


def test_parse_malformed_raises():
    # HiveSchemaUtil.java:58-66 raises RuntimeException; we raise ValueError
    with pytest.raises(ValueError):
        S.parse_ddl("id int,, name")
    with pytest.raises(ValueError):
        S.parse_ddl("")


def test_decimal_flattening():
    # ORCFile.java:230-232: decimal ~ bigdecimal ~ decimal(38,18)
    st = S.parse_ddl("d decimal, b bigdecimal")
    assert st.fields[0].dataType == T.DecimalType(38, 18)
    assert st.fields[1].dataType == T.DecimalType(38, 18)


def test_from_names_types_default_fill():
    # ColumnarSerDeSource.scala:22-31: missing types default to string
    st = S.from_names_types(["a", "b", "c"], ["int"])
    assert [f.dataType.simpleString() for f in st.fields] == ["int", "string", "string"]


def test_from_names_types_validation():
    # RCFile.java:123-133: lengths must agree (types <= names)
    with pytest.raises(ValueError):
        S.from_names_types(["a"], ["int", "string"])


def test_default_names():
    # ORCFile.java:91 / ORCFileTest.java:180-182
    assert S.default_names(3) == ["_col0", "_col1", "_col2"]


def test_to_ddl_roundtrip():
    ddl = "a int, b array<string>, c struct<x:bigint,y:string>"
    assert S.to_ddl(S.parse_ddl(ddl)) == ddl.replace(" ,", ",")
