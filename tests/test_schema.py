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


def test_ddl_roundtrip_property(spark):
    """Property test (hypothesis): any generated column list survives
    to_ddl ∘ parse_ddl unchanged, and the pure-Python parser agrees
    with Spark's own DDL parser."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    simple_types = st.sampled_from(
        ["int", "bigint", "string", "double", "float", "boolean", "date",
         "timestamp", "binary", "smallint", "tinyint", "decimal(12,3)"]
    )
    nested_types = st.recursive(
        simple_types,
        lambda inner: st.one_of(
            inner.map(lambda t: f"array<{t}>"),
            st.tuples(inner, inner).map(lambda ab: f"map<{ab[0]},{ab[1]}>"),
            inner.map(lambda t: f"struct<f1:{t},f2:int>"),
        ),
        max_leaves=4,
    )
    names = st.from_regex(r"[a-z][a-z0-9_]{0,10}", fullmatch=True)
    cols = st.lists(st.tuples(names, nested_types), min_size=1, max_size=6,
                    unique_by=lambda nt: nt[0])

    from pyspark.sql import types as T

    @given(cols)
    @settings(max_examples=60, deadline=None, derandomize=True)
    def check(col_list):
        ddl = ", ".join(f"{n} {t}" for n, t in col_list)
        st1 = S.parse_ddl(ddl)
        assert S.to_ddl(S.parse_ddl(S.to_ddl(st1))) == S.to_ddl(st1)
        assert [f.name for f in st1.fields] == [n for n, _ in col_list]
        # differential: pure-Python parser == Spark's JVM DDL parser
        assert st1 == T.StructType.fromDDL(ddl)

    check()


def test_schema_diff_reports_drift_with_nested_paths():
    from cascading_hive_spark.schema import parse_ddl, schema_diff

    old = parse_ddl(
        "id bigint, price decimal(18,2), tags array<string>, "
        "meta struct<lang:string,score:double>, gone int"
    )
    new = parse_ddl(
        "id bigint, price decimal(38,6), tags array<string>, "
        "meta struct<lang:string,score:float,source:string>, fresh date"
    )
    diff = {(d["column"], d["change"]) for d in schema_diff(old, new)}
    assert diff == {
        ("price", "type_changed"),
        ("meta.score", "type_changed"),
        ("meta.source", "added"),
        ("gone", "removed"),
        ("fresh", "added"),
    }
    assert schema_diff(new, new) == []


def test_schema_diff_ignores_column_order():
    from cascading_hive_spark.schema import parse_ddl, schema_diff

    a = parse_ddl("x int, y string")
    b = parse_ddl("y string, x int")
    assert schema_diff(a, b) == []


def test_schema_diff_roundtrip_property():
    """Property: for any generated schema, schema_diff(s, s) == [] and
    parse_ddl(to_ddl(s)) is drift-free vs s (DDL round-trip loses
    nothing schema_diff can see)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from cascading_hive_spark.schema import parse_ddl, schema_diff, to_ddl

    types = st.sampled_from(
        ["int", "bigint", "string", "double", "date", "decimal(18,4)",
         "array<string>", "map<string,int>", "struct<a:int,b:string>"]
    )
    names = st.lists(
        st.from_regex(r"[a-z][a-z0-9_]{0,8}", fullmatch=True),
        min_size=1, max_size=6, unique=True,
    )

    @given(names=names, data=st.data())
    @settings(max_examples=50, deadline=None)
    def check(names, data):
        cols = [(n, data.draw(types)) for n in names]
        ddl = ", ".join(f"{n} {t}" for n, t in cols)
        schema = parse_ddl(ddl)
        assert schema_diff(schema, schema) == []
        assert schema_diff(schema, parse_ddl(to_ddl(schema))) == []

    check()
