"""Direct parity with the reference's OWN test queries and goldens.

Inputs are the reference repo's test resources (read-only), outputs
are the Tuple[] goldens hardcoded in its JUnit tests — the strongest
form of 'a user of the reference could switch to this repo':

- wordcount over wc.txt  -> ("",9), ("A",3), ("Australia",1)
  (ORCFileTest.testSchemaInferenceIt, ORCFileTest.java:271-281)
- ExpressionFilter("col1 > 3") over test.txt -> the 7 kept tuples
  (HCatTapTest.testOrcInOut, HCatTapTest.java:126-134)
- ExpressionFilter("col1 != 1") over test.txt -> the 3 kept tuples
  (HCatTapTest.testParquetIn, HCatTapTest.java:155-164)
- CountBy(intCol) over rc_test.txt -> {1:3, 2:3, 3:1, 4:3, 5:3}
  (RCFileTest.testCountBy, RCFileTest.java:144-150)
- files WRITTEN by the reference's own Hive/ORC stack (test.orc,
  wc.orc, test.parquet) read back with identical contents
  (round-trip compatibility at the format level)
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cascading_hive_spark.operators import relational as R

DATA = "/root/reference/src/test/resources/data"


@pytest.fixture(scope="module")
def wc_docs(spark):
    return spark.read.csv(
        f"{DATA}/wc.txt", sep="\t", header=True, schema="doc_id string, text string"
    )


@pytest.fixture(scope="module")
def simple3(spark):
    return spark.read.csv(
        f"{DATA}/test.txt", header=True, schema="col1 int, col2 string, col3 string"
    )


def test_wordcount_reference_goldens(wc_docs):
    rows = R.wordcount(wc_docs, "text", r"[ \[\]\(\),.]").collect()
    # key-ordered output; first three goldens from ORCFileTest.java:271-281
    got = [(r.token, r.cnt) for r in rows[:3]]
    assert got == [("", 9), ("A", 3), ("Australia", 1)]


def test_expression_filter_gt3_goldens(simple3):
    kept = (
        R.expression_filter(simple3, "col1 > 3")
        .orderBy("col1", "col2")
        .collect()
    )
    got = [(r.col1, r.col2, r.col3) for r in kept]
    assert got == [
        (1, "a", "A"), (1, "b", "B"), (1, "c", "C"),
        (2, "b", "B"), (2, "c", "C"), (2, "d", "D"),
        (3, "c", "C"),
    ]  # HCatTapTest.java:126-134; exactly 7 rows


def test_expression_filter_ne1_goldens(simple3):
    kept = (
        R.expression_filter(simple3, "col1 != 1").orderBy("col1", "col2").collect()
    )
    got = [(r.col1, r.col2, r.col3) for r in kept]
    assert got == [(1, "a", "A"), (1, "b", "B"), (1, "c", "C")]  # HCatTapTest.java:155-164


def test_count_by_goldens(spark):
    rc = spark.read.csv(
        f"{DATA}/rc_test.txt",
        header=True,
        schema="intCol int, bigintCol bigint, floatCol float, doubleCol double, "
        "decimalCol decimal(38,18), booleanCol boolean, binaryCol string, "
        "stringCol string, timestampCol timestamp",
    )
    got = {
        r.intCol: r.cnt
        for r in R.count_by(rc, ["intCol"]).collect()
    }
    assert got == {1: 3, 2: 3, 3: 1, 4: 3, 5: 3}  # RCFileTest.java:144-150


def test_read_reference_produced_orc(spark, simple3):
    # test.orc was written by the reference's Hive ORC stack; our
    # reader must see the same 12 rows as the text source (A4 + A7:
    # schema comes from the ORC footer, no schema arg)
    orc = spark.read.orc(f"{DATA}/test.orc")
    assert orc.count() == simple3.count()
    a = sorted(tuple(r) for r in orc.collect())
    b = sorted(tuple(r) for r in simple3.collect())
    assert [tuple(str(x) for x in r) for r in a] == [
        tuple(str(x) for x in r) for r in b
    ]


def test_read_reference_produced_wc_orc(spark, wc_docs):
    orc = spark.read.orc(f"{DATA}/wc.orc")
    assert orc.count() == wc_docs.count()
    # single text column, same contents
    got = sorted(r[orc.columns[-1]] for r in orc.collect())
    want = sorted(r.text for r in wc_docs.collect())
    assert got == want


def test_read_reference_produced_parquet(spark, simple3):
    pq = spark.read.parquet(f"{DATA}/test.parquet")
    assert pq.count() == simple3.count()


@pytest.fixture(scope="module")
def sample07(spark):
    return spark.read.csv(
        f"{DATA}/sample_07.csv",
        sep="\t",
        schema="code string, description string, total_emp string, salary string",
    )


def test_sample07_identity_projection_golden(spark, sample07):
    # HCatTapTest.testDataIn: Identity over all four fields, golden =
    # hcatout.txt (pipe-delimited copy of the table)
    ours = R.project(sample07, ["code", "description", "total_emp", "salary"])
    got = [("|".join(x if x is not None else "" for x in r)) for r in ours.collect()]
    want = [
        line.rstrip("\n")
        for line in open(f"{DATA}/hcatout.txt", encoding="utf-8")
    ]
    assert got == want


def test_sample07_source_fields_subset_golden(spark, sample07):
    # HCatTapTest.testDataInWithSouceFields: Fields("code","salary")
    # subset, golden = hcat_result_fields.txt
    ours = R.project(sample07, ["code", "salary"])
    got = ["|".join(r) for r in ours.collect()]
    want = [
        line.rstrip("\n")
        for line in open(f"{DATA}/hcat_result_fields.txt", encoding="utf-8")
    ]
    assert got == want


def test_sample07_coerce_round_trip_golden(spark, sample07):
    # HCatTapTest.testDataOut: Coerce total_emp/salary to int, write,
    # byte-compare against the original csv — numeric rendering must be
    # exactly Java's Integer.toString (no decimal point, no padding)
    coerced = R.coerce(sample07, {"total_emp": "int", "salary": "int"})
    got = [
        f"{r.code}\t{r.description}\t{r.total_emp}\t{r.salary}" for r in coerced.collect()
    ]
    want = [
        line.rstrip("\n") for line in open(f"{DATA}/sample_07.csv", encoding="utf-8")
    ]
    assert got == want


def test_partition_union_matches_partition_files(spark):
    # A13: MultiSourceTap over the partitioned table's two ds
    # directories == concatenation of the partition files
    schema = "code string, description string, total_emp string, salary string"
    p0 = spark.read.csv(f"{DATA}/test_partition_0.txt", sep="|", schema=schema)
    p1 = spark.read.csv(f"{DATA}/test_partition_1.txt", sep="|", schema=schema)
    both = spark.read.csv(
        [f"{DATA}/test_partition_0.txt", f"{DATA}/test_partition_1.txt"],
        sep="|",
        schema=schema,
    )
    assert both.count() == p0.count() + p1.count()
    assert sorted(map(tuple, both.collect())) == sorted(
        map(tuple, p0.union(p1).collect())
    )
