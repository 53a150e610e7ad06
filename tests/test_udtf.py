"""Python UDTF surface (Spark 3.5+ @udtf): the python counterpart of
the JVM posexplode used by the posexplode_tokens query."""

from __future__ import annotations

from pyspark.sql.functions import lit, udtf


@udtf(returnType="pos int, token string")
class Tokenize:
    def eval(self, text: str):
        for i, tok in enumerate(text.split(" ")):
            yield i, tok


def test_python_udtf_tokenize(spark):
    out = Tokenize(lit("a b c")).collect()
    assert [(r.pos, r.token) for r in out] == [(0, "a"), (1, "b"), (2, "c")]


def test_python_udtf_lateral_join(spark):
    spark.udtf.register("py_tokenize", Tokenize)
    df = spark.createDataFrame([(1, "x y"), (2, "z")], "id int, t string")
    df.createOrReplaceTempView("udtf_docs")
    rows = spark.sql(
        "SELECT id, pos, token FROM udtf_docs, LATERAL py_tokenize(t)"
    ).collect()
    assert sorted((r.id, r.pos, r.token) for r in rows) == [
        (1, 0, "x"), (1, 1, "y"), (2, 0, "z"),
    ]
