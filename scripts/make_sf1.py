"""Tile /root/testdata/sf0.1 into an ~sf1 parquet directory for the
end-to-end headliner board (r14 VERDICT #1).

Plain crossJoin tiling (the q1_decimal precedent) is only honest for
scan/agg queries: exact key copies would square join multiplicities
(10 copies on each side of o_orderkey -> 100x join output) and exact
text/vector copies would push every dedup family superlinear (10
identical docs per group -> 45x pair blowup per bucket). Real sf1
data is 10x DISTINCT rows at the same duplicate/skew RATE, so each
tile gets:

- join tables: every FK/PK shifted by tile * (max_key + 1), applied
  consistently on both sides, so each tile is a self-contained join
  graph and the composite scales linearly. nation/region stay shared
  dims (sf1 still has 25 nations).
- documents: doc_id shifted; every whitespace-delimited token
  suffixed with the tile digit (token counts, structure, and
  WITHIN-tile planted duplicates preserved; cross-tile exact
  duplication destroyed — the honest 10x for gram/LSH dedup);
  n_chars recomputed.
- embeddings: vec_id shifted; each dimension nudged by a
  deterministic +-5e-3 tile/dim-dependent epsilon (kills exact
  vector copies without moving cluster structure).
- events: event_id/user_id shifted (10x users, same per-user
  session shape).

Usage: python scripts/make_sf1.py [out_dir=/tmp/sf1] [tiles=10]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

SRC = "/root/testdata/sf0.1"


def _spark():
    from cascading_hive_spark.session import get_session

    return get_session(
        "make-sf1",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
    )


def _tiled(df: DataFrame, tiles: int) -> DataFrame:
    return df.crossJoin(
        F.broadcast(
            df.sparkSession.range(tiles).select(F.col("id").alias("_t"))
        )
    )


def _shift(col: str, stride: int):
    return (F.col(col) + F.col("_t") * F.lit(stride)).alias(col)


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    tiles = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = _spark()
    from cascading_hive_spark.tables import load_table

    t = {
        n: load_table(spark, SRC, n)
        for n in (
            "region nation customer supplier part orders lineitem "
            "events documents embeddings"
        ).split()
    }
    # strides: one per key family, shared by every table referencing it
    stride = {
        k: t[tab].agg(F.max(col)).first()[0] + 1
        for k, (tab, col) in {
            "O": ("orders", "o_orderkey"),
            "C": ("customer", "c_custkey"),
            "S": ("supplier", "s_suppkey"),
            "P": ("part", "p_partkey"),
            "E": ("events", "event_id"),
            "U": ("events", "user_id"),
            "D": ("documents", "doc_id"),
            "V": ("embeddings", "vec_id"),
        }.items()
    }

    def write(df: DataFrame, name: str, files: int) -> None:
        (
            df.repartition(files)
            .write.mode("overwrite")
            .parquet(os.path.join(out, f"{name}.parquet"))
        )
        print(f"wrote {name}", flush=True)

    # shared dims, copied as-is
    write(t["region"], "region", 1)
    write(t["nation"], "nation", 1)

    c = t["customer"]
    write(
        _tiled(c, tiles).select(
            _shift("c_custkey", stride["C"]),
            *[x for x in c.columns if x != "c_custkey"],
        ),
        "customer",
        8,
    )
    s = t["supplier"]
    write(
        _tiled(s, tiles).select(
            _shift("s_suppkey", stride["S"]),
            *[x for x in s.columns if x != "s_suppkey"],
        ),
        "supplier",
        4,
    )
    p = t["part"]
    write(
        _tiled(p, tiles).select(
            _shift("p_partkey", stride["P"]),
            *[x for x in p.columns if x != "p_partkey"],
        ),
        "part",
        8,
    )
    o = t["orders"]
    write(
        _tiled(o, tiles).select(
            _shift("o_orderkey", stride["O"]),
            _shift("o_custkey", stride["C"]),
            *[x for x in o.columns if x not in ("o_orderkey", "o_custkey")],
        ),
        "orders",
        16,
    )
    li = t["lineitem"]
    write(
        _tiled(li, tiles).select(
            _shift("l_orderkey", stride["O"]),
            _shift("l_partkey", stride["P"]),
            _shift("l_suppkey", stride["S"]),
            *[
                x
                for x in li.columns
                if x not in ("l_orderkey", "l_partkey", "l_suppkey")
            ],
        ),
        "lineitem",
        32,
    )
    e = t["events"]
    write(
        _tiled(e, tiles).select(
            _shift("event_id", stride["E"]),
            _shift("user_id", stride["U"]),
            *[x for x in e.columns if x not in ("event_id", "user_id")],
        ),
        "events",
        16,
    )
    d = t["documents"]
    text2 = F.regexp_replace(
        F.col("text"),
        F.lit(r"(\S+)"),
        F.concat(F.lit("$1"), F.col("_t").cast("string")),
    )
    write(
        _tiled(d, tiles).select(
            _shift("doc_id", stride["D"]),
            text2.alias("text"),
            "lang",
            "source",
            F.length(text2).cast("bigint").alias("n_chars"),
        ),
        "documents",
        32,
    )
    v = t["embeddings"]
    eps = F.transform(
        F.col("embedding"),
        lambda x, i: (
            x.cast("double")
            + (
                F.pmod(F.col("_t") * 31 + F.col("vec_id") + i, F.lit(11))
                - F.lit(5)
            ).cast("double")
            * F.lit(1e-3)
        ).cast("float"),
    )
    write(
        _tiled(v, tiles).select(
            _shift("vec_id", stride["V"]),
            eps.alias("embedding"),
            "label",
        ),
        "embeddings",
        8,
    )
    for n in t:
        cnt = spark.read.parquet(os.path.join(out, f"{n}.parquet")).count()
        print(f"{n}: {cnt}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
