"""Mergeable frequency sketches: Misra-Gries heavy hitters.

The reference's aggregation surface stops at exact counts
(RCFileTest.java:139 CountBy); at 100-TB corpus scale the question
"which keys exceed phi of all traffic" can't afford a full groupBy
over every distinct key (billions of distinct (user, action) pairs
shuffle for a handful of answers). Misra-Gries (and its mergeable-
summaries generalization, Agarwal et al., PODS'12) bounds pass-1
memory at O(1/phi) per partition and emits at most ceil(1/phi)
candidate keys per partition — a map-only pass whose output is
metadata-sized — then an exact recount restricted to candidates makes
the final answer EXACT, not approximate:

  pigeonhole: a key with global count > phi * n has, in at least one
  partition p, count > phi * n_p; Misra-Gries with k >= ceil(1/phi)
  counters over n_p rows retains every key whose partition count
  exceeds n_p / k <= phi * n_p. So the union of per-partition
  candidate sets is a superset of the true heavy hitters, and the
  recount + threshold filter converges on exactly
  {key : count(key) > phi * n} regardless of partitioning.

Pass 2 shuffles ONLY rows matching a broadcast candidate set — at a
phi of 1e-3 that is <= 1000 keys per partition in flight, never the
full key domain.
"""

from __future__ import annotations

from collections.abc import Iterator
from functools import reduce

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_merge(counters: dict, add: dict, k: int) -> dict:
    """Merge new counts into a Misra-Gries summary, keeping at most
    ``k`` counters. Batched decrement (the mergeable-summaries rule):
    combine, then subtract the (k+1)-th largest count from every
    counter and drop the non-positive — equivalent to running the
    one-at-a-time decrement, and preserves the n/k error bound."""
    for key, cnt in add.items():
        counters[key] = counters.get(key, 0) + int(cnt)
    if len(counters) > k:
        # (k+1)-th largest value; subtracting it zeroes out at least
        # len - k counters, restoring the size bound in one pass
        cut = sorted(counters.values(), reverse=True)[k]
        counters = {key: c - cut for key, c in counters.items() if c > cut}
    return counters


def heavy_hitters(
    df: DataFrame, keys: list[str], phi: float, count_name: str = "cnt"
) -> DataFrame:
    """Exact keys with ``count > phi * total_rows``, two-pass.

    Pass 1 (map-only, no shuffle): per-partition Misra-Gries with
    ``k = ceil(1/phi)`` counters over Arrow batches via mapInPandas;
    each partition emits its <= k candidate key tuples. Pass 2: exact
    recount of rows matching the (metadata-sized, broadcast) candidate
    set, filtered against the true total. Output is deterministic —
    candidate supersets vary with partitioning, but the recount +
    threshold keeps exactly the true hitters (module docstring).
    """
    if not 0.0 < phi < 1.0:
        raise ValueError(f"phi must be in (0, 1), got {phi}")
    k = int(1.0 / phi) + 1
    keyed = df.select(*keys)  # column pruning reaches the scan
    schema = keyed.schema

    def _norm_key(key: object) -> tuple:
        # NULL keys arrive from pandas as NaN/NaT, and NaN != NaN would
        # split one logical key across counters — breaking the
        # pigeonhole retention bound for that key. Canonicalize every
        # null-ish element to None so the counter dict merges them.
        parts = key if isinstance(key, tuple) else (key,)
        return tuple(None if pd.isna(p) else p for p in parts)

    def mg_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        cols = None
        for pdf in batches:
            cols = list(pdf.columns)
            grouped = pdf.groupby(cols, sort=False, dropna=False).size()
            add = {_norm_key(key): cnt for key, cnt in grouped.to_dict().items()}
            counters = _mg_merge(counters, add, k)
        if counters:
            # object dtype + None (never NaN): a NaN in an int64 key
            # column would fail the Arrow cast back to the key schema
            out = pd.DataFrame(list(counters.keys()), columns=cols, dtype=object)
            yield out.where(pd.notna(out), None)

    candidates = keyed.mapInPandas(mg_partition, schema=schema).dropDuplicates()
    total = df.groupBy().agg(F.count(F.lit(1)).alias("_hh_total"))
    # eqNullSafe per key: a plain equality semi-join would drop
    # NULL-keyed candidates that pass 1 deliberately kept (ADVICE r8)
    cand = candidates.select(*[F.col(k).alias(f"_hh_{k}") for k in keys])
    cond = reduce(
        lambda a, b: a & b, [F.col(k).eqNullSafe(F.col(f"_hh_{k}")) for k in keys]
    )
    return (
        df.join(F.broadcast(cand), cond, "left_semi")
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias(count_name))
        .crossJoin(F.broadcast(total))
        .filter(F.col(count_name) > F.lit(phi) * F.col("_hh_total"))
        .drop("_hh_total")
    )
