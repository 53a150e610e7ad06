"""Property tests (hypothesis) for the round-11 operators: each one
is replayed by an independent pure-Python reference on randomized
inputs — the same differential discipline as test_packing — so the
distributed formulation (percentile edges, fixed-grid histograms,
span islands, overlap joins) is pinned against a spec that cannot
share its bugs.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def _py_quantile_linear(sorted_vals, p):
    """numpy 'linear' / percentile_cont interpolation."""
    n = len(sorted_vals)
    pos = p * (n - 1)
    lo = int(math.floor(pos))
    hi = min(lo + 1, n - 1)
    frac = pos - lo
    return sorted_vals[lo] + (sorted_vals[hi] - sorted_vals[lo]) * frac


def test_percentile_bins_matches_python_reference(spark):
    """percentile_bins == pure-Python binning against interpolated
    quartiles, on random integer multisets (ties included)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from cascading_hive_spark.operators.relational import percentile_bins

    @settings(max_examples=12, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=-1000, max_value=1000), min_size=4, max_size=80
        )
    )
    def check(vals):
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vals)], "id long, v long"
        )
        got = {r.id: r.v_bin for r in percentile_bins(df, ["v"]).collect()}
        sv = sorted(vals)
        q = [_py_quantile_linear(sv, p) for p in (0.25, 0.5, 0.75)]
        for i, v in enumerate(vals):
            want = 1 if v >= q[2] else 2 if v >= q[1] else 3 if v >= q[0] else 4
            assert got[i] == want, (vals, i, v, q)

    check()


def test_histogram_quantile_matches_python_replay(spark):
    """histogram_quantile_merge == an exact pure-Python replay of the
    fixed-grid pipeline (bounds -> bin -> merge -> cumulative ->
    interpolate) on random float lists — the whole point of the
    deterministic sketch is that this equality is EXACT, not
    approximate."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from cascading_hive_spark.operators.sketches import histogram_quantile_merge

    BINS = 16

    @settings(max_examples=12, deadline=None)
    @given(
        st.lists(
            st.floats(
                min_value=-1e6,
                max_value=1e6,
                allow_nan=False,
                allow_infinity=False,
                width=32,
            ),
            min_size=3,
            max_size=60,
        ).filter(lambda xs: max(xs) > min(xs))
    )
    def check(vals):
        df = spark.createDataFrame(
            [(float(v), i % 3) for i, v in enumerate(vals)], "v double, pk int"
        )
        row = histogram_quantile_merge(
            df, "v", "pk", bins=BINS, probs=(0.5, 0.9)
        ).collect()[0]
        lo, hi = min(vals), max(vals)
        width = (hi - lo) / float(BINS)
        counts: dict[int, int] = {}
        for v in vals:
            b = min(BINS - 1, int(math.floor((v - lo) / width)))
            counts[b] = counts.get(b, 0) + 1
        n = len(vals)
        for p, got in ((0.5, row.q500), (0.9, row.q900)):
            target = p * n
            cum = 0
            for b in sorted(counts):
                prev = cum
                cum += counts[b]
                if cum >= target and prev < target:
                    est = lo + width * (b + (target - prev) / counts[b])
                    break
            # Spark/DuckDB round() is HALF_UP on the exact double;
            # Python round() is banker's — replay HALF_UP explicitly
            from decimal import ROUND_HALF_UP, Decimal

            want = float(
                Decimal(repr(est)).quantize(Decimal("0.000001"), ROUND_HALF_UP)
            ) + 0.0
            assert got == want, (vals, p, got, want)
        assert row.n == n

    check()


def test_span_scrub_matches_python_replay(spark):
    """remove_duplicate_spans == a pure-Python replay (gram digests ->
    cross-doc dup grams -> merged islands -> positional scrub) on
    random tiny corpora with planted sharing; kept + dup always tiles
    each doc."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from cascading_hive_spark.operators.dedup import (
        duplicate_span_stats,
        remove_duplicate_spans,
    )

    N = 3  # small n so random corpora actually share n-grams
    token = st.sampled_from(["a", "b", "c", "d"])

    @settings(max_examples=10, deadline=None)
    @given(st.lists(st.lists(token, min_size=1, max_size=14), min_size=2, max_size=5))
    def check(corpora):
        rows = [(i, " ".join(toks)) for i, toks in enumerate(corpora)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r.doc_id: (r.n_tokens, r.kept_tokens, r.clean_text)
            for r in remove_duplicate_spans(df, "doc_id", "text", n=N).collect()
        }
        # python replay
        gram_docs: dict[tuple, set] = {}
        toks = {i: t.split(" ") for i, t in rows}
        for i, ts in toks.items():
            for p in range(len(ts) - N + 1):
                gram_docs.setdefault(tuple(ts[p : p + N]), set()).add(i)
        dup = {g for g, ds in gram_docs.items() if len(ds) >= 2}
        for i, ts in toks.items():
            covered = set()
            for p in range(len(ts) - N + 1):
                if tuple(ts[p : p + N]) in dup:
                    covered.update(range(p, p + N))
            kept = [t for j, t in enumerate(ts) if j not in covered]
            assert got[i] == (len(ts), len(kept), " ".join(kept)), (rows, i)
        stats = {
            r.doc_id: r.dup_tokens
            for r in duplicate_span_stats(df, "doc_id", "text", n=N).collect()
        }
        for i in toks:
            assert got[i][1] + stats[i] == got[i][0]

    check()


def test_source_overlap_matches_python_bruteforce(spark):
    """source_overlap == brute-force pair counting over distinct
    (fingerprint, source) pairs on random doc/source assignments."""
    from itertools import combinations

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from cascading_hive_spark.operators.dedup import source_overlap

    @settings(max_examples=10, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=6),  # fingerprint id
                st.sampled_from(["s1", "s2", "s3"]),
            ),
            min_size=1,
            max_size=30,
        )
    )
    def check(pairs):
        rows = [(i, f"fp{fp}", src) for i, (fp, src) in enumerate(pairs)]
        df = spark.createDataFrame(rows, "doc_id long, text string, source string")
        got = {
            (r.source_a, r.source_b): r.shared_fps
            for r in source_overlap(df, "source", F.col("text")).collect()
        }
        by_fp: dict[str, set] = {}
        for _, fp, src in rows:
            by_fp.setdefault(fp, set()).add(src)
        want: dict[tuple, int] = {}
        for srcs in by_fp.values():
            for a, b in combinations(sorted(srcs), 2):
                want[(a, b)] = want.get((a, b), 0) + 1
        assert got == want, (pairs, got, want)

    check()
