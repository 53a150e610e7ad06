"""Properties of the r16-continuation operators: autocorrelation,
day-of-week seasonality, KMV distinct sketch, triplet hard-negative
mining, RAKE keywords — exact values on constructed inputs, estimator
accuracy bounds, and empty/degenerate-input robustness (the ANSI
divide-by-zero lesson from r13)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from cascading_hive_spark.operators.relational import (
    autocorrelation,
    dow_seasonality,
)
from cascading_hive_spark.operators.similarity import hard_negative_mine
from cascading_hive_spark.operators.sketches import kmv_distinct_by_key
from cascading_hive_spark.operators.text import RAKE_STOPWORDS, rake_keywords


def _daily(spark, counts, key="a", start="2024-01-01"):
    rows = [(key, f"{start[:8]}{1 + i:02d}", int(c)) for i, c in enumerate(counts)]
    return spark.createDataFrame(
        rows, "k string, bucket string, cnt long"
    ).withColumn("bucket", F.col("bucket").cast("timestamp"))


def test_acf_matches_numpy_definition(spark):
    xs = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 9, 7]
    out = autocorrelation(
        _daily(spark, xs), ["k"], "bucket", "cnt", max_lag=3
    ).collect()
    # mirror the operator's exact integer image (n^2 cancels in the
    # ratio) so the expected value is bit-identical, not approximate
    n, tot = len(xs), sum(xs)
    dev = [n * x - tot for x in xs]
    den = sum(d * d for d in dev)
    for r in out:
        num = sum(dev[t] * dev[t - r.lag] for t in range(r.lag, len(xs)))
        assert r.n_points == n
        assert r.acf == round(num / den, 6)


def test_acf_period2_series_alternates_sign(spark):
    xs = [0, 10] * 8
    out = {
        r.lag: r.acf
        for r in autocorrelation(
            _daily(spark, xs), ["k"], "bucket", "cnt", max_lag=2
        ).collect()
    }
    assert out[1] < 0 < out[2]


def test_acf_constant_series_null_not_crash(spark):
    out = autocorrelation(
        _daily(spark, [5] * 10), ["k"], "bucket", "cnt", max_lag=2
    ).collect()
    assert len(out) == 2 and all(r.acf is None for r in out)


def test_acf_empty_input(spark):
    empty = spark.createDataFrame([], "k string, bucket timestamp, cnt long")
    assert autocorrelation(empty, ["k"], "bucket", "cnt").count() == 0


def test_dow_seasonality_constant_series_is_zero(spark):
    out = dow_seasonality(_daily(spark, [4] * 21), ["k"]).collect()
    assert len(out) == 7  # 15 interior days cover all 7 weekdays
    assert all(r.seasonal == 0.0 for r in out)


def test_dow_seasonality_weekly_pattern_recovered(spark):
    # period-7 impulse: day 0, 7, 14, ... carry +7 extra events
    xs = [10 + (7 if i % 7 == 0 else 0) for i in range(28)]
    out = dow_seasonality(_daily(spark, xs), ["k"]).collect()
    # 2024-01-01 is a Monday -> impulse lands on dow=1 (0=Sunday)
    by_dow = {r.dow: r.seasonal for r in out}
    assert by_dow[1] == max(by_dow.values())
    assert by_dow[1] == 6.0  # 7 - 7/7 (impulse minus its trend share)
    assert all(v == -1.0 for d, v in by_dow.items() if d != 1)


def test_dow_seasonality_empty_input(spark):
    empty = spark.createDataFrame([], "k string, bucket timestamp, cnt long")
    assert dow_seasonality(empty, ["k"]).count() == 0


def test_kmv_small_set_branch_is_exact(spark):
    df = spark.createDataFrame(
        [("a", i) for i in range(20)], "grp string, v long"
    )
    rows = {
        r.key: r for r in kmv_distinct_by_key(df, "grp", "v", k=64).collect()
    }
    for key in ("a", "__ALL__"):
        assert rows[key].exact_distinct == 20
        assert rows[key].est_distinct == 20.0
        assert rows[key].rel_err == 0.0


def test_kmv_estimator_within_error_bound(spark):
    # 3 groups x 2000 distinct values (plus overlap through __ALL__);
    # KMV k=64 has std err ~ 1/sqrt(k-2) ~ 12.7%; assert a 4-sigma band
    df = spark.createDataFrame(
        [(f"g{i % 3}", i) for i in range(6000)], "grp string, v long"
    )
    out = kmv_distinct_by_key(df, "grp", "v", k=64).collect()
    assert len(out) == 4
    for r in out:
        assert r.n_sketch == 64
        assert abs(r.rel_err) < 4 / math.sqrt(62), (r.key, r.rel_err)


def test_kmv_union_row_merges_all_groups(spark):
    df = spark.createDataFrame(
        [("a", i) for i in range(10)] + [("b", i) for i in range(5, 15)],
        "grp string, v long",
    )
    rows = {r.key: r for r in kmv_distinct_by_key(df, "grp", "v").collect()}
    assert rows["__ALL__"].exact_distinct == 15  # union, not sum
    assert rows["a"].exact_distinct == rows["b"].exact_distinct == 10


def test_kmv_null_values_dropped(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", None), ("a", 2)], "grp string, v long"
    )
    rows = {r.key: r for r in kmv_distinct_by_key(df, "grp", "v").collect()}
    assert rows["a"].exact_distinct == 2


def test_kmv_empty_input(spark):
    empty = spark.createDataFrame([], "grp string, v long")
    assert kmv_distinct_by_key(empty, "grp", "v").count() == 0


def _emb(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )


def test_hard_negatives_labels_and_margin(spark):
    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.9, 0.1], 0),   # nearest same-label to 0
        (2, [0.95, 0.05], 1),  # nearest impostor to 0
        (3, [0.0, 1.0], 1),
        (4, [-1.0, 0.0], 2),
    ]
    e = _emb(spark, rows)
    out = hard_negative_mine(e, e.filter("vec_id = 0"), k=2).collect()
    assert [r.neg_id for r in sorted(out, key=lambda r: r.rnk)] == [2, 3]
    top = next(r for r in out if r.rnk == 1)
    assert top.pos_id == 1
    # impostor 2 is closer than genuine 1 -> negative margin
    assert top.margin < 0
    assert all(r.pos_id == 1 and r.pos_sim == top.pos_sim for r in out)


def test_hard_negatives_singleton_label_null_positive(spark):
    rows = [(0, [1.0, 0.0], 0), (1, [0.5, 0.5], 1), (2, [0.0, 1.0], 1)]
    e = _emb(spark, rows)
    out = hard_negative_mine(e, e.filter("vec_id = 0"), k=2).collect()
    assert len(out) == 2
    assert all(r.pos_id is None and r.margin is None for r in out)


def test_hard_negatives_empty_anchor_set(spark):
    rows = [(0, [1.0, 0.0], 0), (1, [0.0, 1.0], 1)]
    e = _emb(spark, rows)
    assert hard_negative_mine(e, e.filter("vec_id < 0"), k=2).count() == 0


def test_rake_scores_known_corpus(spark):
    docs = spark.createDataFrame(
        [
            (1, "deep learning of the deep model"),
            (2, "deep learning is great; model training"),
        ],
        "doc_id long, text string",
    )
    # phrases: [deep learning], [deep model] / [deep learning],
    #          [great model training]  ("is" and ";" delimit; nothing
    #          separates great/model/training)
    out = {r.word: r for r in rake_keywords(docs, "text", top_n=10).collect()}
    assert out["deep"].freq == 3 and out["deep"].degree == 6
    assert out["learning"].freq == 2 and out["learning"].degree == 4
    assert out["model"].freq == 2 and out["model"].degree == 5
    assert out["great"].freq == 1 and out["great"].degree == 3
    assert out["deep"].rake_score == 2.0
    assert out["great"].rake_score == 3.0
    # stopwords never surface as keywords
    assert not set(out) & set(RAKE_STOPWORDS)


def test_rake_top_n_frontier_deterministic(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta alpha"), (3, "gamma delta")],
        "doc_id long, text string",
    )
    out = rake_keywords(docs, "text", top_n=3).collect()
    # all score 2.0; ties break by freq desc then word asc
    assert [r.word for r in out] == ["alpha", "beta", "delta"]


def test_rake_empty_and_null_text(spark):
    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "; , .")], "doc_id long, text string"
    )
    assert rake_keywords(docs, "text").count() == 0


def test_new_queries_no_cartesian(spark, sf_dir):
    from cascading_hive_spark import queries as Q
    from cascading_hive_spark.plans.explain import assert_no_cartesian

    for name in (
        "events_acf",
        "events_dow_seasonality",
        "events_kmv_distinct",
        "embedding_hard_negatives",
        "text_rake_keywords",
    ):
        assert_no_cartesian(Q.queries()[name](spark, sf_dir))


def test_rake_query_plans_take_ordered(spark, sf_dir):
    from cascading_hive_spark import queries as Q

    plan = (
        Q.queries()["text_rake_keywords"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


# ---- wave 2: EWMA forecast, Mann-Kendall, label propagation ----


def test_ewma_matches_python_fold(spark):
    from cascading_hive_spark.operators.timeseries import ewma_forecast

    xs = [10, 12, 9, 15, 11, 14]
    out = ewma_forecast(_daily(spark, xs), ["k"], "bucket", "cnt").collect()
    acc = float(xs[0])
    for x in xs[1:]:
        acc = 0.3 * x + 0.7 * acc
    assert len(out) == 1
    r = out[0]
    assert r.n_days == len(xs) and r.last_obs == float(xs[-1])
    assert r.ewma_forecast == pytest.approx(round(acc, 6), abs=1e-9)


def test_ewma_single_day_is_identity(spark):
    from cascading_hive_spark.operators.timeseries import ewma_forecast

    out = ewma_forecast(_daily(spark, [7]), ["k"], "bucket", "cnt").collect()
    assert out[0].ewma_forecast == 7.0 and out[0].n_days == 1


def test_ewma_empty_input(spark):
    from cascading_hive_spark.operators.timeseries import ewma_forecast

    empty = spark.createDataFrame([], "k string, bucket timestamp, cnt long")
    assert ewma_forecast(empty, ["k"]).count() == 0


def test_mann_kendall_increasing_series(spark):
    from cascading_hive_spark.operators.timeseries import mann_kendall

    n = 10
    out = mann_kendall(
        _daily(spark, list(range(1, n + 1))), ["k"], "bucket", "cnt"
    ).collect()
    r = out[0]
    assert r.s_stat == n * (n - 1) // 2  # every pair ascending
    var = n * (n - 1) * (2 * n + 5) / 18
    assert r.var_s == pytest.approx(var, abs=1e-6)
    assert r.z == pytest.approx(round((r.s_stat - 1) / math.sqrt(var), 6), abs=1e-9)
    assert r.trend == "increasing"


def test_mann_kendall_constant_series_null_z(spark):
    from cascading_hive_spark.operators.timeseries import mann_kendall

    out = mann_kendall(_daily(spark, [5] * 8), ["k"], "bucket", "cnt").collect()
    r = out[0]
    assert r.s_stat == 0 and r.var_s == 0.0
    assert r.z is None and r.trend == "no_trend"


def test_mann_kendall_decreasing_series(spark):
    from cascading_hive_spark.operators.timeseries import mann_kendall

    out = mann_kendall(
        _daily(spark, list(range(12, 0, -1))), ["k"], "bucket", "cnt"
    ).collect()
    assert out[0].s_stat == -66 and out[0].trend == "decreasing"


def test_mann_kendall_empty_input(spark):
    from cascading_hive_spark.operators.timeseries import mann_kendall

    empty = spark.createDataFrame([], "k string, bucket timestamp, cnt long")
    assert mann_kendall(empty, ["k"]).count() == 0


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_label_propagation_two_triangles_bridge(spark):
    from cascading_hive_spark.operators.graph import label_propagation

    e = _edges(
        spark,
        [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12), (3, 10)],
    )
    out = {r.node: r.community for r in label_propagation(e, iterations=3).collect()}
    # hand-traced synchronous rounds with min-label tie-break:
    # the triangles stabilize on labels 1 and 3 respectively
    assert {out[1], out[2], out[3]} == {1}
    assert {out[10], out[11], out[12]} == {3}


def test_label_propagation_deterministic_and_guarded(spark):
    from cascading_hive_spark.operators.graph import label_propagation

    e = _edges(spark, [(1, 2), (2, 3), (3, 4)])
    a = sorted(map(tuple, label_propagation(e, iterations=3).collect()))
    b = sorted(map(tuple, label_propagation(e, iterations=3).collect()))
    assert a == b
    with pytest.raises(ValueError):
        label_propagation(e, iterations=0)


def test_label_propagation_empty_edges(spark):
    from cascading_hive_spark.operators.graph import label_propagation

    assert label_propagation(_edges(spark, []), iterations=2).count() == 0


def test_wave2_queries_no_cartesian(spark, sf_dir):
    from cascading_hive_spark import queries as Q
    from cascading_hive_spark.plans.explain import assert_no_cartesian

    for name in (
        "events_ewma_forecast",
        "events_trend_mannkendall",
        "graph_label_propagation",
    ):
        assert_no_cartesian(Q.queries()[name](spark, sf_dir))


# ---- wave 3: rolling distinct actives, Theil-Sen slope ----


def test_rolling_distinct_counts_by_hand(spark):
    from cascading_hive_spark.operators.timeseries import rolling_distinct_users

    rows = [
        (1, "2024-01-01 05:00:00"),
        (1, "2024-01-01 09:00:00"),  # same user+day dupes collapse
        (2, "2024-01-02 05:00:00"),
        (1, "2024-01-09 05:00:00"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    out = {
        str(r.window_end)[:10]: r.active_users
        for r in rolling_distinct_users(df, window_days=7).collect()
    }
    # hand-traced: Jan1 end covers only user 1; Jan2-7 ends cover
    # {1, 2}; Jan8 covers {2}; Jan9 covers {1}; ends past the max
    # observed day (Jan 9) are clipped
    assert out["2024-01-01"] == 1
    assert all(out[f"2024-01-0{d}"] == 2 for d in range(2, 8))
    assert out["2024-01-08"] == 1
    assert out["2024-01-09"] == 1
    assert max(out) == "2024-01-09" and len(out) == 9


def test_rolling_distinct_window1_is_daily_distinct(spark):
    from cascading_hive_spark.operators.timeseries import rolling_distinct_users

    rows = [(1, "2024-01-01 01:00:00"), (2, "2024-01-01 02:00:00"),
            (1, "2024-01-03 01:00:00")]
    df = spark.createDataFrame(rows, "user_id long, ts string").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    out = {
        str(r.window_end)[:10]: r.active_users
        for r in rolling_distinct_users(df, window_days=1).collect()
    }
    assert out == {"2024-01-01": 2, "2024-01-03": 1}


def test_rolling_distinct_empty_and_guard(spark):
    from cascading_hive_spark.operators.timeseries import rolling_distinct_users

    empty = spark.createDataFrame([], "user_id long, ts timestamp")
    assert rolling_distinct_users(empty).count() == 0
    with pytest.raises(ValueError):
        rolling_distinct_users(empty, window_days=0)


def test_theil_sen_exact_linear_series(spark):
    from cascading_hive_spark.operators.timeseries import theil_sen_slope

    # perfectly linear: every pairwise slope is exactly 3
    out = theil_sen_slope(
        _daily(spark, [2 + 3 * i for i in range(10)]), ["k"]
    ).collect()
    assert out[0].slope == 3.0 and out[0].n_pairs == 45


def test_theil_sen_resists_outlier(spark):
    from cascading_hive_spark.operators.timeseries import theil_sen_slope

    xs = [2 + 3 * i for i in range(10)]
    xs[5] = 1000  # single spike barely moves the median slope
    out = theil_sen_slope(_daily(spark, xs), ["k"]).collect()
    assert abs(out[0].slope - 3.0) < 1.0


def test_theil_sen_matches_python_median(spark):
    from cascading_hive_spark.operators.timeseries import theil_sen_slope

    xs = [3, 1, 4, 1, 5, 9, 2, 6]
    slopes = sorted(
        (xs[j] - xs[i]) / (j - i)
        for i in range(len(xs))
        for j in range(i + 1, len(xs))
    )
    n = len(slopes)
    med = (slopes[(n + 1) // 2 - 1] + slopes[n // 2]) / 2
    out = theil_sen_slope(_daily(spark, xs), ["k"]).collect()
    assert out[0].slope == pytest.approx(round(med, 6), abs=1e-9)


def test_theil_sen_empty(spark):
    from cascading_hive_spark.operators.timeseries import theil_sen_slope

    empty = spark.createDataFrame([], "k string, bucket timestamp, cnt long")
    assert theil_sen_slope(empty, ["k"]).count() == 0


def test_wave3_queries_no_cartesian(spark, sf_dir):
    from cascading_hive_spark import queries as Q
    from cascading_hive_spark.plans.explain import assert_no_cartesian

    for name in ("events_rolling_active_users", "events_theilsen_slope"):
        assert_no_cartesian(Q.queries()[name](spark, sf_dir))


def test_argmin_cell_carry_vec_matches_join_formulation(spark):
    """The r16 carry_vec E-step (vector rides the argmin aggregate as
    an any_value) must return exactly the rows the old formulation
    (skinny argmin + join back on _id) produced — same assignments,
    same vectors — including centroid-distance ties (broken to the
    lower cid in both shapes)."""
    from pyspark.sql import functions as F

    from cascading_hive_spark.operators.similarity import (
        argmin_cell,
        cell_distances,
    )

    base = spark.createDataFrame(
        [
            (1, [0.0, 0.0]),
            (2, [1.0, 1.0]),
            (3, [0.5, 0.5]),  # equidistant from both centroids -> cid 0
            (4, [0.9, 1.1]),
        ],
        "  _id long, _v array<double>",
    )
    cents = spark.createDataFrame(
        [(0, 0, 0.0), (0, 1, 0.0), (1, 0, 1.0), (1, 1, 1.0)],
        "cid long, dim int, centroid double",
    )
    carried = argmin_cell(
        cell_distances(base, cents, keep_vec=True), carry_vec=True
    ).select("_id", "_v", "cid")
    joined = base.join(
        argmin_cell(cell_distances(base, cents)), "_id"
    ).select("_id", "_v", "cid")
    c_rows = {r._id: (tuple(r._v), r.cid) for r in carried.collect()}
    j_rows = {r._id: (tuple(r._v), r.cid) for r in joined.collect()}
    assert c_rows == j_rows
    assert c_rows[3][1] == 0  # tie broke to the lower cid
