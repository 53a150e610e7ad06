"""Learned quality classifier (VERDICT r12 #1): fastText-style hashed
char-n-gram logistic filter — fit determinism / frozen-weight
provenance, scoring accuracy, map-only plan shape, and a pure-Python
differential for the portable bucket hash + margin arithmetic.

Reference parity note: the reference has no learned text ops (its
only text op is the wordcount regex split, ORCFileTest.java:249-251);
this family is north-star LLM-pipeline surface per the build brief.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    from cascading_hive_spark.tables import load_table

    return load_table(spark, sf_dir, "documents").cache()


def _weak_label(col):
    # the frozen-weights training label: function-word rate > 0.06
    toks = F.split(col, " ")
    fw = F.size(F.filter(toks, lambda w: w.isin("the", "a"))).cast(
        "double"
    ) / F.size(toks).cast("double")
    return (fw > 0.06).cast("int")


def test_frozen_weights_reproduce_from_fit(spark, docs):
    """_QC_WEIGHTS_V1 provenance: refitting with the documented params
    on the documented data reproduces the frozen constants bit-for-bit
    (fixed-order IRLS over exact integer counts)."""
    from cascading_hive_spark.operators.text import quality_classifier_fit
    from cascading_hive_spark.queries import _QC_BIAS_V1, _QC_WEIGHTS_V1

    labeled = docs.withColumn("y", _weak_label(F.col("text")))
    w, b = quality_classifier_fit(
        labeled, "doc_id", "text", "y", n_buckets=128, n=3, iters=8,
        ridge=1e-3, seed="qc13|", method="collect",
    )
    assert b == _QC_BIAS_V1
    assert w == _QC_WEIGHTS_V1


def test_score_accuracy_on_training_label(spark, docs):
    from cascading_hive_spark.operators.text import quality_classifier_score
    from cascading_hive_spark.queries import _QC_BIAS_V1, _QC_WEIGHTS_V1

    labeled = docs.withColumn("y", _weak_label(F.col("text")))
    scored = quality_classifier_score(
        docs, "doc_id", "text", _QC_WEIGHTS_V1, _QC_BIAS_V1
    )
    acc = (
        scored.join(labeled.select("doc_id", "y"), "doc_id")
        .agg(F.avg((F.col("quality_pass") == (F.col("y") == 1)).cast("double")))
        .collect()[0][0]
    )
    assert acc >= 0.88, acc  # measured 0.906 at freeze time


def test_fit_generalizes_to_held_out_half(spark, docs):
    """Learning, not memorizing: fit on even doc_ids, score odd ones —
    must beat the majority-class rate (0.56 positive at sf0.001) by a
    clear margin."""
    from cascading_hive_spark.operators.text import (
        quality_classifier_fit,
        quality_classifier_score,
    )

    labeled = docs.withColumn("y", _weak_label(F.col("text")))
    train = labeled.filter(F.col("doc_id") % 2 == 0)
    test = labeled.filter(F.col("doc_id") % 2 == 1)
    w, b = quality_classifier_fit(train, "doc_id", "text", "y")
    scored = quality_classifier_score(test, "doc_id", "text", w, b)
    acc = (
        scored.join(test.select("doc_id", "y"), "doc_id")
        .agg(F.avg((F.col("quality_pass") == (F.col("y") == 1)).cast("double")))
        .collect()[0][0]
    )
    assert acc >= 0.70, acc


def test_scoring_plan_is_map_only(spark, docs):
    """The weight table is a plan literal: scoring must be a single
    narrow scan — no key (hash-partitioned) shuffle, no join, no
    Python UDF. The one allowed Exchange is spread()'s round-robin
    scan widening (no-op at real input widths)."""
    from cascading_hive_spark.operators.text import quality_classifier_score
    from cascading_hive_spark.queries import _QC_BIAS_V1, _QC_WEIGHTS_V1

    scored = quality_classifier_score(
        docs, "doc_id", "text", _QC_WEIGHTS_V1, _QC_BIAS_V1
    )
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Join" not in plan, plan
    assert "Python" not in plan, plan  # no UDF in the scoring path


def test_null_and_empty_text_score_total(spark):
    from cascading_hive_spark.operators.text import quality_classifier_score
    from cascading_hive_spark.queries import _QC_BIAS_V1, _QC_WEIGHTS_V1

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "ab")], "id BIGINT, text STRING"
    )
    rows = {
        r.id: r
        for r in quality_classifier_score(
            df, "id", "text", _QC_WEIGHTS_V1, _QC_BIAS_V1
        ).collect()
    }
    assert set(rows) == {1, 2, 3}
    # NULL featurizes like '' — one (empty-)gram bucket, same margin
    assert rows[1].n_grams == 1 and rows[2].n_grams == 1
    assert rows[1].margin == rows[2].margin
    assert all(r.margin is not None for r in rows.values())


def test_margin_matches_pure_python(spark, docs):
    """Differential oracle for the whole scoring path: portable md5
    bucket hash + decimal-exact dot + IEEE margin, recomputed in
    plain Python on a 40-doc sample."""
    from cascading_hive_spark.operators.text import quality_classifier_score
    from cascading_hive_spark.queries import _QC_BIAS_V1, _QC_WEIGHTS_V1

    sample = docs.filter(F.col("doc_id") < 40)
    got = {
        r.doc_id: r
        for r in quality_classifier_score(
            sample, "doc_id", "text", _QC_WEIGHTS_V1, _QC_BIAS_V1
        ).collect()
    }
    for did, text in sample.select("doc_id", "text").collect():
        t = text or ""
        n_grams = max(len(t) - 2, 1)
        dot = 0
        for i in range(n_grams):
            g = t[i : i + 3]
            b = int(hashlib.md5(("qc13|" + g).encode()).hexdigest()[:8], 16) % 128
            dot += round(_QC_WEIGHTS_V1[b] * 1_000_000)
        margin = (dot / 1_000_000) / n_grams + _QC_BIAS_V1
        assert got[did].n_grams == n_grams
        assert got[did].margin == round(margin, 6) + 0.0, did
        assert got[did].quality_pass == (margin > 0), did


def test_xxhash_scale_path_learns_too(spark, docs):
    """portable=False (xxhash64 buckets — the cheap scale featurizer):
    fit+score through the same flag must reach the same accuracy
    ballpark as the md5 path (weight tables are featurizer-tied)."""
    from cascading_hive_spark.operators.text import (
        quality_classifier_fit,
        quality_classifier_score,
    )

    labeled = docs.withColumn("y", _weak_label(F.col("text")))
    w, b = quality_classifier_fit(
        labeled, "doc_id", "text", "y", portable=False
    )
    scored = quality_classifier_score(
        docs, "doc_id", "text", w, b, portable=False
    )
    acc = (
        scored.join(labeled.select("doc_id", "y"), "doc_id")
        .agg(F.avg((F.col("quality_pass") == (F.col("y") == 1)).cast("double")))
        .collect()[0][0]
    )
    assert acc >= 0.85, acc


def test_fit_bounds_training_collect(spark, docs):
    from cascading_hive_spark.operators.text import quality_classifier_fit

    labeled = docs.withColumn("y", _weak_label(F.col("text")))
    with pytest.raises(ValueError, match="max_train_rows"):
        quality_classifier_fit(
            labeled, "doc_id", "text", "y", max_train_rows=10,
            method="collect",
        )
    with pytest.raises(ValueError, match="non-empty"):
        quality_classifier_fit(
            labeled.filter(F.lit(False)), "doc_id", "text", "y"
        )


# ---------------------------------------------------------------------------
# learned lang-id (one-vs-rest over the same hashed char-n-gram core)
# ---------------------------------------------------------------------------
def _lang_corpus_split(spark):
    from cascading_hive_spark.operators.text import synth_lang_corpus

    rows = synth_lang_corpus()
    train = [r for r in rows if (r[0] % 200) % 5 != 0]
    test = [r for r in rows if (r[0] % 200) % 5 == 0]
    schema = "doc_id long, text string, lang string"
    return (
        spark.createDataFrame(train, schema),
        spark.createDataFrame(test, schema),
    )


def test_frozen_lid_models_reproduce_from_fit(spark):
    """Provenance of queries._LID_MODELS_V1: refit on the deterministic
    synthetic multilingual train split with the registered params and
    assert bit-equality — the frozen table is a cache of this fit, not
    hand-tuned numbers."""
    from cascading_hive_spark.operators.text import lang_classifier_fit
    from cascading_hive_spark.queries import _LID_MODELS_V1

    train, _ = _lang_corpus_split(spark)
    models = lang_classifier_fit(
        train, "doc_id", "text", "lang", n_buckets=64, n=3, iters=8,
        ridge=1e-3, seed="lid14|", portable=True, method="collect",
    )
    assert set(models) == set(_LID_MODELS_V1)
    for lang, (w, b) in _LID_MODELS_V1.items():
        assert models[lang][0] == w, lang
        assert models[lang][1] == b, lang


def test_lid_models_learn_language_held_out(spark):
    """The machinery actually learns language where signal exists:
    100% accuracy on the held-out fifth of the synthetic corpus (five
    disjoint vocabularies — any honest char-3-gram model separates
    them perfectly; failure means the featurizer/argmax broke)."""
    from cascading_hive_spark.operators.text import lang_id_scores
    from cascading_hive_spark.queries import _LID_MODELS_V1

    _, test = _lang_corpus_split(spark)
    pred = lang_id_scores(test, "doc_id", "text", _LID_MODELS_V1)
    joined = pred.join(test.select("doc_id", "lang"), "doc_id")
    n = joined.count()
    n_ok = joined.filter(F.col("pred_lang") == F.col("lang")).count()
    assert n == 200 and n_ok == n, (n_ok, n)


def test_lang_id_scores_plan_is_map_only(spark):
    """All five models ride one fold: the scoring plan must contain no
    join and no aggregate-shuffle — a single scan projection (plus
    spread's round-robin exchange, which is repartitioning, not a key
    shuffle)."""
    from cascading_hive_spark.operators.text import lang_id_scores
    from cascading_hive_spark.queries import _LID_MODELS_V1

    df = spark.createDataFrame([(1, "der und die"), (2, "the and of")],
                               "doc_id long, text string")
    plan = lang_id_scores(
        df, "doc_id", "text", _LID_MODELS_V1, widen=False
    )._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    assert "Aggregate" not in plan, plan


def test_lang_id_scores_tiebreak_and_guards(spark):
    """Identical models for two languages -> equal margins -> the
    lexicographically smaller language wins; mismatched bucket counts
    and empty model dicts raise."""
    import pytest

    from cascading_hive_spark.operators.text import lang_id_scores

    w = [1.0] * 8
    df = spark.createDataFrame([(1, "abcdef")], "doc_id long, text string")
    out = lang_id_scores(
        df, "doc_id", "text", {"zz": (w, 0.5), "aa": (w, 0.5)}
    ).collect()
    assert out[0].pred_lang == "aa"
    with pytest.raises(ValueError, match="n_buckets"):
        lang_id_scores(df, "doc_id", "text", {"a": (w, 0.0), "b": ([1.0] * 4, 0.0)})
    with pytest.raises(ValueError, match="at least one"):
        lang_id_scores(df, "doc_id", "text", {})


def test_lang_id_null_and_empty_text_total(spark):
    """NULL/empty text must still produce a row with a deterministic
    prediction (featurizes like '' — one empty-gram bucket), never a
    crash or a dropped row."""
    from cascading_hive_spark.operators.text import lang_id_scores
    from cascading_hive_spark.queries import _LID_MODELS_V1

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "und der nicht")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in
           lang_id_scores(df, "doc_id", "text", _LID_MODELS_V1).collect()}
    assert len(got) == 3
    assert got[1].pred_lang == got[2].pred_lang  # NULL == '' convention
    assert got[1].n_grams == 1


# ---------------------------------------------------------------------------
# distributed Gram-matrix IRLS (no driver-collect ceiling)
# ---------------------------------------------------------------------------
def test_fit_distributed_matches_collect_path(spark, docs):
    """quality_classifier_fit_distributed must agree with the collect
    path to float-summation noise (Newton is contracting): same
    decisions everywhere, weights within 1e-4 after the 6-dp round."""
    from cascading_hive_spark.operators.text import (
        quality_classifier_fit,
        quality_classifier_fit_distributed,
        quality_classifier_score,
    )

    labeled = docs.withColumn("y", _weak_label(F.col("text")))
    w1, b1 = quality_classifier_fit(
        labeled, "doc_id", "text", "y", method="collect"
    )
    w2, b2 = quality_classifier_fit_distributed(labeled, "doc_id", "text", "y")
    assert abs(b1 - b2) < 1e-4, (b1, b2)
    assert max(abs(a - b) for a, b in zip(w1, w2)) < 1e-4
    s1 = quality_classifier_score(docs, "doc_id", "text", w1, b1)
    s2 = quality_classifier_score(docs, "doc_id", "text", w2, b2)
    d1 = {r.doc_id: r.quality_pass for r in s1.collect()}
    d2 = {r.doc_id: r.quality_pass for r in s2.collect()}
    assert d1 == d2


def test_fit_distributed_deterministic_and_scales_past_guard(spark, docs):
    """Re-running on the same (cached) partitioning re-derives
    bit-identical weights, and the operator happily trains past the
    collect path's max-train-rows guard — the whole point."""
    from cascading_hive_spark.operators.text import (
        quality_classifier_fit,
        quality_classifier_fit_distributed,
    )

    labeled = docs.withColumn("y", _weak_label(F.col("text")))
    r1 = quality_classifier_fit_distributed(labeled, "doc_id", "text", "y")
    r2 = quality_classifier_fit_distributed(labeled, "doc_id", "text", "y")
    assert r1 == r2
    import pytest

    with pytest.raises(ValueError, match="max_train_rows"):
        quality_classifier_fit(
            labeled, "doc_id", "text", "y", max_train_rows=10,
            method="collect",
        )
    w, b = quality_classifier_fit_distributed(labeled, "doc_id", "text", "y")
    assert len(w) == 128 and isinstance(b, float)


def test_fit_distributed_empty_raises(spark, docs):
    import pytest

    from cascading_hive_spark.operators.text import (
        quality_classifier_fit_distributed,
    )

    labeled = docs.withColumn("y", _weak_label(F.col("text")))
    with pytest.raises(ValueError, match="non-empty"):
        quality_classifier_fit_distributed(
            labeled.filter(F.lit(False)), "doc_id", "text", "y"
        )


def test_public_fit_default_has_no_row_ceiling(spark, docs):
    """r14 VERDICT #5: the PUBLIC fit entry points default to the
    distributed Gram path — an absurdly small max_train_rows must not
    raise (the param only binds the collect provenance leg)."""
    from cascading_hive_spark.operators.text import quality_classifier_fit

    labeled = docs.withColumn("y", _weak_label(F.col("text")))
    w, b = quality_classifier_fit(
        labeled, "doc_id", "text", "y", max_train_rows=1
    )
    assert len(w) == 128 and isinstance(b, float)


def test_lang_fit_distributed_matches_collect_path(spark):
    """lang_classifier_fit_distributed (ALL languages' partials in one
    pass per Newton round) agrees with the collect path to
    float-summation noise, and re-derives bit-identically on a fixed
    partitioning."""
    from cascading_hive_spark.operators.text import (
        lang_classifier_fit,
        lang_classifier_fit_distributed,
    )

    train, _ = _lang_corpus_split(spark)
    collect = lang_classifier_fit(
        train, "doc_id", "text", "lang", n_buckets=64, method="collect"
    )
    dist = lang_classifier_fit_distributed(
        train, "doc_id", "text", "lang", n_buckets=64
    )
    assert set(dist) == set(collect)
    for lang, (w, b) in collect.items():
        assert abs(dist[lang][1] - b) < 1e-4, lang
        assert max(abs(a - c) for a, c in zip(dist[lang][0], w)) < 1e-4, lang
    again = lang_classifier_fit_distributed(
        train, "doc_id", "text", "lang", n_buckets=64
    )
    assert again == dist


def test_fit_method_validation():
    import pytest

    from cascading_hive_spark.operators.text import (
        lang_classifier_fit,
        quality_classifier_fit,
    )

    with pytest.raises(ValueError, match="unknown method"):
        quality_classifier_fit(None, "id", "text", "y", method="magic")
    with pytest.raises(ValueError, match="unknown method"):
        lang_classifier_fit(None, "id", "text", "lang", method="magic")
