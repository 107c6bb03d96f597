"""Deterministic sampling: md5 replay, realized-rate envelope,
any-parallelism stability, stratified composition."""

import hashlib

from tric_spark.operators.sampling import (
    RESOLUTION,
    deterministic_sample,
    stratified_sample,
)


def _bucket(key, seed=42):
    h = hashlib.md5(f"smp:{seed}:{key}".encode()).hexdigest()
    return int(h[:12], 16) % RESOLUTION


def _docs(spark, n=4000):
    return spark.range(n).selectExpr(
        "id AS doc_id",
        "element_at(array('en','en','de','fr'), cast(id % 4 + 1 AS int)) AS lang",
    )


def test_matches_python_md5(spark):
    df = _docs(spark, 500)
    kept = {r.doc_id for r in deterministic_sample(df, 0.3, "doc_id").collect()}
    expect = {k for k in range(500) if _bucket(k) < int(0.3 * RESOLUTION)}
    assert kept == expect


def test_realized_rate(spark):
    df = _docs(spark, 20000)
    kept = deterministic_sample(df, 0.5, "doc_id").count()
    assert abs(kept / 20000 - 0.5) < 0.02


def test_parallelism_invariant(spark):
    df = _docs(spark, 2000)
    a = {r.doc_id for r in deterministic_sample(df, 0.25, "doc_id").collect()}
    b = {
        r.doc_id
        for r in deterministic_sample(df.repartition(23), 0.25, "doc_id").collect()
    }
    assert a == b


def test_stratified_rates_and_default(spark):
    df = _docs(spark, 8000)  # en 50%, de 25%, fr 25% of rows
    out = stratified_sample(
        df, {"en": 0.1, "de": 1.0}, strata_col="lang", key_col="doc_id"
    )
    by_lang = {r["lang"]: r["n"] for r in out.groupBy("lang").count().withColumnRenamed("count", "n").collect()}
    assert by_lang.get("fr") is None           # default_rate=0 drops the stratum
    assert by_lang["de"] == 2000               # rate 1.0 keeps everything
    assert abs(by_lang["en"] / 4000 - 0.1) < 0.03


def test_stratified_composes_with_flat(spark):
    """Within a stratum, stratified at rate r keeps EXACTLY the flat-rate-r
    rows (shared hash bucket — repeated sampling composes)."""
    df = _docs(spark, 3000)
    strat = stratified_sample(
        df, {"en": 0.2}, strata_col="lang", key_col="doc_id"
    )
    flat = deterministic_sample(df.filter("lang = 'en'"), 0.2, "doc_id")
    assert {r.doc_id for r in strat.collect()} == {r.doc_id for r in flat.collect()}


def test_keys_live_or_die_together(spark):
    df = _docs(spark, 1000).selectExpr("doc_id % 100 AS user_id", "doc_id", "lang")
    kept = deterministic_sample(df, 0.4, "user_id")
    users = {r.user_id for r in kept.collect()}
    # every row of a kept user survives: count per kept user == 10
    counts = {r.user_id: r["count"] for r in kept.groupBy("user_id").count().collect()}
    assert all(c == 10 for c in counts.values())
    assert users == {u for u in range(100) if _bucket(u) < int(0.4 * RESOLUTION)}


# --- Efraimidis–Spirakis weighted sampling ---------------------------------

from tric_spark.operators.sampling import (  # noqa: E402
    weighted_sample,
    weighted_sample_stratified,
)


def _es_key_py(w, key, seed=42):
    u = (_bucket(key, seed) + 0.5) / RESOLUTION
    return round(u ** (1.0 / w), 6)


def _wdocs(spark, n=300):
    # weight = 1 + doc_id % 7 (strictly positive, varied)
    return spark.range(n).selectExpr(
        "id AS doc_id",
        "cast(1 + id % 7 AS double) AS w",
        "element_at(array('en','de','fr'), cast(id % 3 + 1 AS int)) AS lang",
    )


def test_weighted_sample_matches_python_replay(spark):
    df = _wdocs(spark, 300)
    got = [r.doc_id for r in weighted_sample(df, 25, "w", "doc_id").collect()]
    ranked = sorted(
        range(300), key=lambda i: (-_es_key_py(1 + i % 7, i), i)
    )[:25]
    assert sorted(got) == sorted(ranked)


def test_weighted_sample_parallelism_invariant(spark):
    df = _wdocs(spark, 500)
    a = {r.doc_id for r in weighted_sample(df, 40, "w", "doc_id").collect()}
    b = {
        r.doc_id
        for r in weighted_sample(df.repartition(17), 40, "w", "doc_id").collect()
    }
    assert a == b


def test_weighted_sample_inclusion_tracks_weight(spark):
    """Across 60 seeds, k=1 of {w=10, w=1}: the heavy item must win the
    great majority (its true inclusion probability is 10/11 ≈ 0.91).
    Deterministic — the seed set is fixed."""
    df = spark.createDataFrame(
        [(0, 10.0), (1, 1.0)], "doc_id long, w double"
    )
    wins = sum(
        weighted_sample(df, 1, "w", "doc_id", seed=s).collect()[0].doc_id == 0
        for s in range(60)
    )
    assert wins >= 42  # ≥70%; expected ~55/60


def test_weighted_sample_drops_null_and_nonpositive(spark):
    df = spark.createDataFrame(
        [(0, 5.0), (1, 0.0), (2, -3.0), (3, None), (4, 2.0)],
        "doc_id long, w double",
    )
    got = {r.doc_id for r in weighted_sample(df, 10, "w", "doc_id").collect()}
    assert got == {0, 4}


def test_weighted_stratified_is_flat_rank_within_stratum(spark):
    df = _wdocs(spark, 300)
    out = weighted_sample_stratified(df, 5, "w", "doc_id", "lang").collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r.doc_id)
    assert all(len(v) == 5 for v in by_lang.values())
    langs = ["en", "de", "fr"]
    for lang in langs:
        members = [i for i in range(300) if langs[i % 3] == lang]
        ranked = sorted(
            members, key=lambda i: (-_es_key_py(1 + i % 7, i), i)
        )[:5]
        assert sorted(by_lang[lang]) == sorted(ranked)
