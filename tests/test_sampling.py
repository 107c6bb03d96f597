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
