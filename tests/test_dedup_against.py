"""dedup_against: daily-ingest screening of a batch vs an existing corpus."""

from __future__ import annotations

from tric_spark.operators.dedup import dedup_against

BASE = "the quick brown fox jumps over the lazy dog near the old stone bridge"

CORPUS = [
    (0, BASE),
    (1, "completely different words about spark and engines and graphs"),
    (2, "a third corpus document with its own unique vocabulary entirely"),
    (3, None),
]

NEW = [
    (10, BASE),  # exact dup of 0
    (11, BASE + " tonight"),  # near dup of 0
    (12, "nothing in common with anything stored before this moment"),
    (13, None),  # NULL text: screened out entirely
]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dedup_against_verdicts(spark):
    out = {
        r["doc_id"]: r
        for r in dedup_against(_df(spark, CORPUS), _df(spark, NEW)).collect()
    }
    assert set(out) == {10, 11, 12}  # NULL-text new doc dropped
    assert out[10]["verdict"] == "exact" and out[10]["exact_dup"]
    assert out[11]["verdict"] == "near" and not out[11]["exact_dup"]
    assert out[11]["n_near_candidates"] >= 1
    assert out[12]["verdict"] == "unique"
    assert out[12]["n_near_candidates"] == 0


def test_dedup_against_probes_corpus_only(spark):
    # two identical NEW docs that do not exist in the corpus must NOT flag
    # each other (the probe is batch x corpus, never batch x batch)
    new = [(20, "fresh identical text never seen before in the corpus x y z"),
           (21, "fresh identical text never seen before in the corpus x y z")]
    out = {
        r["doc_id"]: r["verdict"]
        for r in dedup_against(_df(spark, CORPUS), _df(spark, new)).collect()
    }
    assert out == {20: "unique", 21: "unique"}


def test_dedup_against_cap_guard(spark):
    # cap=0 removes every corpus band cell -> no near candidates, exact
    # membership still works
    out = {
        r["doc_id"]: r
        for r in dedup_against(
            _df(spark, CORPUS), _df(spark, NEW), max_bucket=0
        ).collect()
    }
    assert out[10]["verdict"] == "exact"
    assert out[11]["verdict"] == "unique"
