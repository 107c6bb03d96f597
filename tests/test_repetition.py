"""Repetition metrics: hand-computed goldens, short-doc zeros, the 1.0
cap, and a python brute-force oracle over a random corpus."""

import random
from collections import Counter

import pytest

from tric_spark.operators.repetition import repetition_metrics


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _brute(text, top_n, dup_n):
    toks = text.split(" ")

    def grams(n):
        return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]

    L = max(len(text), 1)
    g = grams(top_n)
    if g:
        c = Counter(g)
        # tie-break: max count, lexicographically smallest gram
        top_cnt = max(c.values())
        gram = min(k for k, v in c.items() if v == top_cnt)
        top = round(top_cnt * len(gram) / L, 6)
    else:
        top = 0.0
    d = Counter(grams(dup_n))
    dup = round(min(1.0, sum(v * len(k) for k, v in d.items() if v >= 2) / L), 6)
    return top, dup


def test_goldens(spark):
    # "a b a b a b": 2-grams = [a b, b a, a b, b a, a b] -> top "a b" x3,
    # len("a b")=3, text len 11 -> 9/11; 3-grams: "a b a" x2, "b a b" x2
    # -> dup mass (2+2)*5 = 20 -> capped 1.0
    out = {
        r.doc_id: (r.top2_frac, r.dup3_frac)
        for r in repetition_metrics(
            _docs(spark, ["a b a b a b", "x y z w", "unique words only here now"])
        ).collect()
    }
    assert out[0] == (pytest.approx(round(9 / 11, 6)), 1.0)
    assert out[1] == (pytest.approx(round(3 / 7, 6)), 0.0)  # all 2-grams unique
    assert out[2][1] == 0.0


def test_short_docs_zero(spark):
    # 1 token: no 2-grams, no 3-grams -> both 0, but the doc still appears
    out = repetition_metrics(_docs(spark, ["word", ""])).collect()
    assert {(r.top2_frac, r.dup3_frac) for r in out} == {(0.0, 0.0)}
    assert len(out) == 2


def test_matches_python_brute(spark):
    rng = random.Random(7)
    vocab = ["the", "cat", "sat", "on", "a", "mat", "dog", "ran"]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 40)))
        for _ in range(120)
    ]
    got = {
        r.doc_id: (r.top2_frac, r.dup3_frac)
        for r in repetition_metrics(_docs(spark, texts)).collect()
    }
    for i, t in enumerate(texts):
        top, dup = _brute(t, 2, 3)
        assert got[i][0] == pytest.approx(top, abs=1e-6), (i, t)
        assert got[i][1] == pytest.approx(dup, abs=1e-6), (i, t)


def test_parallelism_invariant(spark):
    texts = ["b a " * k for k in range(1, 30)]
    df = _docs(spark, texts)
    a = sorted(map(tuple, repetition_metrics(df).collect()))
    b = sorted(map(tuple, repetition_metrics(df.repartition(17)).collect()))
    assert a == b


# --- expression-level twin ----------------------------------------------------

def test_expr_twin_equals_batch_on_corpus(spark):
    """repetition_metrics_expr must reproduce the explode-groupBy plan's
    output EXACTLY — including the top-gram tie rule — on the real corpus."""
    from tric_spark.operators.repetition import (
        repetition_metrics,
        repetition_metrics_expr,
    )
    from tric_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    a = {r.doc_id: (r.top2_frac, r.dup3_frac) for r in repetition_metrics(docs).collect()}
    b = {r.doc_id: (r.top2_frac, r.dup3_frac) for r in repetition_metrics_expr(docs).collect()}
    assert a == b and len(a) == 500


def test_expr_twin_edge_cases(spark):
    from tric_spark.operators.repetition import (
        repetition_metrics,
        repetition_metrics_expr,
    )

    texts = [
        "",            # no grams at all
        "one",         # one token: no bigrams
        "a b",         # exactly one bigram, count 1
        "a b a b a b",  # heavy repetition; ties between 'a b' and 'b a'
        "x y x z x y",  # tie between distinct grams → smallest wins
        "w w w w w w w w",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    a = {r.doc_id: (r.top2_frac, r.dup3_frac) for r in repetition_metrics(docs).collect()}
    b = {r.doc_id: (r.top2_frac, r.dup3_frac) for r in repetition_metrics_expr(docs).collect()}
    assert a == b


def test_expr_twin_has_no_shuffle(spark):
    from tric_spark.operators.repetition import repetition_metrics_expr

    docs = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    plan = repetition_metrics_expr(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
