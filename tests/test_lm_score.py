"""Bigram-LM perplexity vs a python brute replay (add-k smoothing,
self-scored and reference-scored), short/empty-doc exclusion."""

import math

import pytest

from tric_spark.operators.lm_score import lm_perplexity


def _docs(spark, texts, offset=0):
    return spark.createDataFrame(
        [(i + offset, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _brute(texts, train_texts=None, k=0.5):
    train = texts if train_texts is None else train_texts

    def bigrams(t):
        toks = [x for x in (t or "").split(" ") if x]
        return list(zip(toks, toks[1:]))

    cvw, cv, vocab = {}, {}, set()
    for t in train:
        for x in [w for w in (t or "").split(" ") if w]:
            vocab.add(x)
        for v, w in bigrams(t):
            cvw[(v, w)] = cvw.get((v, w), 0) + 1
            cv[v] = cv.get(v, 0) + 1
    V = len(vocab)
    out = {}
    for i, t in enumerate(texts):
        bgs = bigrams(t)
        if not bgs:
            continue
        nlls = [
            -math.log((cvw.get(bg, 0) + k) / (cv.get(bg[0], 0) + k * V))
            for bg in bgs
        ]
        avg = sum(nlls) / len(nlls)
        out[i] = (len(bgs), round(avg, 6), round(math.exp(avg), 6))
    return out


TEXTS = [
    "the cat sat on the mat and the cat ran",
    "the dog sat on the mat",
    "zx qv zx qv plort",
    "the",
    "",
    "the cat sat on the mat and the dog sat on the mat again",
]


def test_self_scored_matches_brute(spark):
    got = {
        r.doc_id: (r.n_bigrams, r.avg_nll, r.ppl)
        for r in lm_perplexity(_docs(spark, TEXTS)).collect()
    }
    assert got == _brute(TEXTS)


def test_gibberish_scores_higher_than_fluent(spark):
    got = {r.doc_id: r.ppl for r in lm_perplexity(_docs(spark, TEXTS)).collect()}
    assert got[2] > got[1]  # rare transitions beat common ones
    assert got[2] > got[0]


def test_short_and_empty_docs_absent(spark):
    got = {r.doc_id for r in lm_perplexity(_docs(spark, TEXTS)).collect()}
    assert 3 not in got and 4 not in got  # 1 token / empty: no bigrams


def test_reference_corpus_scoring(spark):
    ref = ["the cat sat on the mat", "the dog ran home to the house"]
    score = ["the cat ran home", "purple monkey dishwasher"]
    got = {
        r.doc_id: (r.n_bigrams, r.avg_nll, r.ppl)
        for r in lm_perplexity(
            _docs(spark, score), train_docs=_docs(spark, ref, offset=100)
        ).collect()
    }
    assert got == _brute(score, train_texts=ref)
    assert got[1][2] > got[0][2]  # fully-unseen text gets the smoothed floor


def test_add_k_knob(spark):
    a = {
        r.doc_id: r.ppl
        for r in lm_perplexity(_docs(spark, TEXTS), add_k=0.1).collect()
    }
    assert a == {i: v[2] for i, v in _brute(TEXTS, k=0.1).items()}


# --- PMI collocations ---------------------------------------------------------

from tric_spark.operators.lm_score import collocations_topk  # noqa: E402


def _pmi_brute(texts, k, min_count):
    cvw, c1 = {}, {}
    bt = tt = 0
    for t in texts:
        toks = [x for x in (t or "").split(" ") if x]
        tt += len(toks)
        for x in toks:
            c1[x] = c1.get(x, 0) + 1
        for bg in zip(toks, toks[1:]):
            bt += 1
            cvw[bg] = cvw.get(bg, 0) + 1
    rows = [
        (v, w, n, round(math.log((n / bt) / ((c1[v] / tt) * (c1[w] / tt))), 6))
        for (v, w), n in cvw.items()
        if n >= min_count
    ]
    rows.sort(key=lambda r: (-r[3], r[0], r[1]))
    return [(v, w, n, p, i + 1) for i, (v, w, n, p) in enumerate(rows[:k])]


def test_collocations_vs_brute(spark):
    texts = [
        "new york is big and new york is loud",
        "the new york subway runs all night",
        "a b a b a b a b",
        "new york again and again and again",
    ]
    got = sorted(
        (r.v, r.w, r.n_vw, r.pmi, r.rank)
        for r in collocations_topk(_docs(spark, texts), k=5, min_count=2).collect()
    )
    assert got == sorted(_pmi_brute(texts, 5, 2))
    # "new york" is a genuine collocation: always adjacent when present
    top = min(_pmi_brute(texts, 5, 2), key=lambda r: r[4])
    assert (top[0], top[1]) in {("a", "b"), ("b", "a"), ("new", "york")}


def test_collocations_min_count_guard(spark):
    texts = ["x y once only", "p q p q p q"]
    got = [(r.v, r.w) for r in collocations_topk(_docs(spark, texts), k=10, min_count=2).collect()]
    assert ("x", "y") not in got
    assert ("p", "q") in got
