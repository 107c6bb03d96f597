"""Flesch readability vs a hand-computed referee."""

import re

from tric_spark.operators.textstats import readability


def _py_flesch(text):
    words = [w for w in text.split(" ") if w]
    sents = max(1, len(re.findall(r"[.!?]+", text)))
    syl = sum(max(1, len(re.findall(r"[aeiouy]+", w.lower()))) for w in words)
    return (
        len(words),
        sents,
        syl,
        round(206.835 - 1.015 * (len(words) / sents) - 84.6 * (syl / len(words)), 6),
    )


def test_readability_matches_referee(spark):
    texts = [
        "The cat sat on the mat. It was happy!",
        "Incomprehensibility characterizes bureaucratic documentation",
        "a b c",          # consonant-only words -> 1 syllable each
        "no punctuation here at all",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)] + [(99, None)],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_words, r.n_sentences, r.n_syllables, r.flesch)
        for r in readability(df).collect()
    }
    assert set(got) == {0, 1, 2, 3}  # NULL text dropped
    for i, t in enumerate(texts):
        assert got[i] == _py_flesch(t), (i, got[i], _py_flesch(t))
    # simple prose scores far above the sesquipedalian doc
    assert got[0][3] > got[1][3] + 50
