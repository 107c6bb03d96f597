"""TF-IDF top-k terms vs a python brute-force oracle (smoothed sklearn
idf, rounded ranking key, token tie-break)."""

import math


from tric_spark.operators.textstats import tfidf_topk_terms


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _brute(texts, k):
    n = len(texts)
    tf = {}
    df = {}
    for i, t in enumerate(texts):
        toks = [x for x in t.split(" ") if x]
        for tok in toks:
            tf[(i, tok)] = tf.get((i, tok), 0) + 1
        for tok in set(toks):
            df[tok] = df.get(tok, 0) + 1
    out = {}
    for i in range(n):
        scored = [
            (tok, c, df[tok], round(c * (math.log((n + 1) / (df[tok] + 1)) + 1.0), 6))
            for (d, tok), c in tf.items()
            if d == i
        ]
        scored.sort(key=lambda s: (-s[3], s[0]))
        out[i] = scored[:k]
    return out


TEXTS = [
    "the cat sat on the mat",
    "the dog sat on the log the dog barked",
    "cat and dog and fish",
    "quantum flux capacitor the",
    "",
    "the the the the",
]


def test_tfidf_vs_brute(spark):
    got = {}
    for r in tfidf_topk_terms(_docs(spark, TEXTS), k=3).collect():
        got.setdefault(r.doc_id, []).append((r.rnk, r.token, r.tf, r.df, r.tfidf))
    expect = _brute(TEXTS, 3)
    for i, terms in expect.items():
        rows = sorted(got.get(i, []))
        assert [(t, tf, df, s) for _, t, tf, df, s in rows] == terms


def test_tfidf_rare_term_outranks_stopword(spark):
    got = {
        r.doc_id: r.token
        for r in tfidf_topk_terms(_docs(spark, TEXTS), k=1).collect()
    }
    # doc 3: "quantum"/"flux"/"capacitor" are corpus-unique (df=1) — the
    # top term must be one of them, never "the" (df=5)
    assert got[3] in {"quantum", "flux", "capacitor"}
    # tie among the three df=1 tf=1 terms breaks by token asc
    assert got[3] == "capacitor"


def test_tfidf_empty_text_emits_nothing(spark):
    rows = tfidf_topk_terms(_docs(spark, TEXTS), k=3).filter(
        "doc_id = 4"
    ).collect()
    assert rows == []


def test_tfidf_k_bounds_output(spark):
    rows = tfidf_topk_terms(_docs(spark, TEXTS), k=2).collect()
    per = {}
    for r in rows:
        per[r.doc_id] = per.get(r.doc_id, 0) + 1
    assert all(v <= 2 for v in per.values())
