import math

import pytest

from tric_spark.operators import textsearch
from tric_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus(spark):
    docs = load_table(spark, SF, "documents")
    rows = [(r.doc_id, r.text) for r in docs.collect()]
    return docs, {d: t.split() for d, t in rows if t is not None}


def test_inverted_index_and_stats(spark, corpus):
    docs, toks = corpus
    idx = {
        (r.token, r.doc_id): (r.tf, list(r.positions))
        for r in textsearch.inverted_index(docs).collect()
    }
    want = {}
    for d, ts in toks.items():
        for i, t in enumerate(ts, start=1):
            key = (t, d)
            tf, pos = want.get(key, (0, []))
            want[key] = (tf + 1, pos + [i])
    assert idx == want

    stats = {
        r.token: (r.df, r.tf)
        for r in textsearch.postings_stats(docs).collect()
    }
    by_tok = {}
    for (t, d), (tf, _) in want.items():
        df_, tf_ = by_tok.get(t, (set(), 0))
        df_.add(d)
        by_tok[t] = (df_, tf_ + tf)
    assert stats == {t: (len(dfs), tf) for t, (dfs, tf) in by_tok.items()}


def _brute_phrase(toks, phrase):
    out = {}
    n = len(phrase)
    for d, ts in toks.items():
        c = sum(
            1
            for i in range(len(ts) - n + 1)
            if ts[i : i + n] == phrase
        )
        if c:
            out[d] = c
    return out


@pytest.mark.parametrize("length", [2, 3])
def test_phrase_counts(spark, corpus, length):
    docs, toks = corpus
    # pick the most frequent n-gram so matches exist
    from collections import Counter

    grams = Counter()
    for ts in toks.values():
        for i in range(len(ts) - length + 1):
            grams[tuple(ts[i : i + length])] += 1
    phrase = list(grams.most_common(1)[0][0])
    got = {
        r.doc_id: r.n_matches
        for r in textsearch.phrase_counts(docs, phrase).collect()
    }
    assert got == _brute_phrase(toks, phrase)
    assert got  # the chosen phrase matches somewhere


def test_bm25_matches_brute_force(spark, corpus):
    docs, toks = corpus
    terms = ["spark", "query", "fast"]
    k1, b = 1.2, 0.75
    dl = {d: len(ts) for d, ts in toks.items() if ts}
    n = len(dl)
    avgdl = sum(dl.values()) / n
    df = {t: sum(1 for ts in toks.values() if t in ts) for t in terms}
    want = {}
    for d, ts in toks.items():
        s = 0.0
        for t in terms:
            tf = ts.count(t)
            if tf:
                idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
                s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl[d] / avgdl))
        if any(t in ts for t in terms):
            want[d] = round(s, 6)
    got = {
        r.doc_id: r.score
        for r in textsearch.bm25_scores(docs, terms).collect()
    }
    assert got == pytest.approx(want)

    top = textsearch.bm25_topk(docs, terms, k=5).collect()
    ranked = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert [(r.doc_id, r.score, r.rank) for r in top] == [
        (d, s, i + 1) for i, (d, s) in enumerate(ranked)
    ]
    plan = textsearch.bm25_topk(docs, terms, k=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
