"""lexical_diversity, daily_retention, textrank_keywords vs replicas."""

import math
from collections import Counter, defaultdict
from datetime import datetime

from tric_spark.operators.anomaly import daily_retention
from tric_spark.operators.textrank import textrank_keywords, word_graph
from tric_spark.operators.textstats import lexical_diversity

DOCS = [
    (0, "spark rank spark rank spark graph"),
    (1, "graph rank walk walk"),
    (2, "a a a a"),
    (3, ""),
    (4, None),
]


def _docs_df(spark, rows=DOCS):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_lexical_diversity_matches_replica(spark):
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_types"], r["ttr"], r["entropy"])
        for r in lexical_diversity(_docs_df(spark)).collect()
    }
    assert set(got) == {0, 1, 2}  # empty + NULL -> no row
    for i, text in DOCS[:3]:
        c = Counter(t for t in text.split(" ") if t)
        n = sum(c.values())
        h = math.log(n) - sum(v * math.log(v) for v in c.values()) / n
        nt, ty, ttr, ent = got[i]
        assert (nt, ty) == (n, len(c))
        assert abs(ttr - len(c) / n) < 1e-12
        assert abs(ent - h) < 1e-9
    assert got[2][3] == 0.0  # all-identical tokens: zero entropy


def test_daily_retention(spark):
    rows = [
        (datetime(2026, 1, 1, 5), 1),
        (datetime(2026, 1, 1, 6), 1),  # dup within day collapses
        (datetime(2026, 1, 1, 7), 2),
        (datetime(2026, 1, 2, 1), 1),
        (datetime(2026, 1, 2, 2), 3),
        (datetime(2026, 1, 4, 9), 1),  # gap day: nothing retained
    ]
    ev = spark.createDataFrame(rows, "ts timestamp, user_id long")
    got = {
        r["day"]: (r["n_active"], r["n_retained"], r["retention"])
        for r in daily_retention(ev).collect()
    }
    assert got == {
        "2026-01-01": (2, 0, 0.0),
        "2026-01-02": (2, 1, 0.5),
        "2026-01-04": (1, 0, 0.0),
    }


def _textrank_replica(rows, iters=2, d=0.85):
    wedges = Counter()
    for _, text in rows:
        if text is None:
            continue
        toks = [t for t in text.split(" ") if t]
        for v, w in zip(toks, toks[1:]):
            if v != w:
                wedges[(min(v, w), max(v, w))] += 1
    adj = defaultdict(dict)
    for (v, w), c in wedges.items():
        adj[v][w] = float(c)
        adj[w][v] = float(c)
    n = len(adj)
    r = {v: 1.0 / n for v in adj}
    for _ in range(iters):
        nxt = {}
        for v in adj:
            s = sum(
                adj[u][v] * r[u] / sum(adj[u].values()) for u in adj[v]
            )
            nxt[v] = 0.15 / n + d * s
        r = nxt
    return {v: round(x, 6) for v, x in r.items()}


def test_word_graph_and_textrank(spark):
    df = _docs_df(spark)
    wg = {
        (r["src"], r["dst"]): r["weight"] for r in word_graph(df).collect()
    }
    # "spark rank" adjacency occurs 4x in doc 0 (both directions canonical)
    assert wg[("rank", "spark")] == 4.0
    assert ("a", "a") not in wg  # self-pairs dropped
    want = _textrank_replica(DOCS)
    got = {
        r["word"]: r["rank"]
        for r in textrank_keywords(df, iters=2, k=10).collect()
    }
    assert set(got) == set(want)  # vocab is < k here
    assert all(abs(got[w] - want[w]) < 2e-6 for w in got)
    top = max(want, key=lambda w: (want[w], w))
    assert max(got, key=lambda w: (got[w], w)) == top
