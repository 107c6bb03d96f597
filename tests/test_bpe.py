"""BPE merge training vs a pure-Python reference on small fixtures."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from tric_spark.operators.bpe import bpe_train, word_types


def _py_bpe(texts, rounds):
    """Reference weighted word-type BPE (Sennrich et al. 2016)."""
    wt = Counter()
    for t in texts:
        if t is None:
            continue
        for w in t.split(" "):
            if w:
                wt[w] += 1
    syms = {w: [c for c in w if c not in "\n\r"] for w in wt}
    merges = []
    for rnd in range(1, rounds + 1):
        pc = Counter()
        for w, s in syms.items():
            for a, b in zip(s, s[1:]):
                pc[(a, b)] += wt[w]
        if not pc:
            break
        (l, r), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rnd, l, r, l + r, cnt))
        for w, s in syms.items():
            out = []
            for tok in s:
                if out and out[-1] == l and tok == r:
                    out[-1] = l + r
                else:
                    out.append(tok)
            syms[w] = out
    return merges, syms, wt


TEXTS = [
    "the theme of the thesis",
    "banana bandana cabana",
    "aaa abab b the",
    "low lower lowest low low",
    None,
    "",
]


def _docs(spark, texts=TEXTS):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_bpe_matches_python_reference(spark):
    merges, word_syms = bpe_train(_docs(spark), rounds=4)
    got = [tuple(r) for r in merges.orderBy("round").collect()]
    exp_merges, exp_syms, exp_wt = _py_bpe(TEXTS, rounds=4)
    assert got == exp_merges

    got_syms = {
        r["word"]: (r["wc"], list(r["syms"])) for r in word_syms.collect()
    }
    assert got_syms == {w: (exp_wt[w], s) for w, s in exp_syms.items()}


def test_bpe_overlap_semantics(spark):
    # "a a a a" within one word: left-to-right non-overlap -> aa aa
    merges, word_syms = bpe_train(_docs(spark, ["aaaa aaa"]), rounds=1)
    m = merges.collect()[0]
    assert (m["left"], m["right"], m["merged"]) == ("a", "a", "aa")
    # aaaa appears once, aaa once: pairs 3 + 2 = 5
    assert m["pair_count"] == 5
    syms = {r["word"]: list(r["syms"]) for r in word_syms.collect()}
    assert syms == {"aaaa": ["aa", "aa"], "aaa": ["aa", "a"]}


def test_bpe_deterministic_ties(spark):
    # all pairs tie at count 1 -> lexicographically smallest (l, r) wins
    merges, _ = bpe_train(_docs(spark, ["zy ba"]), rounds=1)
    m = merges.collect()[0]
    assert (m["left"], m["right"]) == ("b", "a")


def test_word_types_filters(spark):
    wt = {r["word"]: r["wc"] for r in word_types(_docs(spark)).collect()}
    assert "" not in wt
    assert wt["the"] == 3  # 2 in doc0 + 1 in doc2


def test_bpe_compression(spark):
    from tric_spark.operators.bpe import bpe_compression

    row = bpe_compression(_docs(spark), rounds=4).collect()[0]
    _, exp_syms, exp_wt = _py_bpe(TEXTS, rounds=4)
    before = sum(exp_wt[w] * len([c for c in w if c not in "\n\r"]) for w in exp_wt)
    after = sum(exp_wt[w] * len(s) for w, s in exp_syms.items())
    assert row["n_word_types"] == len(exp_wt)
    assert row["total_words"] == sum(exp_wt.values())
    assert row["total_syms_before"] == before
    assert row["total_syms_after"] == after
    assert abs(row["compression"] - round(after / before, 6)) < 1e-9
    assert row["compression"] < 1.0
