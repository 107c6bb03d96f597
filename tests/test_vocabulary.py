"""Vocabulary top-k: goldens, tie-break order, doc-frequency semantics,
partial-top-k equivalence at any parallelism."""

from collections import Counter

from tric_spark.operators.textstats import vocabulary


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_counts_and_rank_golden(spark):
    df = _docs(spark, ["a b a", "b c b b", "a  c"])  # double space -> '' dropped
    out = {r.token: (r.n_occurrences, r.n_docs, r.rank) for r in
           vocabulary(df, k=10).collect()}
    assert out == {"b": (4, 2, 1), "a": (3, 2, 2), "c": (2, 2, 3)}


def test_k_cutoff_and_tiebreak(spark):
    # all counts equal -> rank is pure lexicographic; k cuts after 2
    df = _docs(spark, ["z y x"])
    got = [(r.token, r.rank) for r in
           vocabulary(df, k=2).orderBy("rank").collect()]
    assert got == [("x", 1), ("y", 2)]


def test_matches_python_brute(spark):
    import random

    rng = random.Random(3)
    vocab = [f"w{i}" for i in range(40)]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 60)))
        for _ in range(200)
    ]
    occ = Counter()
    docs_of = Counter()
    for t in texts:
        toks = [x for x in t.split(" ") if x]
        occ.update(toks)
        docs_of.update(set(toks))
    order = sorted(occ.items(), key=lambda kv: (-kv[1], kv[0]))[:25]
    want = {
        tok: (c, docs_of[tok], i + 1) for i, (tok, c) in enumerate(order)
    }
    got = {r.token: (r.n_occurrences, r.n_docs, r.rank) for r in
           vocabulary(_docs(spark, texts), k=25).collect()}
    assert got == want


def test_parallelism_invariant(spark):
    texts = [f"t{i % 7} t{i % 3} shared" for i in range(100)]
    df = _docs(spark, texts)
    a = sorted(map(tuple, vocabulary(df, k=5).collect()))
    b = sorted(map(tuple, vocabulary(df.repartition(13), k=5).collect()))
    assert a == b


# --- host distribution ---------------------------------------------------------

def test_host_distribution_matches_python(spark):
    import math

    from tric_spark.operators.textstats import host_distribution

    hosts = ["a"] * 6 + ["b"] * 3 + ["c"] * 1 + [None] * 2
    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(hosts)], "doc_id long, source string"
    )
    r = host_distribution(df).collect()[0]
    counts = {"a": 6, "b": 3, "c": 1, "": 2}
    n = 12
    ps = [c / n for c in counts.values()]
    assert r.n_hosts == 4 and r.n_docs == n
    assert r.entropy == round(-sum(p * math.log(p) for p in ps), 6)
    assert r.hhi == round(sum(p * p for p in ps), 6)
    assert r.top1_share == 0.5


def test_host_distribution_uniform_vs_concentrated(spark):
    from tric_spark.operators.textstats import host_distribution

    uni = spark.createDataFrame(
        [(i, f"h{i % 10}") for i in range(100)], "doc_id long, source string"
    )
    conc = spark.createDataFrame(
        [(i, "mega" if i < 91 else f"h{i}") for i in range(100)],
        "doc_id long, source string",
    )
    u = host_distribution(uni).collect()[0]
    c = host_distribution(conc).collect()[0]
    assert u.entropy > c.entropy and u.hhi < c.hhi
    assert c.top1_share == 0.91
