"""Contamination screen: goldens, distinct-gram match counts, the
decontaminate anti-join property, and broadcast-vs-shuffle equivalence."""

from tric_spark.operators.contamination import contaminated_docs, decontaminate


def _df(spark, rows, id_col="doc_id"):
    return spark.createDataFrame(rows, f"{id_col} long, text string")


def test_golden_hits(spark):
    docs = _df(
        spark,
        [
            (1, "the cat sat on the mat"),   # shares "the cat sat" + "cat sat on"
            (2, "dogs bark at night"),        # clean
            (3, "cat sat on a mat"),          # shares "cat sat on"
            (4, "the cat sat the cat sat"),   # repeated hit counts ONCE (distinct)
        ],
    )
    bench = _df(spark, [(100, "the cat sat on grass")], id_col="bench_id")
    got = {
        r.doc_id: r.n_matched_grams
        for r in contaminated_docs(docs, bench, ngram=3).collect()
    }
    # bench 3-grams: {the cat sat, cat sat on, sat on grass}
    assert got == {1: 2, 3: 1, 4: 1}


def test_short_docs_never_match(spark):
    docs = _df(spark, [(1, "the cat"), (2, "")])
    bench = _df(spark, [(9, "the cat sat")], id_col="bench_id")
    assert contaminated_docs(docs, bench, ngram=3).count() == 0


def test_decontaminate_partitions_corpus(spark):
    docs = _df(
        spark,
        [(i, f"doc {i} says the cat sat on mat {i}") for i in range(20)]
        + [(100 + i, f"totally unrelated words here {i}") for i in range(5)],
    )
    bench = _df(spark, [(0, "the cat sat")], id_col="bench_id")
    dirty = {r.doc_id for r in contaminated_docs(docs, bench).select("doc_id").collect()}
    clean = {r.doc_id for r in decontaminate(docs, bench).select("doc_id").collect()}
    assert dirty == set(range(20))
    assert clean == {100 + i for i in range(5)}
    assert dirty | clean == {r.doc_id for r in docs.select("doc_id").collect()}


def test_broadcast_and_shuffle_paths_agree(spark):
    docs = _df(spark, [(i, f"alpha beta gamma {i} delta") for i in range(30)])
    bench = _df(spark, [(0, "alpha beta gamma epsilon")], id_col="bench_id")
    a = sorted(map(tuple, contaminated_docs(docs, bench, broadcast_bench=True).collect()))
    b = sorted(map(tuple, contaminated_docs(docs, bench, broadcast_bench=False).collect()))
    assert a == b and len(a) == 30
