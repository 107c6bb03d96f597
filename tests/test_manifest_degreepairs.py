"""curation_manifest + degree_pair_histogram."""

from conftest import edges_df

from tric_spark import graph
from tric_spark.operators.digraph_stats import degree_pair_histogram
from tric_spark.pipeline import curation_manifest


def test_curation_manifest(spark):
    long_ok = " ".join(["token"] * 40)       # 40 tokens, mwl 5 -> kept
    short = "too short"                       # fails min_tokens
    docs = spark.createDataFrame(
        [
            (0, long_ok, "en"),
            (1, long_ok, "en"),               # exact dup of 0 -> one rep
            (2, short, "en"),
            (3, long_ok, "fr"),
            (4, None, "fr"),                  # NULL text excluded
        ],
        "doc_id long, text string, lang string",
    )
    got = {
        r.lang: (r.n_docs, r.n_unique, r.n_kept, r.kept_tokens)
        for r in curation_manifest(docs).collect()
    }
    assert got["en"] == (3, 2, 1, 40)
    assert got["fr"] == (1, 1, 1, 40)


def test_degree_pair_histogram(spark):
    # star: center degree 3 (bucket 1), leaves degree 1 (bucket 0)
    sym = graph.symmetrize(
        graph.canonical_edges(edges_df(spark, [(0, 1), (0, 2), (0, 3)]))
    )
    deg = graph.degrees(sym)
    got = {
        (r.bucket_src, r.bucket_dst): r.n_edges
        for r in degree_pair_histogram(sym, deg).collect()
    }
    assert got == {(1, 0): 3, (0, 1): 3}
