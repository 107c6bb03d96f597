from pyspark.sql import functions as F

from tric_spark.operators import dedup
from tric_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _docs_with_dups(spark):
    docs = load_table(spark, SF, "documents").limit(100)
    clones = docs.filter(F.col("doc_id") < 5).withColumn(
        "doc_id", F.col("doc_id") + 10_000
    )
    return docs.union(clones)


def test_exact_duplicates_and_dedup(spark):
    docs = _docs_with_dups(spark)
    groups = dedup.exact_duplicates(docs).collect()
    assert len(groups) == 5
    assert all(g.n_dups == 2 and g.min_doc_id < 5 for g in groups)
    kept = dedup.dedup_exact(docs)
    assert kept.count() == 100
    assert kept.filter(F.col("doc_id") >= 10_000).count() == 0


def test_minhash_identical_docs_always_candidates(spark):
    docs = _docs_with_dups(spark)
    pairs = {(r.a, r.b) for r in dedup.lsh_candidate_pairs(docs).collect()}
    for i in range(5):
        assert (i, i + 10_000) in pairs  # identical text → identical bands


def test_ngram_jaccard_identical_is_one(spark):
    docs = _docs_with_dups(spark)
    jac = {
        (r.a, r.b): r.jaccard for r in dedup.ngram_jaccard_pairs(docs).collect()
    }
    for i in range(5):
        assert jac[(i, i + 10_000)] == 1.0


def test_simhash_candidates_include_exact_dups(spark):
    docs = _docs_with_dups(spark)
    pairs = {(r.a, r.b) for r in dedup.simhash_candidates(docs, bits=16, bands=4).collect()}
    for i in range(5):
        assert (i, i + 10_000) in pairs
    # banding prunes: candidates well below all C(105,2) pairs
    assert len(pairs) < 105 * 104 / 2


def test_lsh_is_selective_at_sf001(spark):
    """VERDICT r1 #1: the banded groupBy only earns its keep if the verify
    stage sees a sliver of the pair space. At sf0.01 (500 docs) the shingled
    k=16/4-row-band scheme must emit < 5% of all C(500,2) pairs."""
    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    n = docs.count()
    n_cand = dedup.lsh_candidate_pairs(docs).count()
    assert n_cand < 0.05 * n * (n - 1) / 2, n_cand
    n_sim = dedup.simhash_candidates(docs).count()
    assert n_sim < 0.05 * n * (n - 1) / 2, n_sim


def test_mega_hub_graph_tc_fast(spark):
    """A 20k-leaf star + one triangle: degree orientation keeps the hub's
    out-degree at 0, so the wedge space stays tiny (the hub-blowup guard)."""
    from tric_spark import graph
    from tric_spark.operators import tc

    hub_edges = spark.range(1, 20_001).select(
        F.lit(0).alias("src"), (F.col("id") + 100).alias("dst")
    )
    tri = spark.createDataFrame([(101, 102), (102, 103), (101, 103)], "src long, dst long")
    canon = graph.canonical_edges(hub_edges.union(tri))
    deg = graph.degrees(graph.symmetrize(canon))
    ori = graph.orient_by_degree(canon, deg)
    # 1 leaf triangle + 3 triangles through the hub (hub links all 3 leaves)
    assert tc.triangle_count_adj(ori) == 4
    # hub (vid 0) has no out-edges after degree orientation
    hub_out = ori.filter(F.col("src") == 0).count()
    assert hub_out == 0
