"""Borůvka minimum spanning forest vs a python Kruskal referee under the
same (weight, src, dst) total order — exact edge-set equality, forest
invariants, disconnected inputs, and the real sf0.001 doc graph."""

from conftest import edges_df
from fixtures import er_graph

from tric_spark.operators.mst import minimum_spanning_forest, mst_total_weight


def _kruskal(wedges):
    """Exact MST under the (w, src, dst) total order."""
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    mst = []
    for w, s, d in sorted((w, s, d) for s, d, w in wedges):
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[rs] = rd
            mst.append((s, d, w))
    return set(mst)


def _weighted(pairs):
    """Canonical (src<dst) edges with deterministic pseudo-random weights."""
    canon = {tuple(sorted(e)) for e in pairs if e[0] != e[1]}
    return [(s, d, (s * 7919 + d * 104729) % 1000 + 1) for s, d in canon]


def _wdf(spark, wedges):
    return spark.createDataFrame(wedges, "src long, dst long, weight long")


def test_mst_matches_kruskal_er(spark):
    wedges = _weighted(er_graph(n=80, p_inv=5, seed=31))
    got = {
        (r.src, r.dst, r.weight)
        for r in minimum_spanning_forest(_wdf(spark, wedges)).collect()
    }
    assert got == _kruskal(wedges)


def test_mst_forest_on_disconnected_graph(spark):
    # two components: a triangle and a square — forest has 2 + 3 edges
    wedges = _weighted(
        [(0, 1), (1, 2), (0, 2), (10, 11), (11, 12), (12, 13), (10, 13)]
    )
    forest = minimum_spanning_forest(_wdf(spark, wedges))
    got = {(r.src, r.dst, r.weight) for r in forest.collect()}
    assert got == _kruskal(wedges)
    assert len(got) == 5
    (t,) = mst_total_weight(forest).collect()
    assert t.n_edges == 5
    assert t.total_weight == sum(w for _, _, w in got)


def test_mst_heavy_ties(spark):
    # constant weights: the (src, dst) tie-break alone must pick a forest
    canon = {tuple(sorted(e)) for e in er_graph(n=50, p_inv=3, seed=8)}
    wedges = [(s, d, 5) for s, d in canon if s != d]
    got = {
        (r.src, r.dst, r.weight)
        for r in minimum_spanning_forest(_wdf(spark, wedges)).collect()
    }
    assert got == _kruskal(wedges)


def test_mst_parallelism_invariant(spark):
    wedges = _weighted(er_graph(n=60, p_inv=4, seed=44))
    a = {
        (r.src, r.dst)
        for r in minimum_spanning_forest(_wdf(spark, wedges)).collect()
    }
    b = {
        (r.src, r.dst)
        for r in minimum_spanning_forest(
            _wdf(spark, wedges).repartition(13)
        ).collect()
    }
    assert a == b


def test_mst_on_sf0001_doc_graph(spark):
    """The driver-shaped input: canonical doc edges with the (src+dst)%7+1
    weights the driver query uses, refereed by Kruskal."""
    from pyspark.sql import functions as F

    from tric_spark.sources.doc_graph import doc_edges

    canon = doc_edges(spark, "/root/testdata/sf0.001")
    we = canon.select(
        "src", "dst", ((F.col("src") + F.col("dst")) % 7 + 1).alias("weight")
    )
    wedges = [(r.src, r.dst, r.weight) for r in we.collect()]
    got = {
        (r.src, r.dst, r.weight)
        for r in minimum_spanning_forest(we).collect()
    }
    assert got == _kruskal(wedges) and got


def test_mst_stats_stay_bounded_on_long_chain(spark):
    """Regression for the localCheckpoint origin-stats bomb (see
    plans/lineage.py): self-joining supersteps square the sizeInBytes
    estimate unless the checkpoint cuts stats too. A path graph with
    monotone weights maximizes chain length (every component picks its
    left edge), forcing many doubling steps; the result's estimate must
    stay near the constant default, not an exponential BigInt."""
    from tric_spark.plans.lineage import stats_size_bits

    wedges = [(i, i + 1, i + 1) for i in range(100)]  # sorted-weight path
    forest = minimum_spanning_forest(_wdf(spark, wedges))
    got = {(r.src, r.dst, r.weight) for r in forest.collect()}
    assert got == _kruskal(wedges)
    assert stats_size_bits(forest) < 256


def test_single_linkage_matches_filtered_cc(spark):
    from tric_spark.operators.mst import single_linkage_clusters

    wedges = _weighted(er_graph(n=70, p_inv=4, seed=12))
    tau = 500
    # union-find referee over the tau-filtered ORIGINAL graph
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    verts = {v for s, d, _ in wedges for v in (s, d)}
    for s, d, w in wedges:
        if w <= tau:
            rs, rd = find(s), find(d)
            if rs != rd:
                parent[rs] = rd
    want = {}
    for v in verts:
        want.setdefault(find(v), []).append(v)
    want = {v: min(members) for members in want.values() for v in members}
    got = {
        r.vid: r.cluster
        for r in single_linkage_clusters(_wdf(spark, wedges), tau).collect()
    }
    assert got == want
