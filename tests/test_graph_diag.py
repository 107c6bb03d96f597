"""gap_encoding_stats, attribute_assortativity, dedup_rate_by,
double_sweep_bound."""

from conftest import edges_df
from fixtures import PATH4, STAR10

from tric_spark import graph
from tric_spark.operators.bfs import double_sweep_bound
from tric_spark.operators.compress import gap_encoding_stats
from tric_spark.operators.dedup import dedup_rate_by
from tric_spark.operators.digraph_stats import attribute_assortativity


def _sym(spark, pairs):
    return graph.symmetrize(graph.canonical_edges(edges_df(spark, pairs)))


def test_gap_encoding_stats(spark):
    e = spark.createDataFrame(
        [(0, 1), (0, 3), (0, 11), (2, 5)], "src long, dst long"
    )
    row = gap_encoding_stats(e).collect()[0]
    # list 0: bitlen(2)+bitlen(2)+bitlen(8) = 2+2+4; list 2: bitlen(6) = 3
    assert (row["n_links"], row["n_lists"], row["total_bits"]) == (4, 2, 11)
    assert abs(row["bits_per_link"] - 2.75) < 1e-12


def test_gap_encoding_prefers_local_ids(spark):
    # same structure, renumbered far apart -> strictly more bits
    near = spark.createDataFrame(
        [(0, i) for i in range(1, 9)], "src long, dst long"
    )
    far = spark.createDataFrame(
        [(0, i * 1000) for i in range(1, 9)], "src long, dst long"
    )
    b_near = gap_encoding_stats(near).collect()[0]["total_bits"]
    b_far = gap_encoding_stats(far).collect()[0]["total_bits"]
    assert b_near < b_far


def test_attribute_assortativity(spark):
    # two same-label triangles joined by one cross edge
    pairs = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    labels = [(i, "a" if i < 3 else "b") for i in range(6)]
    sym = _sym(spark, pairs)
    lab = spark.createDataFrame(labels, "vid long, label string")
    row = attribute_assortativity(sym, lab).collect()[0]
    q = 12 / 14  # 6 of 7 undirected edges intra, both directions
    ex = 2 * (7 / 14) ** 2
    r = (q - ex) / (1 - ex)
    assert abs(row["same_frac"] - round(q, 6)) < 1e-9
    assert abs(row["expected"] - round(ex, 6)) < 1e-9
    assert abs(row["assortativity"] - round(r, 6)) < 1e-9


def test_attribute_assortativity_single_label_null(spark):
    sym = _sym(spark, PATH4)
    lab = spark.createDataFrame(
        [(i, "x") for i in range(4)], "vid long, label string"
    )
    row = attribute_assortativity(sym, lab).collect()[0]
    assert row["same_frac"] == 1.0 and row["expected"] == 1.0
    assert row["assortativity"] is None


def test_dedup_rate_by(spark):
    rows = [
        (0, "dup", "h1"),
        (1, "dup", "h1"),
        (2, "solo", "h1"),
        (3, "dup", "h2"),
        (4, None, "h2"),
        (5, "x", None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        r["key"]: (r["n_docs"], r["n_unique"], r["dup_rate"])
        for r in dedup_rate_by(df).collect()
    }
    assert got == {
        "h1": (3, 2, round(1 / 3, 6)),
        "h2": (1, 1, 0.0),  # NULL text excluded entirely
        "": (1, 1, 0.0),  # NULL source is its own stratum
    }


def test_double_sweep(spark):
    row = double_sweep_bound(_sym(spark, PATH4), start_vid=1).collect()[0]
    # from 1 the farthest is 3 (dist 2); BFS from 3 certifies diameter 3
    assert (row["start_vid"], row["far_vid"], row["diameter_lb"]) == (1, 3, 3)
    row = double_sweep_bound(_sym(spark, STAR10), start_vid=0).collect()[0]
    assert (row["far_vid"], row["diameter_lb"]) == (1, 2)


def test_gini_coefficient_exact(spark):
    """Hand-checked classic cases: perfect equality -> 0; and the
    textbook [1,2,3,4] -> 0.25."""
    from tric_spark.operators.digraph_stats import gini_coefficient

    eq = spark.createDataFrame([(5,)] * 4, "x long")
    assert gini_coefficient(eq, "x").collect()[0].gini == 0.0
    v = spark.createDataFrame([(1,), (2,), (3,), (4,)], "x long")
    r = gini_coefficient(v, "x").collect()[0]
    assert r.gini == 0.25 and r.n == 4 and r.total == 10.0
    # concentration: one holder of everything -> (n-1)/n
    conc = spark.createDataFrame([(0,), (0,), (0,), (12,)], "x long")
    assert gini_coefficient(conc, "x").collect()[0].gini == 0.75


def test_neighbor_degree_curve_star(spark):
    """Star over 3 leaves: center (deg 3) has knn 1; leaves (deg 1)
    have knn 3 — maximally disassortative."""
    from tric_spark.operators.digraph_stats import neighbor_degree_curve

    sym = _sym(spark, [(0, 1), (0, 2), (0, 3)])
    deg = graph.degrees(sym)
    got = {
        r.degree: (r.n_vertices, r.knn)
        for r in neighbor_degree_curve(sym, deg).collect()
    }
    assert got == {3: (1, 1.0), 1: (3, 3.0)}


def test_degree_ccdf(spark):
    from tric_spark.operators.digraph_stats import degree_ccdf

    deg = spark.createDataFrame(
        [(0, 1), (1, 1), (2, 2), (3, 5)], "vid long, degree long"
    )
    got = {r.degree: (r.n_ge, r.ccdf) for r in degree_ccdf(deg).collect()}
    assert got == {5: (1, 0.25), 2: (2, 0.5), 1: (4, 1.0)}
