from conftest import edges_df

from tric_spark import graph
from tric_spark.operators.robustness import attack_robustness

# hub-and-spoke: star center 0 over 1..8, plus a 2-path tail 9-10-11
PAIRS = [(0, i) for i in range(1, 9)] + [(0, 9), (9, 10), (10, 11)]


def test_star_shatters_when_hub_removed(spark):
    sym = graph.symmetrize(graph.canonical_edges(edges_df(spark, PAIRS)))
    deg = graph.degrees(sym)
    got = {
        r.frac: r for r in attack_robustness(sym, deg, fractions=(0.0, 0.10)).collect()
    }
    base = got[0.0]
    # f=0: nothing removed, one giant component of all 12
    assert base.n_removed == 0 and base.giant_size == 12 and base.giant_frac == 1.0
    hit = got[0.10]
    # f=0.10 over 12 vertices removes exactly the degree-9 hub
    assert hit.n_removed == 1 and hit.d_threshold < 9
    # remaining giant is the 9-10-11 tail minus nothing = {9,10,11}
    assert hit.giant_size == 3 and hit.n_remaining == 11
    assert hit.giant_frac == round(3 / 11, 6)
