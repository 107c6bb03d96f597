"""SimRank (simrank.py) vs a dense pure-python replica."""

from collections import defaultdict

from tric_spark.operators.simrank import simrank


def _replica(edges, vids, iters=2, c=0.8):
    inn = defaultdict(set)
    for u, v in set(edges):
        inn[v].add(u)
    s = {(v, v): 1.0 for v in vids}
    for _ in range(iters):
        nxt = {(v, v): 1.0 for v in vids}
        for a in vids:
            for b in vids:
                if a == b or not inn[a] or not inn[b]:
                    continue
                t = sum(s.get((i, j), 0.0) for i in inn[a] for j in inn[b])
                if t:
                    nxt[(a, b)] = c * t / (len(inn[a]) * len(inn[b]))
        s = nxt
    return {
        (a, b): v for (a, b), v in s.items() if a < b and v > 0
    }


DIAMOND = [(0, 2), (1, 2), (0, 3), (1, 3), (2, 4), (3, 4)]


def _run(spark, edges, vids, iters=2):
    e = spark.createDataFrame(edges, "src long, dst long")
    v = spark.createDataFrame([(x,) for x in vids], "vid long")
    return {
        (r["a"], r["b"]): r["sim"]
        for r in simrank(e, v, iters=iters).collect()
    }


def test_simrank_diamond_iter1(spark):
    got = _run(spark, DIAMOND, range(5), iters=1)
    # I(2) = I(3) = {0,1}: s1(2,3) = 0.8 * 2/4 = 0.4; no other pair shares
    # in-neighbor structure at step 1 except (2,3)->4 self pair
    assert abs(got[(2, 3)] - 0.4) < 1e-12
    want = _replica(DIAMOND, range(5), iters=1)
    assert set(got) == set(want)
    assert all(abs(got[k] - want[k]) < 1e-9 for k in got)


def test_simrank_diamond_iter2(spark):
    got = _run(spark, DIAMOND, range(5), iters=2)
    want = _replica(DIAMOND, range(5), iters=2)
    assert set(got) == set(want)
    assert all(abs(got[k] - want[k]) < 1e-9 for k in got)


def test_simrank_dedupes_parallel_edges(spark):
    got = _run(spark, DIAMOND + DIAMOND, range(5), iters=2)
    want = _replica(DIAMOND, range(5), iters=2)
    assert set(got) == set(want)
    assert all(abs(got[k] - want[k]) < 1e-9 for k in got)
