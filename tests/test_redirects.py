"""Pointer-doubling redirect resolution: chains collapse to terminals,
cycles flagged, python doubling replay equality, min-dst normalization."""

from tric_spark.operators.redirects import resolve_redirects


def _df(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _got(spark, pairs, **kw):
    return {
        r.src: (r.final, r.resolved)
        for r in resolve_redirects(_df(spark, pairs), **kw).collect()
    }


def test_chain_collapses_to_terminal(spark):
    # 0→1→2→3→100 (100 is not a redirect source)
    pairs = [(0, 1), (1, 2), (2, 3), (3, 100)]
    got = _got(spark, pairs)
    assert got == {i: (100, True) for i in range(4)}


def test_long_chain_log_rounds(spark):
    # a 33-hop chain resolves within 6 doublings (2^6 = 64 ≥ 33)
    pairs = [(i, i + 1) for i in range(33)]
    got = _got(spark, pairs, max_doublings=6)
    assert got == {i: (33, True) for i in range(33)}


def test_cycle_flagged_unresolved(spark):
    # 0→1→2→0 cycle plus a tail 9→0 that can only land inside the cycle
    pairs = [(0, 1), (1, 2), (2, 0), (9, 0)]
    got = _got(spark, pairs, max_doublings=5)
    assert not got[0][1] and not got[1][1] and not got[2][1]
    assert not got[9][1]  # the tail terminates inside the loop
    # cyclic finals are the deterministic 2^r-hop jump — replay it
    f = {0: 1, 1: 2, 2: 0, 9: 0}
    cur = dict(f)
    for _ in range(5):
        cur = {v: cur.get(c, c) for v, c in cur.items()}
    assert {v: got[v][0] for v in f} == cur


def test_branching_into_one_terminal(spark):
    pairs = [(1, 5), (2, 5), (5, 7)]
    got = _got(spark, pairs)
    assert got == {1: (7, True), 2: (7, True), 5: (7, True)}


def test_duplicate_src_normalized_min_dst(spark):
    pairs = [(0, 9), (0, 3), (3, 8)]
    got = _got(spark, pairs)
    assert got[0] == (8, True)  # min dst 3, then 3→8


def test_mixed_graph_matches_python_replay(spark):
    # deterministic pseudo-random functional graph over 60 nodes
    pairs = [(v, (v * 13 + 7) % 80) for v in range(0, 60, 2)]
    pairs = [(s, d) for s, d in pairs if s != d]
    got = _got(spark, pairs, max_doublings=8)
    f = {}
    for s, d in pairs:
        f[s] = min(d, f.get(s, d))
    cur = dict(f)
    for _ in range(8):
        cur = {v: cur.get(c, c) for v, c in cur.items()}
    expect = {v: (cur[v], cur[v] not in f) for v in f}
    assert got == expect
