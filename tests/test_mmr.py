"""MMR diversified retrieval vs a pure-python greedy referee."""

import math

from tric_spark.operators.mmr import mmr_topk

VECS = {
    0: [1.0, 0.0, 0.0],          # the query
    1: [0.9, 0.1, 0.0],          # most relevant
    2: [0.9, 0.11, 0.0],         # near-copy of 1 -> penalized
    3: [0.5, 0.5, 0.0],          # less relevant but diverse
    4: [0.4, 0.0, 0.6],          # diverse
    5: [0.89, 0.1, 0.01],        # another near-copy of 1
}


def _cos(a, b):
    d = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return round(d / (na * nb), 6)


def _py_mmr(qid, k, lam):
    cand = {i: _cos(VECS[qid], v) for i, v in VECS.items() if i != qid}
    sims = {
        (i, j): _cos(VECS[i], VECS[j])
        for i in cand
        for j in cand
        if i != j
    }
    out, sel = [], []
    for rnd in range(1, k + 1):
        best = None
        for c, rel in cand.items():
            if c in sel:
                continue
            raw = (
                rel
                if not sel
                else lam * rel - (1.0 - lam) * max(sims[(c, s)] for s in sel)
            )
            key = (-raw, c)
            if best is None or key < best[0]:
                best = (key, c, raw)
        sel.append(best[1])
        out.append((qid, best[1], rnd, round(best[2], 6)))
    return out


def test_mmr_matches_greedy_referee_and_diversifies(spark):
    emb = spark.createDataFrame(
        [(i, v) for i, v in VECS.items()], "vec_id long, embedding array<double>"
    )
    got = sorted(
        (r.query_id, r.vec_id, r.sel_round, r.score)
        for r in mmr_topk(emb, emb.filter("vec_id = 0"), k=3, pool=5, lam=0.3).collect()
    )
    want = sorted(_py_mmr(0, 3, 0.3))
    assert got == want
    picked = {v for _, v, _, _ in got}
    # diversification: the two near-copies of 1 must NOT both be picked
    assert not {2, 5} <= picked and 1 in picked


def test_mmr_round1_is_pure_relevance(spark):
    emb = spark.createDataFrame(
        [(i, v) for i, v in VECS.items()], "vec_id long, embedding array<double>"
    )
    r1 = [
        r
        for r in mmr_topk(emb, emb.filter("vec_id = 0"), k=2, pool=5).collect()
        if r.sel_round == 1
    ][0]
    assert r1.vec_id == 1 and r1.score == _cos(VECS[0], VECS[1])
