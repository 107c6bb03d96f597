"""Product quantization: donor self-codes, cluster retrieval, and a
full numpy replay of encode (same slicing, same rounding, same
tiebreak)."""

import numpy as np
import pytest

from tric_spark.operators.pq import pq_codes, pq_encode, pq_search


def _emb_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )


def _cluster_vecs(n_per=6, dims=16, seed=3):
    rng = np.random.RandomState(seed)
    centers = rng.randn(3, dims) * 5
    vecs = []
    for c in centers:
        for _ in range(n_per):
            vecs.append(c + rng.randn(dims) * 0.01)
    return vecs


def test_donor_self_codes(spark):
    vecs = _cluster_vecs()
    df = _emb_df(spark, vecs)
    codes = {
        r["vec_id"]: r["codes"]
        for r in pq_codes(df, n_sub=4, ks=4).collect()
    }
    # donors are vec_id 0..3; each donor is distance 0 from itself in
    # every subspace, so its code is [j]*4
    for j in range(4):
        assert codes[j] == [j] * 4, codes[j]


def test_encode_numpy_replay(spark):
    vecs = _cluster_vecs(n_per=7, dims=24, seed=11)
    n_sub, ks, sub = 6, 5, 4
    df = _emb_df(spark, vecs)
    got = {
        (r["vec_id"], r["sub"]): r["code"]
        for r in pq_encode(df, n_sub=n_sub, ks=ks).collect()
    }
    arr = np.array(vecs)
    donors = arr[:ks]
    for i, v in enumerate(arr):
        for s in range(n_sub):
            ds = [
                (round(float(((v[s * sub:(s + 1) * sub] - d[s * sub:(s + 1) * sub]) ** 2).sum()), 6), j)
                for j, d in enumerate(donors)
            ]
            want = min(ds)[1]
            assert got[(i, s)] == want, (i, s, ds)


def test_search_finds_cluster(spark):
    # INTERLEAVE the clusters so the deterministic first-ks codebook
    # spans all of them (donors from one cluster cannot represent the
    # others — the quantization-collapse case the first version of this
    # test tripped over)
    grouped = _cluster_vecs(n_per=6, dims=16, seed=3)
    vecs = [grouped[c * 6 + i] for i in range(6) for c in range(3)]
    df = _emb_df(spark, vecs)
    q = df.filter("vec_id in (0, 1, 2)")
    res = pq_search(df, q, k=4, n_sub=4, ks=6).collect()
    by_q = {}
    for r in res:
        by_q.setdefault(r["query_id"], []).append(r["vec_id"])
    # vec i belongs to cluster i % 3; top-4 neighbors (self excluded)
    # must come from the query's own cluster
    for qid in (0, 1, 2):
        cluster = {v for v in range(18) if v % 3 == qid} - {qid}
        assert set(by_q[qid]) <= cluster, (qid, by_q[qid])
        assert len(by_q[qid]) == 4


def test_width_guard(spark):
    df = _emb_df(spark, [np.arange(10.0)])
    with pytest.raises(ValueError):
        pq_encode(df, n_sub=4, ks=1)
