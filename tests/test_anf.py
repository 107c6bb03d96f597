"""HyperANF: exact-BFS accuracy envelope, md5 register replay, exact
k-hop companion, effective-diameter readout."""

import hashlib
import math

from conftest import edges_df
from fixtures import STAR10, er_graph

from tric_spark.operators.anf import (
    ALPHA_16,
    M,
    effective_diameter,
    hyper_anf,
    k_hop_counts,
)


def _sym(pairs):
    return sorted(set(pairs) | {(v, u) for u, v in pairs})


def _adj(pairs):
    adj = {}
    for u, v in _sym(pairs):
        adj.setdefault(u, set()).add(v)
    return adj


def _exact_nf(pairs, n, max_h):
    """Exact neighborhood function via BFS: nf[h] = Σ_v |ball(v, h)|."""
    adj = _adj(pairs)
    nf = [0] * (max_h + 1)
    for v in range(n):
        ball, frontier = {v}, {v}
        nf[0] += 1
        for h in range(1, max_h + 1):
            frontier = {w for u in frontier for w in adj.get(u, ())} - ball
            ball |= frontier
            nf[h] += len(ball)
    return nf


def _py_regs(vid, seed="anf"):
    """Mirror of anf._init_reg_cols: md5 index digit + 48-bit rho field."""
    h = hashlib.md5(f"{seed}:{vid}".encode()).hexdigest()
    j = int(h[0], 16)
    field = int(h[1:13], 16)
    rho = 49 if field == 0 else 49 - field.bit_length()
    regs = [0] * M
    regs[j] = rho
    return regs


def _estimate(regs):
    z = sum(2.0 ** -r for r in regs)
    v = sum(1 for r in regs if r == 0)
    raw = ALPHA_16 * M * M / z
    if raw <= 2.5 * M and v > 0:
        return M * math.log(M / v)
    return raw


def test_h0_matches_singleton_estimate_exactly(spark):
    """At h=0 every ball is {v}: the curve row must equal n times the
    deterministic singleton estimate (linear counting with V=15)."""
    n = 30
    pairs = er_graph(n=n, p_inv=4, seed=2)
    sym = edges_df(spark, _sym(pairs))
    verts = spark.range(n).withColumnRenamed("id", "vid")
    row = {r.h: r.nf for r in hyper_anf(sym, verts, max_h=1).collect()}
    expected = sum(_estimate(_py_regs(v)) for v in range(n))
    assert abs(row[0] - expected) < 1e-4


def test_curve_vs_exact_bfs_within_tolerance(spark):
    n, max_h = 300, 5
    pairs = er_graph(n=n, p_inv=60, seed=7)
    exact = _exact_nf(pairs, n, max_h)
    sym = edges_df(spark, _sym(pairs))
    verts = spark.range(n).withColumnRenamed("id", "vid")
    curve = {r.h: r.nf for r in hyper_anf(sym, verts, max_h=max_h).collect()}
    for h in range(max_h + 1):
        rel = abs(curve[h] - exact[h]) / exact[h]
        assert rel < 0.15, (h, curve[h], exact[h])
    assert curve[max_h] >= curve[0]


def test_star_effective_diameter(spark):
    sym = edges_df(spark, _sym(STAR10))
    verts = spark.range(11).withColumnRenamed("id", "vid")
    curve = hyper_anf(sym, verts, max_h=4)
    d = effective_diameter(curve, fraction=0.9)
    # star: every pair within 2 hops — the curve plateaus at h=2
    assert 0.0 < d <= 2.0
    vals = {r.h: r.nf for r in curve.collect()}
    assert abs(vals[2] - vals[4]) < 1e-9


def test_k_hop_counts_exact(spark):
    n = 80
    pairs = er_graph(n=n, p_inv=10, seed=13)
    adj = _adj(pairs)
    expect = {}
    for v in adj:
        two = set(adj[v]) | {w for u in adj[v] for w in adj[u]}
        two.discard(v)
        expect[v] = len(two)
    sym = edges_df(spark, _sym(pairs))
    got = {r.vid: r.n_reach for r in k_hop_counts(sym, k=2).collect()}
    assert got == expect


def test_parallelism_invariant(spark):
    n = 50
    pairs = er_graph(n=n, p_inv=5, seed=21)
    verts = spark.range(n).withColumnRenamed("id", "vid")
    a = hyper_anf(edges_df(spark, _sym(pairs)), verts, max_h=3).collect()
    b = hyper_anf(
        edges_df(spark, _sym(pairs)).repartition(17), verts, max_h=3
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


# --- effective diameter -------------------------------------------------------

def test_effective_diameter_interpolation_golden(spark):
    from tric_spark.operators.anf import effective_diameter_from_curve

    # nf: 10 → 50 → 90 → 100; target 0.9·100 = 90 hit exactly at h=2
    curve = spark.createDataFrame(
        [(0, 10.0), (1, 50.0), (2, 90.0), (3, 100.0)], "h long, nf double"
    )
    r = effective_diameter_from_curve(curve, ratio=0.9).collect()[0]
    assert (r.d_eff, r.h_ceil, r.nf_max) == (2.0, 2, 100.0)
    # target between h=1 and h=2: 0.7·100 = 70 → 1 + (70−50)/(90−50) = 1.5
    r = effective_diameter_from_curve(curve, ratio=0.7).collect()[0]
    assert r.d_eff == 1.5


def test_effective_diameter_zero_when_start_covers(spark):
    from tric_spark.operators.anf import effective_diameter_from_curve

    curve = spark.createDataFrame(
        [(0, 99.0), (1, 100.0)], "h long, nf double"
    )
    r = effective_diameter_from_curve(curve, ratio=0.9).collect()[0]
    assert r.d_eff == 0.0 and r.h_ceil == 0


def test_effective_diameter_on_hyperanf_curve(spark):
    """Derivation over a real hyper_anf curve must equal the python
    computation from the SAME collected (rounded) curve."""
    from pyspark.sql import functions as F

    from tric_spark.operators.anf import (
        effective_diameter_from_curve,
        hyper_anf,
    )

    pairs = er_graph(n=60, p_inv=5, seed=47)
    both = [(u, v) for u, v in pairs] + [(v, u) for u, v in pairs]
    edges = edges_df(spark, both)
    verts = spark.range(60).withColumnRenamed("id", "vid")
    curve = hyper_anf(edges, verts, max_h=6).select(
        "h", F.round("nf", 6).alias("nf")
    )
    rows = sorted((r.h, r.nf) for r in curve.collect())
    nfm = rows[-1][1]
    target = 0.9 * nfm
    h, nf = next((h, nf) for h, nf in rows if nf >= target)
    if h == 0:
        expect = 0.0
    else:
        prev = dict(rows)[h - 1]
        expect = round(h - 1 + (target - prev) / (nf - prev), 6)
    r = effective_diameter_from_curve(curve).collect()[0]
    assert r.d_eff == expect and r.h_ceil == h


# --- standalone HLL distinct count ---------------------------------------------

def test_hll_count_distinct_python_replay_and_envelope(spark):
    import hashlib

    from tric_spark.operators.anf import ALPHA_16, M, hll_count_distinct

    vals = [i % 700 for i in range(5000)]  # 700 distinct, heavy repeats
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    r = hll_count_distinct(df, "x").collect()[0]
    # replay: same md5 register rule
    regs = [0] * M
    for v in set(str(v) for v in vals):
        h = hashlib.md5(f"hll:{v}".encode()).hexdigest()
        j = int(h[0], 16)
        field = int(h[1:13], 16)
        rho = 49 if field == 0 else 49 - len(bin(field)[2:])
        regs[j] = max(regs[j], rho)
    z = sum(2.0 ** -x for x in regs)
    vz = sum(1 for x in regs if x == 0)
    raw = ALPHA_16 * M * M / z
    import math

    expect = M * math.log(M / vz) if (raw <= 2.5 * M and vz > 0) else raw
    assert r.est == round(expect, 6)
    assert r.n_rows == 5000
    assert 0.5 * 700 < r.est < 1.6 * 700  # m=16 error envelope


def test_hll_duplicates_dont_move_estimate(spark):
    from tric_spark.operators.anf import hll_count_distinct

    a = spark.createDataFrame([(i,) for i in range(300)], "x long")
    b = spark.createDataFrame([(i % 300,) for i in range(9000)], "x long")
    ea = hll_count_distinct(a, "x").collect()[0].est
    eb = hll_count_distinct(b, "x").collect()[0].est
    assert ea == eb


def test_hll_count_distinct_by(spark):
    import hashlib

    from tric_spark.operators.anf import hll_count_distinct_by

    rows = [("a", str(i % 7)) for i in range(50)] + [
        ("b", str(i) ) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "k string, x string")
    got = {r["key"]: r for r in hll_count_distinct_by(df, "k", "x").collect()}

    def py_est(vals):
        regs = [0] * 16
        for v in set(vals):
            h = hashlib.md5(f"hll:{v}".encode()).hexdigest()
            j = int(h[0], 16)
            field = int(h[1:13], 16)
            rho = 49 if field == 0 else 49 - len(bin(field)[2:])
            regs[j] = max(regs[j], rho)
        z = sum(2.0 ** -r for r in regs)
        vz = sum(1 for r in regs if r == 0)
        raw = 0.673 * 256 / z
        if raw <= 40 and vz > 0:
            import math
            return 16.0 * math.log(16.0 / vz)
        return raw

    assert got["a"]["n_rows"] == 50
    assert abs(got["a"]["est"] - round(py_est([str(i % 7) for i in range(50)]), 6)) < 1e-6
    assert abs(got["b"]["est"] - round(py_est([str(i) for i in range(40)]), 6)) < 1e-6


def test_small_world_sigma_arithmetic(spark):
    """P3-path curve: L = (1*4 + 2*2)/6 = 4/3; formulas replay exactly."""
    import math

    from tric_spark.operators.anf import small_world_sigma

    curve = spark.createDataFrame(
        [(0, 3.0), (1, 7.0), (2, 9.0)], "h int, nf double"
    )
    r = small_world_sigma(curve, gcc=0.3, n=100, mean_k=4.0).collect()[0]
    assert r.avg_path == round(4.0 / 3.0, 6)
    assert r.c_rand == 0.04
    assert r.l_rand == round(math.log(100) / math.log(4.0), 6)
    want = (0.3 / 0.04) / ((4.0 / 3.0) / (math.log(100) / math.log(4.0)))
    assert r.sigma == round(want, 6)
