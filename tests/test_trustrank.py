"""TrustRank + spam mass: seed-teleport trajectory golden, mass
conservation under dangling, trust attenuation with distance from the
seeds, and the spam-farm relative-mass signature.

All kernel runs use FIXED-iteration mode (tol=0 — no per-superstep delta
barrier) and the python oracles replay the exact same trajectory, so the
comparison is tight at any iteration count and the tests stay fast."""

import pytest

from pyspark.sql import functions as F

from tric_spark.operators.pagerank import pagerank
from tric_spark.operators.trustrank import (
    host_trustrank,
    spam_mass,
    trusted_seed_hosts,
    trustrank,
)

ITERS = 10


def _hosts(spark, names):
    return spark.createDataFrame([(h,) for h in names], "vid string")


def _wedges(spark, triples):
    return spark.createDataFrame(
        [(s, t, float(w)) for s, t, w in triples],
        "src string, dst string, weight double",
    )


def test_trusted_seed_hosts_deterministic_and_subset(spark):
    hosts = _hosts(spark, [f"site{i}.example" for i in range(64)])
    s1 = sorted(r.vid for r in trusted_seed_hosts(hosts).collect())
    s2 = sorted(r.vid for r in trusted_seed_hosts(hosts).collect())
    assert s1 == s2 and 0 < len(s1) < 64
    # md5-digit rule replayed in python for portability evidence
    import hashlib

    expect = sorted(
        h
        for h in (f"site{i}.example" for i in range(64))
        if int(hashlib.md5(h.encode()).hexdigest()[0], 16) < 4
    )
    assert s1 == expect


def test_trustrank_three_host_golden_with_dangling(spark):
    # a (seed) → b (2 links), a → c (1 link), b → a (1); c dangling
    e = _wedges(spark, [("a", "b", 2), ("a", "c", 1), ("b", "a", 1)])
    hosts = _hosts(spark, ["a", "b", "c"])
    seeds = _hosts(spark, ["a"])
    r = {
        x.vid: x.rank
        for x in trustrank(e, hosts, seeds, tol=0.0, max_iter=ITERS).collect()
    }
    assert abs(sum(r.values()) - 1.0) < 1e-9  # dangling mass conserved
    # python replay: teleport e=(1,0,0); dangling c returns its mass to a
    d = 0.85
    t = {"a": 1.0, "b": 0.0, "c": 0.0}
    for _ in range(ITERS):
        dm = t["c"]
        t = {
            "a": (1 - d) + d * (t["b"] + dm),
            "b": d * t["a"] * (2 / 3),
            "c": d * t["a"] * (1 / 3),
        }
    for h in "abc":
        assert r[h] == pytest.approx(t[h], abs=1e-9)


def test_trust_attenuates_with_distance(spark):
    # cycle seed → h1 → h2 → h3 → seed: trust decays by d per hop
    e = _wedges(
        spark, [("s", "h1", 1), ("h1", "h2", 1), ("h2", "h3", 1), ("h3", "s", 1)]
    )
    hosts = _hosts(spark, ["s", "h1", "h2", "h3"])
    # 24 iters: the trust wave circling the 4-cycle decays (0.85^k) below
    # the fixpoint gaps by ~k=20, after which the ordering is stable
    r = {
        x.vid: x.rank
        for x in trustrank(
            e, hosts, _hosts(spark, ["s"]), tol=0.0, max_iter=24
        ).collect()
    }
    assert r["s"] > r["h1"] > r["h2"] > r["h3"] > 0


def test_unreachable_from_seeds_scores_zero(spark):
    # two disjoint 2-cycles; seeds only in the first — zero trust leaks,
    # exactly, at every iteration (e=0 and no in-mass ever arrives)
    e = _wedges(spark, [("a", "b", 1), ("b", "a", 1), ("x", "y", 1), ("y", "x", 1)])
    hosts = _hosts(spark, ["a", "b", "x", "y"])
    r = {
        x.vid: x.rank
        for x in trustrank(
            e, hosts, _hosts(spark, ["a"]), tol=0.0, max_iter=ITERS
        ).collect()
    }
    assert r["x"] == pytest.approx(0.0, abs=1e-15)
    assert r["y"] == pytest.approx(0.0, abs=1e-15)
    assert r["a"] > r["b"] > 0


def test_empty_seeds_raises(spark):
    e = _wedges(spark, [("a", "b", 1)])
    hosts = _hosts(spark, ["a", "b"])
    with pytest.raises(ValueError):
        trustrank(e, hosts, hosts.filter(F.lit(False)))


def test_spam_mass_flags_the_farm(spark):
    """Good core: t ↔ g. Spam farm: f1..f4 ↔ p (the boosted page), with
    NO path from the trusted side — p's PageRank is high but its
    TrustRank is exactly 0, so rel_mass(p) = 1; the trusted core sits at
    rel_mass < 0 (over-explained)."""
    farm = [(f"f{i}", "p", 1) for i in range(1, 5)]
    back = [("p", f"f{i}", 1) for i in range(1, 5)]
    e = _wedges(spark, [("t", "g", 1), ("g", "t", 1)] + farm + back)
    names = ["t", "g", "p"] + [f"f{i}" for i in range(1, 5)]
    hosts = _hosts(spark, names)
    seeds = _hosts(spark, ["t"])
    pr = pagerank(e.select("src", "dst"), hosts, tol=0.0, max_iter=ITERS)
    tr = trustrank(e, hosts, seeds, tol=0.0, max_iter=ITERS)
    sm = {x.vid: x for x in spam_mass(pr, tr).collect()}
    assert sm["p"].rel_mass > 0.95
    assert all(sm[f"f{i}"].rel_mass > 0.95 for i in range(1, 5))
    assert sm["t"].rel_mass < 0.0  # trusted core over-explained
    # both inputs are probability distributions → masses cancel globally
    assert sum(x.mass for x in sm.values()) == pytest.approx(0.0, abs=1e-9)
    # and p outranks every farm page in raw PageRank (the boost worked)
    assert all(sm["p"].pr > sm[f"f{i}"].pr for i in range(1, 5))


def test_anti_trustrank_flags_linkers_to_spam(spark):
    """x → spam, y → clean: distrust flows BACKWARD from the blacklist, so
    x (who links to spam) scores high and y scores exactly 0."""
    from tric_spark.operators.trustrank import anti_trustrank

    e = _wedges(
        spark,
        [("x", "spam", 1), ("y", "clean", 1), ("spam", "x", 1), ("clean", "y", 1)],
    )
    hosts = _hosts(spark, ["x", "y", "spam", "clean"])
    r = {
        x.vid: x.rank
        for x in anti_trustrank(
            e, hosts, _hosts(spark, ["spam"]), tol=0.0, max_iter=ITERS
        ).collect()
    }
    assert r["spam"] > r["x"] > 0  # the seed itself, then its in-linker
    assert r["y"] == pytest.approx(0.0, abs=1e-15)
    assert r["clean"] == pytest.approx(0.0, abs=1e-15)


def test_seed_sets_disjoint(spark):
    from tric_spark.operators.trustrank import spam_seed_hosts

    hosts = _hosts(spark, [f"site{i}.example" for i in range(128)])
    good = {r.vid for r in trusted_seed_hosts(hosts).collect()}
    bad = {r.vid for r in spam_seed_hosts(hosts).collect()}
    assert good and bad and not (good & bad)


def test_host_trustrank_weights_matter(spark):
    he = spark.createDataFrame(
        [("s", "b", 9), ("s", "c", 1), ("b", "s", 1), ("c", "s", 1)],
        "src_host string, dst_host string, n_links long",
    )
    hosts = _hosts(spark, ["s", "b", "c"])
    r = {
        x.vid: x.rank
        for x in host_trustrank(
            he, hosts, _hosts(spark, ["s"]), tol=0.0, max_iter=ITERS
        ).collect()
    }
    assert r["b"] > r["c"]  # 9× the links → more trust flow
