import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def test_entry_smoke(spark):
    import __spark_entry__ as m

    df = m.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"vid", "tc", "degree"}
    assert all(r.tc > 0 for r in rows)


def test_queries_and_oracles_consistent():
    import __spark_entry__ as m

    qs, os_ = m.queries(), m.oracle_sql()
    assert set(os_) <= set(qs)
    # every SURVEY §2 kernel family is represented
    for required in [
        "triangle_count_adj",
        "pagerank_iter2",
        "cc_converged",
        "lp_iter2",
        "minhash_lsh_pairs",
        "simhash_groups",
        "ann_topk",
        "token_counts",
    ]:
        assert required in qs and (required in os_ or required.startswith("ann_lsh"))


def test_oracle_gate_subset():
    """Run the real driver-style comparison for a representative subset at
    sf0.001 (fast); the full battery runs in scripts/check_oracles.py."""
    env = dict(os.environ, SPARK_GRAFT_ORACLE_SF="/root/testdata/sf0.001")
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "check_oracles.py"),
            "triangle_count_adj",
            "triangles_per_vertex",
            "pagerank_iter2",
            "cc_converged",
            "lp_iter2",
            "minhash_lsh_pairs",
            "simhash_groups",
            "ann_topk",
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-2000:]
