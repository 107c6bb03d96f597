"""The bin/tric-compatible CLI: same invocations a reference user runs."""

import pytest

from tric_spark.cli import build_parser, run

KARATE = "/root/reference/karate.bin"


def _run(spark, argv):
    return run(build_parser().parse_args(argv), spark=spark)


def test_cli_karate_default(spark):
    # mpiexec -n 2 bin/tric -f karate.bin
    r = _run(spark, ["-f", KARATE])
    assert r["triangles"] == 45
    assert r["n_edges_directed"] == 156
    assert r["teps"] > 0


def test_cli_karate_all_variants_and_balanced(spark):
    for variant in ("adj", "join", "salted"):
        assert _run(spark, ["-f", KARATE, "--variant", variant])["triangles"] == 45
    # -b balanced layout and -r read-chunk count change placement, not results
    assert _run(spark, ["-f", KARATE, "-b", "-r", "3"])["triangles"] == 45


def test_cli_rgg_matches_direct_generation(spark):
    # mpiexec -n 2 bin/neve -p 2 -n 100 — synthetic input with extra edges
    from tric_spark import graph, synth
    from tric_spark.operators import tc

    r = _run(spark, ["-n", "300", "-p", "2", "-l"])
    canon = synth.rgg_edges(spark, 300, extra_edge_pct=2.0).select("src", "dst")
    deg = graph.degrees(graph.symmetrize(canon))
    want = tc.triangle_count_adj2(graph.orient_by_degree(canon, deg))
    assert r["triangles"] == want > 0


def test_cli_per_vertex_out(spark, tmp_path):
    out = str(tmp_path / "pv")
    r = _run(spark, ["-f", KARATE, "--per-vertex", "--out", out])
    pv = {row.vid: row.tc for row in spark.read.parquet(out).collect()}
    # verify-skill goldens: per-vertex v0..v9
    want = [18, 12, 11, 10, 2, 3, 3, 6, 5, 0]
    assert [pv.get(i, 0) for i in range(10)] == want
    assert r["per_vertex_out"] == out


def test_cli_approx(spark):
    # p=1.0 keeps every edge: the estimate is exact and deterministic
    r = _run(spark, ["-f", KARATE, "--approx", "1.0"])
    assert r["triangles"] == 45.0
    assert r["variant"] == "approx(p=1.0)"


def test_cli_requires_options(spark):
    with pytest.raises(SystemExit, match="Must specify some options."):
        _run(spark, [])


def test_cli_auto_variant_reports_resolved_kernel(spark):
    """VERDICT r4 #2: the CLI default is the measured auto rule — on karate
    (78 edges, far below AUTO_ARROW_MAX_EDGES) auto resolves to adj2 and the
    result sink reports the kernel that actually ran."""
    r = _run(spark, ["-f", KARATE])
    assert r["triangles"] == 45
    assert r["variant"] == "adj2"
    r2 = _run(spark, ["-f", KARATE, "--variant", "auto"])
    assert r2["variant"] == "adj2" and r2["triangles"] == 45
