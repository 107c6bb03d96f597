from pyspark.sql import functions as F

from tric_spark import graph, synth
from tric_spark.operators import tc
from tric_spark.sources.bucketed import read_bucketed, write_bucketed_edges


def test_bucketed_self_join_no_exchange(spark, tmp_path):
    """A src-keyed self-join on the bucketed table must run without any
    shuffle Exchange on either side — the durable 1-D partitioning analog."""
    # warehouse dir is a static conf — the table lands in the session's
    # default spark-warehouse; dropped in the finally block
    edges = synth.link_edges(spark, 2000, seed=42)
    write_bucketed_edges(edges, "edges_b", buckets=8)
    try:
        t = read_bucketed(spark, "edges_b")
        joined = t.alias("a").join(t.alias("b"), "src")
        joined.count()
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        shuffles = [
            ln for ln in plan.splitlines()
            if "Exchange hashpartitioning" in ln
        ]
        assert not shuffles, plan[:2000]
        # and it returns the same rows as the unbucketed join
        plain = edges.alias("a").join(edges.alias("b"), "src")
        assert joined.count() == plain.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS edges_b")


def test_approximate_tc_within_tolerance(spark):
    edges = synth.link_edges(spark, 20_000, seed=42)
    canon = graph.canonical_edges(edges).cache()
    deg = graph.degrees(graph.symmetrize(canon))
    ori = graph.orient_by_degree(canon, deg).cache()
    exact = tc.triangle_count_adj(ori)
    approx = tc.triangle_count_approx(ori, p=0.5, seed=42)
    assert exact > 1000
    rel_err = abs(approx - exact) / exact
    assert rel_err < 0.25, (exact, approx, rel_err)
    # deterministic: same seed → same estimate
    assert tc.triangle_count_approx(ori, p=0.5, seed=42) == approx
