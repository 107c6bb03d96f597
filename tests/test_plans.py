"""Physical-plan shape assertions — the SURVEY §4 invariants: column
pruning reaches the scan, filters push down, the zone-map prune uses a
broadcast join, and Python never appears in plans that don't need it."""

from pyspark.sql import functions as F

from tric_spark import graph
from tric_spark.operators import tc
from tric_spark.sources.doc_graph import doc_edges
from tric_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def test_doc_graph_scan_prunes_columns(spark):
    """doc_edges must read only (doc_id, n_chars) — not text (the wide
    column). A scan reading text for a 2-column derivation is wrong."""
    plan = _plan(doc_edges(spark, SF))
    scan = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan, plan
    assert "doc_id" in scan[0] and "n_chars" in scan[0]
    assert "text" not in scan[0], scan[0]


def test_filter_pushdown_to_parquet(spark):
    docs = load_table(spark, SF, "documents").filter(F.col("lang") == "en").select("doc_id")
    plan = _plan(docs)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed and "lang" in pushed[0], plan


def test_erange_prune_is_broadcast(spark):
    """The zone-map prune (reference erange heuristic) must be a broadcast
    join, not a shuffle."""
    canon = doc_edges(spark, SF)
    plan = _plan(tc.triangles_join(canon, prune=True))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan


def test_join_tc_plan_has_no_python(spark):
    """The join TC path is pure Catalyst — no Python evaluation nodes."""
    canon = doc_edges(spark, SF)
    plan = _plan(tc.triangles_join(canon))
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_whole_stage_codegen_in_kernels(spark):
    """The degree/normalize plans must sit inside WholeStageCodegen spans.
    AQE hides codegen markers pre-execution, so probe with AQE off."""
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        canon = doc_edges(spark, SF)
        df = graph.degrees(graph.symmetrize(canon))
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "*(" in plan, plan  # WholeStageCodegen stage markers
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_tpch_q6_predicates_reach_the_scan(spark):
    """Q6 is the pure pushdown exerciser: every predicate (shipdate range,
    discount band, quantity cap) must appear in PushedFilters, and the
    scan must read only the four referenced columns."""
    import __spark_entry__ as entrymod

    plan = _plan(entrymod.q_tpch_q6(spark, SF))
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed, plan
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed[0], pushed[0]
    scan = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan and "l_extendedprice" in scan[0]
    assert "l_orderkey" not in scan[0], scan[0]


def test_rp_project_plan_is_map_only(spark):
    """JL projection must be a single map stage over the scan: no shuffle
    Exchange, no Python eval — the matrix ships as literals."""
    from tric_spark.operators.similarity import rp_project

    emb = load_table(spark, SF, "embeddings")
    plan = _plan(rp_project(emb, out_dims=16))
    assert "ShuffleExchange" not in plan and "Exchange hashpartitioning" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_kmeans_assign_plan_broadcasts_centroids(spark):
    """The n×k distance pass must broadcast the centroid frame — a
    SortMergeJoin of points against centroids would shuffle the points
    once per superstep."""
    from tric_spark.operators.kmeans import kmeans

    emb = load_table(spark, SF, "embeddings")
    assign, _ = kmeans(emb, k=4, iters=1)
    plan = _plan(assign)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_tpch_q4_semi_join_and_pushdown(spark):
    """Q4's EXISTS must compile to a LeftSemi join (matches deduped by the
    join itself, no distinct), with the order-date range pushed to the
    orders scan and the lineitem scan pruned to its two used columns."""
    import __spark_entry__ as entrymod

    plan = _plan(entrymod.q_tpch_q4(spark, SF))
    assert "LeftSemi" in plan, plan
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("o_orderdate" in ln for ln in pushed), plan
    scans = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    li_scan = [ln for ln in scans if "l_orderkey" in ln]
    assert li_scan and "l_extendedprice" not in li_scan[0], scans


def test_readability_plan_is_map_only(spark):
    """Flesch must be a single map stage over the scan: no shuffle
    Exchange, no Python eval — the HOF fold runs in JVM expressions."""
    from tric_spark.operators.textstats import readability

    docs = load_table(spark, SF, "documents")
    plan = _plan(readability(docs))
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_whiten_plan_broadcasts_stats(spark):
    """The whitening join must broadcast the |dims|-row stats frame — a
    SortMergeJoin would shuffle the exploded wide data twice."""
    from tric_spark.operators.embstats import whiten_embeddings

    emb = load_table(spark, SF, "embeddings")
    plan = _plan(whiten_embeddings(emb))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
