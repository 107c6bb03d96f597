from pyspark.sql import functions as F

from fixtures import er_graph
from oracles import tc_oracle

from tric_spark import graph, synth
from tric_spark.operators import tc
from tric_spark.plans import partition as P


def test_partition_stats_and_balance(spark):
    edges = synth.link_edges(spark, 3000, seed=42)
    skewed = edges.repartition(8, "src")  # 1-D by vertex — hubs pile up
    balanced = P.repartition_balanced_by_degree(edges, 8)
    s1 = P.partition_stats(skewed)
    s2 = P.partition_stats(balanced)
    assert s2["partitions"] >= 2
    assert s2["skew_ratio"] <= s1["skew_ratio"] + 0.1
    assert s2["skew_ratio"] < 1.5  # equal-#edges layout is near-flat


def test_two_d_partition_preserves_rows(spark):
    edges = synth.link_edges(spark, 1000, seed=42)
    grid = P.two_d_partition(edges, 4, 4)
    assert grid.count() == edges.count()
    assert grid.rdd.getNumPartitions() == 16


def test_salted_join_row_identical(spark):
    """Salting must not change join semantics — same multiset of rows."""
    edges = synth.link_edges(spark, 2000, seed=42)  # hubby dst distribution
    ranks = (
        edges.select(F.col("dst").alias("vid")).distinct()
        .withColumn("rank", (F.col("vid") * 7 % 100).cast("double"))
    )
    plain = edges.join(ranks.withColumnRenamed("vid", "dst"), "dst")
    salted = P.salted_join(
        edges, ranks.withColumnRenamed("vid", "dst"), "dst",
        num_salts=4, hot_threshold=20,
    )
    assert salted.count() == plain.count()
    assert salted.select("dst", "src", "rank").exceptAll(
        plain.select("dst", "src", "rank")
    ).count() == 0


def test_split_hub_vertices_partial_agg(spark):
    """Two-phase (vid,salt)→vid aggregation equals direct aggregation."""
    edges = synth.link_edges(spark, 2000, seed=42)
    sym = graph.symmetrize(graph.canonical_edges(edges))
    deg = graph.degrees(sym)
    salted = P.split_hub_vertices(sym, deg, tau=25)
    two_phase = (
        salted.groupBy(F.col("src").alias("vid"), "salt")
        .agg(F.count("*").alias("c"))
        .groupBy("vid")
        .agg(F.sum("c").alias("degree"))
    )
    direct = {r.vid: r.degree for r in deg.collect()}
    got = {r.vid: r.degree for r in two_phase.collect()}
    assert got == direct


def test_tc_on_2d_partitioned_input_unchanged(spark):
    """TC result is invariant to the physical layout."""
    pairs = er_graph(60, 8)
    total, _ = tc_oracle(pairs)
    canon = graph.canonical_edges(
        spark.createDataFrame([(int(u), int(v)) for u, v in pairs], "src long, dst long")
    )
    grid = P.two_d_partition(canon, 3, 3)
    assert tc.triangle_count_join(grid) == total
    deg = graph.degrees(graph.symmetrize(canon))
    assert tc.triangle_count_adj(graph.orient_by_degree(grid, deg)) == total
