"""Condensation + DAG longest-path layering (condensation.py)."""

import pytest

from tric_spark.operators.condensation import condensation_edges, dag_layers
from tric_spark.operators.scc import strongly_connected_components


def _layers(spark, dag, comps):
    e = spark.createDataFrame(dag, "src long, dst long")
    c = spark.createDataFrame([(x,) for x in comps], "comp long")
    return {r["comp"]: r["layer"] for r in dag_layers(e, c).collect()}


def test_layers_diamond_with_shortcut(spark):
    # 0->1->2->3 plus shortcut 1->3: LONGEST path wins -> layer(3)=3
    got = _layers(spark, [(0, 1), (1, 2), (2, 3), (1, 3)], range(4))
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}


def test_layers_isolated_component(spark):
    got = _layers(spark, [(0, 1)], [0, 1, 7])
    assert got == {0: 0, 1: 1, 7: 0}


def test_cycle_raises(spark):
    e = spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long")
    c = spark.createDataFrame([(0,), (1,)], "comp long")
    with pytest.raises(ValueError, match="cycle"):
        dag_layers(e, c, max_rounds=5)


def test_condensation_pipeline(spark):
    # cycle {0,1,2} -> 3 -> cycle {4,5}; plus tail 3 -> 6
    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5), (5, 4), (3, 6)]
    e = spark.createDataFrame(edges, "src long, dst long")
    v = spark.createDataFrame([(i,) for i in range(7)], "vid long")
    labels = strongly_connected_components(e, v).withColumnRenamed(
        "scc", "label"
    )
    ce = condensation_edges(e, labels)
    rows = {(r["src"], r["dst"]): r["n_links"] for r in ce.collect()}
    assert rows == {(0, 3): 1, (3, 4): 1, (3, 6): 1}
    comps = labels.select("label").distinct().withColumnRenamed("label", "comp")
    got = {
        r["comp"]: r["layer"]
        for r in dag_layers(ce.select("src", "dst"), comps).collect()
    }
    assert got == {0: 0, 3: 1, 4: 2, 6: 2}
