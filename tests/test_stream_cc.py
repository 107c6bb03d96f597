"""Streaming CC maintenance: after draining an edge stream in micro-
batches, the maintained labels equal the from-scratch batch labeling."""

from conftest import edges_df
from fixtures import er_graph

from tric_spark import graph
from tric_spark.operators.cc import connected_components
from tric_spark.streaming.graphcc import CCMaintainer, stream_cc


def test_stream_cc_matches_batch(spark, tmp_path):
    pairs = er_graph(50, 20)
    canon = graph.canonical_edges(edges_df(spark, pairs))
    # three files -> three micro-batches with maxFilesPerTrigger=1
    src_dir = str(tmp_path / "edges_src")
    canon.repartition(3).write.parquet(src_dir)

    stream = (
        spark.readStream.schema("src long, dst long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    m = CCMaintainer(spark)
    q = (
        stream_cc(stream, m)
        .option("checkpointLocation", str(tmp_path / "ck_cc"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()
    assert m.n_batches >= 2  # genuinely incremental, not one big batch

    got = {r["vid"]: r["comp"] for r in m.labels.collect()}
    sym = graph.symmetrize(canon)
    want = {
        r["vid"]: r["comp"]
        for r in connected_components(sym, graph.vertices(sym)).collect()
    }
    assert got == want
