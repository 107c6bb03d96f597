import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from oracles import tc_oracle

from tric_spark import graph
from tric_spark.operators import tc
from tric_spark.sources.binary_csr import (
    read_binary_csr,
    read_binary_csr_local,
    write_binary_csr_local,
)

KARATE = "/root/reference/karate.bin"


def test_roundtrip_karate_byte_identical(tmp_path):
    src, dst, w = read_binary_csr_local(KARATE)
    out = str(tmp_path / "karate_copy.bin")
    write_binary_csr_local(out, src, dst, w, nv=34)
    with open(KARATE, "rb") as f1, open(out, "rb") as f2:
        assert f1.read() == f2.read()


def test_reader_decodes_header(tmp_path):
    src, dst, w = read_binary_csr_local(KARATE)
    assert src.size == dst.size == w.size == 156
    assert src.min() == 0 and dst.max() == 33
    assert os.path.getsize(KARATE) == 16 + 35 * 8 + 156 * 16


# property: for ANY undirected graph, write→read→TC == oracle TC
edge_lists = st.lists(
    st.tuples(st.integers(0, 15), st.integers(0, 15)).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=40,
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(pairs=edge_lists)
def test_property_roundtrip_tc(spark, tmp_path_factory, pairs):
    import numpy as np

    und = sorted({(min(u, v), max(u, v)) for u, v in pairs})
    src = np.array([u for u, v in und] + [v for u, v in und], dtype=np.int64)
    dst = np.array([v for u, v in und] + [u for u, v in und], dtype=np.int64)
    w = np.ones(src.size, dtype=np.float64)
    path = str(tmp_path_factory.mktemp("bin") / "g.bin")
    write_binary_csr_local(path, src, dst, w)
    rs, rd, rw = read_binary_csr_local(path)
    assert sorted(zip(rs, rd)) == sorted(zip(src, dst))

    df = read_binary_csr(spark, path)
    got = tc.triangle_count_join(graph.canonical_edges(df))
    want, _ = tc_oracle(und)
    assert got == want
