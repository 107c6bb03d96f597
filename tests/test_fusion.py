"""RRF fusion vs a pure-Python reference."""

from __future__ import annotations

import pytest

from tric_spark.operators.fusion import rrf_fuse

A = [(1, 10, 1), (1, 11, 2), (1, 12, 3), (2, 20, 1)]
B = [(1, 11, 1), (1, 13, 2), (2, 21, 1), (2, 20, 2)]


def _frames(spark):
    schema = "query_id long, item long, rank long"
    return [spark.createDataFrame(A, schema), spark.createDataFrame(B, schema)]


def _py_rrf(lists, c=60):
    out: dict[tuple[int, int], list] = {}
    for lst in lists:
        for q, i, r in lst:
            e = out.setdefault((q, i), [0, 0.0])
            e[0] += 1
            e[1] += 1.0 / (c + r)
    return {k: (n, round(s, 6)) for k, (n, s) in out.items()}


def test_rrf_matches_python(spark):
    got = {
        (r["query_id"], r["item"]): (r["n_lists"], r["rrf"], r["rnk"])
        for r in rrf_fuse(_frames(spark)).collect()
    }
    exp = _py_rrf([A, B])
    assert set(got) == set(exp)
    for k, (n, s) in exp.items():
        assert got[k][:2] == (n, s)
    # item 11 appears in both lists (ranks 2 and 1) and must out-rank
    # every single-list item for query 1
    assert got[(1, 11)][2] == 1


def test_rrf_validation(spark):
    with pytest.raises(ValueError):
        rrf_fuse([])
