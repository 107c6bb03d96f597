"""NMI / ARI agreement vs a pure-Python reference."""

from __future__ import annotations

import math
from collections import Counter

from tric_spark.operators.clustereval import cluster_agreement


def _py_nmi_ari(pairs):
    n = len(pairs)
    cont = Counter(pairs)
    ma = Counter(a for a, _ in pairs)
    mb = Counter(b for _, b in pairs)
    mi = sum(
        (nij / n) * math.log(n * nij / (ma[a] * mb[b]))
        for (a, b), nij in cont.items()
    )
    ha = -sum((c / n) * math.log(c / n) for c in ma.values())
    hb = -sum((c / n) * math.log(c / n) for c in mb.values())
    nmi = mi / math.sqrt(ha * hb) if ha > 0 and hb > 0 else None
    c2 = lambda x: x * (x - 1) / 2  # noqa: E731
    sij = sum(c2(v) for v in cont.values())
    si = sum(c2(v) for v in ma.values())
    sj = sum(c2(v) for v in mb.values())
    exp = si * sj / c2(n)
    den = (si + sj) / 2 - exp
    ari = (sij - exp) / den if den != 0 else None
    return ha, hb, nmi, ari


def _frames(spark, la, lb):
    a = spark.createDataFrame(list(enumerate(la)), "vid long, label string")
    b = spark.createDataFrame(list(enumerate(lb)), "vid long, label string")
    return a, b


def test_agreement_matches_python(spark):
    la = ["x", "x", "x", "y", "y", "z", "z", "z", "z", "w"]
    lb = ["1", "1", "2", "2", "2", "3", "3", "1", "3", "3"]
    row = cluster_agreement(*_frames(spark, la, lb)).collect()[0]
    ha, hb, nmi, ari = _py_nmi_ari(list(zip(la, lb)))
    assert row["n"] == 10
    assert row["n_labels_a"] == 4 and row["n_labels_b"] == 3
    assert abs(row["h_a"] - round(ha, 6)) < 1e-9
    assert abs(row["h_b"] - round(hb, 6)) < 1e-9
    assert abs(row["nmi"] - nmi) < 1e-6
    assert abs(row["ari"] - ari) < 1e-6


def test_identical_labelings_are_perfect(spark):
    la = ["a", "a", "b", "b", "c", "c"]
    row = cluster_agreement(*_frames(spark, la, la)).collect()[0]
    assert abs(row["nmi"] - 1.0) < 1e-9
    assert abs(row["ari"] - 1.0) < 1e-9


def test_degenerate_single_cluster(spark):
    la = ["a"] * 6
    lb = ["1", "1", "2", "2", "3", "3"]
    row = cluster_agreement(*_frames(spark, la, lb)).collect()[0]
    assert row["nmi"] is None  # H(A) = 0: nothing to normalize
    assert row["h_a"] == 0.0


def test_join_is_inner_on_common_ids(spark):
    a = spark.createDataFrame([(0, "a"), (1, "a"), (9, "b")], "vid long, label string")
    b = spark.createDataFrame([(0, "1"), (1, "2"), (7, "3")], "vid long, label string")
    row = cluster_agreement(a, b).collect()[0]
    assert row["n"] == 2
