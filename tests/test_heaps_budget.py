"""Heaps'-law fit and quality-budget curve vs pure-Python references."""

from __future__ import annotations

import math

from tric_spark.operators.quality_filter import quality_budget_curve
from tric_spark.operators.textstats import heaps_law

TEXTS = [
    "the cat sat on the mat",
    "the dog sat on a log and the cat ran",
    "a b c d e f g h",
    "the the the the",
    "zebra quark flux node graph edge vertex",
    None,
]


def _docs(spark, texts=TEXTS):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _py_heaps(texts):
    seen: set[str] = set()
    pts = []
    n_cum = v_cum = 0
    for t in texts:
        if t is None:
            continue
        toks = [w for w in t.split(" ") if w]
        n_cum += len(toks)
        for w in toks:
            if w not in seen:
                seen.add(w)
                v_cum += 1
        if n_cum > 0 and v_cum > 0:
            pts.append((math.log(n_cum), math.log(v_cum), n_cum, v_cum))
    n = len(pts)
    mx = sum(p[0] for p in pts) / n
    my = sum(p[1] for p in pts) / n
    sxy = sum(p[0] * p[1] for p in pts)
    sxx = sum(p[0] * p[0] for p in pts)
    beta = (sxy - n * mx * my) / (sxx - n * mx * mx)
    k = math.exp(my - beta * mx)
    return n, max(p[2] for p in pts), max(p[3] for p in pts), beta, k


def test_heaps_matches_python(spark):
    row = heaps_law(_docs(spark), prefix_partitions=3).collect()[0]
    n, tt, vs, beta, k = _py_heaps(TEXTS)
    assert row["n_points"] == n
    assert row["total_tokens"] == tt
    assert row["vocab_size"] == vs
    assert abs(row["beta"] - beta) < 1e-6
    assert abs(row["k_coef"] - k) < 1e-6


def test_heaps_partition_invariance(spark):
    # the two-phase prefix sum must not depend on the partition count
    r1 = heaps_law(_docs(spark), prefix_partitions=1).collect()[0]
    r5 = heaps_law(_docs(spark), prefix_partitions=5).collect()[0]
    assert r1.asDict() == r5.asDict()


def test_quality_budget_curve(spark):
    rows = quality_budget_curve(_docs(spark)).collect()
    by_t = {round(r["threshold"], 6): r for r in rows}
    # threshold 0 retains everything with a defined score
    n_texts = sum(1 for t in TEXTS if t is not None)
    assert by_t[0.0]["n_docs"] == n_texts
    assert abs(by_t[0.0]["frac_tokens"] - 1.0) < 1e-9
    # monotone non-increasing in both docs and tokens
    ts = sorted(by_t)
    for a, b in zip(ts, ts[1:]):
        assert by_t[a]["n_docs"] >= by_t[b]["n_docs"]
        assert by_t[a]["n_tokens"] >= by_t[b]["n_tokens"]
