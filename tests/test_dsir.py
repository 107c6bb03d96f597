import math

import pytest
from pyspark.sql import functions as F

from tric_spark.operators import dsir

DOCS = [
    # target slice (lang en) speaks "spark fast query"; raw background
    # speaks "slow table scan"
    (0, "spark fast query spark", "en"),
    (1, "fast query spark fast", "en"),
    (2, "slow table scan slow", "de"),
    (3, "table scan slow table", "de"),
    (4, "spark fast query", "fr"),  # target-like doc outside the slice
    (5, "slow table scan", "fr"),
    (6, None, "en"),  # NULL text must be filtered, not scored
]


def _docs(spark):
    return spark.createDataFrame(
        DOCS, "doc_id long, text string, lang string"
    )


def _brute_logweights(n_buckets=1024, seed=17):
    import hashlib

    def bucket(tok):
        h = hashlib.md5(f"dsir:{seed}:{tok}".encode()).hexdigest()
        return int(h[:12], 16) % n_buckets

    rc, tc = {}, {}
    for _, text, lang in DOCS:
        if text is None:
            continue
        for tok in text.split():
            b = bucket(tok)
            rc[b] = rc.get(b, 0) + 1
            if lang == "en":
                tc[b] = tc.get(b, 0) + 1
    rn, tn = sum(rc.values()), sum(tc.values())
    out = {}
    for doc_id, text, _ in DOCS:
        if text is None:
            continue
        toks = text.split()
        s = sum(
            math.log((tc.get(bucket(t), 0) + 1) / (tn + n_buckets))
            - math.log((rc.get(bucket(t), 0) + 1) / (rn + n_buckets))
            for t in toks
        )
        out[doc_id] = (len(toks), round(s / len(toks), 6))
    return out

def test_dsir_matches_brute_force(spark):
    got = {
        r.doc_id: (r.n_toks, r.logw)
        for r in dsir.dsir_logweights(
            _docs(spark), F.col("lang") == "en"
        ).collect()
    }
    want = _brute_logweights()
    assert got == pytest.approx(want)
    assert 6 not in got  # NULL text filtered


def test_dsir_ranking_separates_target_like_docs(spark):
    w = {
        r.doc_id: r.logw
        for r in dsir.dsir_logweights(
            _docs(spark), F.col("lang") == "en"
        ).collect()
    }
    # every target-vocab doc (incl. the out-of-slice one) outranks every
    # background doc
    assert min(w[0], w[1], w[4]) > max(w[2], w[3], w[5])


def test_dsir_select_topk_rank_and_plan(spark):
    top = dsir.dsir_select_topk(_docs(spark), F.col("lang") == "en", k=3)
    rows = top.collect()
    assert [r.rank for r in rows] == [1, 2, 3]
    assert {r.doc_id for r in rows} == {0, 1, 4}
    # scale shape: the k-cut is a TakeOrderedAndProject, not a global sort
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
