"""neardup_eval: exact ground truth via shingle index, LSH recall/precision."""

from __future__ import annotations

from itertools import combinations

from tric_spark.operators.dedup import neardup_eval

BASE = "the quick brown fox jumps over the lazy dog near the old stone bridge"

TEXTS = [
    BASE,
    BASE,  # exact dup of 0 -> jaccard 1.0, shares every band
    BASE + " today",  # near dup of 0/1
    "completely different words about graphs and spark and engines here",
    "unrelated second text with its own vocabulary and no shared runs",
    None,
]


def _py_shingles(t, n=3):
    toks = [w for w in t.split(" ")]
    if len(toks) < n:
        return {t}
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _py_positives(texts, tau=0.5):
    docs = {i: _py_shingles(t) for i, t in enumerate(texts) if t is not None}
    pos = set()
    for a, b in combinations(sorted(docs), 2):
        inter = len(docs[a] & docs[b])
        if inter == 0:
            continue
        j = round(inter / len(docs[a] | docs[b]), 4)
        if j >= tau:
            pos.add((a, b))
    return pos


def _docs(spark, texts=TEXTS):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_neardup_eval_counts(spark):
    row = neardup_eval(_docs(spark)).collect()[0]
    pos = _py_positives(TEXTS)
    assert row["n_pos"] == len(pos)
    assert len(pos) >= 2  # the exact-dup pair and the near-dup pair(s)
    # exact duplicates share every band, so at least that pair is hit
    assert row["n_hit"] >= 1
    assert row["n_hit"] <= row["n_pos"]
    assert row["n_hit"] <= row["n_cand"]
    if row["n_pos"]:
        assert abs(row["recall"] - round(row["n_hit"] / row["n_pos"], 6)) < 1e-9
    if row["n_cand"]:
        assert (
            abs(row["precision"] - round(row["n_hit"] / row["n_cand"], 6)) < 1e-9
        )


def test_neardup_eval_no_positives(spark):
    texts = [
        "alpha beta gamma delta epsilon zeta",
        "one two three four five six seven",
    ]
    row = neardup_eval(_docs(spark, texts)).collect()[0]
    assert row["n_pos"] == 0
    assert row["recall"] is None


def test_neardup_eval_bucket_guard_audit(spark):
    # cap=1 skips every shingle cell AND every LSH band cell
    audit: dict = {}
    row = neardup_eval(_docs(spark), max_bucket=1, audit=audit).collect()[0]
    assert row["n_pos"] == 0 and row["n_cand"] == 0
    assert audit["oversized_buckets"].count() > 0
