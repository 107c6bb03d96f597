"""classify_docs: hashlib replay of the hashed-slot inference."""

import hashlib
import math

from tric_spark.operators.classifier import classify_docs


def _replay(text, n_buckets=1024, seed=29):
    toks = [t for t in text.split(" ") if t]
    ws = []
    for t in toks:
        h = hashlib.md5(f"clf:{seed}:{t}".encode()).hexdigest()
        b = int(h[:12], 16) % n_buckets
        ws.append((b * 2654435761 % 2_000_001) / 1_000_000.0 - 1.0)
    score = round(sum(ws) / len(ws), 6)
    prob = round(1.0 / (1.0 + math.exp(-score)), 6)
    return len(toks), score, prob, prob >= 0.5


def test_classify_replay(spark):
    rows = [
        (0, "the quick brown fox"),
        (1, "spark shuffles  partition data"),  # double space -> dropped
        (2, None),
        (3, "one"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["score"], r["prob"], r["label"])
        for r in classify_docs(df).collect()
    }
    assert set(got) == {0, 1, 3}
    for doc_id, text in [(0, rows[0][1]), (1, rows[1][1]), (3, rows[3][1])]:
        n, score, prob, label = _replay(text)
        g = got[doc_id]
        assert g[0] == n
        assert abs(g[1] - score) < 2e-6 and abs(g[2] - prob) < 2e-6
        assert g[3] == label


def test_classify_deterministic_and_bounded(spark):
    df = spark.createDataFrame(
        [(i, f"tok{i} alpha beta gamma") for i in range(50)],
        "doc_id long, text string",
    )
    a = {r["doc_id"]: r["prob"] for r in classify_docs(df).collect()}
    b = {r["doc_id"]: r["prob"] for r in classify_docs(df).collect()}
    assert a == b
    assert all(0.0 <= p <= 1.0 for p in a.values())
