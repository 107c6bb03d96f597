"""Segment (passage) dedup: hand goldens, identity on dup-free corpora,
ordering/reassembly invariants, and a python brute-force oracle over a
random duplicate-heavy corpus."""

import random

from tric_spark.operators.segdedup import (
    dedup_segments,
    doc_segments,
    duplicated_segments,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _brute_segments(text, k):
    toks = text.split(" ")
    segs = [" ".join(toks[i : i + k]) for i in range(0, len(toks), k)]
    return segs or [""]


def _brute_dedup(texts, k):
    seen = set()
    out = []
    for text in texts:
        kept = []
        segs = _brute_segments(text, k)
        n_kept = 0
        for s in segs:
            if s not in seen:
                seen.add(s)
                kept.append(s)
                n_kept += 1
        out.append((" ".join(kept), len(segs), n_kept))
    return out


def test_doc_segments_golden(spark):
    rows = doc_segments(_docs(spark, ["a b c d e", ""]), seg_tokens=2).collect()
    got = {(r.doc_id, r.seg_idx): r.seg for r in rows}
    assert got == {
        (0, 0): "a b",
        (0, 1): "c d",
        (0, 2): "e",
        (1, 0): "",
    }


def test_dedup_golden_first_occurrence_kept(spark):
    # doc1 repeats doc0's first window and its own window internally
    docs = _docs(spark, ["a b c d", "a b a b x"])
    out = {
        r.doc_id: (r.text_clean, r.n_segs, r.n_kept)
        for r in dedup_segments(docs, seg_tokens=2).collect()
    }
    assert out[0] == ("a b c d", 2, 2)
    # doc1 segments: ["a b", "a b", "x"] -> first "a b" already seen (doc0)
    assert out[1] == ("x", 3, 1)


def test_dedup_is_identity_without_duplicates(spark):
    texts = ["a b c d e", "f g h", "i j k l m n"]
    out = {
        r.doc_id: r.text_clean
        for r in dedup_segments(_docs(spark, texts), seg_tokens=2).collect()
    }
    assert [out[i] for i in range(3)] == texts


def test_fully_duplicated_doc_collapses_to_empty(spark):
    docs = _docs(spark, ["a b c d", "a b c d"])
    out = {
        r.doc_id: (r.text_clean, r.n_kept)
        for r in dedup_segments(docs, seg_tokens=2).collect()
    }
    assert out[0] == ("a b c d", 2)
    assert out[1] == ("", 0)


def test_duplicated_segments_audit_points_at_first(spark):
    docs = _docs(spark, ["p q r s", "z z p q", "p q w"])
    rows = duplicated_segments(docs, seg_tokens=2).collect()
    got = {(r.doc_id, r.seg_idx): (r.seg, r.first_id, r.first_seg_idx) for r in rows}
    # "p q" first occurs at (0,0); later copies at (1,1) and (2,0)
    assert got == {
        (1, 1): ("p q", 0, 0),
        (2, 0): ("p q", 0, 0),
    }


def test_brute_oracle_random_corpus(spark):
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(12)]
    # duplicate-heavy: small vocab, short windows, some texts repeated
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randrange(1, 25)))
        for _ in range(40)
    ]
    texts += texts[:8]  # verbatim repeats
    k = 3
    expected = _brute_dedup(texts, k)
    out = {
        r.doc_id: (r.text_clean, r.n_segs, r.n_kept)
        for r in dedup_segments(_docs(spark, texts), seg_tokens=k).collect()
    }
    assert len(out) == len(texts)
    for i, exp in enumerate(expected):
        assert out[i] == exp, f"doc {i}"
