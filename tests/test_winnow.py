"""Winnowing fingerprints (winnow.py) vs a pure-python replica, plus the
SIGMOD'03 coverage guarantee on planted overlaps."""

import hashlib

from tric_spark.operators.winnow import winnow_candidates, winnow_fingerprints


def _h(gram: str) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:12], 16)


def _replica(text: str, k: int = 4, w: int = 4):
    toks = [t for t in text.split(" ") if t]
    grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    hs = [_h(g) for g in grams]
    out = set()
    for j in range(len(hs) - w + 1):
        win = hs[j : j + w]
        m = min(win)
        pos = j + max(i for i, v in enumerate(win) if v == m)
        out.add((pos, hs[pos]))
    return out


DOCS = [
    (0, "the quick brown fox jumps over the lazy dog again and again ok"),
    (1, "a b c d e f g h i j k l m n o p"),
    (2, "x x x x x x x x x x"),  # low-entropy run: rightmost-tie rule
    (3, "too short"),
    (4, None),
]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_fingerprints_match_replica(spark):
    got = {
        (r["doc_id"], r["pos"], r["fp"])
        for r in winnow_fingerprints(_df(spark, DOCS)).collect()
    }
    want = {
        (i, p, h)
        for i, t in DOCS
        if t is not None
        for (p, h) in _replica(t)
    }
    assert got == want
    assert not any(d == 3 or d == 4 for d, _, _ in got)  # short/NULL -> none


def test_low_entropy_run_selects_once_per_window_chain(spark):
    # all-identical grams: every window's rightmost min walks forward, so
    # selections are singletons per position — replica already encodes it
    got = {
        (r["pos"], r["fp"])
        for r in winnow_fingerprints(_df(spark, [DOCS[2]])).collect()
    }
    assert got == _replica(DOCS[2][1])


def test_coverage_guarantee_and_candidates(spark):
    # two docs sharing a k+w-1 = 7-token run MUST share >= 1 fingerprint
    shared = "alpha beta gamma delta epsilon zeta eta"
    rows = [
        (10, "one two three " + shared + " four five six seven"),
        (11, "nine eight " + shared + " ten eleven twelve thirteen"),
        (12, "completely different words with no overlap at all here now"),
    ]
    fps = winnow_fingerprints(_df(spark, rows))
    by_doc = {}
    for r in fps.collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[10] & by_doc[11]
    assert not (by_doc[10] & by_doc[12])
    cands = {
        (r["a"], r["b"]): r["n_shared"]
        for r in winnow_candidates(_df(spark, rows), min_shared=1).collect()
    }
    assert (10, 11) in cands
    assert cands[(10, 11)] == len(by_doc[10] & by_doc[11])
    assert (10, 12) not in cands and (11, 12) not in cands
