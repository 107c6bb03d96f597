"""JS divergence between strata vs a pure-Python reference."""

from __future__ import annotations

import math
from collections import Counter

from tric_spark.operators.divergence import js_divergence_by

ROWS = [
    (0, "en", "the cat sat on the mat"),
    (1, "en", "the dog and the cat"),
    (2, "de", "der hund und die katze"),
    (3, "de", "die katze sitzt"),
    (4, "fr", "le chat et le chien the"),  # shares one token with en
    (5, None, "ignored stratum"),
    (6, "en", None),
]


def _py_js(rows):
    dists: dict[str, Counter] = {}
    for _, k, t in rows:
        if k is None or t is None:
            continue
        c = dists.setdefault(k, Counter())
        for w in t.split(" "):
            if w:
                c[w] += 1
    probs = {
        k: {w: c / sum(cnt.values()) for w, c in cnt.items()}
        for k, cnt in dists.items()
    }
    out = {}
    ks = sorted(probs)
    for i, ka in enumerate(ks):
        for kb in ks[i + 1 :]:
            p, q = probs[ka], probs[kb]
            js = 0.0
            for w in set(p) | set(q):
                pw, qw = p.get(w, 0.0), q.get(w, 0.0)
                m = (pw + qw) / 2
                if pw:
                    js += 0.5 * pw * math.log(pw / m)
                if qw:
                    js += 0.5 * qw * math.log(qw / m)
            out[(ka, kb)] = (len(set(p) & set(q)), js)
    return out


def test_js_matches_python(spark):
    docs = spark.createDataFrame(ROWS, "doc_id long, lang string, text string")
    got = {
        (r["key_a"], r["key_b"]): (r["n_shared"], r["js"])
        for r in js_divergence_by(docs).collect()
    }
    exp = _py_js(ROWS)
    assert set(got) == set(exp)
    for k, (ns, js) in exp.items():
        assert got[k][0] == ns
        assert abs(got[k][1] - js) < 1e-6


def test_js_bounds_and_extremes(spark):
    rows = [
        (0, "a", "x y z x y"),
        (1, "b", "x y z x y"),  # identical distribution -> 0
        (2, "c", "p q r s"),  # disjoint from both -> ln 2
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {
        (r["key_a"], r["key_b"]): r["js"] for r in js_divergence_by(docs).collect()
    }
    assert abs(got[("a", "b")]) < 1e-9
    assert abs(got[("a", "c")] - round(math.log(2), 6)) < 1e-9
    assert abs(got[("b", "c")] - round(math.log(2), 6)) < 1e-9
