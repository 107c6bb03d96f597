"""event_transitions and langid_confusion vs python references."""

from __future__ import annotations

from collections import Counter
from datetime import datetime

from tric_spark.operators.transitions import event_transitions
from tric_spark.operators.textstats import langid_confusion


def _ts(s):
    return datetime(2024, 1, 1, 0, 0, s)


# user 1 ordered stream incl. a timestamp tie broken by event_id
EV = [
    (0, 1, "view", _ts(0)),
    (1, 1, "click", _ts(5)),
    (2, 1, "click", _ts(5)),  # tie with event 1 -> event_id order
    (3, 1, "purchase", _ts(9)),
    (4, 2, "view", _ts(0)),
    (5, 2, "error", _ts(1)),
    (6, 3, "signup", _ts(2)),  # single event: no transition
]


def test_event_transitions(spark):
    ev = spark.createDataFrame(
        EV, "event_id long, user_id long, event_type string, ts timestamp"
    )
    got = {
        (r["from_type"], r["to_type"]): (r["n"], r["p"])
        for r in event_transitions(ev).collect()
    }
    streams = {}
    for eid, u, t, ts in EV:
        streams.setdefault(u, []).append((ts, eid, t))
    cnt = Counter()
    for s in streams.values():
        s.sort()
        for (_, _, a), (_, _, b) in zip(s, s[1:]):
            cnt[(a, b)] += 1
    tot = Counter()
    for (a, _), n in cnt.items():
        tot[a] += n
    exp = {k: (n, round(n / tot[k[0]], 6)) for k, n in cnt.items()}
    assert got == exp
    # the tie: view->click then click->click then click->purchase
    assert got[("click", "click")][0] == 1


def test_langid_confusion(spark):
    rows = [
        (0, "en", "the cat sat"),
        (1, "en", "no markers here at all"),  # predicts 'de' (tie, asc)
        (2, "de", "der hund und der mann"),
        (3, "fr", "le chat le chien"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {
        (r["actual"], r["pred_lang"]): r["n"]
        for r in langid_confusion(docs).collect()
    }
    assert got == {("en", "en"): 1, ("en", "de"): 1, ("de", "de"): 1, ("fr", "fr"): 1}
