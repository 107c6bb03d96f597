"""Co-visitation vs a pure-Python reference; fanout guard; JSON parsing."""

from __future__ import annotations

import math
from collections import Counter
from itertools import combinations

from tric_spark.operators.covisit import covisitation, covisitation_topk

# (event_id, user_id, item)
EVENTS = [
    (0, 1, 10), (1, 1, 11), (2, 1, 12),
    (3, 2, 10), (4, 2, 11),
    (5, 3, 10), (6, 3, 11), (7, 3, 11),  # dup engagement collapses
    (8, 4, 12), (9, 4, 13),
    (10, 5, None),  # null item dropped
]


def _events(spark, rows=EVENTS):
    data = [
        (i, u, '{"k": %d}' % it if it is not None else "{}")
        for i, u, it in rows
    ]
    return spark.createDataFrame(
        data, "event_id long, user_id long, props string"
    )


def _py_covis(rows):
    ui = {(u, it) for _, u, it in rows if it is not None}
    by_user: dict[int, set[int]] = {}
    for u, it in ui:
        by_user.setdefault(u, set()).add(it)
    n = Counter(it for _, it in ui)
    co = Counter()
    for items in by_user.values():
        for a, b in combinations(sorted(items), 2):
            co[(a, b)] += 1
    return {
        (a, b): (c, round(c / math.sqrt(n[a] * n[b]), 6))
        for (a, b), c in co.items()
    }


def test_covisitation_matches_python(spark):
    got = {
        (r["item_a"], r["item_b"]): (r["n_co"], r["cos"])
        for r in covisitation(_events(spark)).collect()
    }
    assert got == _py_covis(EVENTS)
    # the duplicated (3, 11) engagement counted once
    assert got[(10, 11)][0] == 3


def test_topk_ordering(spark):
    rows = {
        (r["item"], r["rank"]): r["rec"]
        for r in covisitation_topk(_events(spark), k=2).collect()
    }
    # item 10 co-occurs with 11 (3 users) and 12 (1 user)
    assert rows[(10, 1)] == 11
    assert rows[(10, 2)] == 12


def test_fanout_guard(spark):
    # one user touching everything emits no wedges under the cap, but
    # denominators stay exact
    rows = EVENTS + [(20 + i, 9, 100 + i) for i in range(6)]
    audit: dict = {}
    got = covisitation(_events(spark, rows), max_fanout=5, audit=audit)
    items = {
        (r["item_a"], r["item_b"]) for r in got.collect()
    }
    assert not any(a >= 100 or b >= 100 for a, b in items)
    assert audit["oversized_users"].collect()[0]["user_id"] == 9
    # opt-out restores the pairs
    full = covisitation(_events(spark, rows), max_fanout=None)
    assert full.filter("item_a >= 100").count() > 0
