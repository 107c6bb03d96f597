"""Funnel conversion vs a pure-Python reference."""

from __future__ import annotations

from datetime import datetime

import pytest

from tric_spark.operators.funnel import funnel


def _ts(m):
    return datetime(2024, 1, 1, 0, m)


# user 1: full ordered funnel; user 2: click BEFORE view (doesn't convert
# past view until a later click exists — none does); user 3: view+click,
# no purchase; user 4: purchase only (never enters)
ROWS = [
    (1, "view", _ts(0)), (1, "click", _ts(1)), (1, "purchase", _ts(2)),
    (2, "click", _ts(0)), (2, "view", _ts(1)),
    (3, "view", _ts(0)), (3, "click", _ts(5)),
    (4, "purchase", _ts(0)),
    (1, "error", _ts(3)),
]


def _events(spark):
    return spark.createDataFrame(
        ROWS, "user_id long, event_type string, ts timestamp"
    )


def test_funnel_counts(spark):
    rows = {
        r["stage"]: r
        for r in funnel(_events(spark), ["view", "click", "purchase"]).collect()
    }
    assert rows["view"]["n_users"] == 3  # users 1, 2, 3
    assert rows["click"]["n_users"] == 2  # 1 and 3 (2's click precedes view)
    assert rows["purchase"]["n_users"] == 1  # only 1
    assert abs(rows["click"]["conv_from_prev"] - round(2 / 3, 6)) < 1e-9
    assert abs(rows["purchase"]["conv_from_prev"] - 0.5) < 1e-9
    assert abs(rows["purchase"]["conv_from_first"] - round(1 / 3, 6)) < 1e-9
    assert rows["view"]["conv_from_prev"] == 1.0


def test_funnel_strictly_after(spark):
    # equal timestamps do NOT convert (strict >)
    rows = [(1, "view", _ts(0)), (1, "click", _ts(0))]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    got = {r["stage"]: r["n_users"] for r in funnel(ev, ["view", "click"]).collect()}
    assert got == {"view": 1, "click": 0}


def test_funnel_validation(spark):
    with pytest.raises(ValueError):
        funnel(_events(spark), ["view"])
