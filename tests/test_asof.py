"""asof_join: hand-built timelines incl. same-ts ties and no-match."""

import datetime as dt

from tric_spark.operators.asof import asof_join


def _t(s):
    return dt.datetime(2024, 1, 1, 0, 0) + dt.timedelta(seconds=s)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )


def test_asof_basic_and_ties(spark):
    right = _events(
        spark,
        [
            (1, 7, _t(10), 1.0),
            (2, 7, _t(20), 2.0),
            (3, 7, _t(20), 3.0),  # same-ts tie: larger id wins
            (4, 8, _t(50), 4.0),
        ],
    )
    left = _events(
        spark,
        [
            (100, 7, _t(15), 0.0),  # after r1 only
            (101, 7, _t(20), 0.0),  # equal ts -> matches, tie -> id 3
            (102, 7, _t(99), 0.0),  # latest overall -> id 3
            (103, 8, _t(40), 0.0),  # before any right row -> NULL
            (104, 9, _t(40), 0.0),  # user with no right rows -> NULL
        ],
    )
    got = {
        r["event_id"]: (r["r_event_id"], r["r_value"])
        for r in asof_join(left, right, payload=("value",)).collect()
    }
    assert got == {
        100: (1, 1.0),
        101: (3, 3.0),
        102: (3, 3.0),
        103: (None, None),
        104: (None, None),
    }


def test_asof_right_rows_never_leak(spark):
    right = _events(spark, [(1, 7, _t(10), 1.0)])
    left = _events(spark, [(100, 7, _t(15), 0.0)])
    out = asof_join(left, right, payload=("value",))
    assert out.count() == 1
    assert set(out.columns) == {
        "event_id", "user_id", "ts", "r_event_id", "r_value",
    }
