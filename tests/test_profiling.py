import datetime

from tric_spark.operators.profiling import (
    interarrival_quantiles,
    json_schema_profile,
)


def test_json_schema_profile(spark):
    df = spark.createDataFrame(
        [
            ('{"a": 1, "b": "x"}',),
            ('{"a": 2}',),
            ('{"a": "notint", "c": -5}',),
            (None,),
        ],
        "props string",
    )
    got = {
        r.key: (r.n_present, r.n_distinct, r.frac_int)
        for r in json_schema_profile(df).collect()
    }
    assert got["a"] == (3, 3, round(2 / 3, 6))
    assert got["b"] == (1, 1, 0.0)
    assert got["c"] == (1, 1, 1.0)


def test_interarrival_quantiles(spark):
    base = datetime.datetime(2024, 1, 1)
    # user 1, type A at gaps 10s, 20s, 30s, 40s
    offs = [0, 10, 30, 60, 100]
    rows = [
        (i, base + datetime.timedelta(seconds=s), 1, "A", 0.0, None)
        for i, s in enumerate(offs)
    ]
    # another user contributes one 5s gap
    rows += [
        (100, base, 2, "A", 0.0, None),
        (101, base + datetime.timedelta(seconds=5), 2, "A", 0.0, None),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    got = {
        (r.event_type, r.pct): r.value
        for r in interarrival_quantiles(df, pcts=(50, 99)).collect()
    }
    # gaps = [10, 20, 30, 40, 5]; p50 = 3rd of sorted [5,10,20,30,40] = 20
    assert got[("A", 50)] == 20
    assert got[("A", 99)] == 40
