import math
import statistics
from collections import Counter, defaultdict

from tric_spark.operators.anomaly import rate_anomalies
from tric_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"
W, MIN_H = 12, 4


def _brute(rows):
    counts = Counter()
    for ts, et in rows:
        counts[(ts.replace(minute=0, second=0, microsecond=0), et)] += 1
    by_type = defaultdict(list)
    for (h, et), n in counts.items():
        by_type[et].append((h, n))
    want = {}
    for et, series in by_type.items():
        series.sort()
        for i, (h, n) in enumerate(series):
            hist = series[max(0, i - W) : i]
            mu = sigma = z = anom = None
            if hist:
                mu = round(statistics.fmean(x[1] for x in hist), 6)
                if len(hist) >= 2:
                    sigma = round(
                        statistics.stdev(x[1] for x in hist), 6
                    )
            if len(hist) >= MIN_H and sigma is not None and sigma > 0:
                z = round((n - mu) / sigma, 6)
                anom = abs(z) >= 3.0
            want[(h, et)] = (n, mu, sigma, z, anom)
    return want


def test_rate_anomalies_match_brute_force(spark):
    events = load_table(spark, SF, "events")
    rows = [(r.ts, r.event_type) for r in events.select("ts", "event_type").collect()]
    got = {
        (r.ts_hour, r.event_type): (r.n, r.mu, r.sigma, r.z, r.is_anomaly)
        for r in rate_anomalies(events, W, MIN_H, 3.0).collect()
    }
    want = _brute(rows)
    assert set(got) == set(want)
    for k in want:
        gn, gmu, gsig, gz, ga = got[k]
        wn, wmu, wsig, wz, wa = want[k]
        assert gn == wn, k
        for g, w in ((gmu, wmu), (gsig, wsig), (gz, wz)):
            if w is None:
                assert g is None, k
            else:
                assert g is not None and math.isclose(g, w, abs_tol=2e-6), k
        assert ga == wa, k
    # at least some rows have a defined z (the window has history)
    assert any(v[3] is not None for v in want.values())


def test_cohort_retention_matrix(spark):
    import datetime

    from tric_spark.operators.anomaly import cohort_retention

    mon = datetime.datetime(2024, 1, 1)  # a Monday
    rows = [
        # user 1: weeks 0, 1, 2 ; user 2: weeks 0, 2 ; user 3: week 1 only
        (0, mon, 1), (1, mon + datetime.timedelta(days=8), 1),
        (2, mon + datetime.timedelta(days=15), 1),
        (3, mon + datetime.timedelta(days=2), 2),
        (4, mon + datetime.timedelta(days=16), 2),
        (5, mon + datetime.timedelta(days=9), 3),
    ]
    df = spark.createDataFrame(
        [(i, ts, u, "view", 0.0, None) for i, ts, u in rows],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    got = {
        (r.cohort.date().isoformat(), r.period_offset): (r.n_users, r.retention)
        for r in cohort_retention(df).collect()
    }
    assert got[("2024-01-01", 0)] == (2, 1.0)
    assert got[("2024-01-01", 1)] == (1, 0.5)
    assert got[("2024-01-01", 2)] == (2, 1.0)
    assert got[("2024-01-08", 0)] == (1, 1.0)
    assert ("2024-01-08", 1) not in got


def test_user_activity_entropy(spark):
    import math

    from tric_spark.operators.anomaly import user_activity_entropy

    import datetime
    base = datetime.datetime(2024, 1, 1)
    # user 1: 2xA + 2xB (max entropy ln 2); user 2: 4xA (entropy 0)
    rows = [(1, "A"), (1, "A"), (1, "B"), (1, "B")] + [(2, "A")] * 4
    df = spark.createDataFrame(
        [
            (i, base + datetime.timedelta(minutes=i), u, t, 0.0, None)
            for i, (u, t) in enumerate(rows)
        ] + [(99, base, None, "A", 0.0, None)],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    got = {
        r.user_id: (r.n_events, r.n_types, r.entropy)
        for r in user_activity_entropy(df).collect()
    }
    assert got == {
        1: (4, 2, round(math.log(2), 6)),
        2: (4, 1, 0.0),
    }
