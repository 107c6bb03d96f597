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
