import datetime
import math

from tric_spark.operators.rfm import rfm_segments


def _py_rfm(rows):
    """Pure-python referee: same percentile_disc thresholds + scoring."""
    per = {}
    for ts, uid, val in rows:
        if uid is None:
            continue
        r = per.setdefault(uid, [None, 0, 0.0])
        r[0] = ts if r[0] is None else max(r[0], ts)
        r[1] += 1
        r[2] += val or 0.0
    users = [(rec, freq, round(mon, 6)) for rec, freq, mon in per.values()]

    def quarts(xs):
        s, n = sorted(xs), len(xs)
        return [s[math.ceil(p * n) - 1] for p in (0.25, 0.50, 0.75)]

    qs = [quarts([u[i] for u in users]) for i in range(3)]
    grid = {}
    for u in users:
        key = tuple(1 + sum(u[i] > q for q in qs[i]) for i in range(3))
        g = grid.setdefault(key, [0, 0.0])
        g[0] += 1
        g[1] += u[2]
    return {
        k: (n, round(tot / n, 6)) for k, (n, tot) in grid.items()
    }


def test_rfm_grid_matches_python_referee(spark):
    base = datetime.datetime(2024, 1, 1)
    rows = []
    for uid in range(12):
        for e in range(1 + uid % 4):
            rows.append(
                (base + datetime.timedelta(hours=uid * 3 + e), uid, 1.5 * uid + e)
            )
    rows.append((base, None, 99.0))  # NULL user excluded
    df = spark.createDataFrame(
        [(i, ts, uid, "view", val, None) for i, (ts, uid, val) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    got = {
        (r.r_score, r.f_score, r.m_score): (r.n_users, r.avg_monetary)
        for r in rfm_segments(df).collect()
    }
    assert got == _py_rfm(rows)
    # every score in 1..4 and grid covers all 12 users
    assert sum(n for n, _ in got.values()) == 12
    assert all(1 <= s <= 4 for k in got for s in k)
