"""keyness_by, token_freq_spectrum, windowed funnel."""

import datetime
import math

from tric_spark.operators.funnel import funnel
from tric_spark.operators.textstats import keyness_by, token_freq_spectrum


def test_keyness_distinctive_tokens(spark):
    docs = spark.createDataFrame(
        [
            (0, "le chat le chien", "fr"),
            (1, "le monde le", "fr"),
            (2, "the cat the dog", "en"),
            (3, "the world the", "en"),
            (4, None, "en"),
        ],
        "doc_id long, text string, lang string",
    )
    got = {
        (r.key, r.rank): (r.token, r.n, r.log_odds)
        for r in keyness_by(docs, "lang", k=2).collect()
    }
    # "le" is the most fr-distinctive token, "the" the most en-distinctive
    assert got[("fr", 1)][0] == "le" and got[("en", 1)][0] == "the"
    # hand-check fr/"le": a=4, kt=7, ct=4, gt=14
    a, na, b, nb = 4.5, 3.5, 0.5, 7.5
    want = round(math.log(a / na) - math.log(b / nb), 6)
    assert got[("fr", 1)][2] == want


def test_token_freq_spectrum(spark):
    docs = spark.createDataFrame(
        [(0, "a a a b b c"), (1, "c d")], "doc_id long, text string"
    )
    got = {r.occurrences: r.n_types for r in token_freq_spectrum(docs).collect()}
    # a:3, b:2, c:2, d:1
    assert got == {3: 1, 2: 2, 1: 1}


def test_windowed_funnel_gap(spark):
    base = datetime.datetime(2024, 1, 1)
    rows = [
        # user 1 converts view->click in 10 min (inside 1h window)
        (0, base, 1, "view"),
        (1, base + datetime.timedelta(minutes=10), 1, "click"),
        # user 2 clicks 2h after view (outside window)
        (2, base, 2, "view"),
        (3, base + datetime.timedelta(hours=2), 2, "click"),
    ]
    df = spark.createDataFrame(
        [(i, ts, u, t, 0.0, None) for i, ts, u, t in rows],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    open_f = {r.stage: r.n_users for r in funnel(df, ["view", "click"]).collect()}
    gated = {
        r.stage: r.n_users
        for r in funnel(df, ["view", "click"], max_gap_s=3600).collect()
    }
    assert open_f == {"view": 2, "click": 2}
    assert gated == {"view": 2, "click": 1}
