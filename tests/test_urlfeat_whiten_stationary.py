"""url_features, whiten_embeddings, stationary_distribution."""

import datetime

from tric_spark.operators.embstats import whiten_embeddings
from tric_spark.operators.transitions import stationary_distribution
from tric_spark.operators.urlnorm import url_features


def test_url_features_hand_computed(spark):
    df = spark.createDataFrame(
        [
            ("https://spam123.example.com:8080/a/b/c/d?id=1&x=2&y=3#frag",),
            ("http://clean.org/",),
        ],
        "url string",
    )
    rows = {r.host: r for r in url_features(df).collect()}
    s = rows["spam123.example.com"]
    assert s.path_depth == 4 and s.n_params == 3
    d = sum(c.isdigit() for c in "https://spam123.example.com:8080/a/b/c/d?id=1&x=2&y=3#frag")
    assert s.digit_ratio == round(d / s.url_len, 6)
    c = rows["clean.org"]
    assert c.path_depth == 0 and c.n_params == 0 and c.digit_ratio == 0.0
    assert s.spam_score > c.spam_score


def test_whiten_embeddings_stats(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 7.0]), (1, [3.0, 7.0]), (2, [5.0, 7.0])],
        "vec_id long, embedding array<double>",
    )
    rows = {(r.vec_id, r.dim): r.w for r in whiten_embeddings(df).collect()}
    # dim 1: mean 3, std_pop sqrt(8/3)=1.632993
    assert rows[(0, 1)] == round((1.0 - 3.0) / 1.632993, 6)
    assert rows[(1, 1)] == 0.0
    # dim 2 is dead (std 0) -> all zeros, not a division blowup
    assert rows[(0, 2)] == rows[(2, 2)] == 0.0


def test_stationary_distribution_two_state(spark):
    # chain A->B->A->B... for one user: P(A->B)=1, P(B->A)=1;
    # uniform start is already stationary (0.5, 0.5)
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (i, base + datetime.timedelta(minutes=i), 1, "A" if i % 2 == 0 else "B", 0.0, None)
        for i in range(10)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    got = {r.event_type: r.pi for r in stationary_distribution(df, iters=4).collect()}
    assert got == {"A": 0.5, "B": 0.5}


def test_stationary_distribution_biased(spark):
    # self-loop-heavy state hoards mass: A->A (x3), A->B, B->A
    base = datetime.datetime(2024, 1, 1)
    seq = ["A", "A", "A", "A", "B", "A"]
    rows = [
        (i, base + datetime.timedelta(minutes=i), 1, t, 0.0, None)
        for i, t in enumerate(seq)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    got = {r.event_type: r.pi for r in stationary_distribution(df, iters=8).collect()}
    assert got["A"] > 0.7 and abs(got["A"] + got["B"] - 1.0) < 1e-5
