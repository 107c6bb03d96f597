"""Crawl-frontier scoring: hand-checked mass shares, crawled pages never
surface, full-outdeg semantics (links to uncrawled targets count in the
denominator), and the per-host top-k politeness window."""

import pytest

from pyspark.sql import functions as F

from tric_spark.operators.frontier import frontier_scores, frontier_topk_per_host


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def _vids(spark, ids):
    return spark.createDataFrame([(int(v),) for v in ids], "vid long")


def _ranks(spark, d):
    return spark.createDataFrame(
        [(int(v), float(r)) for v, r in d.items()], "vid long, rank double"
    )


def test_frontier_scores_hand_golden(spark):
    # crawled {0,1,2}; 0 → {1, 10, 11} (od 3), 1 → {10} (od 1), 2 → {0}
    # frontier: 10 gets r0/3 + r1, 11 gets r0/3; crawled targets excluded
    e = _edges(spark, [(0, 1), (0, 10), (0, 11), (1, 10), (2, 0)])
    ranks = _ranks(spark, {0: 0.6, 1: 0.3, 2: 0.1})
    got = {
        r.vid: r
        for r in frontier_scores(e, _vids(spark, [0, 1, 2]), ranks).collect()
    }
    assert set(got) == {10, 11}
    assert got[10].score == pytest.approx(0.6 / 3 + 0.3)
    assert got[10].n_inlinks == 2
    assert got[11].score == pytest.approx(0.6 / 3)
    assert got[11].n_inlinks == 1


def test_edges_from_uncrawled_srcs_ignored(spark):
    # src 5 is NOT crawled — its outlinks must not score anything
    e = _edges(spark, [(0, 10), (5, 10), (5, 11)])
    got = {
        r.vid: r
        for r in frontier_scores(
            e, _vids(spark, [0]), _ranks(spark, {0: 1.0})
        ).collect()
    }
    assert set(got) == {10}
    assert got[10].score == pytest.approx(1.0)
    assert got[10].n_inlinks == 1


def test_topk_per_host_budget_and_order(spark):
    scores = spark.createDataFrame(
        [
            (10, 0.5, 1),
            (11, 0.5, 1),  # tie with 10 → vid breaks it
            (12, 0.9, 2),
            (20, 0.1, 1),
        ],
        "vid long, score double, n_inlinks long",
    )
    hosts = spark.createDataFrame(
        [(10, "a"), (11, "a"), (12, "a"), (20, "b")], "vid long, host string"
    )
    got = [
        (r.host, r.vid, r.rnk)
        for r in frontier_topk_per_host(scores, hosts, k=2)
        .orderBy("host", "rnk")
        .collect()
    ]
    assert got == [("a", 12, 1), ("a", 10, 2), ("b", 20, 1)]


def test_topk_rounding_makes_order_deterministic(spark):
    # scores differing below 6dp tie after rounding → vid order wins
    scores = spark.createDataFrame(
        [(3, 0.12345649, 1), (1, 0.12345641, 1)],
        "vid long, score double, n_inlinks long",
    )
    hosts = spark.createDataFrame([(1, "h"), (3, "h")], "vid long, host string")
    got = [
        (r.vid, r.rnk, r.score)
        for r in frontier_topk_per_host(scores, hosts, k=2).orderBy("rnk").collect()
    ]
    assert got == [(1, 1, 0.123456), (3, 2, 0.123456)]


def test_empty_frontier(spark):
    # everything already crawled → zero rows, no crash
    e = _edges(spark, [(0, 1), (1, 0)])
    out = frontier_scores(e, _vids(spark, [0, 1]), _ranks(spark, {0: 0.5, 1: 0.5}))
    assert out.count() == 0


def test_politeness_schedule(spark):
    from tric_spark.operators.frontier import politeness_schedule

    scores = spark.createDataFrame(
        [(1, 0.5), (2, 0.5), (3, 0.9), (4, 0.1), (5, 0.7)],
        "vid long, score double",
    )
    hosts = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "a"), (4, "a"), (5, "b")],
        "vid long, host string",
    )
    got = {
        r["vid"]: (r["host"], r["slot"], r["wave"])
        for r in politeness_schedule(scores, hosts, per_host_rate=2).collect()
    }
    # host a order: 3 (.9), 1 (.5, vid tiebreak), 2 (.5), 4 (.1)
    assert got == {
        3: ("a", 1, 1),
        1: ("a", 2, 1),
        2: ("a", 3, 2),
        4: ("a", 4, 2),
        5: ("b", 1, 1),
    }
