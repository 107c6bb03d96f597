from tric_spark.operators.frontier import crawl_budget


def test_crawl_budget_allocation(spark):
    pr = spark.createDataFrame(
        [("a", 0.5), ("b", 0.3), ("c", 0.2)], "host string, rank double"
    )
    dr = spark.createDataFrame(
        [("a", 10, 5, 0.5), ("c", 4, 4, 0.0)],
        "key string, n_docs long, n_unique long, dup_rate double",
    )
    got = {r.host: r for r in crawl_budget(pr, dr).collect()}
    # raws: a=0.25, b=0.3 (no dup entry -> 0), c=0.2; z=0.75
    assert got["a"].weight == round(0.25 / 0.75, 6)
    assert got["b"].weight == round(0.3 / 0.75, 6)
    assert got["c"].weight == round(0.2 / 0.75, 6)
    assert got["b"].dup_rate == 0.0
    # duplicate-heavy host forfeits budget despite highest rank
    assert got["b"].weight > got["a"].weight
