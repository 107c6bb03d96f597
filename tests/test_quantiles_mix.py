"""exact_quantiles (rank-based percentile_disc semantics) and
source_mix_weights (temperature-scaled mixing) vs python referees."""

import math

from tric_spark.operators.textstats import exact_quantiles, source_mix_weights


def _docs_df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string, n_chars long"
    )


def test_exact_quantiles_matches_rank_rule(spark):
    vals = [5, 1, 9, 3, 3, 7, 7, 7, 2, 10, 4, 8]  # n=12, with ties
    rows = [(i, "t", "s", v) for i, v in enumerate(vals)]
    got = {
        r.pct: r.value
        for r in exact_quantiles(_docs_df(spark, rows), "n_chars").collect()
    }
    sv = sorted(vals)
    want = {p: sv[math.ceil(p / 100.0 * len(vals)) - 1] for p in (25, 50, 75, 90, 99)}
    assert got == want


def test_exact_quantiles_pct100_is_max(spark):
    rows = [(i, "t", "s", v) for i, v in enumerate([4, 2, 9, 9, 1])]
    got = {
        r.pct: r.value
        for r in exact_quantiles(
            _docs_df(spark, rows), "n_chars", (50, 100)
        ).collect()
    }
    assert got == {50: 4, 100: 9}


def test_mix_weights_referee(spark):
    rows = [
        (0, "a b c", "s1", 5),
        (1, "a b", "s1", 3),
        (2, "x y z w", "s2", 7),
        (3, None, "s2", 0),  # NULL text -> 0 tokens
        (4, "q", None, 1),  # NULL source -> '' stratum
    ]
    got = {
        r.source: (r.n_docs, r.n_tokens, r.weight)
        for r in source_mix_weights(_docs_df(spark, rows), alpha=0.7).collect()
    }
    toks = {"s1": 3 + 2, "s2": 4 + 0, "": 1}
    ndocs = {"s1": 2, "s2": 2, "": 1}
    z = sum(t**0.7 for t in toks.values())
    want = {s: (ndocs[s], t, round(t**0.7 / z, 6)) for s, t in toks.items()}
    assert got == want
    assert abs(sum(w for _, _, w in got.values()) - 1.0) < 1e-5


def test_mix_weights_alpha1_is_proportional(spark):
    rows = [(0, "a b", "s1", 3), (1, "c d e f", "s2", 7), (2, "g h", "s2", 3)]
    got = {
        r.source: r.weight
        for r in source_mix_weights(_docs_df(spark, rows), alpha=1.0).collect()
    }
    assert got == {"s1": 0.25, "s2": 0.75}


def test_exact_quantiles_by(spark):
    import math

    from tric_spark.operators.textstats import exact_quantiles_by

    rows = [("a", float(v)) for v in range(1, 101)] + [
        ("b", float(v * 10)) for v in (1, 2, 3, 4)
    ]
    df = spark.createDataFrame(rows, "k string, value double")
    got = {
        (r["key"], r["pct"]): r["value"]
        for r in exact_quantiles_by(df, "k", "value").collect()
    }

    def disc(vals, p):
        vals = sorted(vals)
        return vals[math.ceil(p / 100.0 * len(vals)) - 1]

    for p in (25, 50, 75, 90, 99):
        assert got[("a", p)] == disc([float(v) for v in range(1, 101)], p)
        assert got[("b", p)] == disc([10.0, 20.0, 30.0, 40.0], p)
