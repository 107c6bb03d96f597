"""Count-Min sketch: python replay equality, never-underestimates
property, exactness at collision-free width, bounded sketch size."""

import hashlib

from tric_spark.operators.sketches import cms_build, cms_heavy_hitters, cms_lookup


def _tokens(spark, words):
    return spark.createDataFrame([(w,) for w in words], "token string")


def _bucket_py(token, d, width, seed=42):
    h = hashlib.md5(f"cms:{seed}:{d}:{token}".encode()).hexdigest()
    return int(h[:12], 16) % width


def _cms_py(words, width, depth, seed=42):
    sk = {}
    for w in words:
        for d in range(depth):
            key = (d, _bucket_py(w, d, width, seed))
            sk[key] = sk.get(key, 0) + 1
    return sk


def test_build_matches_python_replay(spark):
    words = (["the"] * 30 + ["cat"] * 10 + ["dog"] * 5 + ["x", "y", "z"]) * 2
    got = {
        (r.d, r.bucket): r.cnt
        for r in cms_build(_tokens(spark, words), width=16, depth=3).collect()
    }
    assert got == _cms_py(words, 16, 3)


def test_estimates_never_underestimate_and_tight_when_wide(spark):
    words = ["the"] * 30 + ["cat"] * 10 + ["dog"] * 5 + ["q", "r", "s", "t"]
    exact = {w: words.count(w) for w in set(words)}
    # narrow sketch: collisions likely → est ≥ exact always
    tk = _tokens(spark, words)
    est_narrow = {
        r.token: r.est
        for r in cms_lookup(cms_build(tk, width=4, depth=2), tk, width=4, depth=2).collect()
    }
    assert all(est_narrow[w] >= c for w, c in exact.items())
    # wide sketch: 7 distinct tokens in 4096 buckets → no collisions → exact
    est_wide = {
        r.token: r.est
        for r in cms_lookup(
            cms_build(tk, width=4096, depth=4), tk, width=4096, depth=4
        ).collect()
    }
    assert est_wide == exact


def test_sketch_size_bounded(spark):
    words = [f"w{i}" for i in range(3000)]
    n = cms_build(_tokens(spark, words), width=32, depth=3).count()
    assert n <= 32 * 3


def test_heavy_hitters_ranks_frequent_first(spark):
    docs = spark.createDataFrame(
        [(0, "the the the the cat cat dog unique1 unique2")],
        "doc_id long, text string",
    )
    rows = cms_heavy_hitters(docs, k=3, width=2048, depth=4).collect()
    got = [(r.rank, r.token, r.est, r.exact) for r in sorted(rows, key=lambda r: r.rank)]
    assert got[0] == (1, "the", 4, 4)
    assert got[1] == (2, "cat", 2, 2)
    assert all(r.est >= r.exact for r in rows)


def test_cms_build_streams_complete_mode(spark, tmp_path):
    """The sketch build is a plain groupBy count, so it runs UNCHANGED as
    a streaming aggregation (complete output): the drained stream's sketch
    must equal the batch sketch bucket-for-bucket. This is the sketch's
    point — depth·width bounded state on an unbounded stream."""
    words = (["the"] * 25 + ["cat"] * 9 + [f"u{i}" for i in range(30)]) * 3
    batch = _tokens(spark, words)
    src = str(tmp_path / "cms_src")
    batch.write.parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)
    q = (
        cms_build(stream, width=32, depth=3)
        .writeStream.format("memory")
        .queryName("cms_stream")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck_cms"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.d, r.bucket): r.cnt
        for r in spark.sql("select * from cms_stream").collect()
    }
    q.stop()
    want = {
        (r.d, r.bucket): r.cnt
        for r in cms_build(batch, width=32, depth=3).collect()
    }
    assert got == want and got
