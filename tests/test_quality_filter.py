"""Gopher quality filter vs a python brute replay of every signal and rule."""

from tric_spark.operators.quality_filter import gopher_kept, gopher_quality_filter
from tric_spark.operators.textstats import STOPWORDS


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _brute_signals(text):
    toks = [x for x in (text or "").split(" ") if x]
    n = len(toks)
    mwl = round(sum(len(t) for t in toks) / max(n, 1), 6)
    sh = sum(1 for s in STOPWORDS if s in toks)
    # top2 / dup3 fracs per repetition_metrics' definition
    def grams(k):
        return [" ".join(toks_all[i : i + k]) for i in range(len(toks_all) - k + 1)]

    toks_all = (text or "").split(" ")
    L = max(len(text or ""), 1)
    c2 = {}
    for g in grams(2) if len(toks_all) >= 2 else []:
        c2[g] = c2.get(g, 0) + 1
    top2 = 0.0
    if c2:
        best = sorted(c2.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        top2 = round(best[1] * len(best[0]) / L, 6)
    c3 = {}
    for g in grams(3) if len(toks_all) >= 3 else []:
        c3[g] = c3.get(g, 0) + 1
    dup3 = round(min(1.0, sum(c * len(g) for g, c in c3.items() if c >= 2) / L), 6)
    return n, mwl, sh, top2, dup3


GOOD = (
    "the quick brown fox and a dozen of other animals went to town before"
    " noon while seven wise owls read long letters about maps rivers roads"
    " and many small things near home"
)
SHORT = "too short to pass"
NO_STOP = "alpha beta gamma delta epsilon zeta eta theta " * 5
REPEAT = "spam ham " * 40
LONGWORDS = "supercalifragilistic expialidocious pneumonoultramicroscopic " * 15


def test_signals_match_brute(spark):
    texts = [GOOD.strip(), SHORT, NO_STOP.strip(), REPEAT.strip(), LONGWORDS.strip()]
    out = {
        r.doc_id: r
        for r in gopher_quality_filter(_docs(spark, texts)).collect()
    }
    for i, t in enumerate(texts):
        n, mwl, sh, top2, dup3 = _brute_signals(t)
        r = out[i]
        assert (r.n_tokens, r.mean_word_len, r.stop_hits) == (n, mwl, sh)
        assert (r.top2_frac, r.dup3_frac) == (top2, dup3)


def test_rule_attribution(spark):
    texts = [GOOD.strip(), SHORT, NO_STOP.strip(), REPEAT.strip(), LONGWORDS.strip()]
    out = {
        r.doc_id: r
        for r in gopher_quality_filter(_docs(spark, texts)).collect()
    }
    assert out[0].keep and out[0].n_failed == 0
    assert not out[1].keep  # too short
    assert not out[2].keep and out[2].stop_hits < 2  # no required stopwords
    assert not out[3].keep and out[3].dup3_frac > 0.6  # pure repetition
    assert not out[4].keep and out[4].mean_word_len > 12.0  # absurd words


def test_null_text_fails_token_rule(spark):
    df = spark.createDataFrame([(0, None)], "doc_id long, text string")
    r = gopher_quality_filter(df).collect()[0]
    assert not r.keep and r.n_tokens <= 0


def test_gopher_kept_is_semi_join_of_keeps(spark):
    texts = [GOOD.strip(), SHORT, NO_STOP.strip(), REPEAT.strip(), LONGWORDS.strip()]
    df = _docs(spark, texts)
    flags = {r.doc_id for r in gopher_quality_filter(df).filter("keep").collect()}
    kept = {r.doc_id for r in gopher_kept(df).collect()}
    assert kept == flags == {0}


def test_thresholds_are_knobs(spark):
    df = _docs(spark, [SHORT])
    assert gopher_quality_filter(
        df, min_tokens=2, min_stop_hits=1, max_top2_frac=1.0, max_dup3_frac=1.0
    ).collect()[0].keep


def test_map_only_equals_batch_gate(spark):
    from tric_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    a = {r.doc_id: tuple(r)[1:] for r in gopher_quality_filter(docs).collect()}
    b = {
        r.doc_id: tuple(r)[1:]
        for r in gopher_quality_filter(docs, map_only=True).collect()
    }
    assert a == b and len(a) == 500


def test_stream_gopher_matches_batch(spark, tmp_path):
    """Streaming gate (map-only, stateless, append) must keep exactly the
    batch gate's keep set, with the full input rows passing through."""
    from tric_spark.sources.tables import load_table
    from tric_spark.streaming.quality import stream_gopher_kept

    docs = load_table(spark, "/root/testdata/sf0.01", "documents").limit(300)
    src = str(tmp_path / "qsrc")
    docs.write.parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)
    q = (
        stream_gopher_kept(stream)
        .writeStream.format("memory")
        .queryName("gated_docs")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_q"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("select * from gated_docs").collect()
    q.stop()
    want = {
        r.doc_id
        for r in gopher_quality_filter(docs).filter("keep").collect()
    }
    assert {r.doc_id for r in got} == want
    assert set(got[0].asDict()) == set(docs.columns)  # full rows, no signals
