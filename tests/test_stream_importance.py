"""DSIR expression twin: batch-expr == batch-join estimator, and the
streaming gate == the batch gate over the same rows (unified contract)."""

from pyspark.sql import functions as F

from tric_spark.operators.dsir import (
    dsir_logweights,
    dsir_model,
    dsir_score_expr,
)
from tric_spark.sources.tables import load_table
from tric_spark.streaming.importance import stream_dsir_kept, stream_dsir_scores

SF = "/root/testdata/sf0.01"


def _target():
    return F.col("lang") == "en"


def test_expr_twin_matches_join_estimator(spark):
    docs = load_table(spark, SF, "documents")
    model = dsir_model(docs, _target())
    got = {
        r.doc_id: r.logw
        for r in docs.select("doc_id", dsir_score_expr(model).alias("logw")).collect()
    }
    want = {r.doc_id: r.logw for r in dsir_logweights(docs, _target()).collect()}
    assert got == want and len(got) == 500


def test_expr_twin_scores_unseen_tokens_with_smoothed_default(spark):
    docs = load_table(spark, SF, "documents")
    model = dsir_model(docs, _target())
    _, default_lr, _, _ = model
    # default_lr = ln((rn+B)/(tn+B)) — must apply to a token whose bucket
    # never appeared in training
    out = spark.createDataFrame(
        [(1, "zzz_never_seen_zzz")], "doc_id long, text string"
    ).select(dsir_score_expr(model).alias("logw"))
    assert out.first().logw == round(default_lr, 6)


def test_stream_gate_matches_batch(spark, tmp_path):
    docs = load_table(spark, SF, "documents").limit(300)
    model = dsir_model(docs, _target())
    # derive a threshold that actually splits this corpus: the 100th
    # largest batch score (the gate compares on the ROUNDED value, so the
    # cut is replayable)
    batch = docs.select("doc_id", dsir_score_expr(model).alias("logw"))
    cut = sorted((r.logw for r in batch.collect()), reverse=True)[99]
    src = str(tmp_path / "dsrc")
    docs.write.parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)
    q = (
        stream_dsir_kept(stream, model, min_logw=cut)
        .writeStream.format("memory")
        .queryName("dsir_kept")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_d"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r.doc_id for r in spark.sql("select doc_id from dsir_kept").collect()}
    q.stop()
    want = {r.doc_id for r in batch.filter(F.col("logw") >= cut).collect()}
    assert got == want
    assert 0 < len(want) < 300  # the gate actually separates
