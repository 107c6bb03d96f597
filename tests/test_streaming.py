import os

from tric_spark.sources.tables import load_table
from tric_spark.streaming.windows import (
    run_available_now,
    stream_events_from_dir,
    windowed_event_counts,
)

SF = "/root/testdata/sf0.001"


def test_stream_matches_batch(spark, tmp_path):
    """Unified batch/stream contract: the same windowed aggregation over the
    same rows must agree between the streaming plan (availableNow drain with
    watermark) and the static plan."""
    events = load_table(spark, SF, "events")
    src_dir = str(tmp_path / "events_src")
    events.write.parquet(src_dir)

    stream = stream_events_from_dir(spark, src_dir, events.schema)
    agg = windowed_event_counts(stream, window="1 hour", late_threshold="30 minutes")
    q = run_available_now(agg, "ev_counts", str(tmp_path / "ck"))
    got = {
        (r.window_start, r.event_type): (r.n, r.sum_value)
        for r in spark.sql("select * from ev_counts").collect()
    }
    q.stop()

    want = {
        (r.window_start, r.event_type): (r.n, r.sum_value)
        for r in windowed_event_counts(events, window="1 hour").collect()
    }
    assert got == want
    assert len(want) > 10


def test_sliding_window(spark):
    events = load_table(spark, SF, "events")
    slid = windowed_event_counts(events, window="2 hours", slide="1 hour")
    tumb = windowed_event_counts(events, window="1 hour")
    # every event lands in exactly 2 sliding windows vs 1 tumbling window
    assert slid.groupBy().sum("n").collect()[0][0] == 2 * tumb.groupBy().sum("n").collect()[0][0]


def test_stream_dedup_exact_matches_batch_keys(spark, tmp_path):
    """Streaming exact dedup (watermark-bounded state) must keep exactly one
    row per content hash — same key set as the batch dedup."""
    from pyspark.sql import functions as F

    from tric_spark.streaming.windows import stream_dedup_exact, with_text_hash

    docs = load_table(spark, SF, "documents").limit(200)
    dup = docs.filter(F.col("doc_id") < 20).withColumn(
        "doc_id", F.col("doc_id") + 50_000
    )
    ts = F.timestamp_seconds(F.lit(1_700_000_000) + F.col("doc_id") % 600)
    staged = with_text_hash(docs.union(dup)).withColumn("ts", ts)
    src_dir = str(tmp_path / "docs_src")
    staged.write.parquet(src_dir)

    stream = spark.readStream.schema(staged.schema).parquet(src_dir)
    q = (
        stream_dedup_exact(stream, late_threshold="1 hour")
        .writeStream.format("memory")
        .queryName("deduped_docs")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_dd"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("select text_hash from deduped_docs").collect()
    q.stop()

    want = {r.text_hash for r in stream_dedup_exact(staged).select("text_hash").collect()}
    assert len(got) == len(want)  # one survivor per key
    assert {r.text_hash for r in got} == want
    assert len(want) == 200  # the 20 clones were dropped


def test_stream_neardup_candidates_match_batch(spark, tmp_path):
    """VERDICT r3 #8: streaming near-dup candidates (watermark-bounded
    band self-join) must produce the same candidate-pair set as the batch
    banded LSH when every doc arrives within one join window — on the
    dup-heavy fixture (exact-dup families + planted near-dups)."""
    from pyspark.sql import functions as F

    from test_dedup import _dup_heavy_corpus
    from tric_spark.operators import dedup
    from tric_spark.streaming.neardup import stream_neardup_candidates

    docs = _dup_heavy_corpus(spark)
    ts = F.timestamp_seconds(F.lit(1_700_000_000) + F.col("doc_id") % 120)
    staged = docs.withColumn("ts", ts)
    src_dir = str(tmp_path / "docs_src")
    staged.write.parquet(src_dir)

    stream = stream_events_from_dir(spark, src_dir, staged.schema)
    cand = stream_neardup_candidates(
        stream, late_threshold="10 minutes", join_window="10 minutes"
    )
    q = (
        cand.writeStream.format("memory")
        .queryName("neardup_cand")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.a, r.b) for r in spark.sql("select distinct a, b from neardup_cand").collect()
    }
    q.stop()

    # batch twin on the SAME staged rows — and the band hashes are
    # byte-identical to the batch LSH family, so the pair set equals the
    # unguarded lsh_candidate_pairs set
    static = {(r.a, r.b) for r in stream_neardup_candidates(staged).select("a", "b").collect()}
    batch = {(r.a, r.b) for r in dedup.lsh_candidate_pairs(docs, max_bucket=None).collect()}
    assert got == static == batch
    # exact-dup family members share every band — guaranteed candidates
    for f in range(10):
        assert (f * 100, f * 100 + 1) in got


def test_stream_dedup_then_neardup_chain(spark, tmp_path):
    """VERDICT r4 #7: the prescribed pair-bomb guard composition —
    stream_dedup_exact feeding stream_neardup_candidates as ONE streaming
    query (chained stateful operators). The composed candidate set must
    equal the batch neardup pipeline's candidate set over exact-dedup
    representatives, compared at the text_hash level because the streaming
    dedup keeps the first ARRIVAL of each hash while the batch keeps the
    min doc_id — same family, possibly different member id."""
    from pyspark.sql import functions as F

    from test_dedup import _dup_heavy_corpus
    from tric_spark.operators import dedup
    from tric_spark.streaming.neardup import stream_neardup_candidates
    from tric_spark.streaming.windows import stream_dedup_exact, with_text_hash

    docs = _dup_heavy_corpus(spark)
    ts = F.timestamp_seconds(F.lit(1_700_000_000) + F.col("doc_id") % 120)
    staged = with_text_hash(docs).withColumn("ts", ts)
    src_dir = str(tmp_path / "docs_src")
    staged.write.parquet(src_dir)

    stream = stream_events_from_dir(spark, src_dir, staged.schema)
    deduped = stream_dedup_exact(stream, late_threshold="10 minutes")
    # late_threshold=None: the watermark is already defined by the dedup
    # stage — Spark disallows redefining it mid-query
    cand = stream_neardup_candidates(
        deduped, late_threshold=None, join_window="10 minutes"
    )
    q = (
        cand.writeStream.format("memory")
        .queryName("chained_cand")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got_ids = {
        (r.a, r.b) for r in spark.sql("select distinct a, b from chained_cand").collect()
    }
    q.stop()

    # map pair ids → their text hashes so representative choice cancels out
    id2h = {r.doc_id: r.text_hash for r in staged.select("doc_id", "text_hash").collect()}
    got = {tuple(sorted((id2h[a], id2h[b]))) for a, b in got_ids}

    # batch twin: exact pre-pass representatives → unguarded banded LSH —
    # exactly neardup_groups' candidate stage (dedup.py exact pre-pass)
    reps = dedup.dedup_exact(docs.filter(F.col("text").isNotNull()))
    batch_pairs = dedup.lsh_candidate_pairs(reps, max_bucket=None)
    want = {
        tuple(sorted((id2h[r.a], id2h[r.b]))) for r in batch_pairs.collect()
    }
    assert got == want
    # the pair bomb is defused: no intra-family (same-hash) pairs survive
    assert all(ha != hb for ha, hb in got)
    # and the planted near-dup families still surface
    assert len(got) > 0


def test_stream_heavy_hitters_match_batch(spark, tmp_path):
    """Streaming per-key window counts drained via availableNow + the
    batch top-k readout must equal the all-batch path."""
    from tric_spark.streaming.windows import topk_per_window, windowed_key_counts

    events = load_table(spark, SF, "events")
    src_dir = str(tmp_path / "hh_src")
    events.write.parquet(src_dir)

    stream = stream_events_from_dir(spark, src_dir, events.schema)
    agg = windowed_key_counts(stream, key_col="user_id", window="6 hours")
    q = run_available_now(agg, "hh_counts", str(tmp_path / "hh_ck"))
    got = {
        (r.window_start, r.key, r.n, r.rank)
        for r in topk_per_window(spark.sql("select * from hh_counts"), k=3).collect()
    }
    q.stop()

    want = {
        (r.window_start, r.key, r.n, r.rank)
        for r in topk_per_window(
            windowed_key_counts(events, key_col="user_id", window="6 hours"), k=3
        ).collect()
    }
    assert got == want and len(want) > 3
    assert all(rk <= 3 for _, _, _, rk in want)
