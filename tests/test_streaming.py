"""Streaming-specific tests: batch-equivalence (SURVEY.md §5 strategy) and a file sink.

The oracle gate already checks s1/s2/s3 against SQL; these tests additionally prove the
*streaming* execution equals the *batch* execution of the same plan on the same data —
the reference analog of byte-equality golden reads.
"""

from __future__ import annotations

from rubix_spark import catalog
from rubix_spark.streaming.events import (
    dedup_stream,
    read_events_stream,
    session_stats,
    sliding_counts,
    _run_available_now,
)
from tests.conftest import SF_SMOKE


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _batch_events(spark):
    return catalog.table(spark, SF_SMOKE, "events")


def test_sliding_batch_equivalence(spark):
    stream_result = _run_available_now(spark, sliding_counts(read_events_stream(spark, SF_SMOKE)))
    batch_result = sliding_counts(_batch_events(spark))
    assert _rows(stream_result) == _rows(batch_result)


def test_session_batch_equivalence(spark):
    stream_result = _run_available_now(spark, session_stats(read_events_stream(spark, SF_SMOKE)))
    batch_result = session_stats(_batch_events(spark))
    assert _rows(stream_result) == _rows(batch_result)


def test_dedup_stream_counts_unique(spark):
    result = _run_available_now(spark, dedup_stream(read_events_stream(spark, SF_SMOKE)))
    expected = _batch_events(spark).select("event_id").distinct().count()
    assert [tuple(r) for r in result.collect()] == [(expected,)]


def test_parquet_sink(spark, tmp_path):
    """writeStream → parquet files sink (append mode): rows land on disk and re-read equal."""
    events = read_events_stream(spark, SF_SMOKE).select("event_id", "user_id", "value")
    out = str(tmp_path / "sink")
    q = (
        events.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    written = spark.read.parquet(out)
    assert written.count() == _batch_events(spark).count()


def test_foreachbatch_upsert_sink(spark, tmp_path):
    """Exactly-once-style sink: each micro-batch MERGEs into a parquet target via
    foreachBatch + ops.upsert (the CDC pattern from the build guide)."""
    import os

    from rubix_spark.ops.upsert import merge_upsert
    from rubix_spark.streaming.events import read_events_stream

    target_dir = str(tmp_path / "target")

    def upsert_batch(batch_df, epoch_id):
        compact = batch_df.groupBy("user_id").count().withColumnRenamed("count", "n")
        if os.path.exists(target_dir):
            current = batch_df.sparkSession.read.parquet(target_dir)
            merged = merge_upsert(current, compact, "user_id")
        else:
            merged = compact
        # write to a staging dir then swap — parquet has no transactional MERGE
        staging = target_dir + "_staging"
        merged.write.mode("overwrite").parquet(staging)
        import shutil

        shutil.rmtree(target_dir, ignore_errors=True)
        os.rename(staging, target_dir)

    q = (
        read_events_stream(spark, SF_SMOKE)
        .writeStream.foreachBatch(upsert_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(target_dir)
    expected = _batch_events(spark).groupBy("user_id").count().withColumnRenamed("count", "n")
    assert _rows(got) == _rows(expected)
