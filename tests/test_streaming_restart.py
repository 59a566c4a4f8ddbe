"""Deployment-path streaming tests: checkpoint restart-resume and a live
processingTime trigger — the semantics a production rollout relies on, beyond the
single-shot availableNow gate runs.

Restart contract under test: two availableNow runs sharing one checkpoint must (a) not
reprocess run-1's input, and (b) produce, across both runs, exactly the finalized
windows a single batch computation yields — no loss, no duplicates. This is how the
engine ships incremental jobs (the cron-driven incremental-batch pattern).
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from rubix_spark.streaming.events import sliding_counts

MIN = 60 * 1_000_000_000  # one minute in nanos (events fixture stores int64 nanos)

_SCHEMA = "event_id bigint, ts bigint, user_id bigint, event_type string, value double, props string"


def _write_events(spark, path, rows):
    spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.mode("append").parquet(path)


def _stream(spark, in_dir):
    from rubix_spark.catalog import ensure_session_confs

    ensure_session_confs(spark)
    raw = spark.readStream.schema(_SCHEMA).format("parquet").load(in_dir)
    return sliding_counts(raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000"))))


def _run_once(spark, in_dir, out_dir, ckpt_dir):
    q = (
        _stream(spark, in_dir)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _evt(i, t_min, etype, v):
    return (i, t_min * MIN, i % 5, etype, float(v), "{}")


def test_checkpoint_restart_resumes_without_loss_or_dupes(spark, tmp_path):
    in_dir, out_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt")

    batch_a = [_evt(i, 2 + i, "view", i) for i in range(8)]  # minutes 2..9
    batch_b = [_evt(100 + i, 31 + i, "click", i) for i in range(8)]  # minutes 31..38
    sentinel = [_evt(999, 600, "flush", 0)]  # far future: advances watermark past A+B

    _write_events(spark, in_dir, batch_a)
    _run_once(spark, in_dir, out_dir, ckpt)

    _write_events(spark, in_dir, batch_b + sentinel)
    _run_once(spark, in_dir, out_dir, ckpt)  # SAME checkpoint → must resume, not replay

    got = sorted(
        tuple(r)
        for r in spark.read.parquet(out_dir).where("event_type <> 'flush'").collect()
    )
    # single-batch truth over the full input (append mode emits only finalized windows,
    # and the sentinel finalizes every A/B window)
    batch_df = spark.createDataFrame(batch_a + batch_b + sentinel, _SCHEMA).withColumn(
        "ts", F.timestamp_micros(F.expr("ts DIV 1000"))
    )
    want = sorted(
        tuple(r) for r in sliding_counts(batch_df).where("event_type <> 'flush'").collect()
    )
    assert got == want
    assert len(got) > 0  # both event types' windows actually emitted


def test_processing_time_trigger_live_run(spark, tmp_path):
    """The continuous deployment mode: a processingTime trigger picks up files appearing
    between micro-batches; stop after the data is through."""
    in_dir, out_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    _write_events(spark, in_dir, [_evt(i, 2 + i, "view", i) for i in range(4)])
    q = (
        _stream(spark, in_dir)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(processingTime="300 milliseconds")
        .start()
    )
    try:
        # second file lands mid-stream; its sentinel finalizes the first file's windows
        _write_events(spark, in_dir, [_evt(999, 600, "flush", 0)])
        deadline = time.time() + 30
        while time.time() < deadline:
            if q.lastProgress and q.lastProgress["numInputRows"] == 0 and spark.read.parquet(
                out_dir
            ).where("event_type = 'view'").count() > 0:
                break
            time.sleep(0.3)
    finally:
        q.stop()
    views = spark.read.parquet(out_dir).where("event_type = 'view'")
    assert views.count() > 0  # windows finalized and emitted while the query was live


def test_processing_time_soak_many_batches_with_midrun_restart(spark, tmp_path):
    """Soak the always-on deployment shape (the reference's daemon posture): a
    processingTime-trigger query stays up across MANY micro-batches while files keep
    arriving, drains its backlog (lag returns to zero), survives a stop/restart on the
    same checkpoint mid-soak, and the union of both incarnations' output equals the
    single-batch truth — no loss, no duplicates, exactly-once to the file sink."""
    in_dir, out_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt")

    def start():
        return (
            _stream(spark, in_dir)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(processingTime="200 milliseconds")
            .start()
        )

    def drain(q, min_batches, expect_rows, deadline_s=60):
        """Wait until the query has consumed every row fed to THIS incarnation (a
        trailing 0-row batch alone can predate the last file being listed), has run
        >= min_batches micro-batches, and the latest batch consumed 0 new rows."""
        deadline = time.time() + deadline_s
        while time.time() < deadline:
            progresses = q.recentProgress
            consumed = sum(p["numInputRows"] for p in progresses)
            drained = bool(progresses) and progresses[-1]["numInputRows"] == 0
            if len(progresses) >= min_batches and consumed >= expect_rows and drained:
                return len(progresses)
            time.sleep(0.2)
        raise AssertionError(
            f"soak did not drain: batches={len(q.recentProgress)}, "
            f"consumed={sum(p['numInputRows'] for p in q.recentProgress)}/{expect_rows}"
        )

    all_rows = []

    def feed(base_id, base_min, n_files, etype):
        for k in range(n_files):
            rows = [_evt(base_id + 10 * k + j, base_min + 10 * k + j, etype, j) for j in range(4)]
            all_rows.extend(rows)
            _write_events(spark, in_dir, rows)
            time.sleep(0.35)  # lands across several trigger intervals, not one batch

    # incarnation 1: files arriving while the query is live
    feed(0, 2, 3, "view")
    q1 = start()
    try:
        feed(1000, 60, 3, "click")
        batches_1 = drain(q1, min_batches=5, expect_rows=24)  # 6 files x 4 rows
    finally:
        q1.stop()

    # incarnation 2: same checkpoint; more arrivals + a far-future sentinel that
    # finalizes every earlier window
    sentinel = [_evt(99999, 6000, "flush", 0)]
    q2 = start()
    try:
        feed(2000, 120, 2, "view")
        all_rows.extend(sentinel)
        _write_events(spark, in_dir, sentinel)
        batches_2 = drain(q2, min_batches=3, expect_rows=9)  # 2 files x 4 + sentinel
    finally:
        q2.stop()

    assert batches_1 + batches_2 >= 8  # a real soak, not one availableNow gulp

    got = sorted(
        tuple(r)
        for r in spark.read.parquet(out_dir).where("event_type <> 'flush'").collect()
    )
    batch_df = spark.createDataFrame(all_rows, _SCHEMA).withColumn(
        "ts", F.timestamp_micros(F.expr("ts DIV 1000"))
    )
    want = sorted(
        tuple(r) for r in sliding_counts(batch_df).where("event_type <> 'flush'").collect()
    )
    assert got == want and len(got) > 0
