"""Adversarial streaming semantics (r12 verdict #4): GENERATED event streams with
controlled micro-batching against the batch oracles, extending the r12 adversarial
program to the streaming layer.

The registered s* rows run availableNow over a single fixture file — ONE micro-batch,
which hides every cross-batch behavior: watermark-driven drops, state carry-over,
tail-session emission, restart resume. This suite writes streams as directories of
part-files with pinned modification times and forces one-file-per-trigger, so batch
boundaries land exactly where the scenario needs them.

Defects found while building it (each fixed in the same commit, invariant-31 class):
 - session_window MERGES two events exactly 30:00.000000 apart (its merge bound is
   inclusive); the s2 oracle and the s4 custom kernel both split there (>=). All
   three now agree on "new session strictly PAST the gap".
 - the s4 kernel emitted the open tail session at the end of EVERY micro-batch, so a
   session spanning batches double-emitted (a partial snapshot plus the real one);
   bounded runs now finalize last-write-wins per (user_id, session_start).
 - s3's COUNT(DISTINCT) oracle ignored the NULL-key group that dropDuplicates keeps.
 - s1/s2/s6 oracles did not state the event-time contract (NULL ts rows drop).

Pinned contracts:
 - complete-mode aggregations NEVER drop late data (watermark bounds state eviction
   only for append); any multi-batch slicing equals the batch run equals the oracle.
 - append-mode windowed aggregation on in-order streams emits exactly the batch
   result restricted to windows whose end <= the final watermark; with late data the
   emitted rows are a subset with counts never exceeding the batch values.
 - NULL event times drop everywhere an event-time operator runs; NULL keys group.
 - checkpoint restart with appended data resumes state (complete mode reflects the
   full input), and a no-new-input restart leaves the sink unchanged.
"""

from __future__ import annotations

import datetime as dt
import os
import random
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from rubix_spark.queries import load_all
from rubix_spark.streaming.events import (
    _EVENTS_SCHEMA_MICROS,
    _run_available_now,
    dedup_stream,
    purchase_click_join,
    session_stats,
    sliding_counts,
)
from rubix_spark.streaming.stateful import finalize_sessions, stateful_sessions

REG = load_all()
BASE = dt.datetime(2024, 1, 1)
M = dt.timedelta(minutes=1)
US = dt.timedelta(microseconds=1)


def _mk_stream(dirpath: str, rows, files) -> str:
    """rows: (event_id, ts, user_id, event_type, value); files: list of index lists.
    Part-file mtimes increase with file index — the file source orders batches by
    modification time, so file i IS micro-batch i under maxFilesPerTrigger=1."""
    shutil.rmtree(dirpath, ignore_errors=True)
    os.makedirs(dirpath)
    for fi, idxs in enumerate(files):
        sel = [rows[i] for i in idxs]
        tbl = pa.table({
            "event_id": pa.array([r[0] for r in sel], pa.int64()),
            "ts": pa.array([r[1] for r in sel], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in sel], pa.int64()),
            "event_type": pa.array([r[3] for r in sel], pa.string()),
            "value": pa.array([r[4] for r in sel], pa.float64()),
            "props": pa.array([None] * len(sel), pa.string()),
        })
        p = os.path.join(dirpath, f"part-{fi:03d}.parquet")
        pq.write_table(tbl, p)
        os.utime(p, (1_700_000_000 + fi * 10,) * 2)
    return dirpath


def _stream(spark, dirpath, per_trigger: int = 1):
    return (
        spark.readStream.schema(_EVENTS_SCHEMA_MICROS).format("parquet")
        .option("maxFilesPerTrigger", str(per_trigger))
        .load(dirpath)
    )


def _batch(spark, dirpath):
    return spark.read.schema(_EVENTS_SCHEMA_MICROS).parquet(dirpath)


def _canon(tuples):
    rows = [tuple((str(v) if v is not None else None) for v in r) for r in tuples]
    return sorted(rows, key=lambda r: tuple((v is None, v or "") for v in r))


def _rows(df):
    return _canon(df.collect())


def _oracle(name: str, dirpath: str):
    import duckdb

    con = duckdb.connect()
    try:
        con.execute(f"CREATE VIEW events AS SELECT * FROM '{dirpath}/*.parquet'")
        return _canon(con.execute(REG[name].oracle).fetchall())
    finally:
        con.close()


# ------------------------------------------------------------------ boundaries


def test_session_gap_boundary_exact_30min(spark, tmp_path):
    """Exactly 30:00.000000 apart MERGES (session_window's inclusive bound);
    30:00.000001 splits. s2 built-in, the s4 custom kernel, the batch run and the
    DuckDB oracle must all agree — they disagreed before r13 (>= vs >)."""
    rows = [
        (0, BASE, 1, "click", 1.0),
        (1, BASE + 30 * M, 1, "click", 2.0),               # == gap -> merge
        (2, BASE, 2, "click", 1.0),
        (3, BASE + 30 * M + US, 2, "click", 2.0),          # 1 µs past -> split
        (4, BASE, 3, "click", 1.0),
        (5, BASE + 30 * M - US, 3, "click", 2.0),          # 1 µs inside -> merge
    ]
    d = _mk_stream(str(tmp_path / "gap"), rows, [[0, 1, 2, 3, 4, 5]])
    s2 = _rows(_run_available_now(spark, session_stats(_stream(spark, d)), "complete", 4))
    s2_batch = _rows(session_stats(_batch(spark, d)))
    s4 = _rows(finalize_sessions(_run_available_now(
        spark, stateful_sessions(_stream(spark, d)), "append", 4)))
    oracle = _oracle("s2_stream_session", d)
    assert s2 == s2_batch == s4 == oracle
    n_sessions = {u: sum(1 for r in s2 if r[0] == u) for u in ("1", "2", "3")}
    assert n_sessions == {"1": 1, "2": 2, "3": 1}


@pytest.mark.parametrize("seed", range(3))
def test_complete_mode_multibatch_equals_batch_and_oracle(spark, tmp_path, seed):
    """Complete-mode contracts, discovered empirically and pinned:
    - KEYED windows (s1 sliding): complete mode never drops late data — ANY batch
      slicing, even fully time-shuffled, equals the batch run and the oracle;
    - SESSION windows (s2): the merging operator finalizes against the watermark
      even in complete mode, so parity with batch holds for watermark-ordered
      delivery (every batch's rows >= the running watermark) — pinned exactly."""
    rng = random.Random(400 + seed)
    rows = []
    for i in range(120):
        rows.append((
            i,
            BASE + dt.timedelta(seconds=rng.randint(0, 7200)),
            rng.choice([1, 2, 3, None]),
            rng.choice(["click", "view", "purchase"]),
            rng.choice([None, 0.0, rng.uniform(-100, 100)]),
        ))
    rows.append((120, None, 1, "click", 5.0))  # NULL event time

    # s1: fully shuffled batches — maximal lateness adversity, still exact
    idx = list(range(len(rows)))
    rng.shuffle(idx)
    cuts = sorted(rng.sample(range(1, len(idx)), 3))
    files = [idx[a:b] for a, b in zip([0] + cuts, cuts + [len(idx)])]
    d = _mk_stream(str(tmp_path / f"cm{seed}"), rows, files)
    got = _rows(_run_available_now(spark, sliding_counts(_stream(spark, d)), "complete", 4))
    assert got == _rows(sliding_counts(_batch(spark, d))), "s1: stream != batch"
    assert got == _oracle("s1_stream_sliding", d), "s1: stream != oracle"

    # s2: watermark-ordered batches — sessions merge across batches, exact parity
    idx2 = sorted(range(len(rows)), key=lambda i: (rows[i][1] is None, rows[i][1] or BASE))
    cuts2 = sorted(rng.sample(range(1, len(idx2)), 3))
    files2 = [idx2[a:b] for a, b in zip([0] + cuts2, cuts2 + [len(idx2)])]
    d2 = _mk_stream(str(tmp_path / f"cm2{seed}"), rows, files2)
    got2 = _rows(_run_available_now(spark, session_stats(_stream(spark, d2)), "complete", 4))
    assert got2 == _rows(session_stats(_batch(spark, d2))), "s2: stream != batch"
    assert got2 == _oracle("s2_stream_session", d2), "s2: stream != oracle"


def test_session_window_under_shuffled_delivery_is_bounded_and_deterministic(spark, tmp_path):
    """Characterization: session windows under time-SHUFFLED multi-batch delivery
    can diverge from the batch run (observed on random corpora: some sessions
    carry fewer events — a slightly-late row still merges, a batches-late one does
    not; keyed windows never diverge, proven above). Since the exact drop rule is
    an engine internal, pin the stable contract instead: (a) the same shuffled
    delivery twice gives the identical result; (b) the stream never INVENTS events
    (total n_events and per-user counts <= the batch run); (c) every value is an
    honest aggregate of real events (total_v of each user bounded by the batch
    user total row count). Session parity is exact iff delivery is
    watermark-ordered — the contract the suite's equality test pins."""
    rng = random.Random(999)
    rows = [
        (i, BASE + dt.timedelta(seconds=rng.randint(0, 7200)), rng.choice([1, 2, 3]),
         "click", 1.0)
        for i in range(120)
    ]
    idx = list(range(len(rows)))
    rng.shuffle(idx)
    files = [idx[:30], idx[30:60], idx[60:90], idx[90:]]
    d = _mk_stream(str(tmp_path / "shuffled"), rows, files)
    got1 = _rows(_run_available_now(spark, session_stats(_stream(spark, d)), "complete", 4))
    got2 = _rows(_run_available_now(spark, session_stats(_stream(spark, d)), "complete", 4))
    assert got1 == got2, "shuffled-delivery session output must be deterministic"
    batch_per_user: dict = {}
    for r in session_stats(_batch(spark, d)).collect():
        batch_per_user[r.user_id] = batch_per_user.get(r.user_id, 0) + r.n_events
    got_per_user: dict = {}
    for u, _, n, _ in got1:
        got_per_user[u] = got_per_user.get(u, 0) + int(n)
    for u, n in got_per_user.items():
        assert n <= batch_per_user[int(u)], f"user {u}: stream invented events"


def test_append_mode_emits_batch_prefix_in_order(spark, tmp_path):
    """In-order stream, append mode: emitted rows == the batch result restricted to
    windows whose end <= final watermark (max ts − 15 min); the unfinished tail is
    withheld — that is the documented cost of append over bounded input."""
    def tumbling(ev):
        return (
            ev.withWatermark("ts", "15 minutes")
            .groupBy(F.window("ts", "10 minutes").alias("w"))
            .agg(F.count("*").alias("c"))
            .select(F.col("w.start").alias("ws"), F.col("w.end").alias("we"), "c")
        )

    rows = [(i, BASE + i * 7 * M, 1, "click", 1.0) for i in range(20)]  # 0..133 min
    files = [[0, 1, 2, 3, 4], [5, 6, 7, 8, 9, 10], [11, 12, 13, 14], [15, 16, 17, 18, 19]]
    d = _mk_stream(str(tmp_path / "append"), rows, files)
    got = _rows(_run_available_now(spark, tumbling(_stream(spark, d)), "append", 4))
    final_wm = rows[-1][1] - dt.timedelta(minutes=15)
    want = _rows(tumbling(_batch(spark, d)).where(F.col("we") <= F.lit(final_wm)))
    assert got == want and len(got) > 0


@pytest.mark.parametrize("seed", range(2))
def test_append_mode_late_data_is_bounded_and_deterministic(spark, tmp_path, seed):
    """Adversarial late data around the watermark (±1 µs, very-late): append output
    must be a subset of the batch result with per-window counts never above the
    batch counts (no invented or double-counted rows), and the same batching run
    twice must be identical (drop decisions are deterministic)."""
    def tumbling(ev):
        return (
            ev.withWatermark("ts", "15 minutes")
            .groupBy(F.window("ts", "10 minutes").alias("w"))
            .agg(F.count("*").alias("c"))
            .select(F.col("w.start").alias("ws"), "c")
        )

    rng = random.Random(800 + seed)
    wm_anchor = BASE + 60 * M  # batch-1 max -> watermark 45 min
    rows = [(0, BASE + M, 1, "click", 1.0), (1, wm_anchor, 1, "click", 1.0)]
    late_pool = [
        BASE + 45 * M, BASE + 45 * M - US, BASE + 45 * M + US, BASE + M,
        BASE + 39 * M, BASE + 41 * M, BASE + 44 * M, BASE + 46 * M,
    ]
    for i in range(2, 14):
        rows.append((i, rng.choice(late_pool), 1, "click", 1.0))
    files = [[0, 1], list(range(2, 8)), list(range(8, 14))]
    d = _mk_stream(str(tmp_path / f"late{seed}"), rows, files)
    got1 = _rows(_run_available_now(spark, tumbling(_stream(spark, d)), "append", 4))
    got2 = _rows(_run_available_now(spark, tumbling(_stream(spark, d)), "append", 4))
    assert got1 == got2, "append drop decisions must be deterministic"
    batch = {r[0]: int(r[1]) for r in _rows(tumbling(_batch(spark, d)))}
    for ws, c in got1:
        assert ws in batch and int(c) <= batch[ws], (ws, c, batch)


# ------------------------------------------------------------------ NULL contracts


def test_null_ts_and_null_keys_single_batch(spark, tmp_path):
    """NULL event times drop from every event-time operator (batch AND stream);
    NULL group keys form their own group. The fixed oracles state both."""
    rows = [
        (0, BASE, 1, "click", 1.0),
        (1, None, 1, "click", 5.0),          # NULL ts: dropped by s1/s2, kept by s3
        (2, BASE, None, "click", 2.0),       # NULL user: groups
        (3, BASE + M, None, "click", 3.0),
        (4, BASE + 2 * M, 2, "click", None),  # NULL value: SUM skips
        (5, None, None, "view", None),
    ]
    d = _mk_stream(str(tmp_path / "nulls"), rows, [[0, 1, 2, 3, 4, 5]])
    for plan, name in ((sliding_counts, "s1_stream_sliding"),
                       (session_stats, "s2_stream_session")):
        got = _rows(_run_available_now(spark, plan(_stream(spark, d)), "complete", 4))
        assert got == _oracle(name, d), name
    s4 = _rows(finalize_sessions(_run_available_now(
        spark, stateful_sessions(_stream(spark, d)), "append", 4)))
    assert s4 == _oracle("s4_stateful_session", d)


def test_s3_dedup_null_keys_and_cross_batch_duplicates(spark, tmp_path):
    """dropDuplicates: duplicate ids collapse ACROSS batches within the watermark
    horizon, NULL ids form one survivor group, NULL-ts rows are kept (dedup state
    is keyed, not windowed) — the oracle now adds the NULL group COUNT(DISTINCT)
    ignores."""
    rows = [
        (10, BASE, 1, "click", 1.0),
        (11, BASE + M, 1, "click", 1.0),
        (10, BASE + 2 * M, 1, "click", 1.0),       # dup across batches
        (12, BASE + 3 * M, 1, "click", 1.0),
        (None, BASE + 4 * M, 1, "click", 1.0),     # NULL id
        (None, BASE + 5 * M, 1, "click", 1.0),     # NULL id dup
        (13, None, 1, "click", 1.0),               # NULL ts, unique id
        (11, None, 1, "click", 1.0),               # NULL ts, dup id
    ]
    d = _mk_stream(str(tmp_path / "dedup"), rows, [[0, 1], [2, 3, 4], [5, 6, 7]])
    got = _rows(_run_available_now(spark, dedup_stream(_stream(spark, d)), "complete", 4))
    assert got == _oracle("s3_stream_dedup", d) == [("5",)]  # {10,11,12,13,NULL}


def test_s5_join_interval_boundary_and_null_keys(spark, tmp_path):
    """Stream-stream interval join: clicks exactly AT p_ts−30:00 and AT p_ts are
    inside (the oracle's >=/<=), 1 µs outside on either end is out; NULL user or
    NULL ts never joins (SQL predicate semantics). In-order multi-batch equals
    the batch interval-join oracle exactly."""
    P = BASE + 60 * M
    rows = [
        (0, P - 30 * M - US, 1, "click", 1.0),   # 1 µs too old
        (1, P - 30 * M, 1, "click", 1.0),        # boundary: in
        (2, P - M, 1, "click", 1.0),             # in
        (3, P, 1, "click", 1.0),                 # boundary: in
        (4, P + US, 1, "click", 1.0),            # after purchase: out
        (5, P - M, None, "click", 1.0),          # NULL user: out
        (6, None, 1, "click", 1.0),              # NULL ts: out
        (7, P, 1, "purchase", 9.0),
        (8, P, None, "purchase", 9.0),           # NULL-user purchase joins nothing
    ]
    d = _mk_stream(str(tmp_path / "join"), rows, [[0, 1, 2, 5, 6], [3, 4, 7, 8]])
    got = _rows(_run_available_now(
        spark, purchase_click_join(_stream(spark, d)), "append", 4))
    assert got == _oracle("s5_stream_stream_join", d)
    assert len(got) == 3  # clicks 1, 2, 3


# ------------------------------------------------------------------ restart/resume


def test_checkpoint_restart_resumes_state_and_is_idempotent(spark, tmp_path):
    """The s6 production shape under adversity: start on batch 1, RESTART from the
    same checkpoint after new files (including late rows) arrive — complete mode
    must reflect the full input (state restored, not recomputed from scratch);
    a third start with no new input must leave the sink byte-identical."""
    rows = [
        (0, BASE, 1, "click", 1.0),
        (1, BASE + 3 * M, 1, "click", 1.0),
        # arrives after the restart: same window as 0/1 (state must still be live)
        (2, BASE + 4 * M, 1, "click", 1.0),
        (3, BASE + 90 * M, 1, "click", 1.0),
        (4, BASE + M, 1, "view", 1.0),  # late vs batch-2 max; complete keeps it
    ]
    d = str(tmp_path / "restart")
    _mk_stream(d, rows, [[0, 1]])
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def run_once():
        def write_batch(bdf, batch_id):
            bdf.write.mode("overwrite").parquet(out_dir)

        q = (
            sliding_counts(_stream(spark, d, per_trigger=1))
            .writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", ckpt)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    first = _rows(spark.read.parquet(out_dir))
    assert len(first) > 0

    # new files land (one with late data), stream restarts from the checkpoint
    extra = [rows[2], rows[3]]
    tbl = pa.table({
        "event_id": pa.array([r[0] for r in extra], pa.int64()),
        "ts": pa.array([r[1] for r in extra], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in extra], pa.int64()),
        "event_type": pa.array([r[3] for r in extra], pa.string()),
        "value": pa.array([r[4] for r in extra], pa.float64()),
        "props": pa.array([None] * len(extra), pa.string()),
    })
    pq.write_table(tbl, os.path.join(d, "part-101.parquet"))
    os.utime(os.path.join(d, "part-101.parquet"), (1_700_000_100,) * 2)
    tbl2 = pa.table({
        "event_id": pa.array([rows[4][0]], pa.int64()),
        "ts": pa.array([rows[4][1]], pa.timestamp("us")),
        "user_id": pa.array([rows[4][2]], pa.int64()),
        "event_type": pa.array([rows[4][3]], pa.string()),
        "value": pa.array([rows[4][4]], pa.float64()),
        "props": pa.array([None], pa.string()),
    })
    pq.write_table(tbl2, os.path.join(d, "part-102.parquet"))
    os.utime(os.path.join(d, "part-102.parquet"), (1_700_000_110,) * 2)

    run_once()
    second = _rows(spark.read.parquet(out_dir))
    # complete mode + restored state == the batch run over ALL rows == the oracle
    assert second == _rows(sliding_counts(_batch(spark, d)))
    assert second == _oracle("s6_stream_durable_sink", d)

    run_once()  # no new input: pure recovery pass
    assert _rows(spark.read.parquet(out_dir)) == second


def test_s4_session_spans_micro_batches(spark, tmp_path):
    """A session whose events arrive in different micro-batches must emit exactly
    once with the full totals (the kernel's per-batch tail snapshot double-emitted
    before r13 — finalize_sessions keeps only the final snapshot per session)."""
    rows = [
        (0, BASE, 1, "click", 1.0),
        (1, BASE + 5 * M, 1, "click", 2.0),     # batch 2: continues the session
        (2, BASE + 120 * M, 1, "click", 4.0),   # batch 2: new session
        (3, BASE + 6 * M, 2, "click", None),    # all-NULL-value session
    ]
    d = _mk_stream(str(tmp_path / "span"), rows, [[0], [1, 2, 3]])
    got = _rows(finalize_sessions(_run_available_now(
        spark, stateful_sessions(_stream(spark, d)), "append", 4)))
    assert got == _oracle("s4_stateful_session", d)
    assert got == [
        ("1", "2024-01-01 00:00:00", "2", "3.0"),
        ("1", "2024-01-01 02:00:00", "1", "4.0"),
        ("2", "2024-01-01 00:06:00", "1", None),
    ]


# --------------------------------------------------- s8 event-time timeout close
def test_s8_timeout_emits_exactly_watermark_proven_sessions(spark, tmp_path):
    """The continuous-close kernel: emitted == oracle == s4's finalized set minus
    the tails the final watermark cannot prove closed — and the trap must FIRE
    (invariant 36): some sessions must close via TIMEOUT (not by later data) and
    some must be withheld, or the run proves nothing."""
    from rubix_spark.streaming.stateful import (
        _run_append_until_quiescent,
        stateful_sessions,
        stateful_sessions_timeout,
    )

    rows = [
        # user 1: two sessions; the first closes BY DATA, the second by timeout
        (0, BASE, 1, "a", 1.0),
        (1, BASE + 10 * M, 1, "a", 2.0),
        (2, BASE + 50 * M, 1, "a", 3.0),        # ends 50M; deadline 80M < 120M max
        # user 2: one session only a TIMEOUT can close (no later data for the key)
        (3, BASE + 20 * M, 2, "b", None),       # all-NULL-value session via timeout
        # user 3: the unprovable tail (ends at the global max)
        (4, BASE + 120 * M, 3, "c", 6.0),
        # user 4: ends close enough to the max that its deadline is NOT passed
        (5, BASE + 100 * M, 4, "c", 7.0),       # deadline 130M > 120M: withheld
    ]
    d = _mk_stream(str(tmp_path / "s8"), rows, [[0, 1, 2, 3, 4, 5]])
    got = _rows(_run_append_until_quiescent(
        spark, stateful_sessions_timeout(_stream(spark, d)), partitions=4))
    assert got == _oracle("s8_stream_timeout_sessions", d)
    assert got == [
        ("1", "2024-01-01 00:00:00", "2", "3.0"),
        ("1", "2024-01-01 00:50:00", "1", "3.0"),
        ("2", "2024-01-01 00:20:00", "1", None),
    ]
    # the withheld set is exactly the difference vs the bounded-run (s4) semantics
    s4 = _rows(finalize_sessions(_run_available_now(
        spark, stateful_sessions(_stream(spark, d)), "append", 4)))
    withheld = [r for r in s4 if r not in got]
    assert withheld == [
        ("3", "2024-01-01 02:00:00", "1", "6.0"),
        ("4", "2024-01-01 01:40:00", "1", "7.0"),
    ]


def test_s8_deadline_watermark_millisecond_boundary(spark, tmp_path):
    """Pin the MEASURED GroupState fire rule: timeouts are millisecond-granular and
    fire on deadline STRICTLY below the watermark — a session whose close deadline
    lands in the watermark's exact millisecond stays open (the oracle's
    ceil_ms(end + gap) < floor_ms(max ts) predicate states it)."""
    from rubix_spark.streaming.stateful import (
        _run_append_until_quiescent,
        stateful_sessions_timeout,
    )

    MS = dt.timedelta(milliseconds=1)
    rows = [
        (0, BASE + 30 * M - MS, 1, "a", 1.0),   # deadline 60M-1ms < wm 60M: fires
        (1, BASE + 30 * M, 2, "a", 2.0),        # deadline == wm exact ms: stays open
        (2, BASE + 30 * M + MS, 3, "a", 3.0),   # deadline past wm: stays open
        # sub-ms probe: 1µs under the gap boundary still CEILS into the wm
        # millisecond, so it must stay open too (the µs->ms seam, armed with ceil)
        (3, BASE + 30 * M - US, 4, "a", 4.0),
        (4, BASE + 60 * M, 9, "z", 0.0),        # the watermark carrier (max ts)
    ]
    d = _mk_stream(str(tmp_path / "s8b"), rows, [[0, 1, 2, 3, 4]])
    got = _rows(_run_append_until_quiescent(
        spark, stateful_sessions_timeout(_stream(spark, d)), partitions=4))
    assert got == _oracle("s8_stream_timeout_sessions", d)
    assert got == [("1", "2024-01-01 00:29:59.999000", "1", "1.0")]


def test_s8_data_closed_session_at_stream_end_is_emitted(spark, tmp_path):
    """A session closed BY DATA is final regardless of the watermark — even when
    the closing event lands within 1 ms past the gap AND is the global max ts, so
    the ms-granular timeout predicate would reject it. The oracle must emit every
    non-tail session unconditionally and apply the watermark rule only to each
    user's tail (a single watermark predicate over all sessions was the review-
    caught defect: kernel and oracle diverged exactly in this 1 ms window)."""
    from rubix_spark.streaming.stateful import (
        _run_append_until_quiescent,
        stateful_sessions_timeout,
    )

    rows = [
        (0, BASE, 1, "a", 1.0),
        # closes session 1 by data: 1µs past the gap, and IS the global max —
        # ceil_ms(end+gap) == floor_ms(max ts), so the timeout rule alone says no
        (1, BASE + 30 * M + US, 1, "a", 2.0),
    ]
    d = _mk_stream(str(tmp_path / "s8dc"), rows, [[0, 1]])
    got = _rows(_run_append_until_quiescent(
        spark, stateful_sessions_timeout(_stream(spark, d)), partitions=4))
    assert got == _oracle("s8_stream_timeout_sessions", d)
    # session 1 emitted (data-closed); session 2 is the unprovable tail
    assert got == [("1", "2024-01-01 00:00:00", "1", "1.0")]


def test_s8_session_spans_micro_batches_emits_once(spark, tmp_path):
    """A session continued across micro-batches emits ONCE with full totals and no
    finalize pass (unlike s4's per-batch snapshots); slicing does not change the
    emitted set (wm-ordered delivery)."""
    from rubix_spark.streaming.stateful import (
        _run_append_until_quiescent,
        stateful_sessions_timeout,
    )

    rows = [
        (0, BASE, 1, "a", 1.0),
        (1, BASE + 5 * M, 1, "a", 2.0),          # batch 2 continues the session
        (2, BASE + 120 * M, 1, "a", 4.0),        # batch 2 opens a new session
        (3, BASE + 6 * M, 2, "b", None),
        (4, BASE + 240 * M, 9, "z", 0.0),        # batch 3: wm carrier closes all
    ]
    sliced = _mk_stream(str(tmp_path / "s8sp"), rows, [[0], [1, 2, 3], [4]])
    got = _rows(_run_append_until_quiescent(
        spark, stateful_sessions_timeout(_stream(spark, sliced)), partitions=4))
    assert got == _oracle("s8_stream_timeout_sessions", sliced)
    one_batch = _mk_stream(str(tmp_path / "s8one"), rows, [[0, 1, 2, 3, 4]])
    assert got == _rows(_run_append_until_quiescent(
        spark, stateful_sessions_timeout(_stream(spark, one_batch)), partitions=4))
    assert got == [
        ("1", "2024-01-01 00:00:00", "2", "3.0"),
        ("1", "2024-01-01 02:00:00", "1", "4.0"),
        ("2", "2024-01-01 00:06:00", "1", None),
    ]


def test_s8_restart_fires_newly_eligible_timeouts_once(spark, tmp_path):
    """Checkpoint restart: sessions withheld in run 1 (deadline past run-1's final
    watermark) emit in run 2 once appended data advances the watermark past them —
    exactly once, via the restored state's re-armed timeout."""
    import time as _time

    from rubix_spark.streaming.stateful import stateful_sessions_timeout

    d = str(tmp_path / "s8r")
    ck = str(tmp_path / "ck")
    sink: list = []

    def run(per_trigger=1, wait_s=30.0):
        def capture(bdf, bid):
            sink.extend(bdf.collect())

        q = (
            stateful_sessions_timeout(_stream(spark, d, per_trigger))
            .writeStream.foreachBatch(capture)
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(processingTime="100 milliseconds")
            .start()
        )
        t0 = _time.time()
        while _time.time() - t0 < wait_s:
            rp = q.recentProgress
            if rp and rp[-1]["numInputRows"] == 0 and not q.status["isDataAvailable"]:
                break
            _time.sleep(0.1)
        q.stop()
        q.awaitTermination()

    rows1 = [
        (0, BASE, 1, "a", 1.0),
        (1, BASE + 50 * M, 9, "z", 0.0),  # wm 50M: user 1 deadline 30M < 50M fires
        (2, BASE + 45 * M, 2, "b", 2.0),  # deadline 75M > 50M: withheld in run 1
    ]
    _mk_stream(d, rows1, [[0, 1, 2]])
    run()
    got1 = _canon([tuple(r) for r in sink])
    assert got1 == [("1", "2024-01-01 00:00:00", "1", "1.0")]

    # append a later file (mtime past the existing ones); the restart restores
    # state for user 2 and the advanced watermark must close it exactly once
    tbl = pa.table({
        "event_id": pa.array([3], pa.int64()),
        "ts": pa.array([BASE + 240 * M], pa.timestamp("us")),
        "user_id": pa.array([9], pa.int64()),
        "event_type": pa.array(["z"], pa.string()),
        "value": pa.array([0.0], pa.float64()),
        "props": pa.array([None], pa.string()),
    })
    p = os.path.join(d, "part-900.parquet")
    pq.write_table(tbl, p)
    os.utime(p, (1_700_000_900,) * 2)
    sink.clear()
    run()
    got2 = _canon([tuple(r) for r in sink])
    # run 2 emits ONLY the newly provable sessions: user 2's restored session and
    # user 9's first session (50M, now gap-closed by its own 240M event)
    assert got2 == [
        ("2", "2024-01-01 00:45:00", "1", "2.0"),
        ("9", "2024-01-01 00:50:00", "1", "0.0"),
    ]


def test_s8_empty_source_returns_empty_quickly(spark, tmp_path):
    """A stream directory with ZERO files never executes a batch (no progress rows
    at all) — the quiescence runner must short-circuit, not spin its full
    max_wait."""
    import time as _time

    from rubix_spark.streaming.stateful import (
        _run_append_until_quiescent,
        stateful_sessions_timeout,
    )

    d = str(tmp_path / "empty")
    os.makedirs(d)
    t0 = _time.time()
    out = _run_append_until_quiescent(
        spark, stateful_sessions_timeout(_stream(spark, d)), partitions=4, max_wait_s=60
    )
    assert out.count() == 0
    assert _time.time() - t0 < 30


# ------------------------------------------------------- s7 incremental dedup
def test_s7_incremental_dedup_multibatch_matches_oracle(spark, tmp_path, monkeypatch):
    """s7 (foreachBatch vs the persisted corpus band index) under FORCED
    multi-batch delivery (maxFilesPerTrigger=1) on an adversarial corpus: exact
    copies of corpus docs spread across micro-batches, empty/punct-only/unicode
    docs, and a new doc duplicated inside one batch. The driver gate and the
    fixture corpora drain the whole stream in ONE batch (all doc_ids < the
    INCR_SPLIT, so the row was passing VACUOUSLY — zero 'new' docs); this pins
    the per-batch aggregation contract (a doc's bands never split across
    batches, so per-batch min(dup_of) IS the global min) with real matches."""
    import random

    from rubix_spark.ops.dedup import INCR_SPLIT

    monkeypatch.setenv("RUBIX_WAREHOUSE_DIR", str(tmp_path / "wh"))
    monkeypatch.setenv("RUBIX_S7_MAX_FILES_PER_TRIGGER", "1")

    rng = random.Random(79)
    vocab = ["the", "cat", "sat", "mat", "dog", "ran", "far", "ünïcode", "42", "x"]

    def text(n):
        return " ".join(rng.choice(vocab) for _ in range(n))

    corpus = {i: text(rng.randint(25, 60)) for i in range(40)}
    corpus[40] = ""                 # empty corpus doc
    corpus[41] = "...!!!___"        # punct-only
    new = {
        INCR_SPLIT + 0: corpus[3],            # exact copy -> guaranteed band hit
        INCR_SPLIT + 1: corpus[7],
        INCR_SPLIT + 2: corpus[7],            # two new docs duping the SAME corpus doc
        INCR_SPLIT + 3: text(40),             # genuinely new
        INCR_SPLIT + 4: "",                   # empty new doc
        INCR_SPLIT + 5: corpus[12],           # lands in a later batch
        INCR_SPLIT + 6: corpus[3] + " extra", # near-copy (bands may or may not hit)
        INCR_SPLIT + 7: "İstanbul ßß " + corpus[5],
    }
    docs = {**corpus, **new}

    d = tmp_path / "sf" / "documents.parquet"
    os.makedirs(d)
    parts = [list(corpus) + [INCR_SPLIT + 0, INCR_SPLIT + 4],
             [INCR_SPLIT + 1, INCR_SPLIT + 3],
             [INCR_SPLIT + 2, INCR_SPLIT + 5, INCR_SPLIT + 6, INCR_SPLIT + 7]]
    for fi, ids in enumerate(parts):
        tbl = pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array([docs[i] for i in ids], pa.string()),
            "lang": pa.array(["en"] * len(ids)),
            "source": pa.array(["synth"] * len(ids)),
            "n_chars": pa.array([len(docs[i]) for i in ids], pa.int32()),
        })
        p = str(d / f"part-{fi:03d}.parquet")
        pq.write_table(tbl, p)
        os.utime(p, (1_700_000_000 + fi * 10,) * 2)
    sf_dir = str(tmp_path / "sf")

    import duckdb

    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet/*.parquet'"
        )
        oracle = _canon(con.execute(REG["s7_stream_incremental_dedup"].oracle).fetchall())
    finally:
        con.close()
    assert len(oracle) >= 4  # the planted exact copies actually matched

    got = _rows(REG["s7_stream_incremental_dedup"].builder(spark, sf_dir))
    assert got == oracle

    # batch twins on the same corpus: the stream, the persisted-index batch path
    # and the self-contained batch path all share one contract
    for twin in ("x1_incremental_neardup", "x1_incremental_neardup_persisted"):
        assert _rows(REG[twin].builder(spark, sf_dir)) == oracle, twin
