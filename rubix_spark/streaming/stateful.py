"""S4 — custom stateful sessionization via ``applyInPandasWithState``.

``session_window`` (S2) covers fixed-gap sessions; this operator shows the escape hatch
for *custom* state logic the built-in can't express: an arbitrary Python reducer over
each key's event stream with explicit persistent state (SURVEY.md §7 Phase 4 risk note).

The sessionizer reproduces S2's exact semantics (30-minute inactivity gap) so the DuckDB
oracle can verify the custom-state path bit-for-bit.  State carries the open session
(start, last_ts, count, exact value sum in integer 1e-4 units — floats in state would
re-introduce summation-order drift) across micro-batches; closed sessions emit
immediately, and the final open session emits once the input is exhausted (the
``availableNow`` run delivers each key's full history, so every session closes in-batch;
a continuous deployment would arm an event-time timeout for the tail session instead).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import math

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from rubix_spark.fns import duck_sum_fast
from rubix_spark.queries import register
from rubix_spark.streaming.events import (
    _run_available_now,
    _shuffle_conf_lock,
    _stream_partitions,
    read_events_stream,
)

GAP_US = 30 * 60 * 1_000_000  # 30 minutes in microseconds

# Version of the GroupState row layout below. applyInPandasWithState has NO
# state-schema migration: a stream restarted from a checkpoint written under a
# different layout misbinds or fails opaquely on state.get mid-stream (ADVICE
# r12 — v1 was 4 fields; v2 added `nn`). Durable deployments must embed this in
# their checkpointLocation (".../sessionizer/v{STATE_SCHEMA_VERSION}/...") so an
# old-state restart fails LOUDLY at startup (fresh checkpoint, no prior offsets)
# instead of corrupting sessions mid-stream. The repo's own runs use fresh
# per-run checkpoints (availableNow), so only external deployments are exposed.
STATE_SCHEMA_VERSION = 2

# state: open-session (start_us, last_us, n_events, value_sum_e4, n_valued)
_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", IntegerType()),
        StructField("v_e4", LongType()),
        StructField("nn", IntegerType()),
    ]
)

_OUT_SCHEMA = (
    "user_id bigint, session_start timestamp, n_events bigint, total_v double"
)


def _merge_batches(
    batches: Iterator[pd.DataFrame], open_sess: list[int] | None
) -> Tuple[list[int] | None, list[list[int]]]:
    """Fold this batch's events for one key into the open session; return the
    (possibly new) open tail plus the sessions CLOSED by later data.

    Shared by both sessionizer kernels (snapshot + event-time-timeout) so the
    30-minute-gap semantics can never drift between them:
    - event-time contract (r12 s2, adversarial-events probe): rows without an
      event time cannot be sessionized — drop them exactly as every built-in
      event-time operator does (the oracles state WHERE ts IS NOT NULL). The
      old astype('int64') turned NaT into garbage microseconds.
    - exact integer ten-thousandths, the fns.money_sum_fast row form (round-8:
      floor(v*1e4+0.5), matching the oracle's per-row FLOOR quantization).
      NULL values arrive as NaN — math.floor(NaN) raised; SQL SUM skips them,
      so they contribute nothing and nn tracks whether ANY value arrived
      (all-NULL session -> total_v NULL, like the oracle's SUM).
    - a new session starts strictly PAST the gap: session_window merges two
      events exactly gap apart (its merge bound is inclusive) and the declared
      contract is S2-built-in parity — found by the r13 adversarial streams
      probing the exact-30:00.000000 boundary.
    """
    closed: list[list[int]] = []
    for pdf in batches:
        pdf = pdf[pdf["ts"].notna()]
        if not len(pdf):
            continue
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        ts_us = (pdf["ts"].astype("int64") // 1000).tolist()
        vals = pdf["value"].tolist()
        v_e4s = [None if v is None or v != v else math.floor(v * 10000 + 0.5) for v in vals]
        for t, v in zip(ts_us, v_e4s):
            dv = 0 if v is None else v
            dn = 0 if v is None else 1
            if open_sess is None:
                open_sess = [t, t, 1, dv, dn]
            elif t - open_sess[1] > GAP_US:
                closed.append(open_sess)
                open_sess = [t, t, 1, dv, dn]
            else:
                open_sess[1] = t
                open_sess[2] += 1
                open_sess[3] += dv
                open_sess[4] += dn
    return open_sess, closed


def _session_frame(user_id: Any, sessions: list[list[int]]) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user_id] * len(sessions),
            "session_start": pd.to_datetime([s[0] for s in sessions], unit="us"),
            "n_events": [s[2] for s in sessions],
            # integer hundredths finalize: s//100 + (s%100>=50) == (s+50)//100,
            # the same half-up fns.money_from_units computes engine-side; an
            # all-NULL-value session carries SQL SUM's NULL (nn == 0)
            "total_v": [
                None if s[4] == 0
                else float(int(s[3] // 100 + (1 if s[3] % 100 >= 50 else 0)) / 100.0)
                for s in sessions
            ],
        }
    )


def _sessionize(
    key: Tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    user_id = key[0]
    open_sess = list(state.get) if state.exists else None
    open_sess, closed = _merge_batches(batches, open_sess)
    # input exhausted for this batch: persist the open session for the next batch;
    # under availableNow each key sees its whole history, so emit the tail too
    if open_sess is not None:
        state.update(tuple(open_sess))
        closed.append(open_sess)
    if closed:
        yield _session_frame(user_id, closed)


def stateful_sessions(events: DataFrame) -> DataFrame:
    return (
        events.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def _sessionize_timeout(
    key: Tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Event-time-timeout sessionizer: the CONTINUOUS-deployment close semantics.

    The snapshot kernel above emits the open tail every micro-batch and relies on a
    bounded-run finalize (invariant 34); this kernel instead emits each session
    EXACTLY ONCE, when it is provably over:
      - closed by later data (a gap-exceeding event arrives for the key), or
      - closed by the WATERMARK passing last_ts + gap (the armed event-time timeout
        fires in a batch where the key has no data — including the no-data batch
        Spark runs after availableNow drains the source, so bounded runs finalize
        through the same code path a 24/7 stream uses).
    A session whose quiet period the watermark never proves (last_ts + gap > final
    watermark) stays in state and is NOT emitted — that is the honest continuous
    contract, and the s8 oracle states it (session_end + gap <= max event time,
    watermark delay 0).
    """
    user_id = key[0]
    if state.hasTimedOut:
        # the watermark passed this key's armed deadline: the open session is final
        sess = list(state.get)
        state.remove()
        yield _session_frame(user_id, [sess])
        return
    open_sess = list(state.get) if state.exists else None
    open_sess, closed = _merge_batches(batches, open_sess)
    if open_sess is not None:
        state.update(tuple(open_sess))
        # arm the close deadline. The state API is millisecond-based while the
        # session arithmetic is microseconds — ceil so the timeout can never fire
        # BEFORE the µs deadline; and the timestamp must sit strictly past the
        # current watermark (the API rejects already-passed deadlines, which can
        # happen when late data under a nonzero delay reopens an old key).
        deadline_ms = (open_sess[1] + GAP_US + 999) // 1000
        state.setTimeoutTimestamp(max(deadline_ms, state.getCurrentWatermarkMs() + 1))
    if closed:
        yield _session_frame(user_id, closed)


def stateful_sessions_timeout(events: DataFrame, delay: str = "0 seconds") -> DataFrame:
    """Continuous-close sessionization: EventTimeTimeout + watermark (delay 0 by
    default so the closed-session set is a pure function of the input, not of the
    micro-batch slicing)."""
    return (
        events.select("user_id", "event_id", "ts", "value")
        .withWatermark("ts", delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_timeout,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def finalize_sessions(raw: DataFrame) -> DataFrame:
    """Bounded-run finalize: last-write-wins per session key.

    The kernel emits the OPEN tail session as a snapshot at the end of every
    micro-batch (a bounded availableNow run has no later watermark to close it);
    a session continued in a later batch therefore appears once per batch it
    spanned — the r13 adversarial multi-batch streams caught the double-emit.
    A session is uniquely keyed by (user_id, session_start): starts strictly
    increase within a user and never move once set (in-watermark delivery), and
    its snapshots only grow in n_events — so keeping the max-n_events row per key
    is exactly "the final version", the same idempotence recipe as the s6 sink's
    per-batch overwrite. Single-batch runs pass through unchanged (one row/key).
    A CONTINUOUS deployment would instead arm an event-time timeout to emit each
    tail exactly once when the watermark passes last_ts + gap; under availableNow
    that timeout can never fire for the final sessions (the watermark cannot pass
    the last event), which is why bounded mode finalizes this way.
    """
    s = F.max_by(F.struct("n_events", "total_v"), "n_events").alias("s")
    return (
        raw.groupBy("user_id", "session_start")
        .agg(s)
        .select(
            "user_id",
            "session_start",
            F.col("s.n_events").alias("n_events"),
            F.col("s.total_v").alias("total_v"),
        )
    )


@register(
    "s4_stateful_session",
    f"""
    WITH o AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                         OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                            > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_s
        FROM events WHERE ts IS NOT NULL
    ),
    s AS (
        SELECT user_id, ts, value,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM o
    )
    SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events,
           {duck_sum_fast("value", "total_v")}
    FROM s GROUP BY user_id, sid
    """,
    doc=(
        "Custom stateful sessionizer (applyInPandasWithState, explicit GroupState, exact "
        "integer value accumulation) reproducing the 30-min-gap semantics — the custom-"
        "state escape hatch, oracle-verified against the SQL sessionizer. Event-time "
        "contract (r12 s2): NULL-ts rows are dropped exactly as built-in event-time "
        "operators drop them (the oracle states it), NULL values contribute nothing "
        "to total_v (SQL SUM semantics; an all-NULL session reads NULL) — the old "
        "kernel CRASHED a production stream on either (math.floor(NaN); NaT-to-int64 "
        "garbage), found by the adversarial-events probe."
    ),
)
def s4_stateful_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = _run_available_now(
        spark, stateful_sessions(read_events_stream(spark, sf_dir)), mode="append",
        partitions=_stream_partitions(sf_dir),
    )
    return finalize_sessions(raw)


def _run_append_until_quiescent(
    spark: SparkSession,
    result: DataFrame,
    partitions: int | None = None,
    max_wait_s: float = 120.0,
) -> DataFrame:
    """Drive an append-mode stateful stream until its event-time timeouts have fired.

    ``availableNow`` stops the moment the source drains — it never runs the
    trailing NO-DATA micro-batch, so EventTimeTimeout deadlines that only the
    final watermark can prove (armed by the last data batch) never fire and the
    closed-session tail silently goes missing (measured on this exact kernel; the
    r13 s7 lesson about availableNow hiding multi-batch behavior, invariant 36).
    A processingTime trigger DOES run one no-data batch once the watermark has
    advanced past the last data batch (spark.sql.streaming.noDataMicroBatches,
    default on), which fires every deadline <= final watermark in one pass — after
    that the query is quiescent and can stop. Stop condition: at least one
    executed zero-input batch after the source drained (idle triggers execute no
    batch and report no progress, so "a trailing progress row with numInputRows
    == 0" IS the no-data batch having run).
    """
    import time

    from rubix_spark.streaming.events import _drive_capture

    def run(writer):
        # short trigger: the gap between the last data batch and the timeout-
        # firing no-data batch is pure wait (measured ~0.1-0.3 s at 100 ms); the
        # batches themselves are seconds, so a 10 ms trigger adds no pressure
        q = writer.trigger(processingTime="10 milliseconds").start()
        t0 = time.time()
        deadline = t0 + max_wait_s
        while time.time() < deadline:
            rp = q.recentProgress
            status = q.status
            if rp and rp[-1]["numInputRows"] == 0 and not status["isDataAvailable"]:
                break
            # a source with NO files never executes a batch at all (no progress
            # rows ever appear) — but wall-clock alone can't distinguish that
            # from a stalled initialization (this VM stalls runs 3-5x at random,
            # invariant 11), so the empty verdict also requires the query to
            # have REACHED its idle state: 'Waiting for data to arrive' only
            # appears after a completed trigger found the source empty, while a
            # stalled init stays in 'Initializing sources'/'Getting offsets'.
            if (
                not rp
                and not status["isDataAvailable"]
                and "waiting for data" in str(status.get("message", "")).lower()
                and time.time() > t0 + 5.0
            ):
                break
            time.sleep(0.02)
        q.stop()
        q.awaitTermination()

    return _drive_capture(spark, result, "append", partitions, run)


@register(
    "s8_stream_timeout_sessions",
    f"""
    WITH o AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                         OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                            > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_s
        FROM events WHERE ts IS NOT NULL
    ),
    s AS (
        SELECT user_id, ts, value,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM o
    ),
    g AS (
        SELECT user_id, sid, MIN(ts) AS session_start, MAX(ts) AS session_end,
               COUNT(*) AS n_events, {duck_sum_fast("value", "total_v")}
        FROM s GROUP BY user_id, sid
    ),
    t AS (SELECT g.*, MAX(sid) OVER (PARTITION BY user_id) AS last_sid FROM g)
    SELECT user_id, session_start, n_events, total_v FROM t
    WHERE sid < last_sid
       OR (epoch_us(session_end) + 1800000000 + 999) // 1000
          < (SELECT epoch_us(max(ts)) // 1000 FROM events WHERE ts IS NOT NULL)
    """,
    doc=(
        "Continuous-close sessionizer: applyInPandasWithState with an EVENT-TIME "
        "TIMEOUT (the production semantics the snapshot kernel's bounded-run "
        "finalize stands in for — invariant 34). Each session emits exactly once: "
        "closed by later data, or by the watermark passing last_ts + 30 min in the "
        "no-data batch a processingTime trigger runs after the source drains "
        "(availableNow never runs it — measured; _run_append_until_quiescent). "
        "Sessions the final watermark cannot prove closed are withheld, and the "
        "oracle states the engine semantics exactly: every NON-TAIL session is "
        "emitted unconditionally (closed by its user's later data — the watermark "
        "plays no part), while each user's TAIL session follows the MEASURED "
        "timeout rule: GroupState timeouts are millisecond-granular and fire on "
        "deadline STRICTLY BELOW watermark, i.e. ceil_ms(end + 30min) < "
        "floor_ms(max event ts) (delay 0; a deadline landing in the watermark's "
        "exact millisecond stays open). A single watermark predicate over ALL "
        "sessions is WRONG: a closing event within 1 ms past the gap at the "
        "stream's end data-closes a session the ms-granular predicate rejects "
        "(caught by review; pinned in the adversarial suite). The emitted set is "
        "a pure function of the input under watermark-ordered delivery, "
        "independent of micro-batch slicing."
    ),
)
def s8_stream_timeout_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run_append_until_quiescent(
        spark, stateful_sessions_timeout(read_events_stream(spark, sf_dir)),
        partitions=_stream_partitions(sf_dir),
    )
