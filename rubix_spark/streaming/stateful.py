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
from rubix_spark.streaming.events import _run_available_now, _stream_partitions, read_events_stream

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


def _sessionize(
    key: Tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    user_id = key[0]
    if state.exists:
        start_us, last_us, n, v_e4, nn = state.get
        open_sess = [start_us, last_us, n, v_e4, nn]
    else:
        open_sess = None

    closed: list[list[int]] = []
    for pdf in batches:
        # event-time contract (r12 s2, adversarial-events probe): rows without an
        # event time cannot be sessionized — drop them exactly as every built-in
        # event-time operator does (the oracle states WHERE ts IS NOT NULL). The
        # old astype('int64') turned NaT into garbage microseconds.
        pdf = pdf[pdf["ts"].notna()]
        if not len(pdf):
            continue
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        ts_us = (pdf["ts"].astype("int64") // 1000).tolist()
        # exact integer ten-thousandths, the fns.money_sum_fast row form (round-8:
        # floor(v*1e4+0.5), matching the oracle's per-row FLOOR quantization).
        # NULL values arrive as NaN — math.floor(NaN) raised; SQL SUM skips them,
        # so they contribute nothing and nn tracks whether ANY value arrived
        # (all-NULL session -> total_v NULL, like the oracle's SUM).
        vals = pdf["value"].tolist()
        v_e4s = [None if v is None or v != v else math.floor(v * 10000 + 0.5) for v in vals]
        for t, v in zip(ts_us, v_e4s):
            dv = 0 if v is None else v
            dn = 0 if v is None else 1
            if open_sess is None:
                open_sess = [t, t, 1, dv, dn]
            elif t - open_sess[1] > GAP_US:
                # strictly PAST the gap: session_window merges two events exactly
                # gap apart (its merge bound is inclusive), and this kernel's declared
                # contract is S2-built-in parity — found by the r13 adversarial
                # streams probing the exact-30:00.000000 boundary
                closed.append(open_sess)
                open_sess = [t, t, 1, dv, dn]
            else:
                open_sess[1] = t
                open_sess[2] += 1
                open_sess[3] += dv
                open_sess[4] += dn
    # input exhausted for this batch: persist the open session for the next batch;
    # under availableNow each key sees its whole history, so emit the tail too
    if open_sess is not None:
        state.update(tuple(open_sess))
        closed.append(open_sess)

    if closed:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(closed),
                "session_start": pd.to_datetime([s[0] for s in closed], unit="us"),
                "n_events": [s[2] for s in closed],
                # integer hundredths finalize: s//100 + (s%100>=50) == (s+50)//100,
                # the same half-up fns.money_from_units computes engine-side; an
                # all-NULL-value session carries SQL SUM's NULL (nn == 0)
                "total_v": [
                    None if s[4] == 0
                    else float(int(s[3] // 100 + (1 if s[3] % 100 >= 50 else 0)) / 100.0)
                    for s in closed
                ],
            }
        )


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
