"""Round-14 probe (r13 verdict #5): the s8 continuous-close sessionizer on
Spark 4's transformWithStateInPandas (arbitrary-state v2) vs the shipped
applyInPandasWithState kernel.

Same semantics: 30-min gap sessions per user, each session emitted exactly once
(closed by later data, or by the event-time timer firing when the watermark
passes last_ts + gap). TWS differences from GroupState:
  - state lives behind a per-task state-server socket (ValueState get/update
    are RPCs, not a local row), RocksDB provider required;
  - timers are explicit (registerTimer/deleteTimer), fire via
    handleExpiredTimer per (key, timer);
  - the operator's watermark/no-data-batch behavior matches, so the bounded
    drive (_run_append_until_quiescent) is reused unchanged.

Measures wall time of the full bounded lifecycle at sf0.1 (the suite's slowest
row, ~4.6-5.1 s) and checks output equality against the shipped kernel.

Usage: python -u tools/proto_s8_tws.py [--sf DIR] [--n 3]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--n", type=int, default=3)
    args = ap.parse_args()

    import pandas as pd
    from pyspark.sql import SparkSession
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    from rubix_spark import catalog

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.codegen.cache.maxEntries", "5000")
        .config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
        .getOrCreate()
    )
    catalog.ensure_session_confs(spark)
    spark.sparkContext.setLogLevel("ERROR")

    from rubix_spark.streaming import stateful as st
    from rubix_spark.streaming.events import read_events_stream
    from rubix_spark.streaming.events import _stream_partitions

    GAP_US = st.GAP_US

    class SessionProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._state = handle.getValueState(
                "sess", "start_us long, last_us long, n int, v_e4 long, nn int"
            )

        def handleInputRows(self, key, rows, timerValues):
            user_id = key[0]
            open_sess = list(self._state.get()) if self._state.exists() else None
            had_open = open_sess is not None
            open_sess, closed = st._merge_batches(rows, open_sess)
            if open_sess is not None:
                self._state.update(tuple(open_sess))
                deadline_ms = (open_sess[1] + GAP_US + 999) // 1000
                wm = timerValues.getCurrentWatermarkInMs()
                if had_open:
                    # move the timer: TWS keeps ALL registered timers, so the old
                    # deadline would also fire — delete it first
                    for t in self._handle.listTimers():
                        self._handle.deleteTimer(t)
                self._handle.registerTimer(max(deadline_ms, wm + 1))
            if closed:
                yield st._session_frame(user_id, closed)

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            if self._state.exists():
                sess = list(self._state.get())
                self._state.clear()
                for t in self._handle.listTimers():
                    self._handle.deleteTimer(t)
                yield st._session_frame(key[0], [sess])

        def close(self) -> None:
            pass

    def tws_sessions(events):
        return (
            events.select("user_id", "event_id", "ts", "value")
            .withWatermark("ts", "0 seconds")
            .groupBy("user_id")
            .transformWithStateInPandas(
                SessionProcessor(),
                outputStructType=st._OUT_SCHEMA,
                outputMode="Append",
                timeMode="EventTime",
            )
        )

    def run_tws():
        return st._run_append_until_quiescent(
            spark, tws_sessions(read_events_stream(spark, args.sf)),
            partitions=_stream_partitions(args.sf),
        )

    def run_current():
        return st._run_append_until_quiescent(
            spark, st.stateful_sessions_timeout(read_events_stream(spark, args.sf)),
            partitions=_stream_partitions(args.sf),
        )

    def timed(name, fn):
        best, rows = None, None
        for i in range(args.n):
            t0 = time.time()
            rows = fn().collect()
            dt = time.time() - t0
            print(f"  {name} run {i}: {dt:.3f}s  rows={len(rows)}", flush=True)
            best = dt if best is None else min(best, dt)
        return best, rows

    b_cur, r_cur = timed("current", run_current)
    b_tws, r_tws = timed("tws", run_tws)
    b_cur2, _ = timed("current2", run_current)
    b_tws2, _ = timed("tws2", run_tws)
    same = sorted(map(tuple, r_cur)) == sorted(map(tuple, r_tws))
    print(
        f"RESULT rows_equal={same} n={len(r_cur)} "
        f"current={min(b_cur, b_cur2):.3f}s tws={min(b_tws, b_tws2):.3f}s"
    )


if __name__ == "__main__":
    main()
