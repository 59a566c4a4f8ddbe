"""Cluster membership monitor — the A21/A24 liveness story, Spark-idiomatic.

The reference discovers nodes per engine (YARN/Presto REST), refreshes membership on a
schedule (``AsyncClusterManager.java:39-86``), and runs a worker→coordinator heartbeat
service with expiring liveness caches (``HeartbeatService.java:146-168``,
``CoordinatorBookKeeper.java:63-86``). Spark already owns executor liveness — the
scheduler registers/expires executors itself — so the idiomatic analog is a polling
monitor over ``sc.statusTracker``: refresh the node set on an interval, feed it to the
rendezvous ring (and the locality shim's ``rubix.cache.nodes`` conf on change), and
surface the membership-churn metric that matters for a cache: what fraction of
ownership keys remapped (rendezvous hashing bounds it to ~1/n on single-node joins —
the property that makes churn survivable at 1000 executors).
"""

from __future__ import annotations

import threading

from rubix_spark.cache.ring import executor_hosts, locate_key


class ClusterMonitor:
    """Periodic membership refresh + churn accounting (AsyncClusterManager analog).

    ``on_change(old_nodes, new_nodes)`` is the deployment hook — e.g. push the new
    host list into ``spark.hadoop.rubix.cache.nodes`` so the locality shim fabricates
    locations over live executors only.
    """

    def __init__(self, spark, interval: float = 10.0, sample_keys: int = 256, on_change=None):
        self._spark = spark
        self._interval = interval
        self._sample = [f"__ring_probe_{i}" for i in range(sample_keys)]
        self._on_change = on_change
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self._lock = threading.Lock()
        self.nodes: list[str] = executor_hosts(spark)
        self._stats = {"refreshes": 0, "changes": 0, "empty_polls": 0,
                       "last_remap_fraction": 0.0}
        # hook-delivery ordering (r13 adversarial-membership schedules): the hook
        # runs OUTSIDE the state lock (it may push session confs — slow, reentrant),
        # so two concurrent refreshes could deliver out of order and a STALE node
        # list would overwrite the newer push (the invariant-32 act-on-snapshot
        # class, here poisoning rubix.cache.nodes until the next churn). Delivery
        # is generation-stamped: a delivery that lost the race to a newer one is
        # SKIPPED (the hook contract is level-triggered — consumers want the
        # current membership, not every intermediate).
        self._gen = 0
        self._delivered_gen = 0
        self._hook_lock = threading.Lock()

    # ------------------------------------------------------------------ refresh
    def refresh(self) -> bool:
        """One membership poll; returns True when the node set changed."""
        return self._apply(executor_hosts(self._spark))

    def _apply(self, new_nodes: list[str]) -> bool:
        """Adopt a node set (separated from polling so churn math is unit-testable)."""
        with self._lock:
            self._stats["refreshes"] += 1
            if not new_nodes:
                # transient empty membership (executor restart storm; dynamic
                # allocation at zero): adopting it would make every locate_key
                # caller raise until the next poll. Keep serving the last live
                # ring — locality preferences over momentarily-dead hosts are
                # hints the scheduler ignores, an empty ring is a crash.
                self._stats["empty_polls"] += 1
                return False
            old = self.nodes
            if new_nodes == old:
                return False
            if old:
                remapped = sum(
                    1 for k in self._sample if locate_key(k, old) != locate_key(k, new_nodes)
                )
                self._stats["last_remap_fraction"] = remapped / len(self._sample)
            else:
                self._stats["last_remap_fraction"] = 1.0
            self._stats["changes"] += 1
            self.nodes = new_nodes
            self._gen += 1
            gen = self._gen
            hook = self._on_change
        if hook is not None:
            self._deliver(gen, old, new_nodes, hook)
        return True

    def _deliver(self, gen: int, old: list[str], new_nodes: list[str], hook) -> None:
        """Ordered at-most-once hook delivery: a generation that lost the race to a
        newer delivery is skipped, so the LAST delivered membership is always the
        newest adopted one (the level-triggered contract consumers rely on when
        pushing ``rubix.cache.nodes``)."""
        with self._hook_lock:
            if gen <= self._delivered_gen:
                return
            self._delivered_gen = gen
            hook(old, new_nodes)

    # ------------------------------------------------------------------ lifecycle
    def start(self) -> None:
        if self._thread is not None:
            return
        self._stop.clear()

        def loop():
            while not self._stop.wait(self._interval):
                try:
                    self.refresh()
                except Exception:  # session shutting down mid-poll — monitor must not die
                    pass

        self._thread = threading.Thread(target=loop, name="rubix-cluster-monitor", daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None

    # ------------------------------------------------------------------ metrics
    def stats(self) -> dict:
        with self._lock:
            return {"nodes": len(self.nodes), **self._stats}
