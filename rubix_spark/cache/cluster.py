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
        self._stats = {"refreshes": 0, "changes": 0, "last_remap_fraction": 0.0}

    # ------------------------------------------------------------------ refresh
    def refresh(self) -> bool:
        """One membership poll; returns True when the node set changed."""
        return self._apply(executor_hosts(self._spark))

    def _apply(self, new_nodes: list[str]) -> bool:
        """Adopt a node set (separated from polling so churn math is unit-testable)."""
        with self._lock:
            self._stats["refreshes"] += 1
            old = self.nodes
            if new_nodes == old:
                return False
            if old and new_nodes:
                remapped = sum(
                    1 for k in self._sample if locate_key(k, old) != locate_key(k, new_nodes)
                )
                self._stats["last_remap_fraction"] = remapped / len(self._sample)
            else:
                self._stats["last_remap_fraction"] = 1.0
            self._stats["changes"] += 1
            self.nodes = new_nodes
            hook = self._on_change
        if hook is not None:
            hook(old, new_nodes)
        return True

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
