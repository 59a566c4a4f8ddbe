"""Metrics reporters — the A27 surface beyond in-process counters.

The reference exposes its BookKeeper counters through pluggable reporters
(``rubix-bookkeeper/.../BookKeeperMetrics.java``: JMX, StatsD, Ganglia selected by
``rubix.metrics.reporters``). Spark-side the natural sinks differ — a driver process
has no JMX story worth shimming from Python — so this module keeps the same shape with
the two reporters that make sense here:

- ``StatsDReporter`` — the reference's StatsD wire format verbatim
  (``StatsDReporter`` in BookKeeperMetrics: ``<prefix>.<name>:<value>|g`` over UDP).
  Works against any statsd/telegraf/datadog agent.
- ``LogReporter``    — periodic human-readable line to a logger (the CachingFileSystem
  ``ReadRequestChainStats`` log analog), for clusters with log-based metrics scraping.

Reporters pull from ``CacheManager.stats()`` (hits/misses/evictions/invalidations/
warmed_files/fallbacks/hit_rate/cached_bytes/cached_files) on a fixed interval in a
daemon thread, mirroring the reference's ScheduledReporter cadence.
"""

from __future__ import annotations

import logging
import socket
import threading
from typing import Callable


class _PeriodicReporter:
    """Base: pull stats() every ``interval`` seconds on a daemon thread."""

    def __init__(self, stats_fn: Callable[[], dict], interval: float = 10.0):
        self._stats_fn = stats_fn
        self._interval = interval
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def start(self) -> "_PeriodicReporter":
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=self._interval + 1)

    def report_once(self) -> None:
        self.emit(self._stats_fn())

    def _run(self) -> None:
        while not self._stop.wait(self._interval):
            try:
                self.report_once()
            except Exception:  # reporter failure must never take down the read path
                logging.getLogger(__name__).exception("metrics report failed")

    def emit(self, stats: dict) -> None:  # pragma: no cover - abstract
        raise NotImplementedError


class StatsDReporter(_PeriodicReporter):
    """StatsD gauges over UDP: ``<prefix>.<metric>:<value>|g`` per counter, one
    datagram per metric (the reference's wire format, BookKeeperMetrics StatsD mode)."""

    def __init__(
        self,
        stats_fn: Callable[[], dict],
        host: str = "127.0.0.1",
        port: int = 8125,
        prefix: str = "rubix_spark.cache",
        interval: float = 10.0,
    ):
        super().__init__(stats_fn, interval)
        self._addr = (host, port)
        self._prefix = prefix
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)

    def emit(self, stats: dict) -> None:
        for name, value in stats.items():
            if isinstance(value, (int, float)):
                payload = f"{self._prefix}.{name}:{value}|g".encode()
                self._sock.sendto(payload, self._addr)

    def stop(self) -> None:
        super().stop()
        self._sock.close()


class LogReporter(_PeriodicReporter):
    """One INFO line per interval with the full counter map."""

    def __init__(
        self,
        stats_fn: Callable[[], dict],
        logger: logging.Logger | None = None,
        interval: float = 10.0,
    ):
        super().__init__(stats_fn, interval)
        self._logger = logger or logging.getLogger("rubix_spark.cache.metrics")

    def emit(self, stats: dict) -> None:
        kv = " ".join(f"{k}={stats[k]}" for k in sorted(stats))
        self._logger.info("cache-stats %s", kv)
