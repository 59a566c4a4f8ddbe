"""Metrics reporters — the A27 surface beyond in-process counters.

The reference exposes its BookKeeper counters through pluggable reporters
(``rubix-bookkeeper/.../BookKeeperMetrics.java``: JMX, StatsD, Ganglia selected by
``rubix.metrics.reporters``). This module keeps the same shape with all four sinks:

- ``StatsDReporter``  — the reference's StatsD wire format verbatim
  (``StatsDReporter`` in BookKeeperMetrics: ``<prefix>.<name>:<value>|g`` over UDP).
  Works against any statsd/telegraf/datadog agent.
- ``GangliaReporter`` — the reference's third sink (``GangliaReporter`` in
  BookKeeperMetrics:73-101): gmetric XDR packets (metadata msg 128 + string-value
  msg 133, gmond protocol v3.1) over UDP unicast/multicast. No dependencies — the
  two-packet wire format is ~40 lines of XDR.
- ``JMXReporter``     — the reference's JMX sink (``JmxReporter`` selection in
  BookKeeperMetrics:73-103). A Python driver has no MBean server of its own, but
  the Spark driver JVM does: the reporter compiles a tiny ``DynamicMBean``
  (``jvm/RubixCacheMetrics.java``, same on-demand javac path as the locality
  shim), loads it through a py4j ``URLClassLoader``, registers it in the driver's
  platform MBean server, and refreshes its gauges each interval. Any JMX client
  attached to the driver (jconsole, a JMX→Prometheus exporter) reads the cache
  counters under ``rubix_spark.cache:type=CacheMetrics``. Requires a live
  SparkSession; the cache daemon's ``metrics`` RPC (``cache/server.py``) remains
  the sessionless pull path.
- ``LogReporter``     — periodic human-readable line to a logger (the
  CachingFileSystem ``ReadRequestChainStats`` log analog), for clusters with
  log-based metrics scraping.

Reporters pull from ``CacheManager.stats()`` (hits/misses/evictions/invalidations/
warmed_files/fallbacks/hit_rate/cached_bytes/cached_files) on a fixed interval in a
daemon thread, mirroring the reference's ScheduledReporter cadence.
"""

from __future__ import annotations

import logging
import os
import socket
import threading
from typing import Callable

_JMX_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "jvm", "RubixCacheMetrics.java")


def _gauge_value(value) -> float | None:
    """Coerce one stats entry to a finite float gauge, or None to skip it.

    Adversarial-values probe (r13): the old ``isinstance(value, (int, float))``
    gate had two silent wire bugs — a BOOL passed it (``bool`` subclasses ``int``)
    and StatsD emitted the malformed line ``name:True|g`` that every statsd agent
    drops; and numpy integer scalars (``np.int64`` — what pyarrow/numpy-derived
    stats naturally carry) FAILED it, silently dropping the metric. Bools are 0/1
    gauges; any ``numbers.Real`` counts; non-finite values are skipped entirely (a
    NaN gauge poisons downstream rollup aggregation in statsd/ganglia alike).
    """
    import math
    import numbers

    # np.bool_ is neither a bool subclass nor numbers.Real — without the name
    # check it silently vanishes, the exact drop class this helper exists to fix
    if isinstance(value, bool) or type(value).__name__ == "bool_":
        return 1.0 if value else 0.0
    if isinstance(value, numbers.Real):
        f = float(value)
        return f if math.isfinite(f) else None
    return None


def _gauge_text(f: float) -> str:
    """Wire text for a gauge: integral values print as integers (statsd agents and
    gmond both parse them; ``1e+20``-style float repr is NOT universally accepted
    for large counters), everything else as the shortest exact float repr."""
    return str(int(f)) if f.is_integer() and abs(f) < 2**63 else repr(f)


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
            f = _gauge_value(value)
            if f is not None:
                payload = f"{self._prefix}.{name}:{_gauge_text(f)}|g".encode()
                self._sock.sendto(payload, self._addr)

    def stop(self) -> None:
        super().stop()
        self._sock.close()


def _xdr_int(n: int) -> bytes:
    import struct

    return struct.pack("!i", int(n))


def _xdr_str(s: str) -> bytes:
    b = s.encode()
    pad = (4 - len(b) % 4) % 4
    return _xdr_int(len(b)) + b + b"\x00" * pad


class GangliaReporter(_PeriodicReporter):
    """gmetric-compatible Ganglia sink: for each numeric counter, a metadata packet
    (msg id 128: host, name, type, units, slope, tmax/dmax, GROUP extra) followed by
    a string-value packet (msg id 133, format "%s") — the gmond 3.1 XDR wire format,
    accepted by gmond over unicast or the 239.2.11.71:8649 multicast default."""

    def __init__(
        self,
        stats_fn: Callable[[], dict],
        host: str = "239.2.11.71",
        port: int = 8649,
        prefix: str = "rubix_spark.cache",
        group: str = "rubix_spark",
        interval: float = 10.0,
    ):
        super().__init__(stats_fn, interval)
        self._addr = (host, port)
        self._prefix = prefix
        self._group = group
        self._host = socket.gethostname()
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)

    def _packets(self, name: str, value) -> tuple[bytes, bytes]:
        full = f"{self._prefix}.{name}"
        meta = (
            _xdr_int(128) + _xdr_str(self._host) + _xdr_str(full) + _xdr_int(0)
            + _xdr_str("double") + _xdr_str(full) + _xdr_str("")  # type, name, units
            + _xdr_int(3) + _xdr_int(int(self._interval * 6)) + _xdr_int(0)  # slope=both, tmax, dmax
            + _xdr_int(1) + _xdr_str("GROUP") + _xdr_str(self._group)
        )
        val = (
            _xdr_int(133) + _xdr_str(self._host) + _xdr_str(full) + _xdr_int(0)
            + _xdr_str("%s") + _xdr_str(_gauge_text(float(value)))
        )
        return meta, val

    def emit(self, stats: dict) -> None:
        for name, value in stats.items():
            f = _gauge_value(value)
            if f is not None:
                meta, val = self._packets(name, f)
                self._sock.sendto(meta, self._addr)
                self._sock.sendto(val, self._addr)

    def stop(self) -> None:
        super().stop()
        self._sock.close()


class JMXReporter(_PeriodicReporter):
    """Publish the counters as MBean attributes in the Spark driver JVM's platform
    MBean server (the reference's JMX sink). The bean is a ``DynamicMBean`` over a
    concurrent map (``jvm/RubixCacheMetrics.java``) so the attribute set tracks
    whatever ``stats()`` returns; it is loaded via a py4j ``URLClassLoader`` (no
    launch-time classpath change needed) and unregistered on ``stop()``."""

    def __init__(
        self,
        stats_fn: Callable[[], dict],
        spark,
        object_name: str = "rubix_spark.cache:type=CacheMetrics",
        interval: float = 10.0,
    ):
        super().__init__(stats_fn, interval)
        sc = spark.sparkContext
        jvm = sc._jvm
        gateway = sc._gateway
        from rubix_spark.cache.locality import build_jar

        jar = build_jar(_JMX_SRC, "rubix-metrics.jar")
        url = jvm.java.io.File(jar).toURI().toURL()
        urls = gateway.new_array(jvm.java.net.URL, 1)
        urls[0] = url
        loader = jvm.java.net.URLClassLoader(urls)
        self._bean = loader.loadClass("rubixspark.metrics.RubixCacheMetrics").newInstance()
        self._oname = object_name
        self._bean.unregister(object_name)  # fresh reporter replaces a stale bean
        self._bean.register(object_name)

    def emit(self, stats: dict) -> None:
        for name, value in stats.items():
            f = _gauge_value(value)
            if f is not None:
                self._bean.put(name, f)

    def stop(self) -> None:
        super().stop()
        try:
            self._bean.unregister(self._oname)
        except Exception:  # gateway already down — never fail teardown
            pass


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
