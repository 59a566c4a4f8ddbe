"""Metrics reporter tests (A27 beyond in-process counters): StatsD wire format against
a real bound UDP socket, log reporter line shape, periodic thread lifecycle."""

from __future__ import annotations

import logging
import socket
import time

from rubix_spark.cache.metrics import GangliaReporter, LogReporter, StatsDReporter


def _stats():
    return {"hits": 3, "misses": 1, "hit_rate": 0.75, "cached_bytes": 4096, "skipme": "str"}


def test_statsd_wire_format():
    recv = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    recv.bind(("127.0.0.1", 0))
    recv.settimeout(2.0)
    port = recv.getsockname()[1]
    rep = StatsDReporter(_stats, port=port, prefix="t.cache")
    rep.report_once()
    got = set()
    for _ in range(4):  # 4 numeric metrics; the string one must be skipped
        got.add(recv.recv(1024).decode())
    assert got == {
        "t.cache.hits:3|g",
        "t.cache.misses:1|g",
        "t.cache.hit_rate:0.75|g",
        "t.cache.cached_bytes:4096|g",
    }
    rep.stop()
    recv.close()


def test_ganglia_wire_format():
    """gmond 3.1 XDR: each numeric metric arrives as a metadata packet (msg 128,
    declaring type double + GROUP extra) followed by a string-value packet (msg 133,
    '%s' format); XDR strings are length-prefixed and 4-byte padded."""
    import struct

    recv = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    recv.bind(("127.0.0.1", 0))
    recv.settimeout(2.0)
    port = recv.getsockname()[1]
    rep = GangliaReporter(_stats, host="127.0.0.1", port=port, prefix="t.cache", group="tg")
    rep.report_once()

    def xdr_str(buf, off):
        (n,) = struct.unpack_from("!i", buf, off)
        s = buf[off + 4 : off + 4 + n].decode()
        return s, off + 4 + n + ((4 - n % 4) % 4)

    seen = {}
    for _ in range(8):  # 4 numeric metrics x (meta + value); the string one skipped
        pkt = recv.recv(2048)
        (msg,) = struct.unpack_from("!i", pkt, 0)
        host, off = xdr_str(pkt, 4)
        name, off = xdr_str(pkt, off)
        (spoof,) = struct.unpack_from("!i", pkt, off)
        off += 4
        assert spoof == 0
        if msg == 128:
            mtype, off = xdr_str(pkt, off)
            assert mtype == "double"
            seen.setdefault(name, set()).add("meta")
        else:
            assert msg == 133
            fmt, off = xdr_str(pkt, off)
            assert fmt == "%s"
            val, off = xdr_str(pkt, off)
            float(val)  # parseable numeric payload
            seen.setdefault(name, set()).add("value")
    assert seen == {
        f"t.cache.{m}": {"meta", "value"}
        for m in ("hits", "misses", "hit_rate", "cached_bytes")
    }
    rep.stop()
    recv.close()


def test_periodic_reporting_thread():
    recv = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    recv.bind(("127.0.0.1", 0))
    recv.settimeout(2.0)
    port = recv.getsockname()[1]
    rep = StatsDReporter(_stats, port=port, interval=0.05).start()
    assert recv.recv(1024)  # at least one datagram arrives without manual report_once
    rep.stop()
    recv.close()


def test_jmx_reporter_registers_and_serves_gauges(spark):
    """The reference's fourth sink (JMX): the reporter registers a DynamicMBean in
    the driver JVM's platform MBean server and refreshes it from stats(); a JMX
    client (here: the MBean server API itself, what jconsole calls) reads the
    gauges back under the declared ObjectName. stop() unregisters."""
    from rubix_spark.cache.metrics import JMXReporter

    oname = "t.cache:type=CacheMetrics"
    rep = JMXReporter(_stats, spark, object_name=oname)
    bean = rep._bean  # helper surface into the platform MBean server (JDK-17 note there)
    try:
        rep.report_once()
        assert bean.registered(oname)
        assert bean.attribute(oname, "hits") == 3.0
        assert bean.attribute(oname, "hit_rate") == 0.75
        # attribute inventory tracks stats() keys; the non-numeric one is skipped
        assert sorted(bean.attributeNames(oname)) == [
            "cached_bytes", "hit_rate", "hits", "misses"]
        # gauges refresh in place on the next report
        rep._stats_fn = lambda: {"hits": 7}
        rep.report_once()
        assert bean.attribute(oname, "hits") == 7.0
    finally:
        rep.stop()
    assert not bean.registered(oname)


def test_log_reporter_line(caplog):
    rep = LogReporter(_stats, logger=logging.getLogger("t.metrics"))
    with caplog.at_level(logging.INFO, logger="t.metrics"):
        rep.report_once()
    assert "cache-stats" in caplog.text
    assert "hit_rate=0.75" in caplog.text and "hits=3" in caplog.text


def test_reporter_failure_does_not_raise():
    def boom():
        raise RuntimeError("stats exploded")

    rep = LogReporter(boom, interval=0.02).start()
    time.sleep(0.1)  # several failing cycles; daemon thread must survive
    assert rep._thread.is_alive()
    rep.stop()


# ------------------------------------------------- adversarial gauge values (r13)
def _adversarial_stats():
    import numpy as np

    return {
        "flag_on": True,            # bool subclasses int — old gate emitted "True|g"
        "flag_off": False,
        "np_count": np.int64(153156),   # numpy scalar — old gate silently DROPPED it
        "np_rate": np.float64(0.25),
        "np_flag": np.bool_(True),      # np.bool_ is neither bool nor numbers.Real
        "nan_rate": float("nan"),   # non-finite: must be skipped, never sent
        "inf_bytes": float("inf"),
        "neg": -7,
        "big": 10**15,              # counters overflow float repr readability
        "name": "a-string",         # non-numeric: skipped
    }


def test_statsd_adversarial_values_are_wire_legal():
    """Every emitted StatsD line must be parseable as <name>:<float>|g — bools
    become 0/1, numpy scalars are emitted, non-finite values are skipped (the old
    isinstance gate sent the malformed 'flag_on:True|g' and dropped np.int64)."""
    recv = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    recv.bind(("127.0.0.1", 0))
    recv.settimeout(2.0)
    port = recv.getsockname()[1]
    rep = StatsDReporter(_adversarial_stats, port=port, prefix="t.adv")
    rep.report_once()
    got = {}
    for _ in range(7):  # the seven emittable entries; nan/inf/string never arrive
        line = recv.recv(1024).decode()
        body, kind = line.rsplit("|", 1)
        name, value = body.rsplit(":", 1)
        assert kind == "g" and name.startswith("t.adv.")
        got[name.removeprefix("t.adv.")] = float(value)  # must parse as a number
    assert got == {
        "flag_on": 1.0, "flag_off": 0.0, "np_count": 153156.0,
        "np_rate": 0.25, "np_flag": 1.0, "neg": -7.0, "big": 1e15,
    }
    # integral gauges travel as plain integers (agents reject exponent notation)
    rep.stop()
    recv.close()


def test_ganglia_adversarial_values_parse_as_floats():
    import struct

    recv = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    recv.bind(("127.0.0.1", 0))
    recv.settimeout(2.0)
    port = recv.getsockname()[1]
    rep = GangliaReporter(
        _adversarial_stats, host="127.0.0.1", port=port, prefix="t.adv", group="tg"
    )
    rep.report_once()

    def xdr_str(buf, off):
        (n,) = struct.unpack_from("!i", buf, off)
        s = buf[off + 4 : off + 4 + n].decode()
        return s, off + 4 + n + ((4 - n % 4) % 4)

    values = {}
    for _ in range(14):  # seven emittable metrics x (meta + value)
        pkt = recv.recv(2048)
        (msg,) = struct.unpack_from("!i", pkt, 0)
        _, off = xdr_str(pkt, 4)
        name, off = xdr_str(pkt, off)
        if msg == 133:
            off += 4  # spoof flag
            _, off = xdr_str(pkt, off)  # "%s" format
            text, _ = xdr_str(pkt, off)
            values[name.removeprefix("t.adv.")] = float(text)  # must parse
    assert values == {
        "flag_on": 1.0, "flag_off": 0.0, "np_count": 153156.0,
        "np_rate": 0.25, "np_flag": 1.0, "neg": -7.0, "big": 1e15,
    }
    rep.stop()
    recv.close()
