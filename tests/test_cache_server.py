"""RPC tier (A22/A23 analog): an external process drives the cache daemon over TCP.

Deployment shape under test, mirroring the reference's BookKeeper daemon: the server
owns a cache dir; a client in a DIFFERENT process warms and inspects it; a Spark-side
CacheManager mounting the same dir then HITS what the remote client warmed (the
cross-engine serving path, coordinated through the flock'd manifest)."""

from __future__ import annotations

import json
import subprocess
import sys

from rubix_spark.cache.server import CacheClient, CacheServer
from tests.conftest import SF_SMOKE

ORDERS = f"{SF_SMOKE}/orders.parquet"


def test_rpc_surface_and_cross_process_client(tmp_path):
    srv = CacheServer(str(tmp_path / "cache"))
    srv.serve_background()
    host, port = srv.address
    try:
        # out-of-process client (the non-Spark-engine posture)
        script = f"""
import json, sys
sys.path.insert(0, {json.dumps("/root/repo")})
from rubix_spark.cache.server import CacheClient
c = CacheClient({json.dumps(host)}, {port})
out = {{}}
out["ping"] = c.ping()["pong"]
out["before"] = c.get_cache_status({json.dumps(ORDERS)})["state"]
out["warm"] = bool(c.warm({json.dumps(ORDERS)})["local_path"])
out["after"] = c.get_cache_status({json.dumps(ORDERS)})["state"]
out["metrics"] = c.get_cache_metrics()["warmed_files"]
print(json.dumps(out))
"""
        proc = subprocess.run([sys.executable, "-c", script], capture_output=True, text=True, timeout=120)
        assert proc.returncode == 0, proc.stderr[-2000:]
        out = json.loads(proc.stdout.strip().splitlines()[-1])
        assert out == {"ping": True, "before": "ABSENT", "warm": True, "after": "CACHED", "metrics": 1}

        # in-process client sees the same state (pipelining on one connection)
        c = CacheClient(host, port)
        assert c.get_cache_status(ORDERS)["state"] == "CACHED"
        entries = c.call("list_entries")
        assert entries["total_bytes"] > 0 and len(entries["entries"]) == 1
        assert c.call("validate", repair=True) == {"checked": 1, "broken": 0, "repaired": 0, "orphans_swept": 0}
        # unknown method → error response, connection stays usable
        try:
            c.call("no_such_method")
            raise AssertionError("expected failure")
        except RuntimeError as exc:
            assert "unknown method" in str(exc)
        assert c.ping()["pong"]
        c.close()
    finally:
        srv.shutdown()


def test_daemon_warm_is_served_to_spark_reader(tmp_path, spark):
    """What the RPC tier is FOR: a remote client warms; a Spark session mounting the
    same cache dir hits the warmed copy (manifest shared via flock, not via the
    daemon's memory)."""
    from pyspark.sql import functions as F

    from rubix_spark.cache.manager import CacheManager

    cache_dir = str(tmp_path / "cache")
    srv = CacheServer(cache_dir)
    srv.serve_background()
    host, port = srv.address
    try:
        CacheClient(host, port).warm(ORDERS)
        mgr = CacheManager(spark, cache_dir)
        df = mgr.read(ORDERS)
        assert mgr.stats()["hits"] == 1 and mgr.stats()["misses"] == 0
        direct = spark.read.parquet(ORDERS).agg(F.sum("o_orderkey")).collect()
        assert df.agg(F.sum("o_orderkey")).collect() == direct
    finally:
        srv.shutdown()


def test_client_retries_reach_late_server(tmp_path):
    """A23: the client retries with backoff — calls issued before the daemon binds the
    final port fail fast and reconnect (simulated by closing the first connection)."""
    srv = CacheServer(str(tmp_path / "cache"))
    srv.serve_background()
    host, port = srv.address
    try:
        c = CacheClient(host, port, retries=3)
        assert c.ping()["pong"]
        c._sock.close()  # sever the pooled connection behind the client's back
        assert c.ping()["pong"]  # retry path reconnects transparently
        c.close()
    finally:
        srv.shutdown()


def test_nonlocal_read_chain_peer_serves_before_remote(tmp_path, spark):
    """A8/A9: a miss on node B pulls node A's cached copy over the daemon socket
    instead of paying the (slow) remote — and commits it through the normal
    generation CAS so B serves locally from then on."""
    import time as _time

    from pyspark.sql import functions as F

    from rubix_spark.cache.manager import CacheManager
    from rubix_spark.cache.server import CacheClient, CacheServer

    node_a = CacheServer(str(tmp_path / "node_a"))
    node_a.serve_background()
    host, port = node_a.address
    try:
        node_a.manager.warm(ORDERS)  # owner node has it cached

        LAT = 2.0  # remote trips cost 2 s each; LAN peer fetch costs none
        node_b = CacheManager(
            spark, str(tmp_path / "node_b"), remote_latency_s=LAT,
            peer_client=CacheClient(host, port),
        )
        t0 = _time.perf_counter()
        df = node_b.read(ORDERS)
        got = df.agg(F.sum("o_orderkey")).collect()
        elapsed = _time.perf_counter() - t0
        assert elapsed < LAT  # served via peer: zero remote trips
        assert node_b.stats()["peer_fetches"] == 1 and node_b.stats()["misses"] == 1
        assert got == spark.read.parquet(ORDERS).agg(F.sum("o_orderkey")).collect()

        # second read: B's own cache hits, no peer round trip needed
        node_b.read(ORDERS)
        assert node_b.stats()["hits"] == 1 and node_b.stats()["peer_fetches"] == 1

        # peer miss degrades to the remote path, correctness preserved
        lineitem = f"{SF_SMOKE}/lineitem.parquet"
        df2 = node_b.read(lineitem)
        assert node_b.stats()["peer_fetches"] == 1  # peer had nothing to serve
        assert df2.count() == spark.read.parquet(lineitem).count()
    finally:
        node_a.shutdown()
