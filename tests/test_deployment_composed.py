"""The full reference deployment story, composed in ONE artifact (round-4 verdict #5).

Separately proven pieces — multi-executor placement (test_locality), latency-injected
slow backend (test_cache_slow), daemon warm shared across processes
(test_cache_server) — run here TOGETHER, the way a real deployment stacks them:

  local-cluster[2,2,1024]  (two executor JVMs under a real TaskScheduler)
  + rubix:// JVM shim      (fabricated block locations from the cache ring)
  + injected remote latency (rubix.remote.latency.ms on the shim;
                             remote_latency_s on the manager — the object store)
  + cache daemon            (cache/server.py warms the file out-of-process)
  + warm read               (the Spark session HITS the daemon-warmed copy)

Asserted: scan tasks over rubix:// run NODE_LOCAL (the fabricated preference reached
and was honored by the real scheduler); the warm pass is hits-only — ZERO remote
trips — which is the number the cache exists for on a slow backend.
"""

from __future__ import annotations

import subprocess
import sys

import pytest

from rubix_spark.cache.locality import javac_available

_SCRIPT = r"""
import json, os, socket, sys, time
import pyarrow as pa, pyarrow.parquet as pq

sys.path.insert(0, {repo!r})
from rubix_spark.cache.locality import shim_confs
from rubix_spark.cache.manager import CacheManager
from rubix_spark.cache.server import CacheServer, CacheClient

from pyspark.sql import SparkSession

SPLIT = 64 * 1024
LAT_S = 0.15
base = {base!r}
path = os.path.join(base, "facts.parquet")
n = 60_000
pq.write_table(
    pa.table({{"k": list(range(n)), "v": [f"row-{{i:08d}}" for i in range(n)]}}),
    path, row_group_size=5000, compression="NONE",
)

host = socket.gethostname()
confs = shim_confs([host], split_bytes=SPLIT)
confs["spark.sql.files.maxPartitionBytes"] = str(SPLIT)
confs["spark.sql.files.openCostInBytes"] = "0"
confs["spark.locality.wait"] = "1s"
confs["spark.ui.enabled"] = "true"
confs["spark.hadoop.rubix.remote.latency.ms"] = str(int(LAT_S * 1000))
builder = (
    SparkSession.builder.master("local-cluster[2,2,1024]")
    .appName("deployment-composed-test")
    .config("spark.sql.shuffle.partitions", "4")
)
for k, v in confs.items():
    builder = builder.config(k, v)
spark = builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

# ---- cold pass: latency-injected remote through the shim, real scheduler placement
t0 = time.perf_counter()
got = spark.read.parquet("rubix://" + path).count()
cold_sec = time.perf_counter() - t0
assert got == n, (got, n)

import urllib.request
app_id = spark.sparkContext.applicationId
ui = spark.sparkContext.uiWebUrl
stages = json.load(urllib.request.urlopen(ui + "/api/v1/applications/" + app_id + "/stages"))
localities = []
for st in stages:
    url = (ui + "/api/v1/applications/" + app_id + "/stages/"
           + str(st["stageId"]) + "/" + str(st["attemptId"]) + "/taskList?length=1000")
    for task in json.load(urllib.request.urlopen(url)):
        localities.append(task["taskLocality"])
assert any(l.startswith("NODE_LOCAL") for l in localities), localities

# ---- daemon warms the file out-of-process (paying the remote trips itself)
cache_dir = os.path.join(base, "cache")
server = CacheServer(cache_dir, remote_latency_s=LAT_S)
server.serve_background()
shost, sport = server.address
client = CacheClient(shost, sport)
assert client.ping()["pong"]
client.warm(path)

# ---- warm pass: the Spark session reads through a manager on the SAME cache dir
mgr = CacheManager(spark, cache_dir, remote_latency_s=LAT_S)
t0 = time.perf_counter()
got2 = mgr.read(path).count()
warm_sec = time.perf_counter() - t0
assert got2 == n, (got2, n)
stats = mgr.stats()
assert stats["hits"] >= 1 and stats["misses"] == 0, stats  # ZERO remote trips
client.close()
server.shutdown()
print(json.dumps({{"cold_sec": round(cold_sec, 3), "warm_sec": round(warm_sec, 3),
                   "localities": sorted(set(localities)), "stats": stats}}))
spark.stop()
"""


@pytest.mark.skipif(not javac_available(), reason="javac not on PATH")
def test_cluster_latency_daemon_warm_composed(tmp_path):
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = _SCRIPT.format(repo=repo, base=str(tmp_path))
    proc = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True, timeout=420
    )
    if proc.returncode != 0 and "local-cluster" in (proc.stderr or ""):
        pytest.skip(f"local-cluster unavailable: {proc.stderr[-400:]}")
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr[-3000:]}"
    assert '"localities"' in proc.stdout
