"""Adversarial schedules for the LAYOUT-ARTIFACT lifecycle (the r12 adversarial
method applied to sources/bucketing.py — the cache manifest got the same
treatment in test_adversarial_cache.py and it found two real leak defects).

persisted_bucketed is a cross-session, cross-process shared artifact: the bench,
the test suite, and any number of user sessions all point at one warehouse dir
(RUBIX_WAREHOUSE_DIR). Before r13 the rebuild path had NO cross-process mutual
exclusion and a non-atomic marker write: two sessions deciding to rebuild the
same layout could interleave rmtree + saveAsTable and commit part-files from
BOTH writers into one directory under a valid-looking marker — silently
duplicated rows on every later zero-exchange join. The fix is the manifest's
flock discipline (exclusive lock around rebuild, re-check the marker after
acquiring, marker lands via tmp+rename).

Contracts pinned here:
- a same-generation process storm produces exactly ONE build: one file per
  bucket, every process reads identical, correct aggregates;
- a storm racing across a source REGENERATION converges on the new generation
  (old data never serves under the new fingerprint);
- a corrupt / truncated / leftover-tmp marker is treated as absent → rebuild,
  never a crash and never trust in unmarked files.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = """
import json, os, sys, time
sys.path.insert(0, %r)
from pyspark.sql import SparkSession
from rubix_spark.sources.bucketing import persisted_bucketed

src, barrier, counter = sys.argv[1], sys.argv[2], sys.argv[3]
spark = (
    SparkSession.builder.master("local[2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.driver.memory", "1g")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

# barrier: session is up; wait for the starter gun so all workers hit
# persisted_bucketed within milliseconds of each other (invariant 36 — the
# schedule that could break must actually run)
print("READY", flush=True)
while not os.path.exists(barrier):
    time.sleep(0.02)


def build():
    # O_APPEND single write: atomic line per build() invocation
    with open(counter, "a") as fh:
        fh.write(f"{os.getpid()}\\n")
    return spark.read.parquet(src)


df = persisted_bucketed(
    spark, label="storm", source_path=src,
    build=build, bucket_col="k", n_buckets=4,
)
row = df.selectExpr("count(*) AS n", "sum(v) AS s").collect()[0]
print("RESULT " + json.dumps({"rows": row["n"], "sum": row["s"]}))
""" % (REPO,)


def _write_source(path: str, n: int, offset: int = 0) -> dict:
    ks = [i % 37 for i in range(n)]
    vs = [offset + i for i in range(n)]
    pq.write_table(pa.table({"k": pa.array(ks, pa.int64()), "v": pa.array(vs, pa.int64())}), path)
    return {"rows": n, "sum": sum(vs)}


def _storm(src: str, warehouse: str, n_procs: int) -> tuple[list[dict], int]:
    """Race n_procs fresh sessions into persisted_bucketed behind a start barrier.
    Returns (per-process results, number of build() invocations this storm)."""
    env = dict(os.environ, RUBIX_WAREHOUSE_DIR=warehouse)
    base = os.path.dirname(src)
    barrier = os.path.join(base, "go")
    counter = os.path.join(base, "builds.log")
    if os.path.exists(barrier):
        os.unlink(barrier)
    before = _count_lines(counter)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, src, barrier, counter],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        )
        for _ in range(n_procs)
    ]
    for p in procs:  # every session up and parked at the barrier
        assert p.stdout.readline().strip() == "READY"
    with open(barrier, "w"):
        pass  # starter gun
    out = []
    for p in procs:
        stdout, stderr = p.communicate(timeout=300)
        assert p.returncode == 0, f"worker failed:\n{stderr[-3000:]}"
        line = [l for l in stdout.splitlines() if l.startswith("RESULT ")][-1]
        out.append(json.loads(line[len("RESULT "):]))
    return out, _count_lines(counter) - before


def _count_lines(path: str) -> int:
    if not os.path.exists(path):
        return 0
    with open(path) as fh:
        return sum(1 for _ in fh)


def _layout_dir(warehouse: str) -> str:
    (digest_dir,) = [d for d in os.listdir(warehouse) if not d.endswith(".lock")]
    inner = os.path.join(warehouse, digest_dir)
    (layout,) = [d for d in os.listdir(inner) if not d.endswith(".lock")]
    return os.path.join(inner, layout)


def _assert_clean_layout(warehouse: str, n_buckets: int) -> dict:
    d = _layout_dir(warehouse)
    parts = [f for f in os.listdir(d) if f.startswith("part-")]
    # exactly one committed file per bucket — interleaved writers leave extras
    assert len(parts) == n_buckets, sorted(os.listdir(d))
    buckets = sorted(f.split("_")[-1].split("-")[0].split(".")[0] for f in parts)
    assert len(set(buckets)) == n_buckets, parts
    with open(os.path.join(d, "_rubix_layout.json")) as fh:
        return json.load(fh)  # must be complete, parseable JSON


@pytest.mark.parametrize("seed", [0, 1])
def test_process_storm_single_generation(tmp_path, seed):
    """Three fresh sessions race to build the SAME layout of the SAME source
    generation: exactly one build must win, every session must read the full,
    unduplicated aggregate, and the directory must hold one file per bucket."""
    src = str(tmp_path / f"src_{seed}.parquet")
    expect = _write_source(src, 5000 + seed)
    warehouse = str(tmp_path / "wh")
    results, builds = _storm(src, warehouse, n_procs=3)
    assert results == [expect] * 3, results
    # the race genuinely fired (all three hit the rebuild decision together) and
    # the flock let exactly ONE of them build; pre-fix all three built over each
    # other's files
    assert builds == 1, builds
    meta = _assert_clean_layout(warehouse, n_buckets=4)
    assert meta["bucket_col"] == "k" and meta["n_buckets"] == 4


def test_storm_across_source_regeneration(tmp_path):
    """Build once, then regenerate the source (the driver does this between
    rounds AND between sessions — invariant 13) and storm again: the layout
    must converge on the NEW generation's contents; the old generation must
    never serve under the new fingerprint."""
    src = str(tmp_path / "src.parquet")
    _write_source(src, 4000)
    warehouse = str(tmp_path / "wh")
    _, builds = _storm(src, warehouse, n_procs=1)
    assert builds == 1

    expect2 = _write_source(src, 6000, offset=10_000)  # new generation, new stats
    results, builds = _storm(src, warehouse, n_procs=3)
    assert results == [expect2] * 3, results
    assert builds == 1, builds  # one rebuild for the new generation, not three
    _assert_clean_layout(warehouse, n_buckets=4)


def test_corrupt_marker_rebuilds(spark, tmp_path, monkeypatch):
    """A truncated/garbage marker (a pre-r13 writer killed mid-json.dump) must
    read as ABSENT — rebuild, not crash, and never trust the unmarked files."""
    from rubix_spark.sources.bucketing import persisted_bucketed

    src = str(tmp_path / "src.parquet")
    expect = _write_source(src, 3000)
    warehouse = str(tmp_path / "wh")
    monkeypatch.setenv("RUBIX_WAREHOUSE_DIR", warehouse)

    def build():
        return spark.read.parquet(src)

    persisted_bucketed(spark, label="corrupt", source_path=src, build=build,
                       bucket_col="k", n_buckets=4)
    d = _layout_dir(warehouse)
    with open(os.path.join(d, "_rubix_layout.json"), "w") as fh:
        fh.write('{"fingerprint": [["src.parquet", 12')  # truncated mid-write
    # leftover tmp from a killed writer must also be inert
    with open(os.path.join(d, "_rubix_layout.json.tmp"), "w") as fh:
        fh.write("garbage")

    spark._rubix_bucketed_memo = {}  # fresh-session view
    df = persisted_bucketed(spark, label="corrupt", source_path=src, build=build,
                            bucket_col="k", n_buckets=4)
    row = df.selectExpr("count(*) AS n", "sum(v) AS s").collect()[0]
    assert {"rows": row["n"], "sum": row["s"]} == expect
    with open(os.path.join(d, "_rubix_layout.json")) as fh:
        json.load(fh)  # rebuilt marker is whole again
