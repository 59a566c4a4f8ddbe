"""Executable locality shim — the scheduling half of A1 (CachingFileSystem parity).

The reference fabricates HDFS block locations so engines schedule scan tasks onto the
nodes that own the cached blocks (``CachingFileSystem.java:393-437``). Spark consumes
exactly that hook when planning file scans: ``FileSourceScanExec`` asks the path's
Hadoop FileSystem for block locations and carries them into each FilePartition's
``preferredLocations``. So the shim is a ~100-line Java FileSystem
(``jvm/RubixLocalFileSystem.java``) under the ``rubix://`` scheme that serves bytes
from the local FS but answers ``getFileBlockLocations`` from the SAME rendezvous ring
as ``cache/ring.py`` (bit-identical md5 weights — asserted by test).

This module compiles the shim on demand (Spark ships a full JDK environment; javac is
present on this image) and produces the session confs that activate it. Reading
``rubix:///path/to/table.parquet`` then yields scan tasks whose preferred location is
the split's ring owner; with ``spark.locality.wait.node`` > 0 the scheduler places
them there, which is the reference's deployment behavior. On clusters the same jar
goes in ``spark.jars`` and ``rubix.cache.nodes`` is set to the executor host list
(see docs/LOCALITY.md).
"""

from __future__ import annotations

import hashlib
import os
import shutil
import subprocess
import zipfile

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "jvm", "RubixLocalFileSystem.java")
_CLASS = "rubixspark.locality.RubixLocalFileSystem"


def _hadoop_jars() -> list[str]:
    import pyspark

    jars_dir = os.path.join(os.path.dirname(pyspark.__file__), "jars")
    return [
        os.path.join(jars_dir, f)
        for f in os.listdir(jars_dir)
        if f.startswith("hadoop-client-api")
    ]


def javac_available() -> bool:
    return shutil.which("javac") is not None


def build_jar(src: str, jar_name: str, classpath: str = "",
              cache_root: str = "/tmp/rubix_spark_jvm") -> str:
    """Compile one Java source and package it as a jar; memoized by source hash."""
    with open(src, "rb") as f:
        body = f.read()
    tag = hashlib.md5(body).hexdigest()[:12]
    out_dir = os.path.join(cache_root, tag)
    jar_path = os.path.join(out_dir, jar_name)
    if os.path.exists(jar_path):
        return jar_path
    classes = os.path.join(out_dir, "classes")
    os.makedirs(classes, exist_ok=True)
    cmd = ["javac"] + (["-cp", classpath] if classpath else []) + ["-d", classes, src]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    tmp_jar = jar_path + ".tmp"
    with zipfile.ZipFile(tmp_jar, "w") as z:
        for root, _, files in os.walk(classes):
            for fn in files:
                full = os.path.join(root, fn)
                z.write(full, os.path.relpath(full, classes))
    os.replace(tmp_jar, jar_path)
    return jar_path


def build_shim_jar(cache_root: str = "/tmp/rubix_spark_jvm") -> str:
    """Compile the FileSystem shim and package it as a jar; memoized by source hash."""
    return build_jar(_SRC, "rubix-locality.jar", ":".join(_hadoop_jars()), cache_root)


def shim_confs(nodes: list[str], split_bytes: int | None = None, jar: str | None = None) -> dict:
    """Session confs that activate the rubix:// scheme (must be set BEFORE JVM start:
    extraClassPath is read at launch). ``nodes`` is the executor host list the ring
    hashes over — on a cluster, ``ring.executor_hosts(spark)`` feeds a refresh."""
    if not nodes:
        # fail at session build, not mid-scan: an empty node list would disable the
        # shim's location fabrication silently (the JVM side guards length==0 by
        # returning default locations), which reads as "locality mysteriously gone"
        raise ValueError("shim_confs requires a non-empty executor host list")
    jar = jar or build_shim_jar()
    confs = {
        "spark.driver.extraClassPath": jar,
        "spark.executor.extraClassPath": jar,
        "spark.hadoop.fs.rubix.impl": _CLASS,
        "spark.hadoop.rubix.cache.nodes": ",".join(nodes),
        # honor fabricated locality instead of launching ANY-locality immediately
        "spark.locality.wait.node": "3s",
    }
    if split_bytes is not None:
        confs["spark.hadoop.rubix.cache.split.bytes"] = str(split_bytes)
    return confs
