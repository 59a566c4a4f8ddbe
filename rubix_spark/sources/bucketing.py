"""Bucketed tables: shuffle-free co-located joins (the 100 TB join strategy).

``bucketBy(n, key)`` pre-shuffles a table ON WRITE; any later equi-join or aggregation on
that key reads co-located buckets and skips the exchange entirely — at 100 TB that's the
difference between an hourly pipeline re-shuffling 100 TB per run and reading it in
place. This is the Spark analog of the reference's stable split→node ownership (consistent
hashing, ``ClusterManager.java:127-130``): both pin data placement by key so repeated
work lands where the data already is.

Requires ``saveAsTable`` (bucket metadata lives in the catalog, not the files).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist df bucketed (and optionally sorted) by key into the session catalog."""
    import shutil

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # the in-memory catalog forgets tables across sessions but their warehouse dirs
    # survive — clear the location so saveAsTable doesn't refuse it
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{warehouse}/{table}", ignore_errors=True)
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.format("parquet").saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, on: str) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — plan must contain no Exchange."""
    return spark.table(left_table).join(spark.table(right_table), on)


# ---------------------------------------------------------------------------
# Persistent warehouse layout: write a fixture table bucketed ONCE, reuse forever
# ---------------------------------------------------------------------------
# This is the analog of the reference's partitioned warehouse (its headline perf query
# runs against a table the warehouse already laid out by ss_sold_date_sk —
# perf/query_tpcds.sql:31): the layout cost is paid at ingest, every later fact-fact
# join / fact groupBy on the bucket key is exchange-free. At 100 TB the bucket count
# would be sized to ~shuffle-partition granularity (thousands); here it defaults to the
# local core count so one task reads one bucket.
#
# The physical data survives across sessions (bucket ids are encoded in the part-file
# names, so re-registering the SAME bucket spec over the files via CREATE TABLE ...
# CLUSTERED BY ... LOCATION is enough); only the cheap DDL is re-run per session. A
# fingerprint of the source parquet (name, size, mtime) guards staleness — the driver
# regenerates /root/testdata between rounds, and a stale layout must rebuild, not serve.

_WAREHOUSE_ENV = "RUBIX_WAREHOUSE_DIR"


def warehouse_root() -> str:
    return os.environ.get(_WAREHOUSE_ENV, os.path.join(tempfile.gettempdir(), "rubix_warehouse"))


def _source_fingerprint(src: str) -> list:
    out = []
    if os.path.isdir(src):
        for root, _, files in os.walk(src):
            for f in sorted(files):
                p = os.path.join(root, f)
                st = os.stat(p)
                out.append([os.path.relpath(p, src), st.st_size, st.st_mtime_ns])
    else:
        st = os.stat(src)
        out.append([os.path.basename(src), st.st_size, st.st_mtime_ns])
    return out


def persisted_bucketed(
    spark: SparkSession,
    label: str,
    source_path: str,
    build,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: str | None = None,
) -> DataFrame:
    """Materialize ``build() -> DataFrame`` ONCE as a persistent bucketed catalog table.

    First call per (warehouse, source generation) pays one repartition+write (ingest
    cost, amortized over every later run — one file per bucket, so sorted buckets also
    skip the join-time Sort); later calls, even from fresh sessions, only re-issue DDL
    over the existing files. Joins/groupBys keyed on ``bucket_col`` against tables from
    here plan with NO Exchange on this side (pinned by tests/test_shuffle_ops.py).

    ``source_path``: the upstream parquet whose (name, size, mtime) fingerprint decides
    staleness — the driver regenerates /root/testdata between rounds, and a stale
    layout must rebuild, not serve. ``build`` is only invoked on a rebuild.
    """
    sort_col = sort_col or bucket_col
    # off by default since 3.0 because multi-file buckets must merge-read to honor the
    # sort metadata; our layout writes exactly ONE file per bucket (repartition below),
    # so sorted scans are pure win: SMJ on the bucket key plans with zero Sort nodes.
    # Runtime-settable; set here per invariant 4 (bare driver-provided sessions).
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    # DisableUnnecessaryBucketedScan (Spark 4) flips a scan to non-bucketed whenever
    # the bucketing's output partitioning isn't consumed downstream — which ALSO
    # discards bucket-filter pruning (measured: `bucket = <q>` read all 32 buckets,
    # "Bucketed: false (disabled by query planner)"). Our layouts are deliberate
    # (one sorted file per bucket), so the rule only ever costs us: joins/aggs that
    # use the partitioning keep it either way, and point probes (ANN index) need the
    # pruning. Scans that use neither still get one task per bucket — the layout's
    # intended granularity.
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    memo = getattr(spark, "_rubix_bucketed_memo", None)
    if memo is None:
        memo = {}
        spark._rubix_bucketed_memo = memo
    src_key = source_path.rstrip("/")
    mkey = (src_key, label, bucket_col, n_buckets)
    if mkey in memo:
        return memo[mkey]

    digest = hashlib.md5(src_key.encode()).hexdigest()[:8]
    data_dir = os.path.join(warehouse_root(), digest, f"{label}__{bucket_col}__{n_buckets}")
    tbl = f"rxb_{label}_{bucket_col}_{digest}"
    marker = os.path.join(data_dir, "_rubix_layout.json")
    fp = _source_fingerprint(src_key)

    meta = None
    if os.path.exists(marker):
        try:
            with open(marker) as fh:
                meta = json.load(fh)
        except (OSError, ValueError):
            meta = None
    sorted_by = f"SORTED BY (`{sort_col}` ASC)" if sort_col else ""
    if meta is not None and meta.get("fingerprint") == fp:
        # layout current: register the existing files (cheap, per-session DDL only)
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")  # external: files untouched
        spark.sql(
            f"CREATE TABLE {tbl} ({meta['schema_ddl']}) USING parquet "
            f"CLUSTERED BY (`{bucket_col}`) {sorted_by} INTO {n_buckets} BUCKETS "
            f"LOCATION '{data_dir}'"
        )
    else:
        # (re)build: source changed or first run. Repartition by the bucket key first so
        # each bucket is exactly ONE file (otherwise every write task emits a file per
        # bucket it sees, and multi-file buckets lose the sorted-scan guarantee).
        from pyspark.sql import functions as F

        df = build()
        schema_ddl = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields)
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        shutil.rmtree(data_dir, ignore_errors=True)
        writer = (
            df.repartition(n_buckets, F.col(bucket_col))
            .write.mode("overwrite")
            .bucketBy(n_buckets, bucket_col)
            .option("path", data_dir)
        )
        if sort_col:
            writer = writer.sortBy(sort_col)
        writer.format("parquet").saveAsTable(tbl)
        os.makedirs(data_dir, exist_ok=True)
        with open(marker, "w") as fh:
            json.dump({"fingerprint": fp, "schema_ddl": schema_ddl, "n_buckets": n_buckets,
                       "bucket_col": bucket_col, "sort_col": sort_col}, fh)
    out = spark.table(tbl)
    memo[mkey] = out
    return out


def bucketed_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: str | None = None,
) -> DataFrame:
    """Fixture table ``name`` as a persistent bucketed layout (see persisted_bucketed)."""
    from rubix_spark import catalog

    return persisted_bucketed(
        spark,
        label=name,
        source_path=f"{sf_dir.rstrip('/')}/{name}.parquet",
        build=lambda: catalog.table(spark, sf_dir, name),
        bucket_col=bucket_col,
        n_buckets=n_buckets,
        sort_col=sort_col,
    )
