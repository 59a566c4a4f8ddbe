"""Fixture catalog: load the driver's parquet tables (TESTDATA.md / FIXTURES.md).

Tables live at ``<sf_dir>/<name>.parquet``.  ``load`` returns plain DataFrames (no session
state); ``register_views`` additionally exposes them as temp views for ``spark.sql``.

Scale note: these are straight ``spark.read.parquet`` scans — Catalyst pushes filters and
prunes columns into the parquet reader, so downstream operators only pay for what they use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def ensure_session_confs(spark: SparkSession) -> None:
    """Make an arbitrary caller-provided session able to read the fixtures correctly.

    The driver harness supplies its own SparkSession, so the configs our builder sets
    (session.py) may be absent — both of these are runtime-settable SQL confs:
    - nanosAsLong: events.ts has shipped as TIMESTAMP(NANOS) parquet, which Spark
      otherwise rejects (harmless when the fixture is TIMESTAMP(MICROS) — µs columns
      still read as TimestampType);
    - UTC session timezone: timestamp outputs must agree with the tz-naive oracle;
    - python filterPushdown: the rubix_cache DataSource implements pushFilters(), which
      Spark refuses to plan unless this (runtime-settable) conf is on.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    # Codegen class cache (round-9): the default 100-entry LRU thrashes once a
    # session runs more than ~5 distinct heavy plans — every re-run then pays
    # Janino re-compilation AND a cold JIT profile on the regenerated class
    # (measured at sf10: q13 1.6 s inside a 9-query suite vs 0.35 s once the
    # cache holds; first measured at 10k entries, re-confirmed at the shipped
    # 5000 — both restore warm passes to isolated-run times).
    # VERIFIED STATIC on this Spark build (ADVICE r9): spark.conf.set raises
    # CANNOT_MODIFY_STATIC_CONFIG, so only session.py-built sessions (the bench /
    # artifact path, where it rides the launch SparkConf) get the sized cache.
    # Bare driver-provided sessions keep the 100-entry default — their work is
    # untimed correctness, where thrash costs latency, not answers. The attempt
    # below is kept for builds where the conf is runtime-settable.
    try:
        spark.conf.set("spark.sql.codegen.cache.maxEntries", "5000")
    except Exception:
        pass  # static conf (this build) or conf absent: keep the session default


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table.

    ``events.ts`` has shipped as both TIMESTAMP(NANOS) and TIMESTAMP(MICROS) across
    driver fixture generations; nanos fixtures read as int64 (see
    ``ensure_session_confs``) and convert here — the nanos are µs-aligned, so the
    DIV 1000 is lossless. Micros fixtures read as TimestampType directly.

    The DataFrame (a lazy plan + resolved FileIndex) is memoized per (session, dir,
    name): every ``spark.read.parquet`` call re-lists the path and re-reads a footer
    for schema inference — pure driver latency repeated per query over immutable
    fixtures. The memo lives ON the session object so it can never outlive it or leak
    across sessions (the driver harness supplies its own session per round).
    """
    memo = getattr(spark, "_rubix_table_memo", None)
    if memo is None:
        memo = {}
        spark._rubix_table_memo = memo
    key = (sf_dir.rstrip("/"), name)
    df = memo.get(key)
    if df is not None:
        return df
    ensure_session_confs(spark)
    # after analyze() has registered + ANALYZEd this fixture dir, read through the
    # catalog tables instead of the raw path: identical data, but the CBO sees the
    # row/column statistics (path-based reads keep size-only estimation)
    prefix = getattr(spark, "_rubix_analyzed_prefix", {}).get(sf_dir.rstrip("/"))
    if prefix is not None:
        df = spark.table(f"{prefix}{name}")
    else:
        df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")).cast("timestamp_ntz"))
    memo[key] = df
    return df


def load(spark: SparkSession, sf_dir: str, names: tuple = TABLES) -> dict[str, DataFrame]:
    """Read several fixture tables → dict[name, DataFrame]."""
    return {name: table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str, names: tuple = TABLES) -> None:
    """Register the fixture tables as (replaceable) temp views for spark.sql().

    Memoized per (session, sf_dir, name) like ``table`` — SQL-text queries call this on
    every build, and re-registering an identical view per query is pure driver latency.
    A different ``sf_dir`` for the same view name re-registers (the memo records where
    each view currently points).
    """
    memo = getattr(spark, "_rubix_view_memo", None)
    if memo is None:
        memo = {}
        spark._rubix_view_memo = memo
    key = sf_dir.rstrip("/")
    for name in names:
        if memo.get(name) != key:
            table(spark, sf_dir, name).createOrReplaceTempView(name)
            memo[name] = key


# Column-stats targets for ``analyze``: join/filter keys the cost-based optimizer
# actually consults (min/max for range selectivity, NDV for equi-selectivity and join
# cardinality). Stats on never-filtered payload columns are wasted ANALYZE time.
_STATS_COLUMNS: dict[str, tuple[str, ...]] = {
    "region": ("r_regionkey", "r_name"),
    "nation": ("n_nationkey", "n_regionkey", "n_name"),
    "customer": ("c_custkey", "c_nationkey", "c_mktsegment"),
    "supplier": ("s_suppkey", "s_nationkey"),
    "part": ("p_partkey", "p_brand", "p_type"),
    "orders": ("o_orderkey", "o_custkey", "o_orderdate", "o_orderstatus"),
    # the four doubles: q2 answers their MAX from these stats when routing is on —
    # footer stats can't prove float maxima (NaN excluded by writers, ADVICE r7) but
    # ANALYZE computes them with the engine's own NaN-greatest max semantics
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey", "l_shipdate", "l_returnflag",
                 "l_quantity", "l_extendedprice", "l_discount", "l_tax"),
    "documents": ("doc_id", "lang", "source"),
    "embeddings": ("vec_id", "label"),  # no stats on array<float> (unsupported type)
    "events": ("event_id", "user_id", "event_type"),
}


def analyze(
    spark: SparkSession, sf_dir: str, names: tuple = TABLES, prefix: str | None = None,
    route: bool = False,
) -> dict[str, dict]:
    """Opt-in ANALYZE/CBO pass — the ``ANALYZE TABLE`` story a 100× scale-up wants.

    AQE fixes plans *during* execution; the cost-based optimizer fixes them *before* —
    join reordering and broadcast decisions on *filtered* inputs need row counts and
    column min/max/NDV at planning time (a filtered dimension whose file is 10 GiB but
    whose surviving rows fit a broadcast is invisible to size-only planning). This
    registers each fixture as an external parquet table ``<prefix><name>`` in the
    session catalog, runs ``ANALYZE TABLE`` for table + column statistics, and switches
    the cost-based optimizer on (``spark.sql.cbo.enabled`` + join reordering — both
    runtime-settable confs). Queries must read the ``<prefix>`` tables (plain
    ``spark.table``/SQL) for stats to apply; ``catalog.table``'s path-based reads keep
    size-only estimation.

    Returns {name: {"rows": int|None, "bytes": int|None}} parsed back from the catalog,
    so callers (and tests) can see exactly what the optimizer sees.

    On a production deployment this is the nightly stats job over warehouse tables;
    stats survive in the metastore rather than a session's in-memory catalog.
    """
    ensure_session_confs(spark)
    # Default prefix: dir-independent "rx_" for ad-hoc stats runs, but a DIGEST of
    # sf_dir when routing — two routed dirs sharing one prefix would silently re-point
    # the first dir's rx_* tables at the second (catalog.table(old_dir, ...) then
    # returns the new dir's data for anything not already memoized; ADVICE r5).
    if prefix is None:
        if route:
            import hashlib

            prefix = f"rx{hashlib.md5(sf_dir.rstrip('/').encode()).hexdigest()[:6]}_"
        else:
            prefix = "rx_"
    if route:
        routed_now = getattr(spark, "_rubix_analyzed_prefix", {})
        clash = next(
            (d for d, p in routed_now.items() if p == prefix and d != sf_dir.rstrip("/")), None
        )
        if clash is not None:
            raise ValueError(
                f"prefix {prefix!r} already routes {clash}; re-routing it to {sf_dir} "
                "would silently serve the new dir's data for the old dir"
            )
    out: dict[str, dict] = {}
    # a re-ANALYZE invalidates any memoized per-column stat lookups (stats.catalog_max)
    memo = getattr(spark, "_rubix_catalog_max_memo", None)
    if memo:
        for k in [k for k in memo if k[0].startswith(prefix)]:
            del memo[k]
    for name in names:
        tbl = f"{prefix}{name}"
        path = f"{sf_dir.rstrip('/')}/{name}.parquet"
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        spark.sql(f"CREATE TABLE {tbl} USING parquet LOCATION '{path}'")
        spark.sql(f"ANALYZE TABLE {tbl} COMPUTE STATISTICS")
        cols = _STATS_COLUMNS.get(name)
        if cols:
            spark.sql(f"ANALYZE TABLE {tbl} COMPUTE STATISTICS FOR COLUMNS {', '.join(cols)}")
        stats_row = [
            r.data_type
            for r in spark.sql(f"DESC EXTENDED {tbl}").collect()
            if r.col_name == "Statistics"
        ]
        rows = bytes_ = None
        if stats_row:  # e.g. "33827 bytes, 1500 rows"
            for part in stats_row[0].split(","):
                part = part.strip()
                if part.endswith("rows"):
                    rows = int(part.split()[0])
                elif part.endswith("bytes"):
                    bytes_ = int(part.split()[0])
        out[name] = {"rows": rows, "bytes": bytes_}
    spark.conf.set("spark.sql.cbo.enabled", "true")
    # joinReorder measured a 15-50% REGRESSION on the deep-join queries at sf10
    # (q30: 6.0 -> 6.7-9.1 s; reorder fights the hand-ordered broadcast plans and its
    # cost model re-plans per call), while the stats-driven broadcast flip needs only
    # cbo.enabled. Leave reorder off; callers who author unordered SQL can opt in.
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
    # opt-in (bench.py): route catalog.table() through the analyzed tables from now
    # on so EVERY query sees the stats (and drop any path-based DataFrames already
    # memoized for this dir so they re-resolve). Requires the full fixture set.
    if route:
        if set(TABLES) - set(names):
            raise ValueError("route=True requires analyzing all fixture tables")
        routed = getattr(spark, "_rubix_analyzed_prefix", None)
        if routed is None:
            routed = {}
            spark._rubix_analyzed_prefix = routed
        routed[sf_dir.rstrip("/")] = prefix
        memo = getattr(spark, "_rubix_table_memo", None)
        if memo:
            for k in [k for k in memo if k[0] == sf_dir.rstrip("/")]:
                del memo[k]
    return out
