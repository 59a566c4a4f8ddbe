"""As-of join — an operator Spark lacks natively (SURVEY.md §2 custom-operator case b).

Semantics: for each left row, attach the most recent right row with the same key and
``right.ts <= left.ts`` (backward as-of).  Two implementations, same results:

- ``asof_join()`` — Arrow-batched ``applyInPandas`` running ``pd.merge_asof`` per key
  group: the *scale path*.  One shuffle co-partitions both sides by key; each group is
  sorted and merged in O(n log n) pandas/numpy, never a row-multiplying range join.
- the oracle restates it relationally (equi-join + MAX over the ts inequality), which is
  what you'd write in SQL but multiplies rows before aggregating — correct, slower.

The registered query as-of joins purchase events to each user's most recent prior click.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rubix_spark import catalog
from rubix_spark.queries import register


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_value_cols: list[str] | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Backward as-of join via co-grouped applyInPandas (pd.merge_asof per key).

    Output = all left columns, plus the matched right timestamp as ``{on}{suffix}``, plus
    ``{c}{suffix}`` for each requested right value column.  The right's ``on`` column is
    renamed Spark-side before the cogroup — duplicating it with an alias instead would
    get deduplicated/pruned by Catalyst before it reaches the Python worker.
    """
    right_value_cols = list(right_value_cols or [])
    ron = f"{on}{suffix}"
    l_cols = left.columns
    r_schema = dict(right.dtypes)
    out_fields = ", ".join(f"{c} {t}" for c, t in left.dtypes)
    out_fields += f", {ron} {r_schema[on]}"
    out_fields += "".join(f", {c}{suffix} {r_schema[c]}" for c in right_value_cols)
    out_cols = l_cols + [ron] + [f"{c}{suffix}" for c in right_value_cols]

    right2 = right.withColumnRenamed(on, ron)

    def merge(key, lp: pd.DataFrame, rp: pd.DataFrame) -> pd.DataFrame:
        if lp.empty:
            return pd.DataFrame(columns=out_cols)
        lp = lp.sort_values(on, kind="mergesort")
        if rp.empty:
            merged = lp.copy()
            for c in out_cols[len(l_cols):]:
                merged[c] = None
            return merged[out_cols]
        rp = rp.sort_values(ron, kind="mergesort")[[ron] + right_value_cols]
        merged = pd.merge_asof(
            lp, rp, left_on=on, right_on=ron, direction="backward", suffixes=("", suffix)
        )
        for c in right_value_cols:
            if c in merged.columns and f"{c}{suffix}" not in merged.columns:
                merged = merged.rename(columns={c: f"{c}{suffix}"})
        return merged[out_cols]

    return (
        left.groupBy(by)
        .cogroup(right2.groupBy(by))
        .applyInPandas(merge, schema=out_fields)
    )


@register(
    "x7_asof_join",
    """
    WITH p AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'),
    c AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
    SELECT p.user_id, p.event_id, MAX(c.ts) AS click_ts
    FROM p LEFT JOIN c ON c.user_id = p.user_id AND c.ts <= p.ts
    GROUP BY p.user_id, p.event_id
    """,
    doc=(
        "Backward as-of join (purchase → most recent prior click per user) via "
        "pd.merge_asof in co-grouped applyInPandas; one co-partitioning shuffle on "
        "user_id, per-group sorted merge — no row-multiplying range join at scale."
    ),
)
def x7_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = catalog.table(spark, sf_dir, "events")
    purchases = events.where(F.col("event_type") == "purchase").select("user_id", "event_id", "ts")
    clicks = events.where(F.col("event_type") == "click").select("user_id", "ts")
    joined = asof_join(purchases, clicks, on="ts", by="user_id")
    return joined.select("user_id", "event_id", F.col("ts_r").alias("click_ts"))


# ---------------------------------------------------------------------------
# range (interval) join — bucketized, never a row-multiplying theta join
# ---------------------------------------------------------------------------
_WINDOW_US = 10 * 60 * 1_000_000  # 10-minute lookback
_BUCKET_US = _WINDOW_US  # bucket width == window span ⇒ candidates live in 2 buckets


@register(
    "x7_range_join",
    """
    SELECT p.event_id, COUNT(*) AS n_clicks,
           FLOOR(CAST(SUM(CAST(c.value AS DECIMAL(18,4))) AS DOUBLE) * 100 + 0.5) / 100.0 AS click_v
    FROM events p
    JOIN events c
      ON c.user_id = p.user_id
     AND c.event_type = 'click'
     AND c.ts >= p.ts - INTERVAL 10 MINUTE
     AND c.ts < p.ts
    WHERE p.event_type = 'purchase'
    GROUP BY p.event_id
    """,
    doc=(
        "Range (interval) join: each purchase gathers the same user's clicks from the "
        "preceding 10 minutes. The oracle states it as the theta join; the Spark plan "
        "BUCKETIZES time at the window width so every candidate pair shares one of two "
        "(user, bucket) keys — a 2x fan-out equi-join with a residual filter, never the "
        "O(clicks x purchases)-per-user nested loop a raw inequality join becomes. At "
        "100 TB both sides shuffle once on narrow keys; AQE handles hot users."
    ),
)
def range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rubix_spark.fns import dec, money

    ev = catalog.table(spark, sf_dir, "events")
    # ts is TIMESTAMP_NTZ; the session tz is pinned UTC, so the cast is lossless
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id",
        us.alias("c_us"),
        "value",
        F.floor(us / _BUCKET_US).cast("long").alias("bucket"),
    )
    pb = F.floor(us / _BUCKET_US).cast("long")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", us.alias("p_us"),
        F.explode(F.array(pb - 1, pb)).alias("bucket"),
    )
    joined = purchases.join(clicks, ["user_id", "bucket"]).where(
        (F.col("c_us") >= F.col("p_us") - _WINDOW_US) & (F.col("c_us") < F.col("p_us"))
    )
    return joined.groupBy("event_id").agg(
        F.count("*").alias("n_clicks"), money(F.sum(dec("value")), "click_v")
    )
