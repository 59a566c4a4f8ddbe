"""Round-trip tests for the format surface (parquet / ORC / CSV / JSON)."""

from __future__ import annotations

import pytest

from rubix_spark.sources import read_table, write_table
from tests.conftest import SF_SMOKE


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("fmt", ["parquet", "orc", "csv", "json"])
def test_roundtrip(spark, tmp_path, fmt):
    src = read_table(spark, f"{SF_SMOKE}/nation.parquet")
    dest = str(tmp_path / f"nation_{fmt}")
    write_table(src, dest, fmt=fmt)
    back = read_table(spark, dest, fmt=fmt, schema="n_nationkey int, n_name string, n_regionkey int")
    assert _rows(back) == _rows(src)


def test_partitioned_write_prunes(spark, tmp_path):
    """partitionBy layout + partition pruning: reading one partition touches one directory."""
    src = read_table(spark, f"{SF_SMOKE}/orders.parquet")
    dest = str(tmp_path / "orders_by_status")
    write_table(src, dest, partition_by=["o_orderstatus"])
    part = read_table(spark, dest).where("o_orderstatus = 'F'")
    expected = src.where("o_orderstatus = 'F'").count()
    assert part.count() == expected
    # pruning proof: the physical plan must carry the partition filter
    plan = part._jdf.queryExecution().executedPlan().toString()
    assert "o_orderstatus" in plan


def test_bad_format_rejected(spark, tmp_path):
    src = read_table(spark, f"{SF_SMOKE}/nation.parquet")
    with pytest.raises(ValueError):
        write_table(src, str(tmp_path / "x"), fmt="avro")
    with pytest.raises(ValueError):
        read_table(spark, str(tmp_path / "x"), fmt="xml")
