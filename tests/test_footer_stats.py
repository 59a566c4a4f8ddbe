"""sources/stats.py trust rules — especially the round-8 NaN rule (ADVICE r7):
parquet writers exclude NaN from column-chunk min/max while Spark F.max and DuckDB MAX
order NaN greatest, so float columns must never be answered from the footer."""

import math
import os

import pyarrow as pa
import pyarrow.parquet as pq

from rubix_spark.sources.stats import footer_max, parquet_row_count


def _write(tmp_path, name, table):
    p = os.path.join(tmp_path, name)
    pq.write_table(table, p)
    return p


def test_floats_never_trusted_even_without_nan(tmp_path):
    p = _write(
        tmp_path, "t.parquet",
        pa.table({"d": pa.array([1.0, 2.5], pa.float64()), "i": pa.array([1, 7], pa.int64())}),
    )
    maxes, scan = footer_max(p)
    assert "d" in scan and "d" not in maxes  # no NaN-count in classic stats -> no proof
    assert maxes["i"] == 7 and "i" not in scan


def test_nan_would_have_poisoned_the_footer_max(tmp_path):
    # the empirical ADVICE finding: the footer reports the non-NaN max, the engines
    # would answer NaN — proving the column must scan
    p = _write(tmp_path, "t.parquet", pa.table({"d": pa.array([1.5, math.nan], pa.float64())}))
    st = pq.ParquetFile(p).metadata.row_group(0).column(0).statistics
    if st is not None and st.has_min_max:
        assert st.max == 1.5  # footer silently ignores the NaN
    maxes, scan = footer_max(p)
    assert "d" in scan and "d" not in maxes


def test_int_string_trust_rules(tmp_path):
    p = _write(
        tmp_path, "t.parquet",
        pa.table({
            "s_short": pa.array(["abc", "zz"]),
            "s_long": pa.array(["x" * 40, "y" * 40]),
        }),
    )
    maxes, scan = footer_max(p)
    assert maxes.get("s_short") == "zz"
    assert "s_long" in scan  # > 8 bytes: could be a truncated bound


def test_row_count_matches(tmp_path):
    p = _write(tmp_path, "t.parquet", pa.table({"i": list(range(123))}))
    assert parquet_row_count(p) == 123
