"""tools/gen_sf.py — the scale-up amplifier is part of the bench protocol, so its
invariants get their own gate: exact row-count multiplication, referential integrity
across shifted key spaces, no degenerate cross-replica duplicates, preserved vector
geometry, and µs timestamps on disk (every reader's unit detection depends on it)."""

from __future__ import annotations

import glob
import sys

import duckdb
import pytest

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def amplified(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sfx"))
    argv = sys.argv
    sys.argv = ["gen_sf.py", "--src", SF_SMOKE, "--out", out, "--factor", "2"]
    try:
        import tools.gen_sf as gen_sf

        gen_sf.main()  # getOrCreate() reuses the test session
    finally:
        sys.argv = argv
    return out


def _view(con, d, t):
    path = f"{d}/{t}.parquet"
    src = f"{path}/*.parquet" if glob.glob(f"{path}/*.parquet") else path
    con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{src}'")


def test_row_counts_and_integrity(amplified):
    con = duckdb.connect()
    for t in ("customer", "orders", "lineitem", "documents", "embeddings", "events"):
        _view(con, amplified, t)
        n_src = con.execute(f"SELECT COUNT(*) FROM '{SF_SMOKE}/{t}.parquet'").fetchone()[0]
        n_out = con.execute(f"SELECT COUNT(*) FROM {t}").fetchone()[0]
        assert n_out == 2 * n_src, (t, n_src, n_out)
    assert con.execute(
        "SELECT COUNT(*) FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey"
        " WHERE o.o_orderkey IS NULL"
    ).fetchone()[0] == 0
    assert con.execute(
        "SELECT COUNT(*) FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey"
        " WHERE c.c_custkey IS NULL"
    ).fetchone()[0] == 0


def test_no_degenerate_duplicates_and_geometry(amplified):
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        _view(con, amplified, t)
    # replicating text verbatim would make every doc an exact dup; token-periodic
    # boilerplate is the trap the replica-salt exists for
    src_dupes = con.execute(
        f"SELECT COUNT(*) FROM (SELECT text FROM '{SF_SMOKE}/documents.parquet'"
        " GROUP BY text HAVING COUNT(*) > 1)"
    ).fetchone()[0]
    out_dupes = con.execute(
        "SELECT COUNT(*) FROM (SELECT text FROM documents GROUP BY text HAVING COUNT(*) > 1)"
    ).fetchone()[0]
    assert out_dupes == src_dupes  # amplification adds NO new exact-dup groups
    # rotation preserves norms exactly (float-identical set of magnitudes per replica)
    norm_spread = con.execute(
        "SELECT MAX(n) - MIN(n) FROM (SELECT sqrt(list_sum(list_transform(embedding,"
        " x -> x*x))) AS n FROM embeddings)"
    ).fetchone()[0]
    src_spread = con.execute(
        "SELECT MAX(n) - MIN(n) FROM (SELECT sqrt(list_sum(list_transform(embedding,"
        f" x -> x*x))) AS n FROM '{SF_SMOKE}/embeddings.parquet')"
    ).fetchone()[0]
    assert abs(norm_spread - src_spread) < 1e-6


def test_events_ts_written_as_micros(amplified):
    import pyarrow.parquet as pq

    part = sorted(glob.glob(f"{amplified}/events.parquet/*.parquet"))[0]
    t = pq.ParquetFile(part).schema_arrow.field("ts").type
    assert getattr(t, "unit", None) == "us"
