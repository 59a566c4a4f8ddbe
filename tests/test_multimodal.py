"""Multimodal ops: the rows-only feature extractor's deterministic properties, and the
real-codec seam."""

from __future__ import annotations

import math

import pytest

from rubix_spark.ops.multimodal import decode_payload
from rubix_spark.queries import load_all
from tests.conftest import SF_SMOKE

REGISTRY = load_all()


def test_features_deterministic_and_normalized(spark):
    """x5_features (rows-only gate): identical across runs, L1-normalized, N_FEAT dims."""
    a = {r.doc_id: tuple(r.feat) for r in REGISTRY["x5_features"].builder(spark, SF_SMOKE).collect()}
    b = {r.doc_id: tuple(r.feat) for r in REGISTRY["x5_features"].builder(spark, SF_SMOKE).collect()}
    assert a == b and a
    for feat in a.values():
        assert len(feat) == 8
        assert math.isclose(sum(feat), 1.0, rel_tol=1e-5)


def test_resize_never_upscales_and_preserves_aspect(spark):
    for r in REGISTRY["x5_resize"].builder(spark, SF_SMOKE).collect():
        assert 1 <= r.rw <= max(r.width, 1) and 1 <= r.rh <= max(r.height, 1)
        assert max(r.rw, r.rh) <= 224


def test_real_decode_is_an_explicit_seam():
    with pytest.raises(NotImplementedError):
        decode_payload(b"payload", fake=False)


@pytest.fixture(scope="module")
def null_payload_docs_dir(tmp_path_factory):
    """documents with a planted NULL text row + an EMPTY text row beside normal rows —
    the NULL-payload contract (every derived column degrades to NULL) had only ever
    been exercised vacuously (invariant 36): no fixture or adversarial corpus carried
    NULL text, the unguarded oracles CRASHED on it, and the JVM bodies' lit(3)/
    greatest(...,1) diverged from the kernels' NULL masks."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    texts = ["the cat sat", None, "", "x" * 300, None, "one two three"]
    d = tmp_path_factory.mktemp("nulldocs")
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts)),
        "source": pa.array(["synth"] * len(texts)),
        "n_chars": pa.array([len(t) if t is not None else None for t in texts], pa.int32()),
    })
    pq.write_table(tbl, str(d / "documents.parquet"))
    return str(d)


@pytest.mark.parametrize("jvm_row,kernel_row", [
    ("x5_multimodal_meta", "x5_multimodal_meta_kernel"),
    ("x5_multimodal_decode", "x5_multimodal_decode_kernel"),
    ("x5_frame_sample", "x5_frame_sample_kernel"),
    ("x5_resize", "x5_resize_kernel"),
])
def test_null_payload_triparity(spark, null_payload_docs_dir, jvm_row, kernel_row):
    """JVM body == Arrow kernel == DuckDB oracle on a corpus WITH NULL payloads,
    and the planted NULLs actually reach the output (non-vacuous)."""
    import duckdb

    jvm = sorted(tuple(r) for r in REGISTRY[jvm_row].builder(spark, null_payload_docs_dir).collect())
    ker = sorted(tuple(r) for r in REGISTRY[kernel_row].builder(spark, null_payload_docs_dir).collect())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{null_payload_docs_dir}/documents.parquet'")
    ora = sorted(tuple(r) for r in con.execute(REGISTRY[jvm_row].oracle).fetchall())
    con.close()
    assert jvm == ora, f"{jvm_row} vs oracle"
    assert ker == ora, f"{kernel_row} vs oracle"
    # the trap fired: the NULL-payload rows are present with NULL derived columns
    null_rows = [r for r in jvm if any(x is None for x in r[1:])]
    assert len(null_rows) >= 2, "planted NULL payloads did not reach the output"


def test_null_payload_features_degrade_to_null(spark, null_payload_docs_dir):
    rows = {r.doc_id: r.feat for r in
            REGISTRY["x5_features"].builder(spark, null_payload_docs_dir).collect()}
    assert rows[1] is None and rows[4] is None  # planted NULL payloads
    assert rows[0] is not None and len(rows[0]) == 8
    # empty (but non-NULL) payload keeps a row with an all-zero histogram
    assert rows[2] is not None and sum(rows[2]) == 0.0
