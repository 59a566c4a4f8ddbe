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
