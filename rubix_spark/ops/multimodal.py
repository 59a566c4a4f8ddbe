"""Multimodal columns: opaque ``binary`` payloads + typed metadata, processed in Arrow batches.

Design (SURVEY.md north star): image/audio/video travel as ``BinaryType`` columns with a
typed metadata struct alongside. All per-payload work (metadata extraction, decode,
resize, frame-sample) runs through ``mapInPandas`` — Arrow-batched, schema-stable,
partition-parallel — never a row-at-a-time Python UDF and never a driver collect.

The container has no image/audio codecs, so the *real* decode is stubbed behind
``decode_payload(..., fake=False)`` → ``NotImplementedError``; the deterministic fake
derives dimensions from the payload's md5 so the full Spark plumbing (schema, batch
iteration, partitioning) is exercised and oracle-checked.

Payloads in the registered queries are synthesized from ``documents.text`` (utf-8 bytes)
because the fixtures carry no true binary column.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rubix_spark import catalog
from rubix_spark.queries import register

META_SCHEMA = "doc_id bigint, n_bytes int, content_md5 string"
DECODE_SCHEMA = "doc_id bigint, width int, height int, channels int"


def decode_payload(payload: bytes, fake: bool = True) -> tuple[int, int, int]:
    """Decode an image payload to (width, height, channels).

    ``fake=True`` (the only mode available in this container) derives deterministic
    dimensions from md5(payload); ``fake=False`` is the seam where a real codec
    (PIL/ffmpeg) plugs in.
    """
    if not fake:
        raise NotImplementedError("real image/audio decode requires codec libs not present in this container")
    h = hashlib.md5(payload).hexdigest()
    return int(h[:4], 16) % 1920 + 1, int(h[4:8], 16) % 1080 + 1, 3


def extract_metadata(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Arrow-batched metadata extraction over a binary column."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": pdf[payload_col].map(len).astype("int32"),
                    "content_md5": pdf[payload_col].map(lambda b: hashlib.md5(bytes(b)).hexdigest()),
                }
            )

    return df.mapInPandas(run, schema=META_SCHEMA)


def decode_batch(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Arrow-batched (fake) decode over a binary column → typed dimensions."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = pdf[payload_col].map(lambda b: decode_payload(bytes(b)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "width": dims.map(lambda d: d[0]).astype("int32"),
                    "height": dims.map(lambda d: d[1]).astype("int32"),
                    "channels": dims.map(lambda d: d[2]).astype("int32"),
                }
            )

    return df.mapInPandas(run, schema=DECODE_SCHEMA)


def _payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = catalog.table(spark, sf_dir, "documents")
    return docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))


@register(
    "x5_multimodal_meta",
    """
    SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS n_bytes, md5(text) AS content_md5
    FROM documents
    """,
    doc="Binary-column metadata extraction via mapInPandas (Arrow batches); md5/length oracle-checked.",
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract_metadata(_payloads(spark, sf_dir))


@register(
    "x5_multimodal_decode",
    """
    SELECT doc_id,
           CAST(CAST(concat('0x', substr(md5(text), 1, 4)) AS INT) % 1920 + 1 AS INT) AS width,
           CAST(CAST(concat('0x', substr(md5(text), 5, 4)) AS INT) % 1080 + 1 AS INT) AS height,
           3 AS channels
    FROM documents
    """,
    doc="Deterministic fake decode through the real mapInPandas plumbing (schema/batching/partitioning).",
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    return decode_batch(_payloads(spark, sf_dir))


FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_offset int"
N_FRAMES = 4


def sample_frames(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Arrow-batched frame sampling: pick N_FRAMES evenly-spaced byte offsets per payload.

    Stand-in for video keyframe extraction (the real seek/decode plugs in where the
    offset arithmetic is); demonstrates the one→many mapInPandas shape for media.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "frame_offset": []}
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                n = len(payload)
                for i in range(N_FRAMES):
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(i)
                    rows["frame_offset"].append((i * n) // N_FRAMES)
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=FRAME_SCHEMA)


@register(
    "x5_frame_sample",
    f"""
    SELECT doc_id, g.i AS frame_idx,
           CAST((g.i * octet_length(encode(text))) // {N_FRAMES} AS INT) AS frame_offset
    FROM documents, generate_series(0, {N_FRAMES - 1}) g(i)
    """,
    doc=(
        "Frame sampling over binary payloads: 4 evenly-spaced offsets per payload via "
        "mapInPandas (one→many media shape; the real keyframe decode plugs into the "
        "offset loop)."
    ),
)
def frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sample_frames(_payloads(spark, sf_dir))


TARGET_EDGE = 224


def resize_plan(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Aspect-preserving resize planning over decoded dims: scale the longer edge down
    to TARGET_EDGE (never upscale). The real pixel resample plugs in where the
    dimension arithmetic is — the Spark-side shape (decode → per-row plan → batched
    resample) is what matters at scale; all of it stays in one mapInPandas pass."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [decode_payload(p) for p in pdf[payload_col]]
            w = pd.Series([d[0] for d in dims], dtype="int32")
            h = pd.Series([d[1] for d in dims], dtype="int32")
            scale = (TARGET_EDGE / pd.concat([w, h], axis=1).max(axis=1)).clip(upper=1.0)
            out = pd.DataFrame({"doc_id": pdf[id_col]})
            out["width"], out["height"] = w, h
            out["rw"] = (w * scale).astype(int).clip(lower=1).astype("int32")
            out["rh"] = (h * scale).astype(int).clip(lower=1).astype("int32")
            yield out

    return df.mapInPandas(run, schema="doc_id bigint, width int, height int, rw int, rh int")


@register(
    "x5_resize",
    f"""
    WITH d AS (
        SELECT doc_id,
               CAST(CAST(concat('0x', substr(md5(text), 1, 4)) AS INT) % 1920 + 1 AS INT) AS width,
               CAST(CAST(concat('0x', substr(md5(text), 5, 4)) AS INT) % 1080 + 1 AS INT) AS height
        FROM documents
    )
    SELECT doc_id, width, height,
           CAST(GREATEST(FLOOR(width * LEAST({TARGET_EDGE}.0 / GREATEST(width, height), 1.0)), 1) AS INT) AS rw,
           CAST(GREATEST(FLOOR(height * LEAST({TARGET_EDGE}.0 / GREATEST(width, height), 1.0)), 1) AS INT) AS rh
    FROM d
    """,
    doc=(
        "Image-resize stage: decode dims (deterministic fake), plan the aspect-"
        f"preserving fit to {TARGET_EDGE}px (downscale only), all inside one "
        "mapInPandas pass — the real pixel resample is the documented seam. "
        "Dimension arithmetic oracle-checked."
    ),
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return resize_plan(_payloads(spark, sf_dir))


N_FEAT = 8


def extract_features(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """REAL (not stubbed) feature extraction over binary payloads: an 8-bin byte-value
    histogram, L1-normalized — numpy bincount over the raw bytes, one Arrow batch at a
    time. The shape a CLIP/audio embedding job has at 100 TB: linear scan, per-row
    vector out, no shuffle; swap the histogram for a model forward pass and nothing
    else changes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            feats = []
            for p in pdf[payload_col]:
                b = np.frombuffer(bytes(p), dtype=np.uint8)
                hist = np.bincount(b >> 5, minlength=N_FEAT).astype("float64")
                tot = hist.sum()
                feats.append((hist / tot if tot else hist).astype("float32").tolist())
            yield pd.DataFrame({"doc_id": pdf[id_col], "feat": feats})

    return df.mapInPandas(run, schema="doc_id bigint, feat array<float>")


@register(
    "x5_features",
    None,  # byte-level histogram over utf-8 payloads — not SQL-expressible in DuckDB
    doc=(
        "Feature extraction over binary payloads: 8-bin L1-normalized byte histogram "
        "per payload (numpy bincount in mapInPandas — real vectorized feature work, "
        "not a stub). Rows-only gate; the repo suite asserts determinism and "
        "normalization (tests/test_multimodal.py)."
    ),
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract_features(_payloads(spark, sf_dir))
